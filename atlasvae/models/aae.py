"""Adversarial autoencoder: AE + 3-class discriminator.

Re-implements the reference's functional-API triple (ref OE-AAE/aae.py:20-57):

* encoder: hidden stack over layers[:-1], final Dense(latent, relu),
* decoder: mirrored stack, final Dense(output, relu),
* discriminator: hidden stack, final Dense(3, softmax) over classes
  {0: QCD, 1: reconstructed QCD, 2: OoD} (ref aae.py:49-57,196-199).

Keras-default inits (glorot_uniform kernels, zero biases,
ref aae.py:73 ``kernel='glorot_uniform'``).  The GAN freeze/unfreeze
cycling (Discriminator.trainable flips, ref aae.py:99,184,227) becomes
two optimizers over disjoint param subtrees + stop_gradient in the
composite loss — see atlasvae.train.aae_loop.
"""

import dataclasses

import jax

from .mlp import init_mlp, init_dense, dense_apply, mlp_apply


@dataclasses.dataclass(frozen=True)
class AAEConfig:
    input_dim: int = 12
    ae_layers: tuple = (100, 100, 100)   # ref OE-AAE/train.sh:6
    disc_layers: tuple = (100, 100, 3)   # ref OE-AAE/aae.py:76
    activation: str = "relu"


def init_aae(key, config):
    hidden = list(config.ae_layers[:-1])
    latent = config.ae_layers[-1]
    k_e, k_el, k_d, k_dl, k_disc, k_discl = jax.random.split(key, 6)
    return {
        "encoder": {
            "hidden": init_mlp(k_e, [config.input_dim] + hidden, "glorot_uniform", "zeros"),
            "out": init_dense(k_el, hidden[-1] if hidden else config.input_dim,
                              latent, "glorot_uniform", "zeros"),
        },
        "decoder": {
            "hidden": init_mlp(k_d, [latent] + hidden[::-1], "glorot_uniform", "zeros"),
            "out": init_dense(k_dl, hidden[0] if hidden else latent,
                              config.input_dim, "glorot_uniform", "zeros"),
        },
        "discriminator": {
            "hidden": init_mlp(k_disc, [config.input_dim] + list(config.disc_layers[:-1]),
                               "glorot_uniform", "zeros"),
            "out": init_dense(k_discl, config.disc_layers[-2], config.disc_layers[-1],
                              "glorot_uniform", "zeros"),
        },
    }


def ae_apply(params, x, activation="relu"):
    """Autoencoder forward: relu latent, relu reconstruction
    (ref OE-AAE/aae.py:26,37)."""
    h = mlp_apply(params["encoder"]["hidden"], x, activation)
    z = jax.nn.relu(dense_apply(params["encoder"]["out"], h))
    h = mlp_apply(params["decoder"]["hidden"], z, activation)
    return jax.nn.relu(dense_apply(params["decoder"]["out"], h))


def discriminator_apply(params, x, activation="relu"):
    """3-class softmax probabilities (ref OE-AAE/aae.py:49-57)."""
    h = mlp_apply(params["discriminator"]["hidden"], x, activation)
    return jax.nn.softmax(dense_apply(params["discriminator"]["out"], h), axis=-1)
