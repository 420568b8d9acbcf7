"""Variational autoencoder: FCN encoder -> (mu, log sigma^2) -> reparam -> FCN decoder.

Re-implements the reference architecture (ref OE-VAE/models.py:7-69) as a
parameter pytree + pure functions compiled into one XLA graph:

* ``Encoder``: hidden stack over FC_layers[:-1], two linear heads for
  z_mean / z_log_var (ref models.py:18-36),
* ``Sampling``: z ~ N(mu, sigma) with sigma = exp(log_var/2) clipped to
  1e6 (ref models.py:7-15),
* ``Decoder``: mirrored hidden stack + linear output (ref models.py:39-52),
* reconstruction clipped via ``clip_values`` (non-finite -> 0, +-1e6,
  ref models.py:243-246).
"""

import dataclasses

import jax
import jax.numpy as jnp

from .mlp import init_mlp, init_dense, dense_apply, mlp_apply


@dataclasses.dataclass(frozen=True)
class VAEConfig:
    fc_layers: tuple = (80, 40, 20, 10)  # ref OE-VAE/vae.py:24 default
    input_dim: int = 12
    activation: str = "relu"


def init_vae(key, config):
    hidden = list(config.fc_layers[:-1])
    latent = config.fc_layers[-1]
    k_enc, k_mean, k_logvar, k_dec, k_out = jax.random.split(key, 5)
    enc_dims = [config.input_dim] + hidden
    dec_dims = [latent] + hidden[::-1]
    return {
        "encoder": {
            "hidden": init_mlp(k_enc, enc_dims, "he_normal", "normal"),
            "mean": init_dense(k_mean, hidden[-1] if hidden else config.input_dim,
                               latent, "glorot_uniform", "zeros"),
            "logvar": init_dense(k_logvar, hidden[-1] if hidden else config.input_dim,
                                 latent, "glorot_uniform", "zeros"),
        },
        "decoder": {
            "hidden": init_mlp(k_dec, dec_dims, "he_normal", "normal"),
            "out": init_dense(k_out, dec_dims[-1], config.input_dim,
                              "glorot_uniform", "zeros"),
        },
    }


def clip_values(x, max_val=1e6):
    """Non-finite -> 0, then clip to [-max_val, max_val]
    (ref OE-VAE/models.py:243-246)."""
    x = jnp.where(jnp.isfinite(x), x, 0.0)
    return jnp.clip(x, -max_val, max_val)


def encode(params, x, activation="relu", impl="xla"):
    """impl='pallas' runs the whole encoder as one fused VMEM-resident
    kernel (atlasvae.ops.fused_vae); requires relu activation.  The
    encoder input receives a zero cotangent under the fused path (inputs
    are data in every training graph)."""
    if impl == "pallas" and activation == "relu":
        from ..ops.fused_vae import fused_encoder
        return fused_encoder(params["encoder"], x)
    h = mlp_apply(params["encoder"]["hidden"], x, activation)
    z_mean = dense_apply(params["encoder"]["mean"], h)
    z_log_var = dense_apply(params["encoder"]["logvar"], h)
    return z_mean, z_log_var


def reparameterize(key, z_mean, z_log_var, noise=None):
    sigma = clip_values(jnp.exp(z_log_var / 2))
    if noise is None:
        noise = jax.random.normal(key, z_mean.shape)
    return z_mean + sigma * noise


def decode(params, z, activation="relu", impl="xla"):
    if impl == "pallas" and activation == "relu":
        from ..ops.fused_vae import fused_decoder
        return fused_decoder(params["decoder"], z)
    h = mlp_apply(params["decoder"]["hidden"], z, activation)
    return dense_apply(params["decoder"]["out"], h)


def vae_apply(params, x, key, activation="relu", sample=True, noise=None,
              impl="xla"):
    """Full forward pass -> (reconstruction, z_mean, z_log_var).

    ``noise``: optional explicit standard-normal draw for the latent
    sample.  Passing a slice of a *global-batch* draw makes data-parallel
    shards reproduce the single-device program bit-for-bit (see
    train/step.py), which the per-shard PRNG stream cannot.
    ``impl='pallas'``: fused encoder/decoder kernels (ops/fused_vae).
    """
    z_mean, z_log_var = encode(params, x, activation, impl)
    z = reparameterize(key, z_mean, z_log_var, noise) if sample else z_mean
    reconstructed = clip_values(decode(params, z, activation, impl))
    return reconstructed, z_mean, z_log_var
