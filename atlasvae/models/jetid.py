"""Supervised jet classifier: multi-branch CNN/FCN -> softmax.

Re-implements the reference's ``multi_CNN`` factory
(ref jet-ID/models.py:9-66): per-image-shape Conv towers
(Conv + MaxPool + LeakyReLU(0) + Dropout), a constituents FCN branch,
a scalars FCN branch, concatenated into a final FCN + softmax head.

TPU-first notes: convolutions use ``lax.conv_general_dilated`` in NHWC
(channels-last maps onto the MXU as implicit GEMMs); dropout is folded
into the apply function with an explicit PRNG key; LeakyReLU(alpha=0)
is plain ReLU, kept under its reference name for parity.  Multi-GPU
MirroredStrategy (ref jet-ID/models.py:69-81) is replaced by the mesh
utilities in atlasvae.parallel.
"""

import dataclasses

import jax
import jax.numpy as jnp

from .mlp import init_mlp, init_dense, dense_apply, mlp_apply


@dataclasses.dataclass(frozen=True)
class JetIDConfig:
    n_classes: int = 2
    scalars: tuple = ()            # names of scalar branches (shape (d,))
    scalar_dims: tuple = ()
    images: tuple = ()             # names of image branches (shape (h, w))
    image_shapes: tuple = ()
    constituent_dim: int = 0       # flat constituents branch width (0 = off)
    nn_type: str = "FCN"           # 'CNN' or 'FCN' (ref classifier.py NN_type)
    fcn_neurons: tuple = (200, 200)
    branch_neurons: tuple = (200,)  # ref jet-ID/models.py:42,52
    cnn_maps: tuple = (100, 100)    # ref jet-ID/classifier.py:74-77 defaults
    cnn_kernels: tuple = ((3, 3), (3, 3))
    cnn_pools: tuple = ((2, 2), (2, 2))
    dropout: float = 0.1
    activation: str = "leaky_relu"
    # TPU analog of the reference's mixed_float16 policy
    # (ref jet-ID/models.py:74-75): compute in bfloat16 with float32
    # master weights; the softmax stays float32 (as Keras' mixed policy
    # keeps its softmax layer float32).  Default float32 for exactness.
    compute_dtype: str = "float32"


def _init_conv(key, kh, kw, c_in, c_out):
    k_w, _ = jax.random.split(key)
    fan_in = kh * kw * c_in
    fan_out = kh * kw * c_out
    limit = jnp.sqrt(6.0 / (fan_in + fan_out))
    return {
        "w": jax.random.uniform(k_w, (kh, kw, c_in, c_out), minval=-limit, maxval=limit),
        "b": jnp.zeros((c_out,), jnp.float32),
    }


def init_jetid(key, config):
    params = {}
    keys = iter(jax.random.split(key, 64))
    concat_dim = 0
    if config.images and config.nn_type == "CNN":
        towers = {}
        for name, shape in zip(config.images, config.image_shapes):
            convs, c_in, h, w = [], 1, shape[0], shape[1]
            for maps, kern, pool in zip(config.cnn_maps, config.cnn_kernels, config.cnn_pools):
                convs.append(_init_conv(next(keys), kern[0], kern[1], c_in, maps))
                h = max(h - kern[0] + 1, 1)
                w = max(w - kern[1] + 1, 1)
                h = -(-h // pool[0])
                w = -(-w // pool[1])
                c_in = maps
            towers[name] = convs
            concat_dim += h * w * c_in
        params["towers"] = towers
    elif config.images:
        concat_dim += sum(s[0] * s[1] for s in config.image_shapes)
    if config.constituent_dim:
        params["constituents"] = init_mlp(
            next(keys), [config.constituent_dim] + list(config.branch_neurons),
            "glorot_uniform", "zeros")
        concat_dim += config.branch_neurons[-1]
    if config.scalar_dims:
        params["scalars"] = init_mlp(
            next(keys), [sum(config.scalar_dims)] + list(config.branch_neurons),
            "glorot_uniform", "zeros")
        concat_dim += config.branch_neurons[-1]
    params["head"] = init_mlp(next(keys), [concat_dim] + list(config.fcn_neurons),
                              "glorot_uniform", "zeros")
    params["out"] = init_dense(next(keys), config.fcn_neurons[-1], config.n_classes,
                               "glorot_uniform", "zeros")
    return params


def _conv_tower(convs, x, pools, dropout, key, train):
    x = x[..., None]  # NHW -> NHWC
    for i, conv in enumerate(convs):
        x = jax.lax.conv_general_dilated(
            x, conv["w"], window_strides=(1, 1), padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + conv["b"]
        ph, pw = pools[i]
        x = -jax.lax.reduce_window(-x, jnp.inf, jax.lax.min,
                                   (1, ph, pw, 1), (1, ph, pw, 1), "SAME")
        x = jax.nn.relu(x)  # LeakyReLU(alpha=0), ref jet-ID/models.py:36
        x = _dropout(x, dropout, key, i, train)
    return x.reshape(x.shape[0], -1)


def _dropout(x, rate, key, salt, train):
    if not train or rate == 0.0:
        return x
    keep = jax.random.bernoulli(jax.random.fold_in(key, salt), 1.0 - rate, x.shape)
    return jnp.where(keep, x / (1.0 - rate), 0.0)


def jetid_apply(params, config, inputs, key=None, train=False):
    """Forward pass -> class probabilities.  ``inputs`` is a dict keyed by
    branch name ('constituents', scalar names, image names)."""
    if key is None:
        key = jax.random.PRNGKey(0)
    dtype = jnp.dtype(config.compute_dtype)
    if dtype != jnp.float32:
        params = jax.tree.map(lambda a: a.astype(dtype), params)
        inputs = {k: jnp.asarray(v).astype(dtype) for k, v in inputs.items()}
    branches = []
    if config.images and config.nn_type == "CNN":
        for name in config.images:
            branches.append(_conv_tower(params["towers"][name], inputs[name],
                                        config.cnn_pools, config.dropout, key, train))
    elif config.images:
        for name in config.images:
            branches.append(inputs[name].reshape(inputs[name].shape[0], -1))
    if config.constituent_dim:
        h = inputs["constituents"].reshape(inputs["constituents"].shape[0], -1)
        h = mlp_apply(params["constituents"], h, "relu")
        branches.append(_dropout(h, config.dropout, key, 101, train))
    if config.scalar_dims:
        h = jnp.concatenate(
            [inputs[name].reshape(inputs[name].shape[0], -1) for name in config.scalars],
            axis=-1)
        h = mlp_apply(params["scalars"], h, "relu")
        branches.append(_dropout(h, config.dropout, key, 202, train))
    h = jnp.concatenate(branches, axis=-1) if len(branches) > 1 else branches[0]
    h = mlp_apply(params["head"], h, "relu")
    h = _dropout(h, config.dropout, key, 303, train)
    logits = dense_apply(params["out"], h).astype(jnp.float32)
    return jax.nn.softmax(logits, axis=-1)
