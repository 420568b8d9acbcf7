"""Dense stacks as parameter pytrees.

Models are plain dicts of arrays + pure apply functions (no module
framework): everything jits, vmaps, shards, and checkpoints as a pytree,
and tensor-parallel layouts are just PartitionSpecs on the leaves.
Replaces the reference's Keras layers (ref OE-VAE/models.py:18-52).
"""

import jax
import jax.numpy as jnp
import numpy as np


def _he_normal(key, shape):
    fan_in = shape[0]
    return jax.random.normal(key, shape) * jnp.sqrt(2.0 / fan_in)


def _glorot_uniform(key, shape):
    limit = jnp.sqrt(6.0 / (shape[0] + shape[1]))
    return jax.random.uniform(key, shape, minval=-limit, maxval=limit)


_KERNEL_INITS = {"he_normal": _he_normal, "glorot_uniform": _glorot_uniform}


def init_dense(key, in_dim, out_dim, kernel_init="he_normal", bias_init="zeros"):
    """One dense layer.  The reference's hidden layers use he_normal
    kernels and *standard-normal* biases (ref OE-VAE/models.py:23-25,
    ``bias_initializer=tf.random.normal``); output heads use Keras
    defaults (glorot_uniform kernel, zero bias)."""
    k_w, k_b = jax.random.split(key)
    w = _KERNEL_INITS[kernel_init](k_w, (in_dim, out_dim)).astype(jnp.float32)
    if bias_init == "normal":
        b = jax.random.normal(k_b, (out_dim,), dtype=jnp.float32)
    else:
        b = jnp.zeros((out_dim,), dtype=jnp.float32)
    return {"w": w, "b": b}


def dense_apply(layer, x):
    return x @ layer["w"] + layer["b"]


def init_mlp(key, dims, kernel_init="he_normal", bias_init="normal"):
    """Stack of dense layers with sizes dims[0] -> dims[1] -> ... -> dims[-1]."""
    keys = jax.random.split(key, max(len(dims) - 1, 1))
    return [
        init_dense(keys[i], dims[i], dims[i + 1], kernel_init, bias_init)
        for i in range(len(dims) - 1)
    ]


_ACTIVATIONS = {
    "relu": jax.nn.relu,
    "leaky_relu": lambda x: jax.nn.leaky_relu(x, 0.0),
    "tanh": jnp.tanh,
    "sigmoid": jax.nn.sigmoid,
    "linear": lambda x: x,
}


def activation_fn(name):
    return _ACTIVATIONS[name]


def mlp_apply(layers, x, activation="relu", final_activation=None):
    """Apply a dense stack; ``activation`` between layers, and
    ``final_activation`` (default: same) on the last layer's output."""
    act = _ACTIVATIONS[activation]
    last = _ACTIVATIONS[final_activation] if final_activation else act
    for i, layer in enumerate(layers):
        x = dense_apply(layer, x)
        x = last(x) if i == len(layers) - 1 else act(x)
    return x


def param_count(tree):
    return sum(int(np.prod(leaf.shape)) for leaf in jax.tree.leaves(tree))
