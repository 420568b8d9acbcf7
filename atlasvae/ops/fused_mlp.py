"""Fused dense-stack Pallas kernel for TPU.

The framework's models are small MLPs (<=512 features, hidden sizes
10-200, ref OE-VAE/vae.py:24).  Run layer-by-layer, each matmul is
HBM-bandwidth-bound: activations bounce HBM->VMEM->HBM between layers.
This kernel keeps **all** weights and the running activation in VMEM and
applies the entire stack per batch tile in one ``pallas_call`` — one HBM
read of x, one HBM write of y, zero intermediate traffic.  Used on the
inference/eval paths (predict, latent KLD, discriminants), which process
tens of millions of jets (ref OE-VAE/vae.py:163-166).

Feature dims are zero-padded to the 128-lane boundary; padded weight
columns/rows are zero so padding is exact, and the batch is padded to
the tile size and sliced back.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANE = 128
_TILE_B = 512


def _pad_to(x, size, axis):
    pad = size - x.shape[axis]
    if pad <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def _round_up(n, m):
    return (n + m - 1) // m * m


def _kernel(n_layers, relu_flags, x_ref, *refs):
    w_refs = refs[:n_layers]
    b_refs = refs[n_layers:2 * n_layers]
    out_ref = refs[2 * n_layers]
    h = x_ref[:]
    for i in range(n_layers):
        h = jnp.dot(h, w_refs[i][:], preferred_element_type=jnp.float32) + b_refs[i][:]
        if relu_flags[i]:
            h = jnp.maximum(h, 0.0)
    out_ref[:] = h


@functools.partial(jax.jit, static_argnames=("relu_flags", "interpret"))
def _fused(x, weights, biases, relu_flags, interpret):
    n_layers = len(weights)
    batch, in_dim = x.shape
    dims = [in_dim] + [w.shape[1] for w in weights]
    pdims = [_round_up(d, _LANE) for d in dims]
    pbatch = _round_up(max(batch, 8), _TILE_B)
    xp = _pad_to(_pad_to(x, pdims[0], 1), pbatch, 0)
    wp = [_pad_to(_pad_to(w, pdims[i], 0), pdims[i + 1], 1)
          for i, w in enumerate(weights)]
    bp = [_pad_to(b[None, :], pdims[i + 1], 1) for i, b in enumerate(biases)]

    grid = (pbatch // _TILE_B,)
    in_specs = [pl.BlockSpec((_TILE_B, pdims[0]), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)]
    in_specs += [pl.BlockSpec((pdims[i], pdims[i + 1]), lambda i_, i=i: (0, 0),
                              memory_space=pltpu.VMEM) for i in range(n_layers)]
    in_specs += [pl.BlockSpec((1, pdims[i + 1]), lambda i_, i=i: (0, 0),
                              memory_space=pltpu.VMEM) for i in range(n_layers)]
    out = pl.pallas_call(
        functools.partial(_kernel, n_layers, relu_flags),
        out_shape=jax.ShapeDtypeStruct((pbatch, pdims[-1]), jnp.float32),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((_TILE_B, pdims[-1]), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(xp, *wp, *bp)
    return out[:batch, :dims[-1]]


def fused_mlp_apply(layers, x, activation="relu", final_activation="linear"):
    """Apply a dense stack (list of {'w','b'} dicts) in one fused kernel.

    ReLU between layers; the final layer is linear by default (matching
    the VAE decoder head, ref OE-VAE/models.py:48).  Falls back to the
    Pallas interpreter off-TPU so tests run on CPU.
    """
    if activation != "relu" or final_activation not in ("linear", "relu"):
        raise ValueError("fused kernel supports relu hidden + linear/relu final")
    weights = tuple(l["w"].astype(jnp.float32) for l in layers)
    biases = tuple(l["b"].astype(jnp.float32) for l in layers)
    relu_flags = tuple([True] * (len(layers) - 1) + [final_activation == "relu"])
    interpret = jax.default_backend() != "tpu"
    return _fused(jnp.asarray(x, jnp.float32), weights, biases, relu_flags, interpret)
