"""Max pooling with an elementwise backward (no select_and_scatter).

**Measured and rejected as a default — opt-in via ATLASVAE_POOL=fast.**
Hypothesis: the f32 chain's backward costs 3.5x its forward
(fwd 1.27-1.52 ms vs fwd+bwd 5.75-5.89 ms at the conv1 anatomy shape,
batch 500 x 64x64 -> 100 maps on v5e) and the max-pool VJP's
``select_and_scatter`` looked like the culprit.  Measured same-run:
this elementwise backward is SLOWER (f32 fwd+bwd 15.0 vs 8.3 ms, bf16
9.8 vs 4.3 ms, benchmarks/anatomy_conv.py) — the three
conv-resolution upsample/compare passes cost more traffic than the
scatter costs serialization, extending round 3's finding that the
"select_and_scatter is slow" folklore does not apply to window==stride
pooling.  Kept as a bitwise-identical validated alternative
(values AND gradients, including XLA's first-match tie routing —
tests/test_pooling.py), the ops/fused_vae.py precedent.

The jet-ID conv towers pool with window==stride SAME max pooling
(ref jet-ID/models.py:31 MaxPool2D).

``maxpool_same`` keeps the reduce_window forward and replaces only the
backward with vectorized elementwise work:

* upsample the pooled output and incoming gradient back to conv
  resolution (broadcast-reshape, fuses into consumers);
* a position matches iff its value equals its window's max;
* XLA routes gradient to the FIRST matching position in window scan
  order — replicated exactly with a per-window rank pattern and one
  more (cheap, forward-only) reduce_window-min over matched ranks;
* the gradient is then a pure ``where``: no scatter anywhere.

Semantics: identical values to ``-reduce_window(-z, min)`` (asserted
bitwise in tests); identical gradients including the first-match tie
rule (asserted on constructed ties, tests/test_fused_conv.py).
Window==stride only (always true in the towers); any rank >= 1.
"""

import functools

import jax
import jax.numpy as jnp

def _rank_dtype(pool):
    """int8 ranks when the window fits (towers: 4-9 positions): the
    matched-rank array at conv resolution is the backward's largest
    intermediate, and int8 quarters its traffic.  The sentinel equals
    the dtype max so the reduce_window-min takes the monoid fast path
    (init == identity); it must be a plain Python int — a jnp scalar
    would stage to a tracer under jit and the fast-path check boolifies
    ``init == identity``."""
    import math
    import numpy as np
    dt = np.int8 if math.prod(pool) < 127 else np.int32
    # numpy scalar: concrete under jit (the fast-path check boolifies
    # ``init == identity``) and dtype-matched to the operand
    return dt, dt(np.iinfo(dt).max)


def _same_lo(size, pool):
    out = -(-size // pool)
    total = max((out - 1) * pool + pool - size, 0)
    return total // 2, out


def _reduce_window(z, pool, init, op):
    window = (1,) + tuple(pool) + (1,)
    return jax.lax.reduce_window(z, init, op, window, window, "SAME")


def _upsample(y, pool, shape):
    """Pooled (N, *out, M) -> conv resolution (N, *padded, M) by window
    replication, then cropped to ``shape`` with the SAME low offsets."""
    for axis, p in enumerate(pool):
        y = jnp.repeat(y, p, axis=axis + 1)
    crop = [slice(None)]
    for axis, p in enumerate(pool):
        lo, _ = _same_lo(shape[axis + 1], p)
        crop.append(slice(lo, lo + shape[axis + 1]))
    return y[tuple(crop)]


def _window_rank(shape, pool, dtype):
    """Scan-order rank of each conv-resolution position within its pool
    window (row-major over the window dims, matching XLA's
    select_and_scatter first-match order)."""
    rank = jnp.zeros((1,) + shape[1:-1] + (1,), jnp.int32)
    stride = 1
    for axis in reversed(range(len(pool))):
        lo, _ = _same_lo(shape[axis + 1], pool[axis])
        idx = (jax.lax.broadcasted_iota(jnp.int32, rank.shape, axis + 1)
               + lo) % pool[axis]
        rank = rank + idx * stride
        stride *= pool[axis]
    return rank.astype(dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def maxpool_same(z, pool):
    """Channels-last max pool, window == stride, SAME (ceil) padding —
    value-identical to ``-reduce_window(-z, inf, min)`` with an
    elementwise backward.  ``pool`` is the spatial window per axis;
    ``z`` is (N, *spatial, M)."""
    z = jnp.asarray(z)
    return -_reduce_window(-z, pool, jnp.inf, jax.lax.min)


def _maxpool_fwd(z, pool):
    y = maxpool_same(z, pool)
    return y, (z, y)


def _maxpool_bwd(pool, res, g):
    z, y = res
    dt, big = _rank_dtype(pool)
    hit = z == _upsample(y, pool, z.shape)
    rank = jnp.broadcast_to(_window_rank(z.shape, pool, dt), z.shape)
    matched = jnp.where(hit, rank, jnp.asarray(big, dt))
    min_rank = _reduce_window(matched, pool, big, jax.lax.min)
    first = jnp.logical_and(hit, rank == _upsample(min_rank, pool, z.shape))
    return (jnp.where(first, _upsample(g, pool, z.shape),
                      jnp.zeros((), z.dtype)),)


maxpool_same.defvjp(_maxpool_fwd, _maxpool_bwd)
