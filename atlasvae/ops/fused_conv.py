"""Fused input-layer Conv2D + bias + max-pool + ReLU Pallas kernel.

**Measured and rejected as a default — opt-in via ATLASVAE_CONV1=fused**
(the round-3 pattern of ops/fused_vae.py: numerically validated, kept
with its measurement).  On v5e at the tower's anatomy shape (batch 500,
64x64x1 -> 100 maps): fused fwd 11.35 ms vs XLA chain 1.27 ms, fwd+bwd
30.75 vs 5.75 ms (f32) — the in-kernel im2col pays a vector relayout
per tap (the (nb, 1, 1, Wc) lane-major slab must pivot onto the patch
matrix's sublane axis), which swamps the HBM traffic it saves; the
bf16 forward does not compile at all (Mosaic: "insertion of minor dim
that is not a no-op only supported for 32-bit types").  The measured
default win on this block is ops/pooling.py's elementwise-backward
pool instead (the backward's select_and_scatter was the real cost);
see benchmarks/anatomy_conv.py and docs/PERF.md.

The original motivation: the jet-ID CNN tower (ref
jet-ID/models.py:30-36: Conv2D -> MaxPool2D -> LeakyReLU(0)) runs
within ~1.7x of its padded-FLOP floor, the gap being the HBM
round-trips of the first conv's pre-pool activation block —
(batch, 62, 62, 100) at the reference's 64x64/100-map defaults, 384 MB
in bf16, written by the conv, re-read by the pool, re-written by the
pool's backward and re-read by the weight-gradient conv
(docs/PERF.md "jet-ID CNN step anatomy", the fusion consciously
deferred in round 3).  This kernel keeps that block in VMEM:

* forward: one pass computes conv rows tile-by-tile (in-VMEM im2col +
  one MXU dot per conv row), max-pools them on the fly and writes ONLY
  the pooled+ReLU'd output — the (Hc, Wc, M) intermediate never exists
  in HBM;
* backward (custom VJP): recomputes the conv rows (the first conv is
  ~4% of tower FLOPs — recompute is ~free next to the saved traffic),
  routes the incoming gradient through the ReLU mask and the pool
  argmax (first-match tie order, matching XLA's select_and_scatter),
  and accumulates dW/db with MXU contractions over the pixel axis.
  **The input gradient is NOT computed** (returned as zeros): this
  kernel is for the *input* conv layer only, where x is data.

Semantics match the unfused chain exactly (up to f32 reassociation and
fp-tie routing, tests/test_fused_conv.py): VALID conv, stride 1;
window==stride max pool with SAME (ceil) padding — including XLA's
low-side padding (pad_lo = total_pad // 2), which shifts the window
grouping when pool >= 3 and the conv output is not a multiple of it;
bias is applied after pooling (max(z + b) == max(z) + b: fp addition of
a per-channel constant is monotone, so the pooled value is identical).

Layout notes (why this maps onto the TPU):

* x is carried as (N, H, C, W): W rides the 128-lane axis, so each
  im2col tap is a lane-aligned slice (the dx shift is a cheap lane
  rotation) — the channels-last (N, H, W, C) layout would put C=1 on
  the lane axis and pad every block 128-wide;
* taps are stacked on a fresh minor axis (Kp = kh*kw*C rounded to 8,
  zero-filled), giving the (pixels, Kp) x (Kp, Mp) MXU dot the same
  padded-K cost XLA's own im2col pays for a c_in=1 conv;
* pooling runs on the f32 dot output in VMEM while the maps dimension
  sits on the lane axis, so the pool/ReLU are full-width VPU ops.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -3.0e38  # max-pool identity; finite so padded lanes never NaN


def _round_up(n, m):
    return (n + m - 1) // m * m


def _pool_pad_lo(size, pool):
    """XLA SAME low-side padding for a window==stride reduce_window."""
    out = -(-size // pool)
    total = max((out - 1) * pool + pool - size, 0)
    return total // 2, out


def _conv_row(x_ref, y, dims):
    """In-VMEM im2col for one conv row: (nb*Wcp, Kp) patch block.

    ``y`` may be out of range (SAME-pool edge rows); the dynamic slice
    clamps and the caller masks the row out of the pool."""
    nb, kh, kw, C, Wcp, Kp = dims
    yc = jnp.clip(y, 0, x_ref.shape[1] - kh)
    taps = []
    for dy in range(kh):
        for dx in range(kw):
            for c in range(C):
                taps.append(x_ref[:, pl.ds(yc + dy, 1), c,
                                  pl.ds(dx, Wcp)].reshape(nb, Wcp))
    for _ in range(Kp - len(taps)):
        taps.append(jnp.zeros_like(taps[0]))
    return jnp.stack(taps, axis=-1).reshape(nb * Wcp, Kp)


def _pool_x(z, dims, Wc, plw):
    """Mask invalid conv columns, apply the low-side SAME shift, and
    max-pool the x axis: (nb*Wcp, Mp) f32 -> (nb, Wo, Mp)."""
    nb, pw, Wcp, Wo, Mp = dims
    z = z.reshape(nb, Wcp, Mp)
    col = jax.lax.broadcasted_iota(jnp.int32, (nb, Wcp, Mp), 1)
    z = jnp.where(col < Wc, z, _NEG)
    if plw:
        z = jnp.concatenate(
            [jnp.full((nb, plw, Mp), _NEG, z.dtype), z[:, :Wcp - plw]], axis=1)
    return jnp.max(z.reshape(nb, Wo, pw, Mp), axis=2)


def _fwd_kernel(dims, x_ref, w_ref, b_ref, out_ref):
    (nb, rb, kh, kw, C, ph, pw, Hc, Wc, Wcp, Wo, Kp, Mp, plh, plw) = dims
    r = pl.program_id(1)
    row_dims = (nb, kh, kw, C, Wcp, Kp)
    pool_dims = (nb, pw, Wcp, Wo, Mp)
    for j in range(rb):
        acc = jnp.full((nb, Wo, Mp), _NEG, jnp.float32)
        for t in range(ph):
            y = (r * rb + j) * ph + t - plh
            z = jnp.dot(_conv_row(x_ref, y, row_dims), w_ref[:],
                        preferred_element_type=jnp.float32)
            pooled = _pool_x(z, pool_dims, Wc, plw)
            valid = jnp.logical_and(y >= 0, y < Hc)
            acc = jnp.maximum(acc, jnp.where(valid, pooled, _NEG))
        out = jnp.maximum(acc + b_ref[:].reshape(1, 1, Mp), 0.0)
        out_ref[:, j] = out.astype(out_ref.dtype)


def _bwd_kernel(dims, x_ref, w_ref, b_ref, g_ref, dw_ref, db_ref):
    (nb, rb, kh, kw, C, ph, pw, Hc, Wc, Wcp, Wo, Kp, Mp, plh, plw) = dims
    i, r = pl.program_id(0), pl.program_id(1)
    row_dims = (nb, kh, kw, C, Wcp, Kp)
    pool_dims = (nb, pw, Wcp, Wo, Mp)

    @pl.when(jnp.logical_and(i == 0, r == 0))
    def _():
        dw_ref[:] = jnp.zeros_like(dw_ref)
        db_ref[:] = jnp.zeros_like(db_ref)

    for j in range(rb):
        patches, pooled_t = [], []
        for t in range(ph):
            y = (r * rb + j) * ph + t - plh
            p = _conv_row(x_ref, y, row_dims)
            z = jnp.dot(p, w_ref[:], preferred_element_type=jnp.float32)
            # apply the column masks/shift BEFORE tie routing so the
            # per-phase values compared against zmax are the pool's own
            z = _shifted(z, pool_dims, Wc, plw)
            valid = jnp.logical_and(y >= 0, y < Hc)
            patches.append(p)
            pooled_t.append(jnp.where(valid, z, _NEG))
        zmax = pooled_t[0].max(axis=2)
        for t in range(1, ph):
            zmax = jnp.maximum(zmax, pooled_t[t].max(axis=2))
        relu_mask = (zmax + b_ref[:].reshape(1, 1, Mp)) > 0.0
        gr = jnp.where(relu_mask, g_ref[:, j].astype(jnp.float32), 0.0)
        db_ref[0:1] += jnp.sum(gr, axis=(0, 1)).reshape(1, Mp)
        taken = jnp.zeros_like(zmax, jnp.bool_)
        for t in range(ph):
            gz = []
            for px in range(pw):
                cand = pooled_t[t][:, :, px]
                hit = jnp.logical_and(cand == zmax,
                                      jnp.logical_not(taken))
                gz.append(jnp.where(hit, gr, 0.0))
                taken = jnp.logical_or(taken, hit)
            gz = jnp.stack(gz, axis=2)                  # (nb, Wo, pw, Mp)
            gz = _unshift(gz, pool_dims, plw)           # (nb*Wcp, Mp)
            dw_ref[:] += jax.lax.dot_general(
                patches[t].astype(jnp.float32), gz,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)


def _shifted(z, dims, Wc, plw):
    """(nb*Wcp, Mp) conv row -> (nb, Wo, pw, Mp) pool-window phases,
    with invalid columns at _NEG and the SAME low-shift applied."""
    nb, pw, Wcp, Wo, Mp = dims
    z = z.reshape(nb, Wcp, Mp)
    col = jax.lax.broadcasted_iota(jnp.int32, (nb, Wcp, Mp), 1)
    z = jnp.where(col < Wc, z, _NEG)
    if plw:
        z = jnp.concatenate(
            [jnp.full((nb, plw, Mp), _NEG, z.dtype), z[:, :Wcp - plw]], axis=1)
    return z.reshape(nb, Wo, pw, Mp)


def _unshift(gz, dims, plw):
    """Inverse of ``_shifted``'s layout: phase grads back to conv-column
    order (nb*Wcp, Mp); the low-pad columns drop off, the tail refills
    with zeros (those conv columns were masked invalid)."""
    nb, pw, Wcp, Wo, Mp = dims
    gz = gz.reshape(nb, Wcp, Mp)
    if plw:
        gz = jnp.concatenate(
            [gz[:, plw:], jnp.zeros((nb, plw, Mp), gz.dtype)], axis=1)
    return gz.reshape(nb * Wcp, Mp)


def _plan(x_shape, w_shape, pool, nb=8, rb=4):
    N, H, W, C = x_shape
    kh, kw, C_w, M = w_shape
    ph, pw = pool
    Hc, Wc = H - kh + 1, W - kw + 1
    plh, Ho = _pool_pad_lo(Hc, ph)
    plw, Wo = _pool_pad_lo(Wc, pw)
    Wcp = Wo * pw
    Kp = _round_up(kh * kw * C, 8)
    Mp = _round_up(M, 128)
    nb = min(nb, N)
    rb = min(rb, Ho)
    dims = (nb, rb, kh, kw, C, ph, pw, Hc, Wc, Wcp, Wo, Kp, Mp, plh, plw)
    Np, Hop = _round_up(N, nb), _round_up(Ho, rb)
    # x rows/cols a tap slice may touch (clamped rows stay in range)
    Hx = max(H, Hc + kh - 1)
    Wx = max(W, Wcp + kw - 1)
    return dims, (N, Ho, Wo, M), (Np, Hop, Hx, Wx)


def _pack(x, w, b, plan):
    dims, _, (Np, Hop, Hx, Wx) = plan
    Kp, Mp = dims[11], dims[12]
    kh, kw, C = dims[2], dims[3], dims[4]
    xt = jnp.transpose(x, (0, 1, 3, 2))              # (N, H, C, W)
    xt = jnp.pad(xt, ((0, Np - x.shape[0]), (0, Hx - x.shape[1]),
                      (0, 0), (0, Wx - x.shape[2])))
    wp = jnp.pad(w.reshape(kh * kw * C, -1),
                 ((0, Kp - kh * kw * C), (0, Mp - w.shape[-1])))
    bp = jnp.pad(b.reshape(1, -1), ((0, 0), (0, Mp - b.shape[0])))
    return xt, wp, bp


def _specs(plan):
    dims, _, (Np, Hop, Hx, Wx) = plan
    nb, rb = dims[0], dims[1]
    C, Wo, Kp, Mp = dims[4], dims[10], dims[11], dims[12]
    grid = (Np // nb, Hop // rb)
    x_spec = pl.BlockSpec((nb, Hx, C, Wx), lambda i, r: (i, 0, 0, 0),
                          memory_space=pltpu.VMEM)
    w_spec = pl.BlockSpec((Kp, Mp), lambda i, r: (0, 0),
                          memory_space=pltpu.VMEM)
    b_spec = pl.BlockSpec((1, Mp), lambda i, r: (0, 0),
                          memory_space=pltpu.VMEM)
    o_spec = pl.BlockSpec((nb, rb, Wo, Mp), lambda i, r: (i, r, 0, 0),
                          memory_space=pltpu.VMEM)
    return grid, x_spec, w_spec, b_spec, o_spec


@functools.partial(jax.jit, static_argnames=("pool", "interpret"))
def _fwd(x, w, b, pool, interpret):
    plan = _plan(x.shape, w.shape, pool)
    dims, (N, Ho, Wo, M), (Np, Hop, _, _) = plan
    nb, rb, Mp = dims[0], dims[1], dims[12]
    xt, wp, bp = _pack(x, w, b, plan)
    grid, x_spec, w_spec, b_spec, o_spec = _specs(plan)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, dims),
        out_shape=jax.ShapeDtypeStruct((Np, Hop, Wo, Mp), x.dtype),
        grid=grid,
        in_specs=[x_spec, w_spec, b_spec],
        out_specs=o_spec,
        interpret=interpret,
    )(xt, wp, bp)
    return out[:N, :Ho, :, :M]


@functools.partial(jax.jit, static_argnames=("pool", "interpret"))
def _bwd(x, w, b, g, pool, interpret):
    plan = _plan(x.shape, w.shape, pool)
    dims, (N, Ho, Wo, M), (Np, Hop, _, _) = plan
    Kp, Mp = dims[11], dims[12]
    kh, kw, C = dims[2], dims[3], dims[4]
    xt, wp, bp = _pack(x, w, b, plan)
    gp = jnp.pad(g.astype(jnp.float32),
                 ((0, Np - N), (0, Hop - Ho), (0, 0), (0, Mp - M)))
    grid, x_spec, w_spec, b_spec, o_spec = _specs(plan)
    dw, db = pl.pallas_call(
        functools.partial(_bwd_kernel, dims),
        out_shape=(jax.ShapeDtypeStruct((Kp, Mp), jnp.float32),
                   jax.ShapeDtypeStruct((8, Mp), jnp.float32)),
        grid=grid,
        in_specs=[x_spec, w_spec, b_spec, o_spec],
        out_specs=(pl.BlockSpec((Kp, Mp), lambda i, r: (0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((8, Mp), lambda i, r: (0, 0),
                                memory_space=pltpu.VMEM)),
        interpret=interpret,
    )(xt, wp, bp, gp)
    dw = dw[:kh * kw * C, :M].reshape(kh, kw, C, M).astype(w.dtype)
    db = db[0, :M].astype(b.dtype)
    return dw, db


def _interpret():
    return jax.default_backend() != "tpu"


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def fused_conv1_pool_relu(x, w, b, pool=(2, 2)):
    """relu(maxpool(conv2d(x, w) + b)) in one VMEM-resident pass.

    x (N, H, W, C) channels-last, w (kh, kw, C, M), b (M,); VALID conv
    stride 1, window==stride SAME max pool.  **Input-layer only**: the
    VJP returns zero for dx (x is data in the jet-ID towers).  Falls
    back to the Pallas interpreter off-TPU so tests run on CPU.
    """
    return _fwd(x, w, b, tuple(pool), _interpret())


def _fused_fwd(x, w, b, pool):
    return _fwd(x, w, b, tuple(pool), _interpret()), (x, w, b)


def _fused_bwd(pool, res, g):
    x, w, b = res
    dw, db = _bwd(x, w, b, g, tuple(pool), _interpret())
    return jnp.zeros_like(x), dw, db


fused_conv1_pool_relu.defvjp(_fused_fwd, _fused_bwd)


def supported(x_shape, w_shape, pool):
    """Shapes this kernel handles: rank-2, pool==stride (always true in
    the tower), modest im2col K and map count."""
    if len(w_shape) != 4 or len(pool) != 2:
        return False
    kh, kw, C, M = w_shape
    return (kh * kw * C <= 512 and M <= 1024
            and x_shape[1] >= kh and x_shape[2] >= kw)
