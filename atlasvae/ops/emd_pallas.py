"""VMEM-resident staged Sinkhorn EMD (Pallas TPU kernel) — measured at
parity with the XLA kernel and therefore NOT the default.

Hypothesis: the XLA staged kernel (ops/emd.py::_sinkhorn_emd) re-reads
the (n, n) Gibbs kernel and its transpose from HBM every
half-iteration — at the production shape (8192 jets x 100
constituents, 100 iterations) naively ~66 GB of traffic for ~33 G VPU
FLOPs.  This kernel blocks jets into VMEM and runs ALL stages and
iterations per block with the cost matrix, the Gibbs kernel and its
transpose VMEM-resident: HBM touches the cost matrices exactly once
and writes one scalar per jet.

Measured head-to-head on v5e (batch 8192 x 100 const, 100 iters,
dispatch-latency-corrected medians): XLA staged 117.5 ms (69.7k
jets/s) vs this kernel 119.1 ms (68.8k jets/s), max rel delta 2.5e-6.
The hypothesis was wrong: XLA already tiles the per-jet iteration so
the Gibbs blocks stay cache/VMEM-resident, and both forms sit at the
same VPU/transcendental floor.  Kept as a numerically-validated opt-in
(``ATLASVAE_EMD=pallas``, the ops/fused_conv.py pattern) and as the
measured record of the attempt (docs/PERF.md "rejected").

Same algorithm and epsilon schedule as the XLA kernel (staged
exp-domain epsilon-scaling, duals absorbed at stage ends), asserted
equal to f32 tolerance in tests/test_emd.py.  Eval-only (no VJP).

Layout: jets on the leading block axis, constituent index i on
sublanes, j on lanes (n padded to 128); the u-update's row-sum is a
lane reduction over K, the v-update's over the precomputed transpose
KT — both full-width VPU ops, no relayouts anywhere (the lesson of the
rejected conv fusion, ops/fused_conv.py).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(n, m):
    return (n + m - 1) // m * m


def _kernel(dims, n_iters, eps_final, n_stages,
            pt_p_ref, pt_q_ref, cost_ref, cost_t_ref, out_ref):
    nbj, n, n_pad = dims
    pt_p = jnp.maximum(pt_p_ref[:], 0.0)
    pt_q = jnp.maximum(pt_q_ref[:], 0.0)
    sum_p = jnp.sum(pt_p, axis=1, keepdims=True)
    sum_q = jnp.sum(pt_q, axis=1, keepdims=True)
    a = pt_p / jnp.maximum(sum_p, 1e-30)          # (nbj, n_pad), 0 at pads
    b = pt_q / jnp.maximum(sum_q, 1e-30)
    cost = cost_ref[:]
    cost_t = cost_t_ref[:]
    # padded columns must never win mass: the cost rows/cols for padded
    # constituents were set huge by the wrapper, and a/b are zero there

    n_stages = max(1, min(n_stages, n_iters))
    base, rem = divmod(n_iters, n_stages)
    f = jnp.zeros((nbj, n_pad), jnp.float32)
    g = jnp.zeros((nbj, n_pad), jnp.float32)
    for s in range(n_stages):
        eps = eps_final * (1.0 + 9.0 * (1.0 - (s + 1.0) / n_stages))
        K = jnp.exp((f[:, :, None] + g[:, None, :] - cost) / eps)
        Kt = jnp.exp((g[:, :, None] + f[:, None, :] - cost_t) / eps)

        def body(_, carry, K=K, Kt=Kt):
            u, v = carry
            u = a / jnp.maximum(jnp.sum(K * v[:, None, :], axis=2), 1e-30)
            v = b / jnp.maximum(jnp.sum(Kt * u[:, None, :], axis=2), 1e-30)
            return u, v

        u, v = jax.lax.fori_loop(0, base + (1 if s < rem else 0), body,
                                 (jnp.ones_like(a), jnp.ones_like(b)))
        f = f + eps * jnp.log(jnp.maximum(u, 1e-30))
        g = g + eps * jnp.log(jnp.maximum(v, 1e-30))

    plan = jnp.exp((f[:, :, None] + g[:, None, :] - cost) / eps_final)
    # f32 masks: Mosaic cannot insert a minor dim on i1 (bool) vectors
    mask_p = (pt_p > 0.0).astype(jnp.float32)
    mask_q = (pt_q > 0.0).astype(jnp.float32)
    plan = plan * mask_p[:, :, None] * mask_q[:, None, :]
    # Altschuler rounding onto the transport polytope — identical
    # epilogue to the XLA kernel (ops/emd.py::_sinkhorn_emd, see the
    # rationale there); padded slots carry zero marginals so their
    # deficits are exactly zero and the rank-one correction never
    # touches the huge pad costs
    row = jnp.sum(plan, axis=2)                               # (nbj, n_pad)
    plan = plan * jnp.minimum(a / jnp.maximum(row, 1e-30), 1.0)[:, :, None]
    col = jnp.sum(plan, axis=1)
    plan = plan * jnp.minimum(b / jnp.maximum(col, 1e-30), 1.0)[:, None, :]
    err_a = a - jnp.sum(plan, axis=2)
    err_b = b - jnp.sum(plan, axis=1)
    denom = jnp.maximum(jnp.sum(jnp.abs(err_a), axis=1, keepdims=True),
                        1e-30)                                # (nbj, 1)
    plan = plan + (err_a / denom)[:, :, None] * err_b[:, None, :]
    # staged reductions keeping rank >= 2 throughout (a rank-1 vector
    # crashes Mosaic's layout assignment: layout.h arr.size() check)
    transport = jnp.sum(jnp.sum(plan * cost, axis=2), axis=1,
                        keepdims=True)
    emd = (transport * jnp.minimum(sum_p, sum_q)
           + jnp.abs(sum_p - sum_q))                       # (nbj, 1)
    out_ref[:] = emd


# cost at padded constituent slots: large enough that exp((f+g-C)/eps)
# underflows to an exact 0 for any reachable dual, small enough that
# (f+g-C)/eps stays finite in f32
_PAD_COST = 1.0e4


@functools.partial(jax.jit, static_argnames=("n_iters", "eps_final",
                                             "n_stages", "interpret"))
def _emd_batch_pallas(pt_p, pt_q, cost, n_iters, eps_final, n_stages,
                      interpret):
    B, n = pt_p.shape
    n_pad = _round_up(n, 128)
    # VMEM per block: cost + cost_t + K + Kt at (nbj, n_pad, n_pad) f32
    nbj = max(1, min(B, (6 << 20) // (4 * 4 * n_pad * n_pad)))
    Bp = _round_up(B, nbj)
    pt_p = jnp.pad(pt_p, ((0, Bp - B), (0, n_pad - n)))
    pt_q = jnp.pad(pt_q, ((0, Bp - B), (0, n_pad - n)))
    cost = jnp.pad(cost, ((0, Bp - B), (0, n_pad - n), (0, n_pad - n)),
                   constant_values=_PAD_COST)
    cost_t = jnp.swapaxes(cost, 1, 2)
    dims = (nbj, n, n_pad)
    out = pl.pallas_call(
        functools.partial(_kernel, dims, n_iters, eps_final, n_stages),
        out_shape=jax.ShapeDtypeStruct((Bp, 1), jnp.float32),
        grid=(Bp // nbj,),
        in_specs=[
            pl.BlockSpec((nbj, n_pad), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nbj, n_pad), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nbj, n_pad, n_pad), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nbj, n_pad, n_pad), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((nbj, 1), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(pt_p, pt_q, cost, cost_t)
    return out[:B, 0]


def emd_batch_pallas(p, q, r_param, n_iters, eps_final, n_stages=10,
                     interpret=None):
    """Batched jet EMD, VMEM-resident Sinkhorn.  ``p``/``q`` are
    (B, n_const, 3) constituent clouds in (pt, y, phi); same schedule
    and result (to f32 tolerance) as ``_emd_batch``'s XLA kernel."""
    from .emd import _pairwise_cost
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    pt_p = jnp.maximum(p[..., 0], 0.0)
    pt_q = jnp.maximum(q[..., 0], 0.0)
    cost = jax.vmap(lambda x, y: _pairwise_cost(x, y, r_param))(p, q)
    return _emd_batch_pallas(pt_p, pt_q, cost, int(n_iters),
                             float(eps_final), int(n_stages), interpret)
