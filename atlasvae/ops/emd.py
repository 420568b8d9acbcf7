"""Energy mover's distance and per-jet KS statistics on device.

The reference computes per-jet EMD with the ``energyflow`` optimal
transport library and per-jet Kolmogorov-Smirnov statistics with scipy,
both fanned out over OS processes (ref OE-VAE/utils.py:311-343 JSD/KSD/
EMD helpers).  Here:

* ``emd_pairs``: entropic-regularized optimal transport (Sinkhorn with a
  small, annealed epsilon) between the (pt, y, phi) constituent clouds
  of paired jets, vmapped over the batch — the standard balanced-OT
  formulation of the jet EMD (arXiv:1902.02346) with the total-pt
  difference penalty: EMD = <pi, theta_R> + |sum pt_P - sum pt_Q|,
  theta_R = DeltaR / R,
* ``ks_pairs``: exact two-sample KS statistic between paired feature
  rows (max ECDF gap over the merged support), vmapped.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

_CHUNK = 50_000


def _pairwise_cost(p, q, r_param):
    """DeltaR cost matrix between constituent clouds (n, 3) x (m, 3) in
    (pt, y, phi) coordinates, phi wrapped to (-pi, pi]."""
    dy = p[:, None, 1] - q[None, :, 1]
    dphi = p[:, None, 2] - q[None, :, 2]
    dphi = jnp.mod(dphi + jnp.pi, 2 * jnp.pi) - jnp.pi
    return jnp.sqrt(dy ** 2 + dphi ** 2) / r_param


def _sinkhorn_emd(p, q, r_param, n_iters, eps_final):
    pt_p = jnp.maximum(p[:, 0], 0.0)
    pt_q = jnp.maximum(q[:, 0], 0.0)
    sum_p = jnp.sum(pt_p)
    sum_q = jnp.sum(pt_q)
    # balanced problem on normalized masses + extra-mass penalty
    a = pt_p / jnp.maximum(sum_p, 1e-30)
    b = pt_q / jnp.maximum(sum_q, 1e-30)
    cost = _pairwise_cost(p, q, r_param)
    mask_a = (pt_p > 0).astype(jnp.float32)
    mask_b = (pt_q > 0).astype(jnp.float32)
    log_a = jnp.where(mask_a > 0, jnp.log(jnp.maximum(a, 1e-30)), -1e9)
    log_b = jnp.where(mask_b > 0, jnp.log(jnp.maximum(b, 1e-30)), -1e9)

    def body(i, carry):
        f, g = carry
        # epsilon annealing: start loose, end tight
        eps = eps_final * (1.0 + 9.0 * (1.0 - i / n_iters))
        mat = (-cost + f[:, None] + g[None, :]) / eps
        f = f + eps * (log_a - jax.nn.logsumexp(mat, axis=1))
        mat = (-cost + f[:, None] + g[None, :]) / eps
        g = g + eps * (log_b - jax.nn.logsumexp(mat, axis=0))
        return f, g

    f0 = jnp.zeros_like(a)
    g0 = jnp.zeros_like(b)
    f, g = jax.lax.fori_loop(0, n_iters, body, (f0, g0))
    plan = jnp.exp((-cost + f[:, None] + g[None, :]) / eps_final)
    plan = plan * mask_a[:, None] * mask_b[None, :]
    plan = plan / jnp.maximum(jnp.sum(plan), 1e-30)
    transport = jnp.sum(plan * cost) * jnp.minimum(sum_p, sum_q)
    return transport + jnp.abs(sum_p - sum_q)


@functools.partial(jax.jit, static_argnames=("r_param", "n_iters", "eps_final"))
def _emd_batch(p, q, r_param, n_iters, eps_final):
    return jax.vmap(lambda a, b: _sinkhorn_emd(a, b, r_param, n_iters, eps_final))(p, q)


def emd_pairs(jets_p, jets_q, r_param=1.0, n_iters=100, eps_final=0.01):
    """EMD between paired jets; inputs (n_jets, n_const, 3) in
    (pt, y, phi) from ``atlasvae.data.jets_3v``."""
    jets_p = np.asarray(jets_p, np.float32)
    jets_q = np.asarray(jets_q, np.float32)
    out = []
    chunk = max(1, _CHUNK // max(jets_p.shape[1] ** 2 // 64, 1))
    for i in range(0, len(jets_p), chunk):
        out.append(np.asarray(_emd_batch(jnp.asarray(jets_p[i:i + chunk]),
                                         jnp.asarray(jets_q[i:i + chunk]),
                                         r_param, n_iters, eps_final)))
    return np.concatenate(out)


@jax.jit
def _ks_batch(p, q):
    def one(pi, qi):
        grid = jnp.concatenate([pi, qi])
        cdf_p = jnp.searchsorted(jnp.sort(pi), grid, side="right") / pi.shape[0]
        cdf_q = jnp.searchsorted(jnp.sort(qi), grid, side="right") / qi.shape[0]
        return jnp.max(jnp.abs(cdf_p - cdf_q))

    return jax.vmap(one)(p, q)


def ks_pairs(p, q):
    """Two-sample KS statistic per paired row (exact; matches
    scipy.stats.ks_2samp's statistic, ref OE-VAE/utils.py:319-324)."""
    p = np.asarray(p, np.float32)
    q = np.asarray(q, np.float32)
    out = []
    for i in range(0, len(p), _CHUNK):
        out.append(np.asarray(_ks_batch(jnp.asarray(p[i:i + _CHUNK]),
                                        jnp.asarray(q[i:i + _CHUNK]))))
    return np.concatenate(out)
