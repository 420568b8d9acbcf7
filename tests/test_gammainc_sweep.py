"""Adversarial accuracy sweep of the log-space incomplete-gamma kernels
(VERDICT r1 weak #6): grid over a in [1, 1e6] x (x/a) in [0.01, 100],
both tails, against mpmath (dps=40) with the long-double C++ oracle as
cross-check and fallback truth.

Measured bound (recorded in docs/PERF.md): max |dlog p| / max(|log p|, 1)
= 2.9e-6 (lower) / 5.3e-6 (upper) over the full grid — the statistics
can cite <1e-5.  The reference's own precision story tops out at
sigma = 151.7 (mpmath dps=5000 calibration table,
ref OE-AAE/BumpHunter/bumphunter_1dim.py:17-24); log-space carries
sigma unbounded at this accuracy.
"""

import itertools

import numpy as np
import pytest

A_GRID = [1, 2, 3, 5, 10, 30, 100, 200, 399, 400, 401, 500,
          1e3, 3e3, 1e4, 1e5, 1e6]
RATIO_GRID = [0.01, 0.05, 0.1, 0.3, 0.5, 0.8, 0.9, 0.99, 1.0, 1.01,
              1.1, 1.5, 2, 5, 10, 100]


@pytest.fixture(scope="module")
def grids():
    mpmath = pytest.importorskip("mpmath")
    mpmath.mp.dps = 40
    from atlasvae.stats.native import oracle_log_gammainc

    aa, xx = [], []
    for a, r in itertools.product(A_GRID, RATIO_GRID):
        aa.append(a)
        xx.append(a * r)
    aa = np.array(aa, np.float64)
    xx = np.array(xx, np.float64)

    def mp_one(a, x, lower):
        try:
            if lower:
                v = mpmath.gammainc(a, 0, x, regularized=True)
            else:
                v = mpmath.gammainc(a, x, mpmath.inf, regularized=True)
            return -1e30 if v <= 0 else float(mpmath.log(v))
        except Exception:  # hypergeometric non-convergence at extremes
            return None

    def mp_log(a, x, lower):
        v = mp_one(a, x, lower)
        if v is not None:
            return v
        comp = mp_one(a, x, not lower)
        if comp is not None and comp < -1e-18:
            return float(mpmath.log(-mpmath.expm1(mpmath.mpf(comp))))
        return None

    mp_lo = np.array([v if (v := mp_log(a, x, True)) is not None else np.nan
                      for a, x in zip(aa, xx)])
    mp_up = np.array([v if (v := mp_log(a, x, False)) is not None else np.nan
                      for a, x in zip(aa, xx)])
    try:
        orc_lo = oracle_log_gammainc(aa, xx, lower=True)
        orc_up = oracle_log_gammainc(aa, xx, lower=False)
    except RuntimeError:
        orc_lo = orc_up = None
    return aa, xx, mp_lo, mp_up, orc_lo, orc_up


def _rel_log_err(ours, true):
    return np.abs(ours - true) / np.maximum(np.abs(true), 1.0)


def test_log_gammainc_sweep_vs_mpmath(grids):
    import jax
    from atlasvae.ops.gammainc import log_gammainc_lower, log_gammainc_upper

    aa, xx, mp_lo, mp_up, orc_lo, orc_up = grids
    true_lo = np.where(np.isnan(mp_lo), orc_lo if orc_lo is not None else mp_lo,
                       mp_lo)
    true_up = np.where(np.isnan(mp_up), orc_up if orc_up is not None else mp_up,
                       mp_up)
    ours_lo = np.asarray(jax.jit(log_gammainc_lower)(aa, xx), np.float64)
    ours_up = np.asarray(jax.jit(log_gammainc_upper)(aa, xx), np.float64)
    ok_lo, ok_up = ~np.isnan(true_lo), ~np.isnan(true_up)
    assert ok_lo.sum() == len(aa) and ok_up.sum() == len(aa)
    # measured 2.9e-6 / 5.3e-6; assert with headroom but well under the
    # 1e-4 envelope the module docstring promises
    assert _rel_log_err(ours_lo[ok_lo], true_lo[ok_lo]).max() < 2e-5
    assert _rel_log_err(ours_up[ok_up], true_up[ok_up]).max() < 2e-5


def test_oracle_agrees_with_mpmath(grids):
    """The long-double oracle itself is verified against mpmath, so the
    scan tests that use it as golden truth rest on checked ground."""
    aa, xx, mp_lo, mp_up, orc_lo, orc_up = grids
    if orc_lo is None:
        pytest.skip("native oracle unavailable")
    ok = ~np.isnan(mp_lo)
    assert _rel_log_err(orc_lo[ok], mp_lo[ok]).max() < 1e-10
    ok = ~np.isnan(mp_up)
    assert _rel_log_err(orc_up[ok], mp_up[ok]).max() < 1e-10
