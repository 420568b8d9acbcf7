"""Golden tests: the vectorized JAX BumpHunter scan vs the independent
long-double C++ oracle (atlasvae/_native/bumphunter_oracle.cpp)."""

import numpy as np
import jax.numpy as jnp
import pytest

from atlasvae.stats import scan_histograms
from atlasvae.stats.native import load_oracle, oracle_scan

pytestmark = pytest.mark.skipif(load_oracle() is None,
                                reason="no C++ toolchain")


def test_oracle_matches_jax_scan(rng):
    nbins = 60
    ref = rng.uniform(30, 300, nbins).astype(np.float64)
    hists = rng.poisson(ref, (20, nbins)).astype(np.float64)
    hists[3, 25:28] += 200  # strong bump
    hists[7, 40:42] += 50   # weak bump
    widths = (2, 3, 4, 5, 6)
    steps = (1, 1, 1, 1, 1)
    jl, jloc, jw, _, _ = map(np.asarray, scan_histograms(
        jnp.asarray(hists, jnp.float32), jnp.asarray(ref, jnp.float32),
        widths, steps, 0, nbins))
    ol, oloc, ow = oracle_scan(hists, ref, widths)
    # window choice identical; log p close (f32 program vs long double)
    np.testing.assert_array_equal(jloc, oloc)
    np.testing.assert_array_equal(jw, ow)
    np.testing.assert_allclose(jl, ol, rtol=2e-3, atol=2e-3)


def test_oracle_matches_at_production_statistics(rng):
    """High-statistics histograms (total >> float32's 2^24 integer
    range, the reference's 1e7-jet production scale): the scan must
    still agree with the long-double oracle.  The original cumsum-
    difference formulation catastrophically cancelled here and returned
    the wrong minimum window."""
    nbins = 160
    ref = np.maximum(2.5e7 * np.exp(-np.arange(nbins) / 20.0) / 20.0, 50.0)
    hists = rng.poisson(np.tile(ref, (6, 1))).astype(np.float64)
    hists[2, 60:63] *= 1.02  # mild excess at high statistics
    widths = (2, 3, 4, 5, 6)
    jl, jloc, jw, _, _ = map(np.asarray, scan_histograms(
        jnp.asarray(hists, jnp.float32), jnp.asarray(ref, jnp.float32),
        widths, (1, 1, 1, 1, 1), 0, nbins))
    ol, oloc, ow = oracle_scan(hists, ref, widths)
    np.testing.assert_array_equal(jloc, oloc)
    np.testing.assert_array_equal(jw, ow)
    np.testing.assert_allclose(jl, ol, rtol=5e-3, atol=5e-2)


def test_oracle_deficit_mode(rng):
    nbins = 30
    ref = np.full(nbins, 500.0)
    hist = ref.copy()
    hist[10:13] -= 300
    widths = (2, 3, 4)
    ol, oloc, ow = oracle_scan(hist, ref, widths, mode="deficit")
    assert 8 <= oloc[0] <= 12
    jl, jloc, jw, _, _ = map(np.asarray, scan_histograms(
        jnp.asarray(hist[None], jnp.float32), jnp.asarray(ref, jnp.float32),
        widths, (1, 1, 1), 0, nbins, mode="deficit"))
    np.testing.assert_array_equal(jloc, oloc)
    np.testing.assert_allclose(jl, ol, rtol=2e-3, atol=2e-3)


def test_oracle_extreme_tail(rng):
    """long double carries log p far past float64 p-underflow."""
    nbins = 20
    ref = np.full(nbins, 50.0)
    hist = ref.copy()
    hist[8:10] += 20000
    ol, _, _ = oracle_scan(hist, ref, (2, 3))
    assert ol[0] < -5000 and np.isfinite(ol[0])
    jl, _, _, _, _ = map(np.asarray, scan_histograms(
        jnp.asarray(hist[None], jnp.float32), jnp.asarray(ref, jnp.float32),
        (2, 3), (1, 1), 0, nbins))
    np.testing.assert_allclose(jl[0], ol[0], rtol=5e-3)
