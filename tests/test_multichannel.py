"""Multi-channel BumpHunter tests (ref _scan_hist_multi semantics)."""

import numpy as np

from atlasvae.stats import BumpHunter1D


def _hists(rng, bump_at=None, nbins=40, scale=200.0):
    edges = np.linspace(0, 400, nbins + 1)
    ref = np.full(nbins, scale)
    data = rng.poisson(ref).astype(float)
    if bump_at is not None:
        lo = np.searchsorted(edges, bump_at) - 1
        data[lo:lo + 3] += 6 * np.sqrt(scale)
    return data, ref, edges


def test_multichannel_overlapping_bumps(rng):
    d1, r1, e1 = _hists(rng, bump_at=250)
    d2, r2, e2 = _hists(rng, bump_at=255)
    hunter = BumpHunter1D(width_min=2, width_max=5, npe=200,
                          bins=[e1, e2], seed=0)
    window = hunter.bump_scan([d1, d2], [r1, r2], is_hist=True,
                              multi_chan=True, verbose=False)
    assert window is not None
    assert window[0] <= 255 <= window[1] or window[0] <= 250 <= window[1]
    # combined t = -ln(prod p): stronger than either channel alone
    assert hunter.t_ar[0] > 0
    assert hunter.significance > 2


def test_multichannel_disjoint_bumps_rejected(rng):
    d1, r1, e1 = _hists(rng, bump_at=100)
    d2, r2, e2 = _hists(rng, bump_at=350)
    hunter = BumpHunter1D(width_min=2, width_max=5, npe=100,
                          bins=[e1, e2], seed=0)
    window = hunter.bump_scan([d1, d2], [r1, r2], is_hist=True,
                              multi_chan=True, verbose=False)
    # no physical overlap -> combined p = 1 (ref :649-656)
    assert window is None
    assert hunter.t_ar[0] == 0


def test_multichannel_background_only(rng):
    d1, r1, e1 = _hists(rng)
    d2, r2, e2 = _hists(rng)
    hunter = BumpHunter1D(width_min=2, width_max=5, npe=200,
                          bins=[e1, e2], seed=1)
    hunter.bump_scan([rng.poisson(r1).astype(float),
                      rng.poisson(r2).astype(float)], [r1, r2],
                     is_hist=True, multi_chan=True, verbose=False)
    assert hunter.global_Pval > 0.01
