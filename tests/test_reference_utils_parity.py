"""Golden parity against the REFERENCE's own utility functions.

The reference's OE-VAE/utils.py and its vendored BumpHunter import
cleanly here (with an energyflow stub for the unused EMD fan-out), so
these tests execute the *actual reference functions* from the read-only
checkout on identical inputs and require our implementations to agree.
This supersedes hand-rolled re-derivations as the parity oracle.
"""

import os
import sys
import types

import numpy as np
import pytest

os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")


@pytest.fixture(scope="module")
def ref():
    if not os.path.isdir("/root/reference/OE-VAE"):
        pytest.skip("reference checkout not available")
    if "energyflow" not in sys.modules:
        ef = types.ModuleType("energyflow")
        ef.emd = types.SimpleNamespace(emd_pot=None)
        sys.modules["energyflow"] = ef
    sys.path.insert(0, "/root/reference/OE-VAE")
    try:
        import utils as ref_utils
        from BumpHunter.bumphunter_1dim import BumpHunter1D as RefBH
        return ref_utils, RefBH
    finally:
        sys.path.remove("/root/reference/OE-VAE")


def test_jets_sorting_matches_reference(ref, rng):
    ref_utils, _ = ref
    from atlasvae.data import sort_constituents_by_pt
    jets = rng.normal(0, 30, (50, 8, 4)).astype(np.float32).reshape(50, 32)
    ours = sort_constituents_by_pt(jets)
    theirs = ref_utils.jets_sorting(jets.copy())
    np.testing.assert_allclose(ours, theirs, rtol=1e-6)


def test_get_4v_matches_reference(ref, rng):
    ref_utils, _ = ref
    from atlasvae.data import jets_4v
    jets = np.abs(rng.normal(20, 10, (40, 6, 4))).astype(np.float32)
    jets[:, :, 0] += 50  # timelike
    flat = jets.reshape(40, 24)
    ours = jets_4v(flat)
    theirs = ref_utils.get_4v(flat)
    np.testing.assert_allclose(ours["pt_calo"], theirs["pt_calo"], rtol=1e-5)
    np.testing.assert_allclose(ours["m_calo"], theirs["m_calo"], rtol=1e-4, atol=1e-2)


def test_sample_cuts_matches_reference_eval(ref, rng):
    ref_utils, _ = ref
    from atlasvae.data import sample_cuts
    sample = {"m": rng.uniform(0, 800, 500).astype(np.float32),
              "pt": rng.uniform(100, 6000, 500).astype(np.float32),
              "weights": np.ones(500, np.float32)}
    cuts = ['(sample["m"] >= 30)', '(sample["pt"] <= 5000)']
    ours = sample_cuts({k: v.copy() for k, v in sample.items()}, cuts)
    theirs = ref_utils.sample_cuts({k: v.copy() for k, v in sample.items()}, cuts)
    np.testing.assert_array_equal(ours["m"], theirs["m"])
    np.testing.assert_array_equal(ours["pt"], theirs["pt"])


def test_get_weights_matches_reference(ref, rng):
    ref_utils, _ = ref
    from atlasvae.data.weights import get_weights
    def mk(seed, n):
        r = np.random.default_rng(seed)
        return {"m": r.uniform(30, 400, n).astype(np.float32),
                "pt": r.uniform(450, 1100, n).astype(np.float32),
                "weights": r.uniform(0.5, 2, n).astype(np.float32)}
    bkg, sig = mk(1, 5000), mk(2, 4000)
    for wt in ("flat_2d", "OoD_2d", "OoD_m", "flat_m"):
        ours = get_weights({k: v.copy() for k, v in bkg.items()},
                           {k: v.copy() for k, v in sig.items()},
                           {"m": 20, "pt": 40}, wt)
        theirs = ref_utils.get_weights({k: v.copy() for k, v in bkg.items()},
                                       {k: v.copy() for k, v in sig.items()},
                                       {"m": 20, "pt": 40}, wt)
        np.testing.assert_allclose(ours, theirs, rtol=1e-4,
                                   err_msg=f"weight_type={wt}")


def test_reweight_sample_matches_reference(ref, rng):
    ref_utils, _ = ref
    from atlasvae.data.weights import reweight_sample
    def mk(seed, n):
        r = np.random.default_rng(seed)
        return {"m": r.uniform(30, 400, n).astype(np.float32),
                "pt": r.uniform(450, 1100, n).astype(np.float32),
                "weights": r.uniform(0.5, 2, n).astype(np.float32)}
    for wt in ("X-S", "flat_2d", "OoD_2d", "None"):
        b1, s1 = mk(1, 4000), mk(2, 3000)
        b2 = {k: v.copy() for k, v in b1.items()}
        s2 = {k: v.copy() for k, v in s1.items()}
        ob, os_ = reweight_sample(b1, s1, {"m": 20, "pt": 40}, wt)
        tb, ts = ref_utils.reweight_sample(b2, s2, {"m": 20, "pt": 40}, wt)
        np.testing.assert_allclose(ob["weights"], tb["weights"], rtol=1e-4)
        np.testing.assert_allclose(os_["weights"], ts["weights"], rtol=1e-4)


def test_loss_function_matches_reference(ref, rng):
    ref_utils, _ = ref
    from atlasvae.eval import loss_function
    p = rng.uniform(0.05, 1.0, (300, 12)).astype(np.float32)
    q = np.clip(p + rng.normal(0, 0.1, p.shape), 0.05, 1.2).astype(np.float32)
    for metric in ("MSE", "MAE", "MARE", "KLD", "JSD", "X-S"):
        ours = loss_function(p, q, 3, metric, multiloss=False)
        theirs = ref_utils.loss_function(p.copy(), q.copy(), 3, metric,
                                         multiloss=False)
        np.testing.assert_allclose(ours, theirs, rtol=2e-3, atol=5e-4,
                                   err_msg=f"metric={metric}")


def test_pairing_quality_matches_reference(ref, rng):
    """The Morton-pyramid pairing must match the reference's windowed
    search distributionally: same 1:1 contract and comparable (m, pt)
    match quality (the documented TPU redesign, not bitwise equality)."""
    ref_utils, _ = ref
    from atlasvae.data import ood_pairing
    n_bkg, n_ood = 800, 8000
    bkg = {"m": rng.uniform(50, 400, n_bkg).astype(np.float32),
           "pt": rng.uniform(450, 1100, n_bkg).astype(np.float32)}
    ood = {"m": rng.uniform(40, 420, n_ood).astype(np.float32),
           "pt": rng.uniform(440, 1150, n_ood).astype(np.float32)}
    ours = ood_pairing(bkg, dict(ood), verbose=False)
    theirs = ref_utils.OoD_pairing(bkg, dict(ood), multithread=False,
                                   verbose=False)
    for key in ("m", "pt"):
        d_ours = np.abs(ours[key] - bkg[key])
        d_theirs = np.abs(theirs[key] - bkg[key])
        # 95th-percentile match distance within 2x of the reference's
        assert np.quantile(d_ours, 0.95) <= 2 * max(np.quantile(d_theirs, 0.95), 5.0)


def test_scan_matches_actual_reference_bumphunter(ref, rng):
    """Our vectorized scan vs the reference's real _scan_hist."""
    import jax.numpy as jnp
    from atlasvae.stats import scan_histograms
    _, RefBH = ref
    nbins = 50
    edges = np.linspace(0, 500, nbins + 1)
    bkg = rng.uniform(50, 300, nbins)
    data = rng.poisson(bkg).astype(float)
    data[20:23] += 80
    hunter = RefBH(width_min=2, width_max=6, width_step=1, scan_step=1,
                   npe=1, nworker=1, seed=0, bins=edges)
    hunter.min_Pval_ar = np.empty(1)
    hunter.min_loc_ar = np.empty(1, dtype=int)
    hunter.min_width_ar = np.empty(1, dtype=int)
    hunter._scan_hist(data, bkg, np.arange(2, 7), 0)
    ours = scan_histograms(jnp.asarray(data, jnp.float32)[None, :],
                           jnp.asarray(bkg, jnp.float32),
                           (2, 3, 4, 5, 6), (1, 1, 1, 1, 1), 0, nbins)
    min_logp, min_loc, min_width = (np.asarray(o) for o in ours[:3])
    assert int(min_loc[0]) == int(hunter.min_loc_ar[0])
    assert int(min_width[0]) == int(hunter.min_width_ar[0])
    np.testing.assert_allclose(np.exp(float(min_logp[0])),
                               float(hunter.min_Pval_ar[0]), rtol=2e-3)


def test_bump_scan_global_sigma_matches_reference(ref, rng):
    """Full bump_scan (pseudo-experiments + global p) vs the reference's
    BumpHunter1D.bump_scan on identical histograms; global significances
    must agree within pseudo-experiment sampling error."""
    from atlasvae.stats import BumpHunter1D
    _, RefBH = ref
    nbins = 60
    edges = np.linspace(0, 600, nbins + 1)
    bkg = rng.uniform(100, 400, nbins)
    data = rng.poisson(bkg).astype(float)
    data[30:33] += 55  # ~moderate bump so global p is resolvable
    theirs = RefBH(width_min=2, width_max=6, width_step=1, scan_step=1,
                   npe=400, nworker=1, seed=0, bins=edges)
    theirs.bump_scan(data, bkg, is_hist=True, verbose=False)
    ours = BumpHunter1D(width_min=2, width_max=6, width_step=1, scan_step=1,
                        npe=400, seed=0, bins=edges)
    ours.bump_scan(data, bkg, is_hist=True, verbose=False)
    assert ours.min_loc_ar[0] == theirs.min_loc_ar[0]
    assert ours.min_width_ar[0] == theirs.min_width_ar[0]
    # global p from independent pseudo ensembles: binomial agreement
    p1, p2 = ours.global_Pval, theirs.global_Pval
    se = np.sqrt(max(p1, p2, 1 / 400) / 400) * 4 + 0.01
    assert abs(p1 - p2) < se + 0.05


def test_deficit_scan_matches_reference(ref):
    """mode='deficit' window scan vs the reference's _scan_hist."""
    import jax.numpy as jnp
    from atlasvae.stats import scan_histograms
    _, RefBH = ref
    rng = np.random.default_rng(11)  # local: shared-fixture order varies
    nbins = 50
    edges = np.linspace(0, 500, nbins + 1)
    bkg = rng.uniform(80, 300, nbins)
    data = rng.poisson(bkg).astype(float)
    # mild deficit: the reference computes p = 1 - gammainc(nh+1, nr) in
    # float64, which cancels to exactly 0 beyond ~8 sigma and then
    # tie-breaks argmin to the smallest width; our log-space p stays
    # exact there (quirk fixed, not replicated), so parity is only
    # meaningful where the reference's float64 still resolves
    data[25:28] = np.maximum(data[25:28] - 30, 0)
    hunter = RefBH(mode="deficit", width_min=2, width_max=6, width_step=1,
                   scan_step=1, npe=1, nworker=1, seed=0, bins=edges)
    hunter.min_Pval_ar = np.empty(1)
    hunter.min_loc_ar = np.empty(1, dtype=int)
    hunter.min_width_ar = np.empty(1, dtype=int)
    hunter._scan_hist(data, bkg, np.arange(2, 7), 0)
    ours = scan_histograms(jnp.asarray(data, jnp.float32)[None, :],
                           jnp.asarray(bkg, jnp.float32),
                           (2, 3, 4, 5, 6), (1, 1, 1, 1, 1), 0, nbins,
                           mode="deficit")
    min_logp, min_loc, min_width = (np.asarray(o) for o in ours[:3])
    assert int(min_loc[0]) == int(hunter.min_loc_ar[0])
    assert int(min_width[0]) == int(hunter.min_width_ar[0])
    np.testing.assert_allclose(np.exp(float(min_logp[0])),
                               float(hunter.min_Pval_ar[0]), rtol=2e-3)


def test_sideband_scan_matches_reference(ref):
    """use_sideband normalization vs the reference's _scan_hist."""
    import jax.numpy as jnp
    from atlasvae.stats import scan_histograms
    _, RefBH = ref
    rng = np.random.default_rng(12)  # local: shared-fixture order varies
    nbins = 50
    edges = np.linspace(0, 500, nbins + 1)
    bkg = rng.uniform(100, 350, nbins)
    data = rng.poisson(bkg * 1.17).astype(float)  # mis-normalized bkg
    data[18:21] += 90
    hunter = RefBH(width_min=2, width_max=6, width_step=1, scan_step=1,
                   npe=1, nworker=1, seed=0, bins=edges, use_sideband=True)
    hunter.min_Pval_ar = np.empty(1)
    hunter.min_loc_ar = np.empty(1, dtype=int)
    hunter.min_width_ar = np.empty(1, dtype=int)
    hunter.norm_scale = np.empty(1)
    hunter._scan_hist(data, bkg, np.arange(2, 7), 0)
    ours = scan_histograms(jnp.asarray(data, jnp.float32)[None, :],
                           jnp.asarray(bkg, jnp.float32),
                           (2, 3, 4, 5, 6), (1, 1, 1, 1, 1), 0, nbins,
                           use_sideband=True)
    min_logp, min_loc, min_width = (np.asarray(o) for o in ours[:3])
    assert int(min_loc[0]) == int(hunter.min_loc_ar[0])
    assert int(min_width[0]) == int(hunter.min_width_ar[0])
    np.testing.assert_allclose(np.exp(float(min_logp[0])),
                               float(hunter.min_Pval_ar[0]), rtol=5e-3)


def test_multichannel_scan_matches_reference(ref):
    """2-channel scan vs the reference's executed ``_scan_hist_multi``
    (ref :478-700), in the regime its (fixed, SURVEY S7) left-edge
    clipping bug cannot fire: channel 1's best window starts at or
    right of channel 0's, so only the correct right-edge clip runs.
    Asserts per-channel min p-values, the combined statistic
    t = -ln(prod p), channel 0's raw window, and the physical overlap
    window against the reference's clipped channel-1 window."""
    from atlasvae.stats import BumpHunter1D
    _, RefBH = ref
    rng = np.random.default_rng(21)  # local: shared-fixture order varies
    nbins = 40
    edges = np.linspace(0, 400, nbins + 1)
    bkg0 = rng.uniform(80, 280, nbins)
    bkg1 = rng.uniform(60, 240, nbins)
    d0 = rng.poisson(bkg0).astype(float)
    d1 = rng.poisson(bkg1).astype(float)
    d0[19:24] += 85   # ch0 bump
    d1[21:26] += 75   # ch1 bump: left edge >= ch0's, right edge beyond

    hunter = RefBH(width_min=2, width_max=6, width_step=1, scan_step=1,
                   npe=1, nworker=1, seed=0, bins=[edges, edges])
    hunter.min_Pval_ar = np.empty(1, dtype=object)
    hunter.min_loc_ar = np.empty(1, dtype=object)
    hunter.min_width_ar = np.empty(1, dtype=object)
    hunter.t_ar = np.empty(1)
    hunter._scan_hist_multi([d0.copy(), d1.copy()], [bkg0, bkg1],
                            np.arange(2, 7), 0)

    ours = BumpHunter1D(width_min=2, width_max=6, width_step=1, scan_step=1,
                        npe=1, seed=0, bins=[edges.copy(), edges.copy()])
    window = ours.bump_scan([d0.copy(), d1.copy()],
                            [bkg0.copy(), bkg1.copy()], is_hist=True,
                            do_pseudo=False, multi_chan=True, verbose=False)

    locs, widths = ours.min_loc_ar[0], ours.min_width_ar[0]
    # regime guard: left-edge clip (the ref bug) must not be in play
    assert locs[1] >= locs[0]
    ref_p = np.asarray(hunter.min_Pval_ar[0], dtype=float)
    assert ref_p[1] < 1.0  # channels did overlap on the ref side
    np.testing.assert_allclose(ours.min_Pval_ar[0], ref_p, rtol=2e-3)
    np.testing.assert_allclose(ours.t_ar[0], float(hunter.t_ar[0]),
                               rtol=1e-3, atol=5e-3)
    # channel 0 keeps its raw window in both implementations
    assert int(locs[0]) == int(hunter.min_loc_ar[0][0])
    assert int(widths[0]) == int(hunter.min_width_ar[0][0])
    # our combined window vs ref's clipped channel-1 window (physical):
    # the left edges agree; on the right the reference's clip loop
    # (ref :669-672: decrement while edge > prev, then +1 back) rounds
    # OUTWARD and lands one bin past the exact intersection even when
    # the bin edges align exactly — ours reports the true intersection
    # (same fix policy as the left-edge bug), so the quirk offset is
    # exactly one bin here
    ref_loc1 = int(hunter.min_loc_ar[0][1])
    ref_w1 = int(hunter.min_width_ar[0][1])
    assert window is not None
    assert window[0] == edges[ref_loc1]
    bin_width = edges[1] - edges[0]
    assert edges[ref_loc1 + ref_w1] == window[1] + bin_width


def test_multichannel_no_overlap_matches_reference(ref):
    """Disjoint per-channel bumps: the reference resets all p to 1 and
    t to 0 (ref :649-656); ours must agree on the combined statistic
    and report no overlap window."""
    from atlasvae.stats import BumpHunter1D
    _, RefBH = ref
    rng = np.random.default_rng(22)  # local: shared-fixture order varies
    nbins = 40
    edges = np.linspace(0, 400, nbins + 1)
    bkg0 = rng.uniform(80, 280, nbins)
    bkg1 = rng.uniform(60, 240, nbins)
    d0 = rng.poisson(bkg0).astype(float)
    d1 = rng.poisson(bkg1).astype(float)
    d0[5:9] += 90    # ch0 bump far left
    d1[30:34] += 80  # ch1 bump far right

    hunter = RefBH(width_min=2, width_max=6, width_step=1, scan_step=1,
                   npe=1, nworker=1, seed=0, bins=[edges, edges])
    hunter.min_Pval_ar = np.empty(1, dtype=object)
    hunter.min_loc_ar = np.empty(1, dtype=object)
    hunter.min_width_ar = np.empty(1, dtype=object)
    hunter.t_ar = np.empty(1)
    hunter._scan_hist_multi([d0.copy(), d1.copy()], [bkg0, bkg1],
                            np.arange(2, 7), 0)

    ours = BumpHunter1D(width_min=2, width_max=6, width_step=1, scan_step=1,
                        npe=1, seed=0, bins=[edges.copy(), edges.copy()])
    window = ours.bump_scan([d0.copy(), d1.copy()],
                            [bkg0.copy(), bkg1.copy()], is_hist=True,
                            do_pseudo=False, multi_chan=True, verbose=False)

    assert np.all(np.asarray(hunter.min_Pval_ar[0], dtype=float) == 1.0)
    assert float(hunter.t_ar[0]) == 0.0
    assert window is None
    assert float(ours.t_ar[0]) == 0.0
