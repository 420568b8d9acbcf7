"""Regression tests for behavioral-parity fixes found in code review."""

import numpy as np
import h5py
import pytest

from atlasvae.data import load_data, ood_pairing, register_file
from atlasvae.stats import BumpHunter1D
from atlasvae.train.checkpoint import save_pytree, load_pytree


def test_derived_kinematics_use_truncated_constituents(tmp_path):
    """ref OE-VAE/utils.py:91,98-99: (pt, m) derive from the constituents
    AFTER truncation to 4*n_const."""
    rng = np.random.default_rng(0)
    n_const_stored = 8
    jets = rng.normal(0, 20, (50, n_const_stored, 4)).astype(np.float32)
    jets[..., 0] = np.abs(jets[..., 0]) + 50  # positive energies
    path = tmp_path / "nokin_QCD.h5"
    with h5py.File(path, "w") as f:
        f.create_dataset("constituents", data=jets.reshape(50, -1))
    register_file("nokin-QCD", path)
    n_const = 4  # truncate to the leading 4 of 8
    sample = load_data("nokin-QCD", 50, n_const=n_const, n_dims=4,
                       constituents="ON", hlvs="OFF", verbose=False)
    # reference formula on the truncated, pt-sorted constituents
    kept = sample["constituents"].reshape(50, n_const, 4)
    four = kept.sum(axis=1)
    pt_ref = np.hypot(four[:, 1], four[:, 2])
    np.testing.assert_allclose(sample["pt"], pt_ref, rtol=1e-5)


def test_do_pseudo_false_reuses_cached_pseudo(rng):
    edges = np.linspace(0, 100, 21)
    bkg = np.full(20, 500.0)
    data1 = rng.poisson(bkg).astype(float)
    data2 = bkg.copy()
    data2[8:10] += 300
    hunter = BumpHunter1D(width_min=2, width_max=4, npe=200, bins=edges, seed=0)
    hunter.bump_scan(data1, bkg, is_hist=True, verbose=False)
    cached_t = hunter.t_ar[1:].copy()
    hunter.bump_scan(data2, bkg, is_hist=True, do_pseudo=False, verbose=False)
    # pseudo distribution retained, data slot replaced, global p computed
    np.testing.assert_array_equal(hunter.t_ar[1:], cached_t)
    assert hunter.t_ar[0] > cached_t.max()  # strong injected bump
    assert hunter.significance > 2


def test_sideband_norm_scale_recorded(rng):
    edges = np.linspace(0, 100, 21)
    bkg = np.full(20, 500.0)
    data = 1.2 * bkg
    data[10:12] += 200
    hunter = BumpHunter1D(width_min=2, width_max=4, npe=50, bins=edges,
                          seed=0, use_sideband=True)
    hunter.bump_scan(data, bkg, is_hist=True, verbose=False)
    assert hunter.norm_scale is not None
    assert 1.05 < hunter.norm_scale < 1.35  # ~1.2 overall scale


def test_pairing_widens_pt_before_m(rng):
    """ref OE-VAE/utils.py:204-211: the pt-window doubles before the
    m-window when the base cell is empty."""
    # grid origin = min of all (m, pt): bkg lands in cell (0, 0)
    bkg = {"m": np.array([105.0], np.float32), "pt": np.array([105.0], np.float32)}
    # candidate B: same m-cell, pt one cell away (found after 1 coarsening)
    # candidate A: same pt-cell, m one cell away (found after 2 coarsenings)
    ood = {"m": np.array([119.0, 105.0], np.float32),
           "pt": np.array([105.0, 119.0], np.float32)}
    paired = ood_pairing(bkg, ood, verbose=False)
    assert paired["pt"][0] == pytest.approx(119.0)  # picked B, pt widened first


def test_save_pytree_bare_path_roundtrip(tmp_path):
    tree = {"a": np.arange(5.0), "b": [np.ones((2, 2))]}
    path = str(tmp_path / "weights.ckpt")  # no .npz suffix
    save_pytree(path, tree)
    import os
    assert os.path.isfile(path)  # exact name, no silent .npz append
    loaded = load_pytree(path, tree)
    np.testing.assert_array_equal(loaded["a"], tree["a"])


def test_multichannel_bump_info_runs(rng):
    edges = np.linspace(0, 400, 41)
    ref = np.full(40, 200.0)
    d1 = rng.poisson(ref).astype(float)
    d2 = rng.poisson(ref).astype(float)
    d1[24:27] += 90
    d2[25:28] += 90
    hunter = BumpHunter1D(width_min=2, width_max=5, npe=100,
                          bins=[edges, edges], seed=0)
    hunter.bump_scan([d1, d2], [ref, ref], is_hist=True, multi_chan=True,
                     verbose=False)
    loc_sigma = hunter.bump_info(d1, is_hist=True, verbose=True)
    assert np.isfinite(loc_sigma) and loc_sigma > 2


def test_signal_inject_tar_contains_injection(rng):
    edges = np.linspace(0, 400, 41)
    bkg_hist = np.histogram(rng.exponential(80, 100_000) + 20, bins=edges)[0].astype(float)
    sig_hist = np.histogram(rng.normal(250, 10, 2000), bins=edges)[0].astype(float)
    hunter = BumpHunter1D(width_min=2, width_max=5, npe=100, npe_inject=50,
                          bins=edges, seed=0, sigma_limit=3, str_min=1.0,
                          str_step=1.0, str_scale="lin", signal_exp=2000)
    hunter.signal_inject(sig_hist, bkg_hist, is_hist=True, verbose=False)
    # t_ar = npe background t's + npe_inject injected t's (ref :1500)
    assert len(hunter.t_ar) == 100 + 50
    assert np.median(hunter.t_ar[100:]) > np.median(hunter.t_ar[:100])


def test_score_cli_respects_n_jets(tmp_path, synth_dir):
    """--n_jets caps the LAST chunk too (was overshooting by chunk-1)."""
    import jax
    from atlasvae.cli.score import main as score_main
    from atlasvae.models import VAEConfig, init_vae
    from atlasvae.train.checkpoint import save_pytree
    params = init_vae(jax.random.PRNGKey(0),
                      VAEConfig(fc_layers=(16, 8), input_dim=12))
    model = str(tmp_path / "m.npz")
    save_pytree(model, params)
    out = str(tmp_path / "scores.h5")
    score_main(["--data", "QCD-Geneva", "--model_in", model,
                "--FC_layers", "16", "8",
                "--n_jets", "1500", "--chunk", "1000", "--n_const", "10",
                "--n_dims", "3", "--metrics", "MAE", "--output", out])
    with h5py.File(out) as f:
        assert len(f["m"]) == 1500


def test_constituent_images_centered_and_layouts(rng):
    """Images center on the jet axis (off-origin jets are not clipped to
    borders) and the 3-dim layout is handled explicitly."""
    from atlasvae.data import constituent_images
    n, c = 40, 8
    # jets whose axis sits far from the origin: eta ~ 2, phi ~ 2.5
    deta = rng.normal(0, 0.2, (n, c))
    dphi = rng.normal(0, 0.2, (n, c))
    pt = rng.uniform(1, 10, (n, c))
    px = pt * np.cos(2.5 + dphi)
    py = pt * np.sin(2.5 + dphi)
    pz = pt * np.sinh(2.0 + deta)
    e = np.sqrt(px**2 + py**2 + pz**2)
    jets4 = np.stack([e, px, py, pz], -1).reshape(n, 4 * c).astype(np.float32)
    img = constituent_images(jets4, n_pixels=10, extent=1.0, n_dims=4)
    border = img[:, [0, -1], :].sum() + img[:, :, [0, -1]].sum()
    assert border < 0.2 * img.sum()  # centered: bulk away from borders
    # 3-dim layout handled via explicit n_dims (not misparsed as 4-dim)
    jets3 = np.stack([px, py, pz], -1).reshape(n, 3 * c).astype(np.float32)
    img3 = constituent_images(jets3, n_pixels=10, extent=1.0, n_dims=3)
    np.testing.assert_allclose(img3, img, rtol=1e-4, atol=1e-4)
    with pytest.raises(ValueError):
        constituent_images(jets3[:, :22], n_dims=4)  # 22 % 4 != 0


def test_constituent_images_mxu_matches_scatter(rng):
    """The accelerator one-hot-matmul formulation equals the scatter-add
    path (same binning math; only f32 summation order differs), incl.
    the block-padding path (n not a multiple of block) and all-zero
    padding jets."""
    from atlasvae.data.jets import _const_images, _const_images_mxu
    n, c = 300, 12
    jets = rng.normal(size=(n, 4 * c)).astype(np.float32)
    jets[-5:] = 0.0  # all-padding jets must yield empty images
    a = np.asarray(_const_images(jets, 16, 1.0, 4))
    b = np.asarray(_const_images_mxu(jets, 16, 1.0, 4, 128))
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)
    assert np.all(b[-5:] == 0)


def test_merge_samples_empty_range_raises(tmp_path):
    from atlasvae.data import register_file
    from atlasvae.data.loader import merge_samples
    with h5py.File(tmp_path / "one.h5", "w") as f:
        f.create_dataset("constituents", data=np.zeros((5, 8), np.float32))
        f.create_dataset("rljet_pt_comb", data=np.ones(5, np.float32))
        f.create_dataset("rljet_m_comb", data=np.ones(5, np.float32))
    register_file("mf-one", tmp_path / "one.h5")
    with pytest.raises(ValueError, match="selects no rows"):
        merge_samples(["mf-one"], (10, 20), constituents="OFF", hlvs="OFF",
                      verbose=False)
