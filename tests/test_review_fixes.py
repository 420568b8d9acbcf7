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


# ---------------------------------------------------------------- round 3

def test_masked_epoch_padding_batches_are_bitexact_noop():
    """An all-padding batch with mask=0 must leave params, optimizer
    state AND the dropout key stream untouched: zero-weight rows already
    zero the CE gradient, but Adam moment decay and the L2-regularizer
    gradient are weight-independent, so without the mask the padded
    folds of a vmapped k-fold drift from the sequential runs."""
    import jax
    from atlasvae.models import JetIDConfig, init_jetid
    from atlasvae.train.jetid_loop import make_jetid_step_fns, _pack
    from atlasvae.train.step import make_optimizer

    cfg = JetIDConfig(n_classes=2, scalars=("s",), scalar_dims=(6,),
                      nn_type="FCN", fcn_neurons=(16, 8), dropout=0.1)
    rng = np.random.default_rng(3)
    x = rng.normal(size=(300, 6)).astype(np.float32)
    y = (x[:, 0] > 0).astype(np.int32)
    w = np.ones(300, np.float32)
    opt = make_optimizer()
    train, _ = make_jetid_step_fns(opt, cfg, masked=True)
    params = init_jetid(jax.random.PRNGKey(0), cfg)
    import optax
    opt_state = opt.init(params)
    key = jax.random.PRNGKey(7)

    def run(n_pad_batches):
        bs = 100
        pad = n_pad_batches * bs
        xi = np.concatenate([x, np.zeros((pad, 6), np.float32)])
        yi = np.concatenate([y, np.zeros(pad, np.int32)])
        wi = np.concatenate([w, np.zeros(pad, np.float32)])
        inputs, labels, weights = _pack({"s": xi}, yi, wi, bs)
        mask = np.ones(3 + n_pad_batches, np.float32)
        mask[3:] = 0.0
        return train(params, opt_state, np.float32(1e-3), key,
                     inputs, labels, weights, mask)

    p0, o0, m0 = run(0)
    p2, o2, m2 = run(2)
    for a, b in zip(jax.tree.leaves(p0), jax.tree.leaves(p2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(o0), jax.tree.leaves(o2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # the real batches' metrics are identical; padded ones report ~0
    np.testing.assert_array_equal(np.asarray(m0), np.asarray(m2)[:3])


def test_kfold_unequal_folds_match_sequential():
    """Folds of different sizes (the smaller one padded with whole
    all-padding batches) must reproduce k independent sequential runs —
    both the final weights and the logged per-epoch train metrics
    (review r3: padding batches diluted history['loss']/['accuracy'])."""
    import jax
    from atlasvae.models import JetIDConfig, init_jetid
    from atlasvae.train.jetid_loop import (train_kfold_vmapped,
                                           train_classifier)

    cfg = JetIDConfig(n_classes=2, scalars=("s",), scalar_dims=(8,),
                      nn_type="FCN", fcn_neurons=(16,), dropout=0.0)
    rng = np.random.default_rng(5)

    def fold(n, seed):
        r = np.random.default_rng(seed)
        xx = r.normal(size=(n, 8)).astype(np.float32)
        yy = (xx[:, 0] + 0.3 * r.normal(size=n) > 0).astype(np.int32)
        return {"s": xx}, yy, np.ones(n, np.float32)

    folds = [fold(400, 0), fold(150, 1)]   # batch 100: 4 vs 2 real batches
    valids = [fold(100, 2), fold(100, 3)]
    params = [init_jetid(jax.random.PRNGKey(f), cfg) for f in range(2)]
    best, hists = train_kfold_vmapped(
        params, cfg, folds, valids, epochs=4, batch_size=100, lr=1e-3,
        seed=0, verbose=False)
    for f in range(2):
        seq_p, seq_h = train_classifier(
            params[f], cfg, folds[f][0], folds[f][1],
            valids[f][0], valids[f][1], epochs=4, batch_size=100,
            lr=1e-3, sample_weight=folds[f][2], seed=0, verbose=False)
        for k in ("loss", "accuracy", "val_loss"):
            np.testing.assert_allclose(hists[f][k], seq_h[k], rtol=2e-4,
                                       atol=1e-5, err_msg=f"fold {f} {k}")
        for a, b in zip(jax.tree.leaves(best[f]), jax.tree.leaves(seq_p)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=5e-4, atol=1e-5)


def test_lz4_full_chunk_compresses_within_24bit_field(rng):
    """A full-_CHUNK_MAX incompressible chunk must frame without
    overflowing the 24-bit csize field (review r3: 0xFF0000 left 10
    bytes less headroom than lz4's worst case) and round-trip."""
    from atlasvae.etl.rootcodec import (_CHUNK_MAX, compress_record,
                                        decompress_record)
    payload = rng.integers(0, 256, _CHUNK_MAX + 17, dtype=np.uint8).tobytes()
    body = compress_record(payload, "lz4")
    assert decompress_record(body, len(payload), "t") == payload


def test_every_truncation_point_raises_named_error(tmp_path, rng):
    """Exhaustive truncation sweep: EVERY proper prefix of a written
    file must raise the RootIOError family on open+read — never a bare
    struct.error/IndexError (review r3: cuts landing inside TKey seek
    fields, TStrings, or big-directory seeks escaped the named paths)."""
    from atlasvae.etl import rootio
    from atlasvae.etl.rootcodec import RootIOError

    n = 40
    branches = {"pt": rng.uniform(0, 9, n).astype(np.float32),
                "trk": [rng.normal(size=c).astype(np.float32)
                        for c in rng.integers(0, 4, n)]}
    path = str(tmp_path / "t.root")
    rootio.write_tree(path, "nominal", branches, basket_entries=16)
    data = open(path, "rb").read()
    cut_path = str(tmp_path / "cut.root")
    for cut in range(len(data)):
        with open(cut_path, "wb") as f:
            f.write(data[:cut])
        try:
            t = rootio.read_tree(cut_path, "nominal")
            for k in t.keys():
                t.array(k)
        except RootIOError:
            continue
        raise AssertionError(
            f"truncation at {cut}/{len(data)} bytes did not raise a "
            f"RootIOError subclass")


def test_ensemble_resume_history_with_stale_key(tmp_path):
    """Resuming an ensemble lane whose saved history carries a key the
    current run does not produce (e.g. 'KLD' saved with beta!=0, resumed
    with beta==0) must pad with 0.0 like train/loop.py, not KeyError."""
    from atlasvae.models import VAEConfig, init_vae
    from atlasvae.train.ensemble import train_ensemble, stack_trees
    from atlasvae.train.checkpoint import load_history
    import jax

    rng = np.random.default_rng(9)
    train_s, valid_s = _toy_vae_samples(rng)
    cfg = VAEConfig(fc_layers=(8, 4), input_dim=6)
    hist_files = [str(tmp_path / f"h{g}.pkl") for g in range(2)]
    state_file = str(tmp_path / "state.npz")

    def run(beta, n_epochs):
        stacked = stack_trees([init_vae(jax.random.PRNGKey(g), cfg)
                               for g in range(2)])
        hyper = (np.full(2, beta, np.float32), np.zeros(2, np.float32),
                 np.zeros(2, np.float32))
        return train_ensemble(stacked, hyper, train_s, valid_s, "MAE",
                              n_epochs=n_epochs, batch_size=100, lr=1e-3,
                              hist_files=hist_files, state_file=state_file)

    run(1.0, 1)                       # epoch 1 logs a 'KLD' history key
    run(0.0, 1)                       # resume 1 epoch: losses carry no 'KLD'
    for hf in hist_files:
        h = load_history(hf)
        assert len(h["KLD"]) == 2 and h["KLD"][1] == 0.0   # padded
        assert len(h["Train loss"]) == 2


def _toy_vae_samples(rng, n=300, dim=6):
    bkg = {"HLVs": rng.normal(size=(n, dim)).astype(np.float32),
           "weights": np.ones(n, np.float32)}
    ood = {"HLVs": rng.normal(0.5, 1.0, (n, dim)).astype(np.float32),
           "weights": np.ones(n, np.float32)}
    vb = {"HLVs": rng.normal(size=(n // 3, dim)).astype(np.float32),
          "weights": np.ones(n // 3, np.float32)}
    vo = {"HLVs": rng.normal(0.5, 1.0, (n // 3, dim)).astype(np.float32),
          "weights": np.ones(n // 3, np.float32)}
    return [(bkg, ood)], [(vb, vo)]


def test_robust_scaler_identity_when_both_options_off():
    """Scaler.from_sklearn on RobustScaler(with_centering=False,
    with_scaling=False): sklearn leaves center_/scale_ as None; the
    import must produce a working identity scaler (review r3:
    len(None) TypeError)."""
    sklearn = pytest.importorskip("sklearn")
    from sklearn.preprocessing import RobustScaler
    from atlasvae.data.scalers import Scaler, _transform_chunk

    x = np.random.default_rng(1).normal(2.0, 3.0, (50, 4)).astype(np.float32)
    sk = RobustScaler(with_centering=False, with_scaling=False).fit(x)
    s = Scaler.from_sklearn(sk)
    np.testing.assert_allclose(np.asarray(_transform_chunk(s, x)), x,
                               rtol=1e-6)


def test_grid_configs_share_resolved_valid_window(tmp_path):
    """_grid_configs must copy the lead's RESOLVED [start, stop]
    train/valid windows to every config (review r3: copying the raw
    scalars made non-lead configs evaluate on the training region)."""
    from atlasvae.cli.vae import _grid_configs

    passthrough = ["--synthetic", "2000", "--n_train", "600",
                   "--n_valid", "300", "--output_dir", str(tmp_path)]
    configs, out_roots, _ = _grid_configs(
        passthrough, ["beta"], [(0.0,), (1.0,)],
        [str(tmp_path / "a"), str(tmp_path / "b")])
    lead = configs[0]
    assert isinstance(lead.n_valid, list) and len(lead.n_valid) == 2
    assert configs[1].n_train == lead.n_train
    assert configs[1].n_valid == lead.n_valid
    # a resolved window: [sample_size - 300, sample_size], never (0, 300)
    assert lead.n_valid[1] - lead.n_valid[0] == 300
    assert lead.n_valid[0] >= lead.n_train[1]


def test_run_ensemble_honors_model_in(tmp_path):
    """--model_in in the sweep passthrough must seed every vmapped lane
    with the pre-trained weights, exactly like the sequential sweep
    (review r3: run_ensemble silently trained all configs from random
    init)."""
    import pickle
    import jax
    from atlasvae.cli.vae import main, run_ensemble
    from atlasvae.models import VAEConfig, init_vae
    from atlasvae.train.checkpoint import save_weights

    cfg = VAEConfig(fc_layers=(8, 4), input_dim=12)
    pre = init_vae(jax.random.PRNGKey(42), cfg)
    weights_in = str(tmp_path / "pre.npz")
    save_weights(pre, weights_in)

    common = ["--synthetic", "2000", "--n_train", "600", "--n_valid", "300",
              "--n_OoD", "600", "--n_sig", "300", "--batch_size", "200",
              "--n_epochs", "1", "--FC_layers", "8", "4",
              "--OE_type", "MAE", "--plotting", "OFF", "--n_devices", "1",
              "--weight_type", "None", "--model_in", weights_in]
    seq_dir = str(tmp_path / "seq")
    main(common + ["--beta", "0.5", "--output_dir", seq_dir])
    vm_dirs = [str(tmp_path / "vm_a"), str(tmp_path / "vm_b")]
    run_ensemble(common, ["beta"], [(0.5,), (2.0,)], vm_dirs)
    with open(seq_dir + "/history.pkl", "rb") as f:
        seq_h = pickle.load(f)
    with open(vm_dirs[0] + "/history.pkl", "rb") as f:
        vm_h = pickle.load(f)
    np.testing.assert_allclose(vm_h["Train loss"], seq_h["Train loss"],
                               rtol=1e-4, atol=1e-5)
