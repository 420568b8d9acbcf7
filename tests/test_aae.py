"""AAE tests: GAN cycle semantics, frozen-discriminator freezing,
discriminant bank, 2-D cut grid scan correctness."""

import jax
import numpy as np
import pytest

from atlasvae.models import AAEConfig, init_aae
from atlasvae.train.aae_loop import (train_aae, make_aae_step_fns,
                                     make_gan_optimizer, _subtree,
                                     AE_KEYS, DISC_KEYS)
from atlasvae.eval.aae_eval import (make_discriminant, adjust_weights,
                                    aae_loss_mapping, aae_bump_scan_2d, get_data)


def _toy_sample(n=512, dim=8, seed=0):
    rng = np.random.default_rng(seed)
    bkg = {"HLVs": rng.normal(0, 1, (n, dim)).astype(np.float32),
           "weights": np.ones(n, np.float32)}
    ood = {"HLVs": rng.normal(2.5, 1, (n, dim)).astype(np.float32),
           "weights": np.ones(n, np.float32)}
    return bkg, ood


def test_phase_freezing():
    """AE phase must not touch disc params; disc phase must not touch AE;
    AAE phase must not touch disc (Keras trainable=False parity,
    ref OE-AAE/aae.py:99,184,227)."""
    cfg = AAEConfig(input_dim=8, ae_layers=(16, 8), disc_layers=(16, 3))
    params = init_aae(jax.random.PRNGKey(0), cfg)
    opt = make_gan_optimizer()
    ae_epoch, disc_epoch, aae_epoch = make_aae_step_fns(opt, lamb=1.0, beta=1.0,
                                                        lr=1e-3)
    bkg, ood = _toy_sample(n=64, dim=8)
    import jax.numpy as jnp
    batches = tuple(jnp.asarray(a.reshape(2, 32, *a.shape[1:]) if a.ndim > 1
                                else a.reshape(2, 32))
                    for a in (bkg["HLVs"], ood["HLVs"], bkg["weights"], ood["weights"]))
    perm = jnp.arange(2)

    def leaves(tree):
        return [np.asarray(x) for x in jax.tree.leaves(tree)]

    p1, s1, _ = ae_epoch(params, opt.init(params), perm, *batches)
    for a, b in zip(leaves(_subtree(p1, DISC_KEYS)), leaves(_subtree(params, DISC_KEYS))):
        np.testing.assert_array_equal(a, b)
    assert any(not np.array_equal(a, b) for a, b in
               zip(leaves(_subtree(p1, AE_KEYS)), leaves(_subtree(params, AE_KEYS))))
    # the frozen subtree's Adam moments stay exactly zero
    for a in leaves(_subtree(s1["mu"], DISC_KEYS)):
        np.testing.assert_array_equal(a, np.zeros_like(a))

    p2, _, _ = disc_epoch(params, opt.init(params), perm, *batches)
    for a, b in zip(leaves(_subtree(p2, AE_KEYS)), leaves(_subtree(params, AE_KEYS))):
        np.testing.assert_array_equal(a, b)

    p3, _, _ = aae_epoch(params, opt.init(params), perm, *batches)
    for a, b in zip(leaves(_subtree(p3, DISC_KEYS)), leaves(_subtree(params, DISC_KEYS))):
        np.testing.assert_array_equal(a, b)


def test_gan_optimizer_shared_iterations():
    """The bias-correction power t advances ACROSS phases: the reference
    shares one Adam instance between the AE, Disc and AAE compiles
    (ref OE-AAE/aae.py:75,88,95,112), so after k AE steps the first
    Disc step runs at t=k+1.  With a unit gradient, the legacy-Adam
    update is exactly -sqrt(1-b2^t)/(1-b1^t) * m_t/(sqrt(v_t)+eps)."""
    import jax.numpy as jnp
    opt = make_gan_optimizer()
    params = {"encoder": jnp.zeros(3), "decoder": jnp.zeros(3),
              "discriminator": jnp.zeros(3)}
    state = opt.init(params)
    g_ae = {"encoder": jnp.ones(3), "decoder": jnp.ones(3)}
    for _ in range(3):
        _, state = opt.update(g_ae, state, AE_KEYS)
    g_disc = {"discriminator": jnp.ones(3)}
    upd, state = opt.update(g_disc, state, DISC_KEYS)
    assert int(state["count"]) == 4
    b1, b2, eps = 0.9, 0.999, 1e-7
    t = 4.0  # disc's FIRST step runs at the shared t=4, not t=1
    m, v = (1 - b1), (1 - b2)  # fresh moments after one unit gradient
    expected = -np.sqrt(1 - b2 ** t) / (1 - b1 ** t) * m / (np.sqrt(v) + eps)
    # rtol 1e-4: the device computes 1 - b2**t in f32 (catastrophic
    # cancellation leaves ~5 significant digits at t=4)
    np.testing.assert_allclose(np.asarray(upd["discriminator"]), expected,
                               rtol=1e-4)
    # AE moments were untouched by the disc step
    np.testing.assert_allclose(float(state["mu"]["encoder"][0]),
                               (1 - b1) * (1 + b1 + b1 ** 2), rtol=1e-6)


def test_train_aae_cycle(tmp_path):
    cfg = AAEConfig(input_dim=8, ae_layers=(16, 8), disc_layers=(16, 3))
    params = init_aae(jax.random.PRNGKey(0), cfg)
    bkg, ood = _toy_sample()
    params, hist = train_aae(params, [(bkg, ood)], n_cycles=2, batch_size=128,
                             output_dir=str(tmp_path), lamb=1.0, beta=1.0,
                             lr=1e-3)
    assert (tmp_path / "AAE.npz").exists()
    assert (tmp_path / "history.pkl").exists()
    # AE improves over the pure-AE phase of cycle 1 (the adversarial
    # phase can legitimately raise the reconstruction loss afterwards)
    cycle1_qcd = [v for c, _, v in hist["QCD-AE Loss"] if c == 1]
    assert cycle1_qcd[-1] < cycle1_qcd[0]
    accs = [v for _, _, v in hist["Disc Accuracy"]]
    assert accs[-1] > 0.4  # disc learns the 3-class task above chance
    # every history key the reference records is populated, incl. the
    # OoD weighted-MAE series (ref aae.py:163-164,274-275) — it was
    # silently left empty before
    assert all(len(v) > 0 for v in hist.values()), \
        {k: len(v) for k, v in hist.items()}
    # AAE-phase Disc Loss entries are the REAL 3-class CE (ref :275-281):
    # with a freshly trained disc they must be finite and nonzero, and
    # each AAE epoch contributes one (cycles record Disc+AAE phases)
    n_epochs_with_disc = 2 * (5 + 5)  # 2 cycles x (Disc 5 + AAE 5)
    assert len(hist["Disc Loss"]) == n_epochs_with_disc
    assert all(np.isfinite(v) and v > 0 for _, _, v in hist["Disc Loss"])


def test_train_aae_with_constituents(tmp_path):
    """With constituents ON, train_aae assembles the same
    constituents+HLVs feature stack the model was sized with — the
    reference hardcodes sample['HLVs'] while sizing input_size WITH
    constituents (ref aae.py:124-125 vs train.py:71), a crash-bug not
    replicated."""
    rng = np.random.default_rng(0)
    n, cdim, hdim = 256, 6, 4
    def mk(shift):
        return {"constituents": rng.normal(shift, 1, (n, cdim)).astype(np.float32),
                "HLVs": rng.normal(shift, 1, (n, hdim)).astype(np.float32),
                "weights": np.ones(n, np.float32)}
    cfg = AAEConfig(input_dim=cdim + hdim, ae_layers=(12, 6),
                    disc_layers=(12, 3))
    params = init_aae(jax.random.PRNGKey(0), cfg)
    params, hist = train_aae(params, [(mk(0.0), mk(1.0))], n_cycles=1,
                             batch_size=64, output_dir=str(tmp_path),
                             lamb=1.0, beta=1.0, lr=1e-3)
    assert np.isfinite([v for _, _, v in hist["AE Loss"]]).all()


def test_make_discriminant_formulas():
    rng = np.random.default_rng(0)
    p = rng.uniform(0.1, 1, (100, 6))
    q = rng.uniform(0.1, 1, (100, 6))
    np.testing.assert_allclose(make_discriminant(p, q, "MAE"),
                               np.mean(np.abs(p - q), axis=1), rtol=1e-6)
    np.testing.assert_allclose(make_discriminant(p, q, "MSE"),
                               np.mean((p - q) ** 2, axis=1), rtol=1e-6)
    jsd = make_discriminant(p, q, "JSD")
    assert np.all(jsd >= 0) and np.all(jsd <= 1.01)


def test_aae_loss_mapping_negative_branch():
    out = aae_loss_mapping(np.array([-4.0, -1.5]))
    np.testing.assert_allclose(out, [1 / 5, 1 / 2.5])


def test_adjust_weights_normalizes_peak():
    rng = np.random.default_rng(1)
    n = 10000
    sample = {"m": np.concatenate([rng.exponential(80, n) + 30,
                                   rng.normal(300, 10, 1000)]),
              "weights": np.ones(n + 1000, np.float32)}
    y_true = np.concatenate([np.ones(n, int), np.zeros(1000, int)])
    factor = adjust_weights(sample, y_true, factor=20)
    assert factor > 0 and np.isfinite(factor)


def test_get_data_discriminants():
    cfg = AAEConfig(input_dim=8, ae_layers=(16, 8), disc_layers=(16, 3))
    params = init_aae(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(2)
    n = 400
    x = rng.normal(0, 1, (n, 8)).astype(np.float32)
    sample = {"m": rng.uniform(50, 500, n), "pt": rng.uniform(450, 1000, n),
              "weights": np.ones(n, np.float32)}
    y_true = rng.integers(0, 2, n)
    x_loss = get_data(params, sample, y_true, x, normal_loss="ON", deco="OFF")
    assert set(x_loss) == {"Autoencoder", "Discriminator", "Auto+Disc"}
    for v in x_loss.values():
        assert np.all((v >= 0) & (v <= 1))


def test_bump_scan_2d_grid_counts():
    """The suffix-cumsum grid must equal brute-force masking counts."""
    rng = np.random.default_rng(3)
    n = 20000
    m_bkg = rng.exponential(80, n) + 30
    m_sig = rng.normal(300, 15, 2000)
    sample = {"m": np.concatenate([m_bkg, m_sig]),
              "pt": rng.uniform(450, 1000, n + 2000),
              "weights": np.ones(n + 2000, np.float32),
              "JZW": np.concatenate([np.zeros(n), -np.ones(2000)])}
    y_true = np.where(sample["JZW"] == -1, 0, 1)
    l1 = np.where(y_true == 0, rng.normal(0.7, 0.1, n + 2000),
                  rng.normal(0.4, 0.12, n + 2000))
    l2 = np.where(y_true == 0, rng.normal(0.65, 0.1, n + 2000),
                  rng.normal(0.45, 0.12, n + 2000))
    x_loss = {"Autoencoder": np.clip(l1, 0, 1), "Discriminator": np.clip(l2, 0, 1)}
    best = aae_bump_scan_2d(y_true, x_loss, sample, "2HDM", None, n_cuts=12,
                            make_plots=False)
    assert best is not None
    cuts = (x_loss["Autoencoder"] >= best["cuts"]["Autoencoder"]) & \
           (x_loss["Discriminator"] >= best["cuts"]["Discriminator"])
    # the chosen cuts keep signal preferentially
    kept_sig = np.sum(cuts & (y_true == 0)) / 2000
    kept_bkg = np.sum(cuts & (y_true == 1)) / n
    assert kept_sig > kept_bkg


def test_aae_dp_phases_match_single_device():
    """Every GAN-cycle phase epoch under the data-parallel mesh equals
    the single-device epoch (params, optimizer state and metrics) to
    f32 reduction order — the MirroredStrategy pattern
    (ref jet-ID/models.py:69-81) applied to the cycle workload
    (ref OE-AAE/aae.py:119-292).  Non-uniform weights exercise the
    local-sum/global-weight gradient decomposition."""
    import jax.numpy as jnp
    from atlasvae.parallel.mesh import make_mesh

    cfg = AAEConfig(input_dim=8, ae_layers=(16, 8), disc_layers=(16, 3))
    params = init_aae(jax.random.PRNGKey(0), cfg)
    opt = make_gan_optimizer()
    rng = np.random.default_rng(11)
    n, nb, bs = 128, 4, 32
    bkg_x = rng.normal(0, 1, (n, 8)).astype(np.float32)
    ood_x = rng.normal(2.5, 1, (n, 8)).astype(np.float32)
    bkg_w = rng.uniform(0.2, 3.0, n).astype(np.float32)
    ood_w = rng.uniform(0.2, 3.0, n).astype(np.float32)
    batches = tuple(jnp.asarray(a.reshape((nb, bs) + a.shape[1:]))
                    for a in (bkg_x, ood_x, bkg_w, ood_w))
    perm = jnp.asarray([2, 0, 3, 1])
    mesh = make_mesh((("data", 4),), jax.devices()[:4])
    fns1 = make_aae_step_fns(opt, lamb=1.0, beta=1.0, lr=1e-3)
    fnsN = make_aae_step_fns(opt, lamb=1.0, beta=1.0, lr=1e-3, mesh=mesh)
    for name, f1, fN in zip(("AE", "Disc", "AAE"), fns1, fnsN):
        opt_state = opt.init(params)
        out1 = f1(params, opt_state, perm, *batches)
        outN = fN(params, opt_state, perm, *batches)
        for a, b in zip(jax.tree.leaves(out1), jax.tree.leaves(outN)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-6,
                                       err_msg=f"{name} phase diverged")


def test_train_aae_dp_full_cycle(tmp_path):
    """The full train_aae cycle schedule over a 4-device mesh reproduces
    the single-device loss history (same seed, same perms)."""
    from atlasvae.parallel.mesh import make_mesh
    cfg = AAEConfig(input_dim=8, ae_layers=(16, 8), disc_layers=(16, 3))
    params0 = init_aae(jax.random.PRNGKey(0), cfg)
    bkg, ood = _toy_sample(n=256)
    (tmp_path / "a").mkdir()
    (tmp_path / "b").mkdir()
    mesh = make_mesh((("data", 4),), jax.devices()[:4])
    _, hist1 = train_aae(params0, [(bkg, ood)], n_cycles=1, batch_size=64,
                         output_dir=str(tmp_path / "a"), lamb=1.0, beta=1.0,
                         lr=1e-3)
    _, histN = train_aae(params0, [(bkg, ood)], n_cycles=1, batch_size=64,
                         output_dir=str(tmp_path / "b"), lamb=1.0, beta=1.0,
                         lr=1e-3, mesh=mesh)
    assert set(hist1) == set(histN)
    for key in hist1:
        v1 = np.asarray([v for _, _, v in hist1[key]])
        vN = np.asarray([v for _, _, v in histN[key]])
        np.testing.assert_allclose(v1, vN, rtol=5e-3, atol=1e-5,
                                   err_msg=f"history {key!r} diverged")
