"""Vmapped ensemble/sweep training vs sequential runs (VERDICT r2 #2).

The grid that the reference maps onto Slurm array jobs
(ref OE-VAE/utils.py:597-600, sbatch.sh:13-16) trains here as ONE
vmapped device program; each config's lane must reproduce the
corresponding sequential ``train_model`` run.
"""

import numpy as np
import pytest

import jax

from atlasvae.models import VAEConfig, init_vae
from atlasvae.train import train_model
from atlasvae.train.ensemble import (train_ensemble, stack_trees, tree_slice,
                                     make_vae_ensemble_step_fns,
                                     init_ensemble_opt_state)
from atlasvae.train.step import make_optimizer, batch_load


def _toy_samples(rng, n=600, dim=12):
    bkg = {"HLVs": rng.normal(size=(n, dim)).astype(np.float32),
           "weights": rng.uniform(0.5, 2.0, n).astype(np.float32)}
    ood = {"HLVs": rng.normal(0.7, 1.0, (n, dim)).astype(np.float32),
           "weights": rng.uniform(0.5, 2.0, n).astype(np.float32)}
    vb = {"HLVs": rng.normal(size=(n // 3, dim)).astype(np.float32),
          "weights": np.ones(n // 3, np.float32)}
    vo = {"HLVs": rng.normal(0.7, 1.0, (n // 3, dim)).astype(np.float32),
          "weights": np.ones(n // 3, np.float32)}
    return [(bkg, ood)], [(vb, vo)]


CONFIGS = [  # (beta, lamb, margin, lr, seed)
    (2.0, 5.0, 1.0, 1e-3, 0),
    (0.5, 1.0, 2.0, 3e-3, 1),
    (4.0, 0.5, 0.5, 1e-3, 2),
]


@pytest.mark.parametrize("oe_type", ["MAE", "KLD"])
def test_ensemble_matches_sequential_trajectories(oe_type):
    rng = np.random.default_rng(11)
    train_s, valid_s = _toy_samples(rng)
    cfg = VAEConfig(fc_layers=(16, 8, 4), input_dim=12)
    n_epochs, batch = 5, 200

    seq_histories, seq_params = [], []
    for beta, lamb, margin, lr, seed in CONFIGS:
        params = init_vae(jax.random.PRNGKey(100 + seed), cfg)
        p, h = train_model(params, train_s, valid_s, oe_type,
                           n_epochs=n_epochs, batch_size=batch, beta=beta,
                           lamb=lamb, margin=margin, lr=lr, seed=seed)
        seq_histories.append(h)
        seq_params.append(p)

    stacked = stack_trees([init_vae(jax.random.PRNGKey(100 + s), cfg)
                           for *_h, s in CONFIGS])
    beta, lamb, margin, lr, seeds = map(np.asarray, zip(*CONFIGS))
    ens_params, ens_histories = train_ensemble(
        stacked, (beta, lamb, margin), train_s, valid_s, oe_type,
        n_epochs=n_epochs, batch_size=batch, lr=lr, seeds=seeds)

    for g, (sh, eh) in enumerate(zip(seq_histories, ens_histories)):
        assert sh.keys() == eh.keys(), f"config {g} history keys differ"
        for k in sh:
            np.testing.assert_allclose(
                eh[k], sh[k], rtol=2e-5, atol=1e-6,
                err_msg=f"config {g} metric {k} diverged from sequential")
    for g in range(len(CONFIGS)):
        got = jax.tree.leaves(tree_slice(ens_params, g))
        want = jax.tree.leaves(seq_params[g])
        for a, b in zip(got, want):
            np.testing.assert_allclose(a, np.asarray(b), rtol=2e-5,
                                       atol=1e-6)


def test_lr_zero_freezes_lane_bit_exactly():
    """A terminated config keeps its lane but must not move: updates are
    scaled by the traced per-config lr, so lr=0 is an exact freeze."""
    rng = np.random.default_rng(3)
    cfg = VAEConfig(fc_layers=(8, 4), input_dim=6)
    stacked = stack_trees([init_vae(jax.random.PRNGKey(i), cfg)
                           for i in range(2)])
    optimizer = make_optimizer()
    opt_state = init_ensemble_opt_state(optimizer, stacked)
    train, _ = make_vae_ensemble_step_fns(optimizer, "MAE")
    x = rng.normal(size=(120, 6)).astype(np.float32)
    w = np.ones(120, np.float32)
    batches = batch_load(x, x + 0.3, w, w, 40)
    keys = np.stack([np.asarray(jax.random.PRNGKey(7))] * 2)
    hyper = tuple(np.full(2, v, np.float32) for v in (1.0, 1.0, 1.0))
    lrs = np.array([0.0, 1e-3], np.float32)
    new_params, _, _ = train(stacked, opt_state, lrs, hyper, keys, *batches)
    for a, b in zip(jax.tree.leaves(tree_slice(new_params, 0)),
                    jax.tree.leaves(tree_slice(stacked, 0))):
        np.testing.assert_array_equal(a, b)
    moved = any(not np.array_equal(a, b)
                for a, b in zip(jax.tree.leaves(tree_slice(new_params, 1)),
                                jax.tree.leaves(tree_slice(stacked, 1))))
    assert moved, "live lane should have trained"


def test_vmapped_sweep_cli_matches_sequential_sweep(tmp_path):
    """cli/sweep.py --vmap ON produces the same per-config histories and
    weights as the sequential sweep (same output-dir naming).

    Config uses a scaler + unit weights: the vmapped program is
    f32-reassociation-equivalent, not bitwise (see train/ensemble.py),
    and the unscaled X-S configuration's 1e4-spanning weights amplify
    that ulp-level drift chaotically over epochs."""
    import pickle
    from atlasvae.cli.sweep import main as sweep_main
    from atlasvae.train.checkpoint import load_weights
    from atlasvae.models import VAEConfig, init_vae

    # --n_devices 1: the sequential CLI would otherwise train DP over the
    # test env's 8 virtual devices, whose padded valid batches draw a
    # different (equally valid) noise stream than the single-device
    # ensemble program
    common = ["--synthetic", "3000", "--n_train", "800", "--n_valid", "400",
              "--n_OoD", "800", "--n_sig", "400", "--batch_size", "200",
              "--n_epochs", "3", "--FC_layers", "16", "8", "4",
              "--OE_type", "MAE", "--plotting", "OFF", "--n_devices", "1",
              "--weight_type", "None",
              "--HLV_scaler_type", "RobustScaler"]
    seq_out = str(tmp_path / "seq")
    vm_out = str(tmp_path / "vm")
    grid = ["--grid", "beta=0.5,2", "lamb=1,5"]
    sweep_main(["--entry", "vae", "--output_dir", seq_out] + grid
               + ["--"] + common)
    sweep_main(["--entry", "vae", "--vmap", "ON", "--output_dir", vm_out]
               + grid + ["--"] + common)

    cfg = VAEConfig(fc_layers=(16, 8, 4), input_dim=12)
    template = init_vae(jax.random.PRNGKey(0), cfg)
    for tag in ("beta0.5_lamb1", "beta0.5_lamb5", "beta2_lamb1",
                "beta2_lamb5"):
        with open(f"{seq_out}/{tag}/history.pkl", "rb") as f:
            seq_h = pickle.load(f)
        with open(f"{vm_out}/{tag}/history.pkl", "rb") as f:
            vm_h = pickle.load(f)
        assert seq_h.keys() == vm_h.keys()
        for k in seq_h:
            np.testing.assert_allclose(vm_h[k], seq_h[k], rtol=1e-4,
                                       atol=1e-5, err_msg=f"{tag}/{k}")
        seq_w = load_weights(f"{seq_out}/{tag}/model.npz", template)
        vm_w = load_weights(f"{vm_out}/{tag}/model.npz", template)
        for a, b in zip(jax.tree.leaves(seq_w), jax.tree.leaves(vm_w)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=5e-4, atol=1e-4)


def test_seed_sweep_lanes_differ():
    """Distinct per-config seeds must produce distinct trajectories even
    with identical hyper-parameters (the ensemble/seed-sweep use)."""
    rng = np.random.default_rng(5)
    train_s, valid_s = _toy_samples(rng, n=300)
    cfg = VAEConfig(fc_layers=(8, 4), input_dim=12)
    stacked = stack_trees([init_vae(jax.random.PRNGKey(0), cfg)] * 2)
    hyper = tuple(np.full(2, v, np.float32) for v in (2.0, 5.0, 1.0))
    _, hist = train_ensemble(stacked, hyper, train_s, valid_s, "MAE",
                             n_epochs=2, batch_size=100, lr=1e-3,
                             seeds=[0, 123])
    assert hist[0]["Train loss"] != hist[1]["Train loss"]


def test_kfold_vmapped_matches_sequential(tmp_path):
    """--vmap_folds trains all folds in one program; per-fold best
    weights and CV probabilities must match the sequential fold loop
    (f32-reassociation tolerance, see train/ensemble.py numerics note)."""
    from atlasvae.cli.jetid import main
    from atlasvae.train.checkpoint import load_pytree

    common = ["--synthetic", "3000", "--n_train", "900", "--n_valid", "300",
              "--batch_size", "150", "--n_epochs", "3", "--n_folds", "3",
              "--FCN_neurons", "32", "16", "--constituents", "OFF",
              "--plotting", "OFF"]
    seq_out, vm_out = str(tmp_path / "seq"), str(tmp_path / "vm")
    main(common + ["--output_dir", seq_out])
    main(common + ["--vmap_folds", "ON", "--output_dir", vm_out])
    import pickle
    for fold in (1, 2, 3):
        a = np.load(f"{seq_out}/model_{fold}.npz")
        b = np.load(f"{vm_out}/model_{fold}.npz")
        assert set(a.files) == set(b.files)
        for k in a.files:
            np.testing.assert_allclose(a[k], b[k], rtol=5e-4, atol=1e-4,
                                       err_msg=f"fold {fold} leaf {k}")
    with open(f"{seq_out}/valid_results.pkl", "rb") as f:
        _, seq_labels, seq_probs = pickle.load(f)
    with open(f"{vm_out}/valid_results.pkl", "rb") as f:
        _, vm_labels, vm_probs = pickle.load(f)
    np.testing.assert_array_equal(seq_labels, vm_labels)
    np.testing.assert_allclose(vm_probs, seq_probs, rtol=2e-3, atol=2e-4)


def test_config_sharded_ensemble_matches_unsharded():
    """G=8 configs sharded over an 8-device 'config' mesh (zero
    collectives — each device trains one config, data replicated) must
    reproduce the unsharded vmapped program's histories and weights."""
    from atlasvae.parallel.mesh import config_mesh
    from atlasvae.train.ensemble import train_ensemble

    rng = np.random.default_rng(7)
    train_s, valid_s = _toy_samples(rng)
    cfg = VAEConfig(fc_layers=(16, 8), input_dim=12)
    G = 8
    hyper = tuple(np.linspace(0.5, 4.0, G).astype(np.float32)
                  for _ in range(3))
    lrs = np.full(G, 1e-3, np.float32)

    def run(mesh):
        stacked = stack_trees([init_vae(jax.random.PRNGKey(s), cfg)
                               for s in range(G)])
        return train_ensemble(stacked, hyper, train_s, valid_s, "MAE",
                              n_epochs=3, batch_size=200, lr=lrs,
                              mesh=mesh)

    p1, h1 = run(None)
    pN, hN = run(config_mesh(8))
    for g in range(G):
        for k in h1[g]:
            np.testing.assert_allclose(hN[g][k], h1[g][k], rtol=1e-6,
                                       err_msg=f"config {g} metric {k}")
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(pN)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-6,
                                   atol=1e-7)
    with pytest.raises(ValueError, match="must be a multiple"):
        run_bad = stack_trees([init_vae(jax.random.PRNGKey(s), cfg)
                               for s in range(6)])
        train_ensemble(run_bad, tuple(h[:6] for h in hyper), train_s,
                       valid_s, "MAE", n_epochs=1, batch_size=200,
                       lr=lrs[:6], mesh=config_mesh(8))


def test_ensemble_state_resume_bit_exact(tmp_path):
    """Kill-and-resume: train 2+3 epochs with a state_file vs 5 straight
    epochs — params, lrs, and histories must match bit-for-bit (the
    ensemble analog of train_model's full-state resume)."""
    from atlasvae.train.ensemble import train_ensemble

    rng = np.random.default_rng(3)
    train_s, valid_s = _toy_samples(rng)
    cfg = VAEConfig(fc_layers=(16, 8), input_dim=12)
    G = 3
    hyper = tuple(np.linspace(0.5, 2.0, G).astype(np.float32)
                  for _ in range(3))
    hist_files = [str(tmp_path / f"h{g}.pkl") for g in range(G)]

    def fresh():
        return stack_trees([init_vae(jax.random.PRNGKey(s), cfg)
                            for s in range(G)])

    p_ref, h_ref = train_ensemble(fresh(), hyper, train_s, valid_s, "MAE",
                                  n_epochs=5, batch_size=200)

    state = str(tmp_path / "ens_state.npz")
    train_ensemble(fresh(), hyper, train_s, valid_s, "MAE", n_epochs=2,
                   batch_size=200, state_file=state, hist_files=hist_files)
    p_res, h_res = train_ensemble(fresh(), hyper, train_s, valid_s, "MAE",
                                  n_epochs=3, batch_size=200,
                                  state_file=state, hist_files=hist_files)

    for a, b in zip(jax.tree.leaves(p_ref), jax.tree.leaves(p_res)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for g in range(G):
        for k in h_ref[g]:
            np.testing.assert_array_equal(h_res[g][k], h_ref[g][k],
                                          err_msg=f"config {g} metric {k}")
