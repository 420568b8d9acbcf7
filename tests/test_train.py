"""Training engine tests: loss decreases, DP = single-device parity,
plateau controller semantics, checkpoint round trip."""

import jax
import numpy as np
import pytest

from atlasvae.models import VAEConfig, init_vae
from atlasvae.train.step import make_vae_step_fns, make_optimizer, batch_load
from atlasvae.train.loop import train_model, model_checkpoint, features
from atlasvae.train.checkpoint import save_weights, load_weights
from atlasvae.parallel import data_parallel_mesh


def _toy_load(n=512, dim=12, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.normal(0, 1, (n, dim)).astype(np.float32)
    ood = rng.normal(3, 1, (n, dim)).astype(np.float32)
    w = np.ones(n, dtype=np.float32)
    return {"HLVs": x, "weights": w}, {"HLVs": ood, "weights": w}


def test_training_reduces_loss():
    cfg = VAEConfig(fc_layers=(32, 16, 8), input_dim=12)
    params = init_vae(jax.random.PRNGKey(0), cfg)
    load = _toy_load()
    params, history = train_model(params, [load], [load], oe_type="MAE",
                                  n_epochs=8, batch_size=128, beta=0.1,
                                  lamb=1.0, margin=1.0, lr=1e-3)
    assert history["Train loss"][-1] < history["Train loss"][0]
    assert len(history["Valid loss"]) == 8


def test_dp_matches_single_device():
    """shard_map DP over 8 virtual devices must reproduce the
    single-device step bit-for-bit-ish (same grads via psum)."""
    cfg = VAEConfig(fc_layers=(16, 8), input_dim=6)
    params = init_vae(jax.random.PRNGKey(0), cfg)
    opt = make_optimizer(1e-3)
    opt_state = opt.init(params)
    bkg, ood = _toy_load(n=256, dim=6)
    batches = batch_load(bkg["HLVs"], ood["HLVs"], bkg["weights"], ood["weights"],
                         64, n_devices=8)
    key = jax.random.PRNGKey(7)

    single_step, _ = make_vae_step_fns(opt, "KLD", 1.0, 1.0, 1.0)
    mesh = data_parallel_mesh(8)
    dp_step, _ = make_vae_step_fns(opt, "KLD", 1.0, 1.0, 1.0, mesh=mesh)

    lr = np.float32(1e-3)
    p1, _, m1 = single_step(params, opt.init(params), lr, key, *batches)
    p2, _, m2 = dp_step(params, opt.init(params), lr, key, *batches)
    # metrics identical up to reduction order; params close
    np.testing.assert_allclose(np.asarray(m1)[:, :4].sum(0),
                               np.asarray(m2)[:, :4].sum(0), rtol=2e-3)
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4)


def test_batch_load_padding():
    x = np.ones((10, 3), np.float32)
    w = np.ones(10, np.float32)
    bx, ox, bw, ow, valid = batch_load(x, x, w, w, batch_size=4, n_devices=1)
    assert bx.shape == (3, 4, 3)
    assert valid.sum() == 10


def test_model_checkpoint_plateau(tmp_path):
    cfg = VAEConfig(fc_layers=(8, 4), input_dim=4)
    params = init_vae(jax.random.PRNGKey(0), cfg)
    opt = make_optimizer(1e-3)
    opt_state = opt.init(params)
    out = str(tmp_path / "model.npz")
    # improving -> saves, count resets
    hist = {"Train loss": [10.0, 5.0]}
    lr, count = model_checkpoint(params, 1e-3, hist, out, 0)
    assert count == 0 and (tmp_path / "model.npz").exists()
    # stagnating for patience epochs -> halve LR
    hist = {"Train loss": [5.0, 5.3, 5.2, 5.4, 5.5]}
    lr, count = model_checkpoint(params, lr, hist, out, 2)
    assert count == 0
    assert lr == pytest.approx(5e-4)
    # LR below min -> terminate
    hist = {"Train loss": [5.0, 5.3, 5.2, 5.4, 5.5]}
    lr, count = model_checkpoint(params, 5e-5, hist, out, 2)
    assert count is None


def test_checkpoint_roundtrip(tmp_path):
    cfg = VAEConfig(fc_layers=(8, 4), input_dim=4)
    params = init_vae(jax.random.PRNGKey(0), cfg)
    path = str(tmp_path / "w.npz")
    save_weights(params, path)
    loaded = load_weights(path, params)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(loaded)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_history_append_on_resume(tmp_path):
    cfg = VAEConfig(fc_layers=(8, 4), input_dim=4)
    params = init_vae(jax.random.PRNGKey(0), cfg)
    load = _toy_load(n=64, dim=4)
    hist_file = str(tmp_path / "history.pkl")
    model_out = str(tmp_path / "model.npz")
    params, h1 = train_model(params, [load], [load], oe_type="MAE", n_epochs=2,
                             batch_size=32, lr=1e-3, hist_file=hist_file,
                             model_in="", model_out=model_out)
    save_weights(params, model_out)
    # resume: history must append (ref OE-VAE/models.py:160-161)
    params, h2 = train_model(params, [load], [load], oe_type="MAE", n_epochs=2,
                             batch_size=32, lr=1e-3, hist_file=hist_file,
                             model_in=model_out, model_out=model_out)
    assert len(h2["Train loss"]) == 4


def test_features_assembly():
    s = {"constituents": np.ones((4, 6)), "HLVs": np.zeros((4, 2)), "weights": np.ones(4)}
    assert features(s).shape == (4, 8)
    assert features({"HLVs": np.zeros((4, 2))}).shape == (4, 2)


def test_orbax_checkpoint_roundtrip(tmp_path):
    from atlasvae.train.checkpoint import save_orbax, load_orbax
    cfg = VAEConfig(fc_layers=(8, 4), input_dim=4)
    params = init_vae(jax.random.PRNGKey(3), cfg)
    path = tmp_path / "orbax_ckpt"
    save_orbax(path, params)
    loaded = load_orbax(path, params)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(loaded)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_full_state_resume_is_exact(tmp_path):
    """Checkpointing (params + optimizer state) and resuming must
    continue the run bit-for-bit — fixing the reference's lossy
    weights-only resume that restarts Adam moments (SURVEY.md S5)."""
    from atlasvae.train.checkpoint import save_pytree, load_pytree
    cfg = VAEConfig(fc_layers=(16, 8), input_dim=6)
    params = init_vae(jax.random.PRNGKey(0), cfg)
    opt = make_optimizer(1e-3)
    bkg, ood = _toy_load(n=256, dim=6)
    batches = batch_load(bkg["HLVs"], ood["HLVs"], bkg["weights"], ood["weights"], 64)
    step, _ = make_vae_step_fns(opt, "MAE", 1.0, 1.0, 1.0)
    k1, k2 = jax.random.PRNGKey(1), jax.random.PRNGKey(2)
    lr = np.float32(1e-3)

    # straight-through: two loads
    p, o = params, opt.init(params)
    p, o, _ = step(p, o, lr, k1, *batches)
    p, o, _ = step(p, o, lr, k2, *batches)

    # checkpoint after load 1, restore, continue
    p2, o2 = params, opt.init(params)
    p2, o2, _ = step(p2, o2, lr, k1, *batches)
    state_path = str(tmp_path / "state.ckpt")
    save_pytree(state_path, {"params": p2, "opt": o2})
    restored = load_pytree(state_path, {"params": p2, "opt": o2})
    p3, o3, _ = step(restored["params"], restored["opt"], lr, k2, *batches)

    for a, b in zip(jax.tree.leaves(p), jax.tree.leaves(p3)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_load_cache_identity_semantics():
    """LoadCache: identical load objects hit (device-resident, no
    rebuild); new objects miss; loads above the budget pass through
    uncached; eviction keeps total bytes bounded."""
    from atlasvae.train.step import LoadCache
    builds = []

    def make_build(tag, n=64):
        def build():
            builds.append(tag)
            return (np.zeros((2, n, 4), np.float32), np.zeros((2, n), np.float32))
        return build

    cache = LoadCache(budget_bytes=10_000)
    a = {"HLVs": np.zeros((8, 4)), "weights": np.ones(8)}
    b = {"HLVs": np.ones((8, 4)), "weights": np.ones(8)}

    out1 = cache.get((a, b), 64, make_build("ab"))
    out2 = cache.get((a, b), 64, make_build("ab"))
    assert builds == ["ab"]                      # second call: cache hit
    assert out1 is out2
    assert isinstance(out1[0], jax.Array)        # device-resident

    cache.get((b, a), 64, make_build("ba"))      # different identity: miss
    assert builds == ["ab", "ba"]
    cache.get((a, b), 32, make_build("ab32"))    # different geometry: miss
    assert builds == ["ab", "ba", "ab32"]

    # oversized load: passed through uncached (numpy, rebuilt every call)
    big = cache.get((b, b), 64, make_build("big", n=4096))
    assert isinstance(big[0], np.ndarray)
    cache.get((b, b), 64, make_build("big", n=4096))
    assert builds.count("big") == 2

    # eviction: inserting beyond budget drops oldest entries
    assert cache._total <= cache.budget


def test_device_put_load_sharded_dp_step():
    """device_put_load with a mesh commits batches sharded over 'data'
    (matching the shard_map in_specs) and the DP step consumes them
    without resharding — the device-resident epoch path under DP."""
    from atlasvae.train.step import device_put_load
    from jax.sharding import PartitionSpec as P

    cfg = VAEConfig(fc_layers=(16, 8), input_dim=6)
    params = init_vae(jax.random.PRNGKey(0), cfg)
    opt = make_optimizer(1e-3)
    bkg, ood = _toy_load(n=256, dim=6)
    batches = batch_load(bkg["HLVs"], ood["HLVs"], bkg["weights"],
                         ood["weights"], 64, n_devices=8)
    mesh = data_parallel_mesh(8)
    dev_batches = device_put_load(batches, mesh)
    assert dev_batches[0].sharding.spec == P(None, "data", None)
    assert dev_batches[4].sharding.spec == P(None, "data")
    assert len(dev_batches[0].sharding.device_set) == 8

    dp_step, _ = make_vae_step_fns(opt, "KLD", 1.0, 1.0, 1.0, mesh=mesh)
    key = jax.random.PRNGKey(7)
    lr = np.float32(1e-3)
    p_host, _, m_host = dp_step(params, opt.init(params), lr, key, *batches)
    p_dev, _, m_dev = dp_step(params, opt.init(params), lr, key, *dev_batches)
    np.testing.assert_array_equal(np.asarray(m_host), np.asarray(m_dev))
    for a, b in zip(jax.tree.leaves(p_host), jax.tree.leaves(p_dev)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_f16_transfer_dtype_streaming(monkeypatch):
    """ATLASVAE_TRANSFER_DTYPE=float16 sends loads over the wire at half
    width and widens to f32 on device; training matches the f32 path to
    quantization noise.  Cache disabled to force the streaming branch."""
    import os
    monkeypatch.setenv("ATLASVAE_DEVICE_CACHE_GB", "0")
    cfg = VAEConfig(fc_layers=(16, 8), input_dim=6)
    params = init_vae(jax.random.PRNGKey(0), cfg)
    bkg, ood = _toy_load(n=512, dim=6)

    _, hist32 = train_model(params, [(bkg, ood)], [(bkg, ood)], oe_type="MAE",
                            n_epochs=3, batch_size=128, beta=1.0, lamb=1.0,
                            margin=1.0, lr=1e-3)
    monkeypatch.setenv("ATLASVAE_TRANSFER_DTYPE", "float16")
    _, hist16 = train_model(params, [(bkg, ood)], [(bkg, ood)], oe_type="MAE",
                            n_epochs=3, batch_size=128, beta=1.0, lamb=1.0,
                            margin=1.0, lr=1e-3)
    np.testing.assert_allclose(hist16["Train loss"], hist32["Train loss"],
                               rtol=2e-3)
    assert hist16["Train loss"][-1] < hist16["Train loss"][0]

    # the widened device buffers really are float32
    from atlasvae.train.step import device_put_load, batch_load
    b = device_put_load(batch_load(bkg["HLVs"], ood["HLVs"], bkg["weights"],
                                   ood["weights"], 128))
    assert all(x.dtype == np.float32 for x in jax.tree.leaves(b))


def test_state_file_resume_is_bit_exact(tmp_path):
    """train_model(state_file=...) resumes params, Adam moments, lr,
    plateau counter, AND the RNG key: 2+2 resumed epochs equal 4
    straight epochs bit-for-bit (SURVEY S5: the reference's weights-only
    resume restarts the optimizer and schedule)."""
    cfg = VAEConfig(fc_layers=(16, 8), input_dim=6)
    params = init_vae(jax.random.PRNGKey(0), cfg)
    load = _toy_load(n=256, dim=6)
    kw = dict(oe_type="MAE", batch_size=64, beta=1.0, lamb=1.0, margin=1.0,
              lr=1e-3)

    p4, h4 = train_model(params, [load], [load], n_epochs=4, **kw)

    state = str(tmp_path / "state.npz")
    hist = str(tmp_path / "hist.pkl")
    train_model(params, [load], [load], n_epochs=2, state_file=state,
                hist_file=hist, **kw)
    p22, h22 = train_model(params, [load], [load], n_epochs=2,
                           state_file=state, hist_file=hist, **kw)

    assert h22["Train loss"] == h4["Train loss"]
    assert h22["Valid loss"] == h4["Valid loss"]
    for a, b in zip(jax.tree.leaves(p4), jax.tree.leaves(p22)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_state_file_records_termination(tmp_path):
    """A state file whose plateau count is the terminal marker (-1,
    written when the schedule stops training) must not be resumed past
    the stop decision, and save_pytree must write atomically (no
    truncated state after a crash mid-write)."""
    from atlasvae.train.checkpoint import save_pytree, load_pytree
    cfg = VAEConfig(fc_layers=(8, 4), input_dim=4)
    params = init_vae(jax.random.PRNGKey(0), cfg)
    opt = make_optimizer()
    state = str(tmp_path / "state.npz")
    key = jax.random.PRNGKey(0)
    save_pytree(state, {"params": params, "opt": opt.init(params),
                        "lr": np.float32(1e-3), "count": np.int32(-1),
                        "key": key})
    load = _toy_load(n=64, dim=4)
    p, history = train_model(params, [load], [load], oe_type="MAE",
                             n_epochs=3, state_file=state, batch_size=32)
    assert history["Train loss"] == []  # no epochs ran past termination
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(p)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # atomic write: a failure mid-save leaves the previous file intact
    template = {"x": np.arange(4)}
    path = str(tmp_path / "atomic.npz")
    save_pytree(path, template)
    import atlasvae.train.checkpoint as ckpt
    orig = ckpt.np.savez
    def boom(*a, **k):
        raise RuntimeError("simulated crash mid-write")
    ckpt.np.savez = boom
    try:
        with pytest.raises(RuntimeError):
            save_pytree(path, {"x": np.arange(4) + 99})
    finally:
        ckpt.np.savez = orig
    out = load_pytree(path, template)
    np.testing.assert_array_equal(out["x"], np.arange(4))


def test_tp_matches_single_device():
    """dp x tp GSPMD step over a (4, 2) mesh must reproduce the
    1-device step to float tolerance, and its compiled step must be
    reused across calls (VERDICT r1 weak #2)."""
    from atlasvae.parallel.mesh import make_mesh
    from atlasvae.parallel.tp import make_tp_train_step

    cfg = VAEConfig(fc_layers=(16, 8), input_dim=6)
    params = init_vae(jax.random.PRNGKey(0), cfg)
    opt = make_optimizer()
    bkg, ood = _toy_load(n=256, dim=6)
    key = jax.random.PRNGKey(3)
    devices = jax.devices()
    mesh1 = make_mesh((("data", 1), ("model", 1)), devices[:1])
    mesh8 = make_mesh((("data", 4), ("model", 2)), devices[:8])
    step1 = make_tp_train_step(opt, mesh1, oe_type="MAE", beta=2.0, lamb=5.0,
                               margin=1.0)
    step8 = make_tp_train_step(opt, mesh8, oe_type="MAE", beta=2.0, lamb=5.0,
                               margin=1.0)
    args = (bkg["HLVs"], ood["HLVs"], bkg["weights"], ood["weights"])

    p1, o1, l1 = step1(params, opt.init(params), key, *args)
    p8, o8, l8 = step8(params, opt.init(params), key, *args)
    np.testing.assert_allclose(float(l1), float(l8), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p8)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)

    # hidden kernels really are sharded over the model axis
    hidden_kernel = p8["encoder"]["hidden"][0]["w"]
    assert "model" in str(hidden_kernel.sharding.spec)

    # second call hits the compiled cache -- no per-call retrace
    step8(p8, o8, key, *args)
    assert step8.jitted._cache_size() == 1


def test_empty_and_zero_row_loads_survive():
    """Zero loads after cuts must not NameError; all-padding loads must
    not divide by zero (VERDICT r1 weak #5)."""
    cfg = VAEConfig(fc_layers=(8, 4), input_dim=4)
    params = init_vae(jax.random.PRNGKey(0), cfg)
    _, history = train_model(params, [], [], oe_type="MAE", n_epochs=2,
                             beta=1.0, lamb=1.0, batch_size=8)
    assert history["Train loss"] == [0.0, 0.0]
    assert history["Valid loss"] == [0.0, 0.0]

    empty = {"HLVs": np.zeros((0, 4), np.float32),
             "weights": np.zeros(0, np.float32)}
    _, history = train_model(params, [(empty, empty)], [(empty, empty)],
                             oe_type="MAE", n_epochs=1, beta=1.0, lamb=1.0,
                             batch_size=8)
    assert np.isfinite(history["Train loss"]).all()


def test_checkpoint_resume_across_device_counts(tmp_path):
    """A train state checkpointed under an 8-device DP mesh resumes on a
    4-device mesh (production elasticity: lose half the slice, keep
    training).  States live as host pytrees and DP params are
    replicated, so only the psum reduction order can differ — the
    resumed trajectory must match the uninterrupted 8-device run to
    reduction tolerance."""
    from atlasvae.train.checkpoint import save_pytree, load_pytree

    cfg = VAEConfig(fc_layers=(16, 8), input_dim=6)
    params0 = init_vae(jax.random.PRNGKey(0), cfg)
    opt = make_optimizer(1e-3)
    bkg, ood = _toy_load(n=256, dim=6)
    batches = batch_load(bkg["HLVs"], ood["HLVs"], bkg["weights"],
                         ood["weights"], 64, n_devices=8)
    lr = np.float32(1e-3)
    keys = [jax.random.PRNGKey(i) for i in range(4)]

    def run(mesh, params, opt_state, ks):
        step, _ = make_vae_step_fns(opt, "KLD", 1.0, 1.0, 1.0, mesh=mesh)
        for k in ks:
            params, opt_state, _ = step(params, opt_state, lr, k, *batches)
        return params, opt_state

    mesh8, mesh4 = data_parallel_mesh(8), data_parallel_mesh(4)
    p_full, _ = run(mesh8, params0, opt.init(params0), keys)

    p_half, s_half = run(mesh8, params0, opt.init(params0), keys[:2])
    ck = str(tmp_path / "state.npz")
    save_pytree(ck, {"params": p_half, "opt": s_half})
    loaded = load_pytree(ck, {"params": p_half, "opt": s_half})
    p_res, _ = run(mesh4, loaded["params"], loaded["opt"], keys[2:])

    for a, b in zip(jax.tree.leaves(p_full), jax.tree.leaves(p_res)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-3)
