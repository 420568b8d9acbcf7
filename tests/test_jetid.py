"""jet-ID tests: classifier learns, callbacks behave, weighting schemes,
CV fold merge, discriminant combination, multi_cuts grid."""

import jax
import numpy as np
import pytest

from atlasvae.models import JetIDConfig, init_jetid
from atlasvae.train.jetid_loop import train_classifier, predict_classifier
from atlasvae.train.checkpoint import save_pytree
from atlasvae.eval.jetid_eval import (make_labels, get_class_weight,
                                      get_sample_weights, upsampling,
                                      downsampling, compo_matrix, cross_valid,
                                      discriminant, multi_cuts, valid_accuracy)


def _toy_classes(n=2000, dim=10, seed=0):
    rng = np.random.default_rng(seed)
    x0 = rng.normal(1.0, 1.0, (n // 2, dim))
    x1 = rng.normal(-1.0, 1.0, (n // 2, dim))
    x = np.concatenate([x0, x1]).astype(np.float32)
    y = np.concatenate([np.zeros(n // 2, int), np.ones(n // 2, int)])
    perm = rng.permutation(n)
    return x[perm], y[perm]


@pytest.fixture(scope="module")
def trained():
    cfg = JetIDConfig(n_classes=2, scalars=("s",), scalar_dims=(10,), nn_type="FCN",
                      fcn_neurons=(32, 16), dropout=0.0)
    x, y = _toy_classes()
    params = init_jetid(jax.random.PRNGKey(0), cfg)
    params, hist = train_classifier(params, cfg, {"s": x[:1500]}, y[:1500],
                                    {"s": x[1500:]}, y[1500:], epochs=10,
                                    batch_size=250, lr=1e-3, verbose=False)
    return cfg, params, x, y, hist


def test_classifier_learns(trained):
    cfg, params, x, y, hist = trained
    probs = predict_classifier(params, cfg, {"s": x[1500:]})
    assert valid_accuracy(y[1500:], probs) > 0.9
    assert hist["val_loss"][-1] <= hist["val_loss"][0]


def test_make_labels():
    sample = {"JZW": np.array([-1.0, 0.0, 2.0])}
    np.testing.assert_array_equal(make_labels(sample), [0, 1, 1])


def test_class_weight():
    labels = np.array([0] * 10 + [1] * 90)
    assert get_class_weight(labels, bkg_ratio=0) is None
    cw = get_class_weight(labels, bkg_ratio=1)
    # signal class upweighted relative to its population
    assert cw[0] > cw[1]


@pytest.mark.parametrize("scheme", ["flattening", "match2max", "bkg_ratio",
                                    "match2class"])
def test_sample_weights_schemes(scheme):
    rng = np.random.default_rng(1)
    n = 5000
    sample = {"pt": rng.uniform(450, 1200, n),
              "eta": rng.normal(0, 1.2, n)}
    labels = rng.integers(0, 2, n)
    w, bins = get_sample_weights(sample, labels, scheme, bkg_ratio=1)
    assert w is not None and np.all(w >= 0)
    np.testing.assert_allclose(np.sum(w), n, rtol=1e-5)  # normalization


def test_downsampling_and_upsampling():
    rng = np.random.default_rng(2)
    n = 2000
    sample = {"pt": rng.uniform(10, 400, n), "x": rng.normal(size=n)}
    labels = rng.integers(0, 2, n)
    v_s, v_l, t_s, t_l = downsampling(sample, labels, pt_key="pt")
    assert len(v_l) + len(t_l) == n
    bins = [0, 100, 200, 500]
    idx = np.digitize(sample["pt"], bins, right=True) - 1
    h_sig = np.histogram(sample["pt"][labels == 0], bins)[0]
    h_bkg = np.histogram(sample["pt"][labels != 0], bins)[0]
    up_s, up_l = upsampling(sample, labels, bins, idx, h_sig, h_bkg,
                            h_sig * 1.5, h_bkg * 1.5)
    assert len(up_l) > n  # upsampled


def test_compo_matrix(trained):
    cfg, params, x, y, _ = trained
    probs = predict_classifier(params, cfg, {"s": x[1500:]})
    matrix, acc = compo_matrix(y[1500:], y[:1500], probs)
    assert matrix.shape == (2, 2)
    assert 80 < acc <= 100


def test_cross_valid_merges_folds(tmp_path, trained):
    cfg, params, x, y, _ = trained
    # save the same params for both folds
    save_pytree(str(tmp_path / "model_1.npz"), params)
    save_pytree(str(tmp_path / "model_2.npz"), params)
    sample = {"s": x, "eventNumber": np.arange(len(y))}
    probs = cross_valid(sample, y, cfg, str(tmp_path), 2, params)
    assert probs.shape == (len(y), 2)
    assert np.all(probs >= 0)  # every row filled (fixes valid_sprobs bug)
    assert valid_accuracy(y, probs) > 0.9


def test_discriminant_multiclass():
    rng = np.random.default_rng(3)
    n = 300
    labels = rng.integers(0, 3, n)
    probs = rng.dirichlet([1, 1, 1], n)
    sample = {"m": rng.uniform(0, 1, n)}
    s2, l2, disc = discriminant(sample, labels, probs, sig_list=[0], bkg="bkg")
    assert set(np.unique(l2)) <= {0, 1}
    assert np.all((disc >= 0) & (disc <= 1))


def test_multi_cuts_grid(trained):
    cfg, params, x, y, _ = trained
    probs = predict_classifier(params, cfg, {"s": x[1500:]})
    rates = multi_cuts(y[1500:], probs, step=0.25)
    assert rates.shape[1] == 3  # per-class efficiencies + combined bkg
    # sorted by descending signal efficiency
    assert np.all(np.diff(rates[:, 0]) <= 1e-9)


def test_streaming_training_matches_quality():
    from atlasvae.train.jetid_loop import train_classifier_streaming
    cfg = JetIDConfig(n_classes=2, scalars=("s",), scalar_dims=(10,), nn_type="FCN",
                      fcn_neurons=(32, 16), dropout=0.0)
    x, y = _toy_classes()
    params = init_jetid(jax.random.PRNGKey(5), cfg)

    def loads():
        for lo, hi in [(0, 750), (750, 1500)]:
            yield {"s": x[lo:hi]}, y[lo:hi], None

    params, hist = train_classifier_streaming(
        params, cfg, loads, {"s": x[1500:]}, y[1500:], epochs=8,
        batch_size=250, lr=1e-3, verbose=False)
    probs = predict_classifier(params, cfg, {"s": x[1500:]})
    assert valid_accuracy(y[1500:], probs) > 0.9
    assert hist["val_loss"][-1] <= hist["val_loss"][0]


def test_cnn_on_constituent_images(synth_dir):
    """End-to-end CNN jet-ID on device-built calorimeter-style images."""
    from atlasvae.data import load_data, constituent_images
    from atlasvae.train.jetid_loop import train_classifier
    qcd = load_data("QCD-Geneva", 1500, n_const=20, n_dims=4,
                    constituents="ON", hlvs="OFF", verbose=False)
    top = load_data("top-Geneva", 1500, n_const=20, n_dims=4,
                    constituents="ON", hlvs="OFF", verbose=False)
    imgs = np.concatenate([constituent_images(qcd["constituents"], 12),
                           constituent_images(top["constituents"], 12)])
    y = np.concatenate([np.ones(len(qcd["constituents"]), int),
                        np.zeros(len(top["constituents"]), int)])
    rng = np.random.default_rng(0)
    perm = rng.permutation(len(y))
    imgs, y = imgs[perm].astype(np.float32), y[perm]
    # normalize images
    imgs /= max(imgs.max(), 1e-6)
    n_train = 2000
    cfg = JetIDConfig(n_classes=2, images=("img",), image_shapes=((12, 12),),
                      nn_type="CNN", cnn_maps=(8, 8), fcn_neurons=(32,),
                      dropout=0.0)
    params = init_jetid(jax.random.PRNGKey(0), cfg)
    params, hist = train_classifier(params, cfg, {"img": imgs[:n_train]},
                                    y[:n_train], {"img": imgs[n_train:]},
                                    y[n_train:], epochs=8, batch_size=250,
                                    lr=1e-3, verbose=False)
    probs = predict_classifier(params, cfg, {"img": imgs[n_train:]})
    acc = valid_accuracy(y[n_train:], probs)
    # images alone separate top from QCD, clearly above the 0.5 chance
    # level.  Margin note: XLA:CPU threaded reductions are not bitwise
    # deterministic run-to-run, and 8 training epochs amplify the jitter
    # to ~+-2% accuracy on the 1000-event validation split, so the bound
    # is 0.55, not the typical ~0.60 outcome.
    assert acc > 0.55, acc


def test_mixed_precision_bf16():
    """compute_dtype='bfloat16' (the TPU analog of the reference's
    mixed_float16 policy, ref jet-ID/models.py:74-75): float32 master
    weights, bf16 branch compute, float32 softmax.  Forward agrees with
    f32 to bf16 tolerance and a CNN+scalars model still trains."""
    import dataclasses
    from atlasvae.models import jetid_apply
    from atlasvae.train.jetid_loop import train_classifier

    rng = np.random.default_rng(5)
    n = 800
    imgs = rng.random((n, 8, 8)).astype(np.float32)
    hlv = rng.normal(size=(n, 6)).astype(np.float32)
    y = (hlv[:, 0] + imgs.sum((1, 2)) * 0.2 > 0.6).astype(int)
    cfg32 = JetIDConfig(n_classes=2, scalars=("HLVs",), scalar_dims=(6,),
                        images=("img",), image_shapes=((8, 8),),
                        nn_type="CNN", cnn_maps=(4, 4), fcn_neurons=(16,),
                        branch_neurons=(16,), dropout=0.0)
    cfg16 = dataclasses.replace(cfg32, compute_dtype="bfloat16")
    params = init_jetid(jax.random.PRNGKey(0), cfg32)
    inputs = {"img": imgs, "HLVs": hlv}

    p32 = np.asarray(jax.jit(lambda p, x: jetid_apply(p, cfg32, x))(params, inputs))
    p16 = np.asarray(jax.jit(lambda p, x: jetid_apply(p, cfg16, x))(params, inputs))
    assert p16.dtype == np.float32          # softmax stays f32
    np.testing.assert_allclose(p16, p32, atol=0.04)

    trained, hist = train_classifier(params, cfg16, inputs, y,
                                     inputs, y, epochs=6, batch_size=200,
                                     lr=1e-3, verbose=False)
    assert hist["loss"][-1] < hist["loss"][0]
    # master weights stay float32
    assert all(a.dtype == np.float32 for a in jax.tree.leaves(trained))


def test_classifier_state_resume_bit_exact(tmp_path):
    """state_file resume of the classifier: 2+2 epochs equal 4 straight
    epochs bit-for-bit, including Adam moments, callback counters, and
    the dropout RNG stream."""
    from atlasvae.train.jetid_loop import train_classifier
    rng = np.random.default_rng(9)
    n = 600
    hlv = rng.normal(size=(n, 6)).astype(np.float32)
    y = (hlv[:, 0] > 0).astype(int)
    cfg = JetIDConfig(n_classes=2, scalars=("HLVs",), scalar_dims=(6,),
                      fcn_neurons=(16,), branch_neurons=(16,), dropout=0.1)
    params = init_jetid(jax.random.PRNGKey(0), cfg)
    inputs = {"HLVs": hlv}
    kw = dict(batch_size=200, lr=1e-3, verbose=False)

    p4, h4 = train_classifier(params, cfg, inputs, y, inputs, y, epochs=4, **kw)

    state = str(tmp_path / "cls_state.npz")
    train_classifier(params, cfg, inputs, y, inputs, y, epochs=2,
                     state_file=state, **kw)
    p22, h22 = train_classifier(params, cfg, inputs, y, inputs, y, epochs=2,
                                state_file=state, **kw)
    assert h22["val_loss"] == h4["val_loss"][2:]
    for a, b in zip(jax.tree.leaves(p4), jax.tree.leaves(p22)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_feature_removal_vmapped_matches_sequential():
    """Vmapped feature-ablation (all F+1 lanes in one program) must
    reproduce the sequential ranking: the informative feature's removal
    hurts most, and per-feature accuracy drops agree."""
    from atlasvae.eval.jetid_eval import feature_removal
    rng = np.random.default_rng(5)
    n, dim = 1200, 4
    # feature 2 carries (almost) all the signal; others are noise
    y = rng.integers(0, 2, n)
    x = rng.normal(0, 1, (n, dim)).astype(np.float32)
    x[:, 2] += (2.5 * (1 - 2 * y)).astype(np.float32)
    cfg = JetIDConfig(n_classes=2, scalars=("s",), scalar_dims=(dim,),
                      nn_type="FCN", fcn_neurons=(16,), dropout=0.0)
    names = [f"f{i}" for i in range(dim)]
    kw = dict(epochs=6, batch_size=200, lr=3e-3)
    common = (cfg, {"s": x[:900]}, y[:900], {"s": x[900:]}, y[900:], names)
    init = lambda i: init_jetid(jax.random.PRNGKey(i), cfg)
    seq = feature_removal(*common, init_fn=init, **kw)
    vm = feature_removal(*common, init_fn=init, vmapped=True, **kw)
    assert max(vm, key=vm.get) == max(seq, key=seq.get) == "f2"
    assert vm["f2"] > 0.2
    for f in names:
        assert abs(vm[f] - seq[f]) < 0.05, (f, vm[f], seq[f])


def test_dropout_per_trunk_layer():
    """The reference repeats Dropout after EVERY branch/trunk dense
    (ref jet-ID/models.py:44-46,63-65): with identity 2-layer stacks the
    masks compound, so the zero fraction approaches 1-(1-r)^2, not the
    single-mask r."""
    import jax
    import numpy as np
    from atlasvae.models.jetid import _dense_stack

    dim, n, rate = 64, 512, 0.5
    eye = {"w": np.eye(dim, dtype=np.float32), "b": np.zeros(dim, np.float32)}
    x = np.ones((n, dim), np.float32)
    out = np.asarray(_dense_stack([eye, eye], x, rate,
                                  jax.random.PRNGKey(0), 303, True))
    zero_frac = float((out == 0).mean())
    assert 0.70 < zero_frac < 0.80, zero_frac   # two masks: ~0.75, not ~0.5
    # eval mode: dropout is a no-op and the stack is plain dense+relu
    ev = np.asarray(_dense_stack([eye, eye], x, rate,
                                 jax.random.PRNGKey(0), 303, False))
    np.testing.assert_array_equal(ev, x)


@pytest.mark.parametrize("nn_type", ["FCN", "CNN"])
def test_jetid_dp_matches_single_device(nn_type):
    """shard_map DP (the MirroredStrategy replacement,
    ref jet-ID/models.py:69-81): an epoch trained over an 8-device
    'data' mesh reproduces the single-device epoch (dropout 0 so the
    per-replica RNG fold is inert; f32 reduction-order tolerance).
    CNN mode also exercises the P(None, 'data') spec prefix over the
    4-D image leaves of the inputs dict."""
    import jax
    from atlasvae.parallel.mesh import make_mesh
    from atlasvae.train.jetid_loop import make_jetid_step_fns, _pack
    from atlasvae.train.step import make_optimizer

    rng = np.random.default_rng(11)
    n, dim = 512, 6
    y = rng.integers(0, 2, n).astype(np.int64)
    x = rng.normal(0, 1, (n, dim)).astype(np.float32)
    x[:, 1] += (1.5 * (1 - 2 * y)).astype(np.float32)
    inputs = {"s": x}
    kw = dict(n_classes=2, scalars=("s",), scalar_dims=(dim,),
              nn_type=nn_type, fcn_neurons=(16, 8), dropout=0.0, l2=1e-4)
    if nn_type == "CNN":
        inputs["img"] = rng.normal(size=(n, 12, 10)).astype(np.float32)
        kw.update(images=("img",), image_shapes=((12, 10),),
                  branch_neurons=(8,), cnn_maps=(4, 4),
                  cnn_kernels=((3, 3), (3, 3)), cnn_pools=((2, 2), (2, 2)))
    cfg = JetIDConfig(**kw)
    params = init_jetid(jax.random.PRNGKey(0), cfg)
    opt = make_optimizer()
    batches = _pack(inputs, y, np.ones(n, np.float32), 64)

    mesh = make_mesh((("data", 8),), jax.devices()[:8])
    t1, e1 = make_jetid_step_fns(opt, cfg)
    t8, e8 = make_jetid_step_fns(opt, cfg, mesh=mesh)
    key = jax.random.PRNGKey(3)
    lr = np.float32(1e-3)
    p1, _, m1 = t1(params, opt.init(params), lr, key, *batches)
    p8, _, m8 = t8(params, opt.init(params), lr, key, *batches)
    np.testing.assert_allclose(np.asarray(m1), np.asarray(m8),
                               rtol=2e-5, atol=2e-6)
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p8)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-6)
    v1, v8 = np.asarray(e1(p1, *batches)), np.asarray(e8(p1, *batches))
    np.testing.assert_allclose(v1, v8, rtol=2e-5, atol=2e-6)
    # dropout > 0 in DP: per-replica masks (MirroredStrategy semantics) —
    # still finite and trainable, just not bit-matched to 1 device
    import dataclasses
    cfg_d = dataclasses.replace(cfg, dropout=0.3)
    td, _ = make_jetid_step_fns(opt, cfg_d, mesh=mesh)
    pd = init_jetid(jax.random.PRNGKey(1), cfg_d)
    _, _, md = td(pd, opt.init(pd), lr, key, *batches)
    assert np.isfinite(np.asarray(md)).all()


def test_monitor_metric_selection():
    """--metrics semantics (ref jet-ID/classifier.py:47, models.py:94-99):
    every callback watches one named series; accuracy metrics are
    higher-is-better; unknown names raise."""
    rng = np.random.default_rng(21)
    n, dim = 600, 4
    y = rng.integers(0, 2, n).astype(np.int64)
    x = rng.normal(0, 1, (n, dim)).astype(np.float32)
    x[:, 0] += (1.5 * (1 - 2 * y)).astype(np.float32)
    cfg = JetIDConfig(n_classes=2, scalars=("s",), scalar_dims=(dim,),
                      nn_type="FCN", fcn_neurons=(8,), dropout=0.0)
    p0 = init_jetid(jax.random.PRNGKey(0), cfg)
    common = (cfg, {"s": x[:400]}, y[:400], {"s": x[400:]}, y[400:])
    _, hist = train_classifier(p0, *common, epochs=3, batch_size=100,
                               monitor="val_accuracy", verbose=False)
    assert len(hist["val_accuracy"]) == 3
    assert all(0.0 <= a <= 1.0 for a in hist["val_accuracy"])
    # the reference's default monitors TRAIN loss (classifier.py:47)
    _, hist2 = train_classifier(p0, *common, epochs=3, batch_size=100,
                                monitor="loss", verbose=False)
    assert len(hist2["loss"]) == 3
    with pytest.raises(ValueError, match="monitor"):
        train_classifier(p0, *common, epochs=1, batch_size=100,
                         monitor="val_auc", verbose=False)


def test_cli_branch_gates(tmp_path):
    """--scalars/--images/--scaling master gates
    (ref jet-ID/classifier.py:39-41,96-97,145)."""
    from atlasvae.cli.jetid import main
    base = ["--synthetic", "4000", "--n_train", "1500", "--n_valid", "800",
            "--batch_size", "500", "--n_epochs", "1", "--plotting", "OFF"]
    # scalars OFF + FCN: constituents-only model trains
    main(base + ["--scalars", "OFF",
                 "--output_dir", str(tmp_path / "noscalars")])
    # images OFF in CNN mode: branch-only model (no towers)
    main(base + ["--NN_type", "CNN", "--images", "OFF",
                 "--output_dir", str(tmp_path / "noimages")])
    # scaling OFF: no scaler pickle written
    out = tmp_path / "noscale"
    main(base + ["--scaling", "OFF", "--output_dir", str(out)])
    assert not list(out.glob("scaler_*.pkl"))
    # all branches off: clean error
    with pytest.raises(SystemExit, match="no input branches"):
        main(base + ["--scalars", "OFF", "--HLVs", "OFF",
                     "--constituents", "OFF",
                     "--output_dir", str(tmp_path / "none")])


def test_state_resume_rejects_monitor_mismatch(tmp_path):
    """A state file records which series its callbacks watched; resuming
    with a different --metrics would compare incompatible scores and is
    refused with a clean error."""
    rng = np.random.default_rng(23)
    n, dim = 300, 4
    y = rng.integers(0, 2, n).astype(np.int64)
    x = rng.normal(0, 1, (n, dim)).astype(np.float32)
    cfg = JetIDConfig(n_classes=2, scalars=("s",), scalar_dims=(dim,),
                      nn_type="FCN", fcn_neurons=(8,), dropout=0.0)
    p0 = init_jetid(jax.random.PRNGKey(0), cfg)
    sf = str(tmp_path / "state.npz")
    common = (cfg, {"s": x[:200]}, y[:200], {"s": x[200:]}, y[200:])
    train_classifier(p0, *common, epochs=1, batch_size=100,
                     monitor="val_accuracy", state_file=sf, verbose=False)
    with pytest.raises(ValueError, match="val_accuracy"):
        train_classifier(p0, *common, epochs=1, batch_size=100,
                         monitor="loss", state_file=sf, verbose=False)
    # same monitor resumes fine
    train_classifier(p0, *common, epochs=1, batch_size=100,
                     monitor="val_accuracy", state_file=sf, verbose=False)
