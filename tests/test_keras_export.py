"""Exporting atlasvae-trained weights back to Keras ``model.h5``.

The reverse migration direction of test_keras_import.py: a user trains
here, exports, and the reference's own Keras code loads the file with
``model.load_weights`` (ref OE-VAE/vae.py:101, OE-AAE/train.py:99,
jet-ID/classifier.py:167).  Two kinds of evidence:

* round trips through our own importer (no TensorFlow needed) —
  export -> ``load_keras_*`` -> identical pytree;
* golden loads: build the reference architecture in the installed
  tf.keras, ``load_weights`` our exported file positionally, and require
  forward parity with the jax apply functions.
"""

import os

import numpy as np
import pytest

import jax

from atlasvae.models import VAEConfig, init_vae
from atlasvae.models.aae import AAEConfig, init_aae
from atlasvae.train.keras_export import (export_keras_vae, export_keras_aae,
                                         export_keras_jetid)
from atlasvae.train.keras_import import (load_keras_vae, load_keras_aae,
                                         load_keras_jetid)


def _assert_tree_equal(a, b):
    ja, jb = jax.tree_util.tree_flatten(a), jax.tree_util.tree_flatten(b)
    assert ja[1] == jb[1]
    for la, lb in zip(ja[0], jb[0]):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))


# ------------------------------------------------------------ round trips

def test_vae_export_roundtrip(tmp_path):
    config = VAEConfig(fc_layers=(8, 6, 4), input_dim=12)
    params = init_vae(jax.random.PRNGKey(7), config)
    path = str(tmp_path / "model.h5")
    export_keras_vae(params, path)
    back = load_keras_vae(path, init_vae(jax.random.PRNGKey(8), config))
    _assert_tree_equal(back, jax.tree.map(np.asarray, params))


def test_aae_export_roundtrip(tmp_path):
    config = AAEConfig(input_dim=12, ae_layers=(10, 10, 5),
                       disc_layers=(7, 7, 3))
    params = init_aae(jax.random.PRNGKey(3), config)
    path = str(tmp_path / "AAE.h5")
    export_keras_aae(params, path)
    template = init_aae(jax.random.PRNGKey(4), config)
    back = load_keras_aae(path, template)
    _assert_tree_equal(back, jax.tree.map(np.asarray, params))

    # AE-only file: discriminator stays at template values, matching the
    # reference's --AE_weights resume path (ref OE-AAE/train.py:94-99)
    ae_path = str(tmp_path / "AE.h5")
    export_keras_aae(params, ae_path, include_discriminator=False)
    back2 = load_keras_aae(ae_path, template)
    _assert_tree_equal(back2["encoder"], jax.tree.map(np.asarray, params["encoder"]))
    _assert_tree_equal(back2["discriminator"],
                       jax.tree.map(np.asarray, template["discriminator"]))


def test_jetid_export_roundtrip(tmp_path):
    from atlasvae.models.jetid import JetIDConfig, init_jetid
    h, w, sdim = 13, 11, 16
    config = JetIDConfig(n_classes=2, scalars=("scalars",), scalar_dims=(sdim,),
                         images=("image",), image_shapes=((h, w),),
                         nn_type="CNN", fcn_neurons=(32,), branch_neurons=(16,),
                         cnn_maps=(8, 8), cnn_kernels=((3, 3), (3, 3)),
                         cnn_pools=((2, 2), (2, 2)), dropout=0.0)
    params = init_jetid(jax.random.PRNGKey(5), config)
    path = str(tmp_path / "model.h5")
    export_keras_jetid(params, path)
    back = load_keras_jetid(path, init_jetid(jax.random.PRNGKey(6), config))
    _assert_tree_equal(back, jax.tree.map(np.asarray, params))


def test_vae_cli_h5_model_out_exports_keras(tmp_path):
    """Reference-style ``--model_out model.h5`` (the reference default,
    ref OE-VAE/vae.py:22): the run ends with a Keras-loadable HDF5 at
    that path, and a follow-up run resumes from it via --model_in."""
    from atlasvae.cli.vae import main
    out = str(tmp_path / "vae")
    tiny = ["--synthetic", "3000", "--n_train", "800", "--n_valid", "400",
            "--batch_size", "200", "--plotting", "OFF", "--n_OoD", "800",
            "--OE_type", "MAE", "--n_epochs", "2", "--output_dir", out,
            "--model_out", "model.h5"]
    main(tiny)
    path = os.path.join(out, "model.h5")
    assert os.path.isfile(path)
    with open(path, "rb") as f:
        assert f.read(4) == b"\x89HDF"  # Keras format, not staged npz
    config = VAEConfig(fc_layers=(80, 40, 20, 10), input_dim=12)
    load_keras_vae(path, init_vae(jax.random.PRNGKey(0), config))
    # resume: --model_in model.h5 goes through the magic-byte sniffer
    # (a bad load raises inside _load_model_in before the early return)
    out2 = str(tmp_path / "vae2")
    main(tiny[:-4] + ["--n_epochs", "0", "--output_dir", out2,
                      "--model_in", path])


# ------------------------------------------------------------ golden loads

def test_reference_vae_loads_export(tmp_path):
    """The reference VAE architecture (subclassed encoder/decoder,
    ref OE-VAE/models.py:18-69) built in the installed tf.keras loads
    our exported file positionally and reproduces the jax forward."""
    pytest.importorskip("tensorflow")
    from tensorflow.keras import layers, models

    fc, input_dim = [8, 6, 4], 12

    class Encoder(layers.Layer):
        def __init__(self, **kw):
            super().__init__(name="encoder", **kw)
            self.denses = [layers.Dense(n, activation="relu") for n in fc[:-1]]
            self.dense_mean = layers.Dense(fc[-1])
            self.dense_log_var = layers.Dense(fc[-1])

        def call(self, x):
            for d in self.denses:
                x = d(x)
            return self.dense_mean(x), self.dense_log_var(x)

    class Decoder(layers.Layer):
        def __init__(self, **kw):
            super().__init__(name="decoder", **kw)
            self.denses = [layers.Dense(n, activation="relu")
                           for n in fc[:-1][::-1]]
            self.dense_output = layers.Dense(input_dim)

        def call(self, x):
            for d in self.denses:
                x = d(x)
            return self.dense_output(x)

    class VAE(models.Model):
        def __init__(self, **kw):
            super().__init__(name="autoencoder", **kw)
            self.encoder = Encoder()
            self.decoder = Decoder()

        def call(self, x):
            z_mean, z_log_var = self.encoder(x)
            return self.decoder(z_mean), z_log_var

    config = VAEConfig(fc_layers=tuple(fc), input_dim=input_dim)
    params = init_vae(jax.random.PRNGKey(11), config)
    path = str(tmp_path / "model.h5")
    export_keras_vae(params, path)

    rng = np.random.default_rng(0)
    x = rng.normal(size=(32, input_dim)).astype(np.float32)
    model = VAE()
    model(x)  # build variables
    model.load_weights(path)
    tf_recon, tf_log_var = model(x)

    from atlasvae.models.vae import encode, decode
    z_mean, z_log_var = encode(params, x)
    ours = decode(params, np.asarray(z_mean))
    np.testing.assert_allclose(np.asarray(ours), np.asarray(tf_recon),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(z_log_var), np.asarray(tf_log_var),
                               rtol=1e-5, atol=1e-5)


def test_reference_aae_loads_export(tmp_path):
    """The reference AAE functional triple (ref OE-AAE/aae.py:20-116,
    minus compile) loads our exported AAE.h5 positionally."""
    pytest.importorskip("tensorflow")
    from tensorflow.keras import layers, models

    input_dim, ae_layers, disc_layers = 12, [10, 10, 5], [7, 7, 3]

    def encoder_model():
        inp = layers.Input(shape=(input_dim,))
        x = inp
        for size in ae_layers[:-1]:
            x = layers.Dense(size)(x)
            x = layers.Activation("relu")(x)
        out = layers.Dense(ae_layers[-1], activation="relu")(x)
        return models.Model(inputs=inp, outputs=out, name="ENCODER")

    def decoder_model():
        inp = layers.Input(shape=(ae_layers[-1],))
        x = inp
        for size in ae_layers[:-1][::-1]:
            x = layers.Dense(size)(x)
            x = layers.Activation("relu")(x)
        out = layers.Dense(input_dim, activation="relu")(x)
        return models.Model(inputs=inp, outputs=out, name="DECODER")

    def discriminator_model():
        inp = layers.Input(shape=(input_dim,))
        x = inp
        for size in disc_layers[:-1]:
            x = layers.Dense(size)(x)
            x = layers.Activation("relu")(x)
        out = layers.Dense(disc_layers[-1], activation="softmax")(x)
        return models.Model(inputs=inp, outputs=out, name="DISCRIMINATOR")

    autoencoder = models.Sequential([encoder_model(), decoder_model()],
                                    name="AUTOENCODER")
    discriminator = discriminator_model()
    discriminator.trainable = False
    b_in, o_in, a_in = (layers.Input(shape=(input_dim,)) for _ in range(3))
    aae = models.Model(
        [b_in, o_in, a_in],
        [autoencoder(b_in), autoencoder(o_in), discriminator(autoencoder(a_in))],
        name="AAE")

    config = AAEConfig(input_dim=input_dim, ae_layers=tuple(ae_layers),
                       disc_layers=tuple(disc_layers))
    params = init_aae(jax.random.PRNGKey(13), config)
    path = str(tmp_path / "AAE.h5")
    export_keras_aae(params, path)

    rng = np.random.default_rng(1)
    x = rng.normal(size=(16, input_dim)).astype(np.float32)
    aae([x, x, x])  # build
    aae.load_weights(path)
    tf_recon, _, tf_probs = aae([x, x, x])

    from atlasvae.models.aae import ae_apply, discriminator_apply
    ours_recon = np.asarray(ae_apply(params, x))
    ours_probs = np.asarray(discriminator_apply(params, ours_recon))
    np.testing.assert_allclose(ours_recon, np.asarray(tf_recon),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(ours_probs, np.asarray(tf_probs),
                               rtol=1e-5, atol=1e-5)


def test_reference_jetid_loads_export(tmp_path):
    """The reference jet-ID functional graph (single conv tower +
    scalars branch + trunk + head, ref jet-ID/models.py:9-66) loads our
    exported file positionally and reproduces the jax forward."""
    pytest.importorskip("tensorflow")
    from tensorflow.keras import layers, models
    from atlasvae.models.jetid import JetIDConfig, init_jetid, jetid_apply

    h, w, sdim = 13, 11, 16
    img_in = layers.Input(shape=(h, w), name="image")
    sc_in = layers.Input(shape=(sdim,), name="scalars")
    x = layers.Reshape((h, w, 1))(img_in)
    for _ in range(2):
        x = layers.Conv2D(8, (3, 3))(x)
        x = layers.MaxPooling2D((2, 2), padding="same")(x)
        x = layers.LeakyReLU(negative_slope=0.0)(x)
    tower = layers.Flatten()(x)
    s = layers.Dense(16)(layers.Flatten()(sc_in))
    s = layers.LeakyReLU(negative_slope=0.0)(s)
    cat = layers.concatenate([tower, s])
    t = layers.Dense(32)(cat)
    t = layers.LeakyReLU(negative_slope=0.0)(t)
    out = layers.Dense(2, activation="softmax")(t)
    model = models.Model(inputs=[img_in, sc_in], outputs=out)

    config = JetIDConfig(n_classes=2, scalars=("scalars",), scalar_dims=(sdim,),
                         images=("image",), image_shapes=((h, w),),
                         nn_type="CNN", fcn_neurons=(32,), branch_neurons=(16,),
                         cnn_maps=(8, 8), cnn_kernels=((3, 3), (3, 3)),
                         cnn_pools=((2, 2), (2, 2)), dropout=0.0)
    params = init_jetid(jax.random.PRNGKey(17), config)
    path = str(tmp_path / "model.h5")
    export_keras_jetid(params, path)
    model.load_weights(path)

    rng = np.random.default_rng(2)
    xi = rng.normal(size=(8, h, w)).astype(np.float32)
    xs = rng.normal(size=(8, sdim)).astype(np.float32)
    tf_out = np.asarray(model([xi, xs]))
    ours = np.asarray(jetid_apply(params, config, {"image": xi, "scalars": xs},
                                  train=False))
    np.testing.assert_allclose(ours, tf_out, rtol=1e-5, atol=1e-5)


# --------------------------------------------- multi-image concat layouts

def _multitower_config():
    """Two tower shapes whose Python-``set`` iteration order differs from
    first-appearance order (int-tuple hashes are process-independent, so
    this is stable), plus a same-shape image pair, constituents and
    scalars branches: exercises both the depth interleave and the
    concat-layout permutation."""
    from atlasvae.models.jetid import JetIDConfig
    return JetIDConfig(
        n_classes=2, scalars=("scalars",), scalar_dims=(16,),
        images=("img_a", "img_b", "img_c"),
        image_shapes=((13, 11), (13, 11), (9, 7)),
        constituent_dim=20, nn_type="CNN", fcn_neurons=(32,),
        branch_neurons=(16,),
        cnn_by_shape=((((13, 11)), (8, 8), ((3, 3), (3, 3)), ((2, 2), (2, 2))),
                      (((9, 7)), (6, 6), ((3, 3), (3, 3)), ((2, 2), (2, 2)))),
        dropout=0.0)


def _reference_multi_cnn(config, sample_shapes):
    """The reference ``multi_CNN`` graph (ref jet-ID/models.py:9-66):
    tower loop over ``set(shapes)``, same-shape inputs concatenated on
    axis=3, Conv/MaxPool/LeakyReLU/Dropout blocks (or Flatten-only in
    FCN mode), constituents and scalars Dense branches, trunk + softmax."""
    from tensorflow.keras import layers, models
    from atlasvae.models.jetid import _shape_cnn

    input_dict = {name: layers.Input(shape=shape, name=name)
                  for name, shape in sample_shapes.items()}
    shapes = [tuple(s) for s in config.image_shapes]
    by_name = dict(zip(config.images, shapes))
    output_list = []
    for shape in list(set(shapes)):                 # ref models.py:12 order
        ins = [layers.Reshape(shape + (1,))(input_dict[n])
               for n in config.images if by_name[n] == shape]
        x = layers.concatenate(ins, axis=3) if len(ins) > 1 else ins[0]
        if config.nn_type == "CNN":
            maps_list, kernels, pools, rank = _shape_cnn(config, shape)
            assert rank == 2, "test helper covers 2-D towers"
            for maps, kern, pool in zip(maps_list, kernels, pools):
                x = layers.Conv2D(maps, kern)(x)
                x = layers.MaxPooling2D(pool, padding="same")(x)
                x = layers.LeakyReLU(negative_slope=0.0)(x)
                x = layers.Dropout(config.dropout)(x)
        output_list.append(layers.Flatten()(x))
    if config.constituent_dim:
        x = layers.Flatten()(input_dict["constituents"])
        for n in config.branch_neurons:
            x = layers.Dense(n)(x)
            x = layers.LeakyReLU(negative_slope=0.0)(x)
            x = layers.Dropout(config.dropout)(x)
        output_list.append(x)
    if config.scalar_dims:
        x = layers.Flatten()(input_dict["scalars"])
        for n in config.branch_neurons:
            x = layers.Dense(n)(x)
            x = layers.LeakyReLU(negative_slope=0.0)(x)
            x = layers.Dropout(config.dropout)(x)
        output_list.append(x)
    x = layers.concatenate(output_list)
    for n in config.fcn_neurons:
        x = layers.Dense(n)(x)
        x = layers.LeakyReLU(negative_slope=0.0)(x)
        x = layers.Dropout(config.dropout)(x)
    out = layers.Dense(config.n_classes, activation="softmax",
                       dtype="float32")(x)
    model = models.Model(inputs=list(input_dict.values()), outputs=out)
    return model, list(input_dict)


def _golden_inputs(config, rng):
    shapes = {"scalars": (16,), "constituents": (20,)}
    shapes.update(zip(config.images, [tuple(s) for s in config.image_shapes]))
    return shapes, {name: rng.normal(size=(8,) + shape).astype(np.float32)
                    for name, shape in shapes.items()}


def test_reference_multitower_loads_export(tmp_path):
    """Multi-tower graph: reference tower order follows ``set`` iteration
    (differs from ours), Keras lists parallel towers interleaved by
    depth, and the trunk kernel needs the concat-layout rewrite — the
    reference model must still load our export positionally and agree."""
    pytest.importorskip("tensorflow")
    from atlasvae.models.jetid import (init_jetid, jetid_apply,
                                       reference_concat_permutation)

    config = _multitower_config()
    assert reference_concat_permutation(config) is not None  # non-trivial
    params = init_jetid(jax.random.PRNGKey(23), config)
    path = str(tmp_path / "model.h5")
    export_keras_jetid(params, path, config)

    rng = np.random.default_rng(3)
    sample_shapes, inputs = _golden_inputs(config, rng)
    model, names = _reference_multi_cnn(config, sample_shapes)
    model.load_weights(path)
    tf_out = np.asarray(model([inputs[n] for n in names]))
    ours = np.asarray(jetid_apply(params, config, inputs, train=False))
    np.testing.assert_allclose(ours, tf_out, rtol=1e-5, atol=1e-5)


def test_reference_fcn_images_loads_export(tmp_path):
    """FCN mode with same-shape image pairs: the reference stacks them
    channel-last and flattens pixel-major (ref jet-ID/models.py:16-17,38)
    while our apply concatenates image-major — the export's trunk-kernel
    row permutation must bridge the two layouts exactly."""
    pytest.importorskip("tensorflow")
    from atlasvae.models.jetid import (JetIDConfig, init_jetid, jetid_apply,
                                       reference_concat_permutation)

    config = JetIDConfig(
        n_classes=2, scalars=("scalars",), scalar_dims=(16,),
        images=("img_a", "img_b"), image_shapes=((5, 4), (5, 4)),
        nn_type="FCN", fcn_neurons=(24,), branch_neurons=(16,), dropout=0.0)
    assert reference_concat_permutation(config) is not None
    params = init_jetid(jax.random.PRNGKey(29), config)
    path = str(tmp_path / "model.h5")
    export_keras_jetid(params, path, config)

    rng = np.random.default_rng(4)
    sample_shapes, inputs = _golden_inputs(config, rng)
    del sample_shapes["constituents"], inputs["constituents"]
    model, names = _reference_multi_cnn(config, sample_shapes)
    model.load_weights(path)
    tf_out = np.asarray(model([inputs[n] for n in names]))
    ours = np.asarray(jetid_apply(params, config, inputs, train=False))
    np.testing.assert_allclose(ours, tf_out, rtol=1e-5, atol=1e-5)


def test_multitower_export_import_roundtrip(tmp_path):
    """Export with the layout rewrite, import with the inverse: the
    original pytree comes back bit-for-bit even though the on-disk trunk
    kernel is row-permuted."""
    from atlasvae.models.jetid import init_jetid
    config = _multitower_config()
    params = init_jetid(jax.random.PRNGKey(31), config)
    path = str(tmp_path / "model.h5")
    export_keras_jetid(params, path, config)
    template = init_jetid(jax.random.PRNGKey(32), config)
    back = load_keras_jetid(path, template, config)
    _assert_tree_equal(back, jax.tree.map(np.asarray, params))
    # without config the trunk kernel stays in the file's (reference)
    # layout — everything else still lands on the right layers
    naive = load_keras_jetid(path, template)
    assert not np.array_equal(np.asarray(naive["head"][0]["w"]),
                              np.asarray(params["head"][0]["w"]))
    _assert_tree_equal(naive["out"], jax.tree.map(np.asarray, params["out"]))


def test_reference_conv3d_multitower_loads_export(tmp_path):
    """Mixed-rank towers: a Conv3D tower over two same-shape images
    stacked on the depth axis (ref jet-ID/models.py:23-27 selects 3-D
    when every kernel has >=3 entries, :24 Reshape(...+(1,))) next to a
    Conv2D tower — positional load + forward parity."""
    pytest.importorskip("tensorflow")
    from tensorflow.keras import layers, models
    from atlasvae.models.jetid import (JetIDConfig, init_jetid, jetid_apply,
                                       _shape_cnn)

    config = JetIDConfig(
        n_classes=3, scalars=("scalars",), scalar_dims=(16,),
        images=("img_a", "img_b", "img_c"),
        image_shapes=((8, 7), (8, 7), (13, 11)),
        nn_type="CNN", fcn_neurons=(32, 24), branch_neurons=(16,),
        cnn_by_shape=(
            # 3-D tower: both kernels have 3 entries (ref rank rule)
            ((8, 7), (6, 6), ((2, 2, 2), (2, 2, 1)), ((2, 2, 1), (2, 2, 1))),
            ((13, 11), (8, 8), ((3, 3), (3, 3)), ((2, 2), (2, 2)))),
        dropout=0.0)
    params = init_jetid(jax.random.PRNGKey(37), config)
    path = str(tmp_path / "model.h5")
    export_keras_jetid(params, path, config)

    shapes = [tuple(s) for s in config.image_shapes]
    by_name = dict(zip(config.images, shapes))
    input_dict = {n: layers.Input(shape=by_name[n], name=n)
                  for n in config.images}
    input_dict["scalars"] = layers.Input(shape=(16,), name="scalars")
    output_list = []
    for shape in list(set(shapes)):                 # ref models.py:12 order
        ins = [layers.Reshape(shape + (1,))(input_dict[n])
               for n in config.images if by_name[n] == shape]
        x = layers.concatenate(ins, axis=3) if len(ins) > 1 else ins[0]
        maps_list, kernels, pools, rank = _shape_cnn(config, shape)
        if rank == 3:                               # ref models.py:24
            x = layers.Reshape(tuple(x.shape[1:]) + (1,))(x)
        conv = {2: layers.Conv2D, 3: layers.Conv3D}[rank]
        pool = {2: layers.MaxPooling2D, 3: layers.MaxPooling3D}[rank]
        for maps, kern, p in zip(maps_list, kernels, pools):
            x = conv(maps, kern)(x)
            x = pool(p, padding="same")(x)
            x = layers.LeakyReLU(negative_slope=0.0)(x)
            x = layers.Dropout(config.dropout)(x)
        output_list.append(layers.Flatten()(x))
    s = layers.Flatten()(input_dict["scalars"])
    for n in config.branch_neurons:
        s = layers.Dense(n)(s)
        s = layers.LeakyReLU(negative_slope=0.0)(s)
        s = layers.Dropout(config.dropout)(s)
    output_list.append(s)
    x = layers.concatenate(output_list)
    for n in config.fcn_neurons:
        x = layers.Dense(n)(x)
        x = layers.LeakyReLU(negative_slope=0.0)(x)
        x = layers.Dropout(config.dropout)(x)
    out = layers.Dense(3, activation="softmax", dtype="float32")(x)
    model = models.Model(inputs=list(input_dict.values()), outputs=out)
    model.load_weights(path)

    rng = np.random.default_rng(5)
    inputs = {n: rng.normal(size=(8,) + by_name[n]).astype(np.float32)
              for n in config.images}
    inputs["scalars"] = rng.normal(size=(8, 16)).astype(np.float32)
    tf_out = np.asarray(model([inputs[n] for n in
                               list(config.images) + ["scalars"]]))
    ours = np.asarray(jetid_apply(params, config, inputs, train=False))
    np.testing.assert_allclose(ours, tf_out, rtol=1e-5, atol=1e-5)


def test_concat_permutation_properties():
    """reference_concat_permutation over random multi-image configs:
    always a bijection of the trunk input positions, identity exactly
    when tower set-order matches appearance order (CNN) or every shape
    is singleton (FCN), and consistent with init_jetid's concat width."""
    from atlasvae.models.jetid import (JetIDConfig, init_jetid,
                                       concat_segments,
                                       reference_concat_permutation)
    rng = np.random.default_rng(7)
    for trial in range(30):
        n_imgs = int(rng.integers(1, 5))
        pool = [(int(rng.integers(6, 14)), int(rng.integers(6, 14)))
                for _ in range(int(rng.integers(1, 3)))]
        shapes = [pool[int(rng.integers(len(pool)))] for _ in range(n_imgs)]
        nn_type = "CNN" if rng.random() < 0.5 else "FCN"
        with_scalars = rng.random() < 0.7
        config = JetIDConfig(
            n_classes=2,
            scalars=("scalars",) if with_scalars else (),
            scalar_dims=(8,) if with_scalars else (),
            images=tuple(f"img{i}" for i in range(n_imgs)),
            image_shapes=tuple(shapes),
            constituent_dim=12 if rng.random() < 0.5 else 0,
            nn_type=nn_type, fcn_neurons=(8,), branch_neurons=(8,),
            cnn_maps=(4,), cnn_kernels=((3, 3),), cnn_pools=((2, 2),),
            dropout=0.0)
        width = sum(w for _, w in concat_segments(config))
        params = init_jetid(jax.random.PRNGKey(trial), config)
        assert params["head"][0]["w"].shape[0] == width
        perm = reference_concat_permutation(config)
        # identity (perm is None) exactly when the reference's
        # set(shapes) tower order matches first-appearance order and —
        # in FCN mode, where the reference pixel-interleaves same-shape
        # images — every shape group is a singleton
        shapes_t = [tuple(s) for s in shapes]
        orders_agree = list(set(shapes_t)) == list(dict.fromkeys(shapes_t))
        singletons = all(shapes_t.count(s) == 1 for s in set(shapes_t))
        identity = orders_agree and (nn_type == "CNN" or singletons)
        assert (perm is None) == identity, (trial, shapes_t, nn_type)
        if perm is None:
            continue
        assert sorted(perm.tolist()) == list(range(width))  # bijection
        assert not np.array_equal(perm, np.arange(width))   # non-trivial
