"""Importing reference-trained Keras model.h5 weights.

The reference checkpoints models with ``save_weights`` to HDF5
(ref OE-VAE/models.py:227, OE-AAE/train.py:142); migrating users hand
those files to ``--model_in``.  Three directions are covered:

* a REAL Keras-written file (Keras 3 ``.weights.h5``, the format the
  installed tf.keras produces) imported and checked by *forward parity*
  against tf.keras on the same inputs;
* a Keras 2 legacy ``model.h5`` assembled from the format spec
  (root ``layer_names`` attr + per-layer ``weight_names``) — the layout
  the reference's TF 2.x actually wrote — checked leaf-by-leaf;
* error paths: architecture mismatch must raise a shape error naming
  the layer, not scatter weights silently.
"""

import numpy as np
import pytest

import jax

from atlasvae.models import VAEConfig, init_vae
from atlasvae.models.aae import AAEConfig, init_aae
from atlasvae.train.keras_import import (load_keras_vae, load_keras_aae,
                                         read_keras_weights)


def _relu(x):
    return np.maximum(x, 0.0)


def _forward_vae_numpy(pairs, x):
    """kernel/bias list -> deterministic encoder-mean + decoder pass."""
    (enc, mean, dec, out) = pairs
    h = x
    for w, b in enc:
        h = _relu(h @ w + b)
    z = h @ mean[0] + mean[1]
    h = z
    for w, b in dec:
        h = _relu(h @ w + b)
    return h @ out[0] + out[1]


def test_real_keras_vae_weights_import(tmp_path):
    """Build the reference VAE architecture in the installed tf.keras
    (ref OE-VAE/models.py:18-69 layer naming), save real weights, import,
    and require forward parity between tf and the jax pytree."""
    tf = pytest.importorskip("tensorflow")
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
            z_mean, _ = self.encoder(x)
            return self.decoder(z_mean)

    rng = np.random.default_rng(0)
    x = rng.normal(size=(32, input_dim)).astype(np.float32)
    model = VAE()
    ref_out = np.asarray(model(x))  # builds + deterministic fwd (mean path)
    path = str(tmp_path / "model.weights.h5")
    model.save_weights(path)

    config = VAEConfig(fc_layers=tuple(fc), input_dim=input_dim)
    template = init_vae(jax.random.PRNGKey(0), config)
    params = load_keras_vae(path, template)

    from atlasvae.models.vae import encode, decode
    z_mean, z_log_var = encode(params, x)
    ours = np.asarray(decode(params, np.asarray(z_mean)))
    np.testing.assert_allclose(ours, ref_out, rtol=1e-5, atol=1e-5)
    # log-var head must be the *other* keras head, not a copy of mean
    tf_log_var = np.asarray(model.encoder.dense_log_var(
        model.encoder.denses[1](model.encoder.denses[0](x))))
    np.testing.assert_allclose(np.asarray(z_log_var), tf_log_var,
                               rtol=1e-5, atol=1e-5)


def _write_keras2_file(path, layer_weights):
    """Assemble a legacy Keras-2 save_weights HDF5 from the spec:
    root attr ``layer_names``; per-layer group with ``weight_names``
    attr listing ``<path>/kernel:0`` entries and datasets at those
    paths (what the reference's TF 2.x wrote for model.h5)."""
    import h5py
    with h5py.File(path, "w") as f:
        f.attrs["layer_names"] = np.array(
            [name.encode() for name in layer_weights], dtype="S64")
        f.attrs["backend"] = b"tensorflow"
        f.attrs["keras_version"] = b"2.11.0"
        for layer, weights in layer_weights.items():
            g = f.create_group(layer)
            g.attrs["weight_names"] = np.array(
                [n.encode() for n, _ in weights], dtype="S128")
            for name, arr in weights:
                g.create_dataset(name, data=arr)


def _dense(rng, din, dout):
    return (rng.normal(size=(din, dout)).astype(np.float32),
            rng.normal(size=(dout,)).astype(np.float32))


def test_keras2_legacy_vae_file(tmp_path):
    """Spec-assembled Keras-2 model.h5 (global dense numbering continuing
    across encoder->decoder, as Keras auto-names) maps onto the right
    pytree leaves."""
    rng = np.random.default_rng(1)
    fc, input_dim = [8, 6, 4], 12
    e0, e1 = _dense(rng, 12, 8), _dense(rng, 8, 6)
    mean, logvar = _dense(rng, 6, 4), _dense(rng, 6, 4)
    d0, d1 = _dense(rng, 4, 6), _dense(rng, 6, 8)
    out = _dense(rng, 8, 12)

    def wpair(prefix, wb):
        return [(f"{prefix}/kernel:0", wb[0]), (f"{prefix}/bias:0", wb[1])]

    path = str(tmp_path / "model.h5")
    _write_keras2_file(path, {
        "encoder": (wpair("autoencoder/encoder/dense", e0)
                    + wpair("autoencoder/encoder/dense_1", e1)
                    + wpair("autoencoder/encoder/dense_mean", mean)
                    + wpair("autoencoder/encoder/dense_log_var", logvar)),
        "decoder": (wpair("autoencoder/decoder/dense_2", d0)
                    + wpair("autoencoder/decoder/dense_3", d1)
                    + wpair("autoencoder/decoder/dense_output", out)),
    })

    config = VAEConfig(fc_layers=tuple(fc), input_dim=input_dim)
    template = init_vae(jax.random.PRNGKey(0), config)
    params = load_keras_vae(path, template)
    np.testing.assert_array_equal(params["encoder"]["hidden"][0]["w"], e0[0])
    np.testing.assert_array_equal(params["encoder"]["hidden"][1]["b"], e1[1])
    np.testing.assert_array_equal(params["encoder"]["mean"]["w"], mean[0])
    np.testing.assert_array_equal(params["encoder"]["logvar"]["b"], logvar[1])
    np.testing.assert_array_equal(params["decoder"]["hidden"][0]["w"], d0[0])
    np.testing.assert_array_equal(params["decoder"]["hidden"][1]["w"], d1[0])
    np.testing.assert_array_equal(params["decoder"]["out"]["b"], out[1])

    # round-trip sanity on the normalizer itself
    named = read_keras_weights(path)
    assert "autoencoder/encoder/dense_mean/kernel" in named


def test_keras2_legacy_aae_file(tmp_path):
    """Combined AAE.h5 (ENCODER + DECODER + DISCRIMINATOR functional
    components, ref OE-AAE/aae.py:20-58): last dense per component is
    the output layer; AE-only files leave the discriminator at template
    values (resume path, ref OE-AAE/train.py:94-99)."""
    rng = np.random.default_rng(2)
    e0, e1, ez = _dense(rng, 12, 10), _dense(rng, 10, 10), _dense(rng, 10, 5)
    d0, d1, dx = _dense(rng, 5, 10), _dense(rng, 10, 10), _dense(rng, 10, 12)
    c0, c1, cz = _dense(rng, 12, 7), _dense(rng, 7, 7), _dense(rng, 7, 3)

    def wpair(prefix, wb):
        return [(f"{prefix}/kernel:0", wb[0]), (f"{prefix}/bias:0", wb[1])]

    enc = (wpair("ENCODER/dense", e0) + wpair("ENCODER/dense_1", e1)
           + wpair("ENCODER/dense_2", ez))
    dec = (wpair("DECODER/dense_3", d0) + wpair("DECODER/dense_4", d1)
           + wpair("DECODER/dense_5", dx))
    disc = (wpair("DISCRIMINATOR/dense_6", c0)
            + wpair("DISCRIMINATOR/dense_7", c1)
            + wpair("DISCRIMINATOR/dense_8", cz))

    config = AAEConfig(input_dim=12, ae_layers=(10, 10, 5),
                       disc_layers=(7, 7, 3))
    template = init_aae(jax.random.PRNGKey(0), config)

    full = str(tmp_path / "AAE.h5")
    _write_keras2_file(full, {"AUTOENCODER": enc + dec,
                              "DISCRIMINATOR": disc})
    params = load_keras_aae(full, template)
    np.testing.assert_array_equal(params["encoder"]["hidden"][0]["w"], e0[0])
    np.testing.assert_array_equal(params["encoder"]["out"]["w"], ez[0])
    np.testing.assert_array_equal(params["decoder"]["hidden"][1]["b"], d1[1])
    np.testing.assert_array_equal(params["decoder"]["out"]["w"], dx[0])
    np.testing.assert_array_equal(params["discriminator"]["hidden"][0]["w"], c0[0])
    np.testing.assert_array_equal(params["discriminator"]["out"]["b"], cz[1])

    ae_only = str(tmp_path / "AE.h5")
    _write_keras2_file(ae_only, {"AUTOENCODER": enc + dec})
    params2 = load_keras_aae(ae_only, template)
    np.testing.assert_array_equal(params2["encoder"]["out"]["w"], ez[0])
    np.testing.assert_array_equal(params2["discriminator"]["out"]["w"],
                                  template["discriminator"]["out"]["w"])


def test_keras_import_shape_mismatch_errors(tmp_path):
    rng = np.random.default_rng(3)

    def wpair(prefix, wb):
        return [(f"{prefix}/kernel:0", wb[0]), (f"{prefix}/bias:0", wb[1])]

    path = str(tmp_path / "model.h5")
    _write_keras2_file(path, {
        "encoder": (wpair("vae/encoder/dense", _dense(rng, 12, 9))  # 9 != 8
                    + wpair("vae/encoder/dense_mean", _dense(rng, 9, 4))
                    + wpair("vae/encoder/dense_log_var", _dense(rng, 9, 4))),
        "decoder": wpair("vae/decoder/dense_output", _dense(rng, 4, 12)),
    })
    config = VAEConfig(fc_layers=(8, 4), input_dim=12)
    template = init_vae(jax.random.PRNGKey(0), config)
    with pytest.raises(ValueError, match="shape mismatch"):
        load_keras_vae(path, template)


def test_real_keras_jetid_cnn_import(tmp_path):
    """Reference jet-ID functional graph (one conv tower + scalars branch
    + trunk + softmax head, ref jet-ID/models.py:9-66) built in the
    installed tf.keras, saved, imported, and checked by forward parity."""
    tf = pytest.importorskip("tensorflow")
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

    rng = np.random.default_rng(4)
    xi = rng.normal(size=(8, h, w)).astype(np.float32)
    xs = rng.normal(size=(8, sdim)).astype(np.float32)
    ref_out = np.asarray(model([xi, xs]))
    path = str(tmp_path / "model.weights.h5")
    model.save_weights(path)

    config = JetIDConfig(n_classes=2, scalars=("scalars",), scalar_dims=(sdim,),
                         images=("image",), image_shapes=((h, w),),
                         nn_type="CNN", fcn_neurons=(32,), branch_neurons=(16,),
                         cnn_maps=(8, 8), cnn_kernels=((3, 3), (3, 3)),
                         cnn_pools=((2, 2), (2, 2)), dropout=0.0)
    import jax
    from atlasvae.train.keras_import import load_keras_jetid
    template = init_jetid(jax.random.PRNGKey(0), config)
    params = load_keras_jetid(path, template)
    ours = np.asarray(jetid_apply(params, config, {"image": xi, "scalars": xs},
                                  train=False))
    np.testing.assert_allclose(ours, ref_out, rtol=1e-5, atol=1e-5)


def test_keras2_legacy_jetid_fcn_file(tmp_path):
    """FCN-type file (no convs): dense creation order is scalars branch,
    trunk, head (ref jet-ID/models.py:40-66)."""
    import jax
    from atlasvae.models.jetid import JetIDConfig, init_jetid
    from atlasvae.train.keras_import import load_keras_jetid
    rng = np.random.default_rng(5)
    s0 = _dense(rng, 10, 6)
    t0, t1 = _dense(rng, 6, 8), _dense(rng, 8, 8)
    o = _dense(rng, 8, 3)

    def wpair(prefix, wb):
        return [(f"{prefix}/kernel:0", wb[0]), (f"{prefix}/bias:0", wb[1])]

    path = str(tmp_path / "model.h5")
    _write_keras2_file(path, {
        "dense": wpair("dense", s0), "dense_1": wpair("dense_1", t0),
        "dense_2": wpair("dense_2", t1), "dense_3": wpair("dense_3", o),
    })
    config = JetIDConfig(n_classes=3, scalars=("scalars",), scalar_dims=(10,),
                         nn_type="FCN", fcn_neurons=(6, 8, 8)[1:],
                         branch_neurons=(6,))
    template = init_jetid(jax.random.PRNGKey(0), config)
    params = load_keras_jetid(path, template)
    np.testing.assert_array_equal(params["scalars"][0]["w"], s0[0])
    np.testing.assert_array_equal(params["head"][0]["w"], t0[0])
    np.testing.assert_array_equal(params["head"][1]["b"], t1[1])
    np.testing.assert_array_equal(params["out"]["w"], o[0])

    # file with conv layers but FCN config must refuse
    bad = str(tmp_path / "bad.h5")
    conv_k = rng.normal(size=(3, 3, 1, 4)).astype(np.float32)
    conv_b = rng.normal(size=(4,)).astype(np.float32)
    _write_keras2_file(bad, {
        "conv2d": [("conv2d/kernel:0", conv_k), ("conv2d/bias:0", conv_b)],
        "dense": wpair("dense", s0), "dense_1": wpair("dense_1", t0),
        "dense_2": wpair("dense_2", t1), "dense_3": wpair("dense_3", o),
    })
    with pytest.raises(ValueError, match="conv layers"):
        load_keras_jetid(bad, template)
