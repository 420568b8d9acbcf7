"""Golden parity vs TensorFlow: the reference implements its math with
tf.keras ops (ref OE-VAE/models.py:72-132).  These tests evaluate the
same formulas with TensorFlow on our parameters and require agreement
with the jitted JAX graphs to float32 precision — the loss-parity
evidence behind BASELINE.md's 'reference-matching loss curves' target.
"""

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

import jax
import jax.numpy as jnp

from atlasvae.models import VAEConfig, init_vae, vae_apply, encode
from atlasvae.losses import get_losses, kld_loss, reconstruction_loss


@pytest.fixture(scope="module")
def setup():
    cfg = VAEConfig(fc_layers=(32, 16, 8), input_dim=12)
    params = init_vae(jax.random.PRNGKey(0), cfg)
    x = np.random.default_rng(1).normal(size=(64, 12)).astype(np.float32)
    return cfg, params, x


def _tf_forward(params, x, noise=None):
    """The reference's encoder/decoder stacks evaluated with TF ops
    (ref OE-VAE/models.py:30-52), using our parameter values."""
    h = tf.constant(x)
    for layer in params["encoder"]["hidden"]:
        h = tf.nn.relu(h @ np.asarray(layer["w"]) + np.asarray(layer["b"]))
    z_mean = h @ np.asarray(params["encoder"]["mean"]["w"]) + \
        np.asarray(params["encoder"]["mean"]["b"])
    z_log_var = h @ np.asarray(params["encoder"]["logvar"]["w"]) + \
        np.asarray(params["encoder"]["logvar"]["b"])
    sigma = tf.clip_by_value(tf.exp(z_log_var / 2), -1e6, 1e6)
    z = z_mean if noise is None else z_mean + sigma * noise
    h = z
    for layer in params["decoder"]["hidden"]:
        h = tf.nn.relu(h @ np.asarray(layer["w"]) + np.asarray(layer["b"]))
    recon = h @ np.asarray(params["decoder"]["out"]["w"]) + \
        np.asarray(params["decoder"]["out"]["b"])
    recon = tf.where(tf.math.is_finite(recon), recon, 0.0)
    recon = tf.clip_by_value(recon, -1e6, 1e6)
    return recon, z_mean, z_log_var


def test_forward_matches_tf(setup):
    cfg, params, x = setup
    noise = np.random.default_rng(2).normal(size=(64, 8)).astype(np.float32)
    tf_recon, tf_mean, tf_logvar = _tf_forward(params, x, noise)
    recon, z_mean, z_log_var = jax.jit(
        lambda p, v: vae_apply(p, v, jax.random.PRNGKey(0),
                               noise=jnp.asarray(noise)))(params, x)
    np.testing.assert_allclose(np.asarray(z_mean), tf_mean.numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(z_log_var), tf_logvar.numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(recon), tf_recon.numpy(), atol=5e-5)


def test_reconstruction_losses_match_keras(setup):
    cfg, params, x = setup
    q = x + 0.3
    # ref OE-VAE/models.py:72-78 uses tf.keras.losses.MSE / MAE
    tf_mse = tf.keras.losses.MSE(x, q).numpy()
    tf_mae = tf.keras.losses.MAE(x, q).numpy()
    ours_mse = np.asarray(reconstruction_loss(jnp.asarray(x), jnp.asarray(q), "MSE"))
    ours_mae = np.asarray(reconstruction_loss(jnp.asarray(x), jnp.asarray(q), "MAE"))
    np.testing.assert_allclose(ours_mse, tf_mse, rtol=1e-6)
    np.testing.assert_allclose(ours_mae, tf_mae, rtol=1e-6)


def test_kld_matches_tf_formula(setup):
    cfg, params, x = setup
    z_mean, z_log_var = encode(params, jnp.asarray(x))
    zm, zlv = np.asarray(z_mean), np.asarray(z_log_var)
    # ref OE-VAE/models.py:81-85
    z_exp = tf.clip_by_value(tf.exp(tf.constant(zlv)), -1e6, 1e6)
    tf_kld = (-tf.reduce_mean(1 + zlv - z_exp - tf.square(zm), axis=-1) / 2).numpy()
    ours = np.asarray(kld_loss(z_mean, z_log_var))
    np.testing.assert_allclose(ours, tf_kld, atol=1e-6)


@pytest.mark.parametrize("oe_type", ["MAE", "MSE", "KLD", "MAE-margin"])
def test_total_loss_matches_tf(setup, oe_type):
    """Full weighted loss combination (ref OE-VAE/models.py:108-132)
    with deterministic latent draws shared between frameworks."""
    cfg, params, x = setup
    rng = np.random.default_rng(3)
    x_ood = x + rng.normal(0.5, 0.2, x.shape).astype(np.float32)
    w_bkg = rng.uniform(0.5, 2, 64).astype(np.float32)
    w_ood = rng.uniform(0.5, 2, 64).astype(np.float32)
    noise = rng.normal(size=(64, 8)).astype(np.float32)
    beta, lamb, margin = 2.0, 5.0, 1.0

    # TF side, same noise for bkg and ood paths
    recon, zm, zlv = _tf_forward(params, x, noise)
    recon_ood, _, _ = _tf_forward(params, x_ood, noise)
    if oe_type in ("MSE", "MSE-margin"):
        loss_fn = tf.keras.losses.MSE
    else:
        loss_fn = tf.keras.losses.MAE
    loss_rec = loss_fn(x, recon)
    z_exp = tf.clip_by_value(tf.exp(zlv), -1e6, 1e6)
    loss_kld = -tf.reduce_mean(1 + zlv - z_exp - tf.square(zm), axis=-1) / 2
    if oe_type == "KLD":
        _, zm_o, zlv_o = _tf_forward(params, x_ood, noise)
        z_exp_o = tf.clip_by_value(tf.exp(zlv_o), -1e6, 1e6)
        kld_o = -tf.reduce_mean(1 + zlv_o - z_exp_o - tf.square(zm_o), axis=-1) / 2
        loss_oe = tf.nn.relu(loss_kld - kld_o + margin)
    else:
        gap = loss_rec - loss_fn(x_ood, recon_ood)
        loss_oe = tf.sigmoid(gap) if oe_type in ("MSE", "MAE") else \
            tf.nn.relu(gap + margin)
    tf_total = (loss_rec * w_bkg + beta * loss_kld * w_bkg
                + lamb * loss_oe * w_ood).numpy()

    ours = jax.jit(lambda p: get_losses(
        p, jnp.asarray(x), jnp.asarray(x_ood), jnp.asarray(w_bkg),
        jnp.asarray(w_ood), jax.random.PRNGKey(0), oe_type, beta, lamb, margin,
        noise=(jnp.asarray(noise), jnp.asarray(noise))))(params)[-1]
    np.testing.assert_allclose(np.asarray(ours), tf_total, rtol=2e-5, atol=2e-5)


def test_jetid_conv_tower_matches_keras_2d():
    """Our NHWC conv tower (VALID conv + SAME max-pool + ReLU) must
    reproduce the reference's Keras Conv2D/MaxPooling2D semantics
    (ref jet-ID/models.py:30-31) on identical weights, including the
    same-shape multi-channel image stacking (ref :15-17)."""
    from atlasvae.models import JetIDConfig, init_jetid, jetid_apply

    cfg = JetIDConfig(n_classes=3, images=("a", "b"),
                      image_shapes=((9, 11), (9, 11)), nn_type="CNN",
                      cnn_maps=(4, 5), cnn_kernels=((3, 5), (3, 3)),
                      cnn_pools=((2, 1), (2, 2)), dropout=0.0,
                      fcn_neurons=(8,))
    params = init_jetid(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(3)
    inputs = {k: rng.normal(size=(16, 9, 11)).astype(np.float32)
              for k in ("a", "b")}
    ours = np.asarray(jax.jit(
        lambda p, i: jetid_apply(p, cfg, i, train=False))(params, inputs))

    y = tf.constant(np.stack([inputs["a"], inputs["b"]], axis=-1))
    for conv, pool in zip(params["towers"]["9x11"], cfg.cnn_pools):
        y = tf.nn.conv2d(y, np.asarray(conv["w"]), strides=1,
                         padding="VALID") + np.asarray(conv["b"])
        y = tf.nn.max_pool2d(y, ksize=pool, strides=pool, padding="SAME")
        y = tf.nn.relu(y)
    y = tf.reshape(y, (16, -1))
    for layer in params["head"]:
        y = tf.nn.relu(y @ np.asarray(layer["w"]) + np.asarray(layer["b"]))
    logits = y @ np.asarray(params["out"]["w"]) + np.asarray(params["out"]["b"])
    theirs = tf.nn.softmax(logits, axis=-1).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=2e-5, atol=2e-5)


def test_jetid_conv_tower_matches_keras_3d():
    """The Conv3D tower path (3-tuple kernels, image stack as the depth
    axis; ref jet-ID/models.py:23-34) against tf.nn.conv3d/max_pool3d."""
    from atlasvae.models import JetIDConfig, init_jetid, jetid_apply

    cfg = JetIDConfig(
        n_classes=2, images=("p", "q", "r", "s"),
        image_shapes=((7, 11),) * 4, nn_type="CNN", dropout=0.0,
        fcn_neurons=(8,),
        cnn_by_shape=(((7, 11), (3, 4), ((3, 5, 3), (3, 3, 1)),
                       ((1, 1, 2), (2, 2, 1))),))
    params = init_jetid(jax.random.PRNGKey(1), cfg)
    rng = np.random.default_rng(4)
    inputs = {k: rng.normal(size=(8, 7, 11)).astype(np.float32)
              for k in "pqrs"}
    ours = np.asarray(jax.jit(
        lambda p, i: jetid_apply(p, cfg, i, train=False))(params, inputs))

    vol = np.stack([inputs[k] for k in "pqrs"], axis=-1)[..., None]
    y = tf.constant(vol)  # (N, 7, 11, 4, 1) NDHWC
    for conv, pool in zip(params["towers"]["7x11"],
                          (((1, 1, 2)), ((2, 2, 1)))):
        y = tf.nn.conv3d(y, np.asarray(conv["w"]), strides=(1, 1, 1, 1, 1),
                         padding="VALID") + np.asarray(conv["b"])
        y = tf.nn.max_pool3d(y, ksize=pool, strides=pool, padding="SAME")
        y = tf.nn.relu(y)
    y = tf.reshape(y, (8, -1))
    for layer in params["head"]:
        y = tf.nn.relu(y @ np.asarray(layer["w"]) + np.asarray(layer["b"]))
    logits = y @ np.asarray(params["out"]["w"]) + np.asarray(params["out"]["b"])
    theirs = tf.nn.softmax(logits, axis=-1).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=2e-5, atol=2e-5)
