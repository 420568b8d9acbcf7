"""Model + loss tests: shapes, reference-formula parity, clipping guards."""

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from atlasvae.models import (VAEConfig, init_vae, vae_apply, encode, clip_values,
                             AAEConfig, init_aae, ae_apply, discriminator_apply,
                             JetIDConfig, init_jetid, jetid_apply)
from atlasvae.models.mlp import mlp_apply
from atlasvae.losses import get_losses, reconstruction_loss, kld_loss
from atlasvae.ops import fused_mlp_apply


@pytest.fixture(scope="module")
def vae():
    cfg = VAEConfig(fc_layers=(80, 40, 20, 10), input_dim=12)
    return cfg, init_vae(jax.random.PRNGKey(0), cfg)


def test_vae_shapes(vae):
    cfg, params = vae
    x = jax.random.normal(jax.random.PRNGKey(1), (64, 12))
    recon, z_mean, z_log_var = jax.jit(vae_apply)(params, x, jax.random.PRNGKey(2))
    assert recon.shape == (64, 12)
    assert z_mean.shape == (64, 10) and z_log_var.shape == (64, 10)


def test_kld_matches_reference_formula(vae):
    # ref OE-VAE/models.py:81-85
    z_mean = np.random.default_rng(0).normal(size=(32, 10)).astype(np.float32)
    z_log_var = np.random.default_rng(1).normal(size=(32, 10)).astype(np.float32)
    ours = np.asarray(jax.jit(kld_loss)(jnp.asarray(z_mean), jnp.asarray(z_log_var)))
    ref = -np.mean(1 + z_log_var - np.exp(z_log_var) - z_mean ** 2, axis=-1) / 2
    np.testing.assert_allclose(ours, ref, rtol=1e-5)


def test_reconstruction_loss_types():
    x = jnp.ones((4, 3))
    y = jnp.zeros((4, 3))
    mse = jax.jit(functools.partial(reconstruction_loss, oe_type="MSE"))
    mae = jax.jit(functools.partial(reconstruction_loss, oe_type="MAE"))
    np.testing.assert_allclose(np.asarray(mse(x, y)), 1.0)
    np.testing.assert_allclose(np.asarray(mae(x, y)), 1.0)


def test_clip_values_guards():
    x = jnp.array([1.0, np.inf, -np.inf, np.nan, 2e6, -2e6])
    out = np.asarray(jax.jit(clip_values)(x))
    np.testing.assert_allclose(out, [1.0, 0.0, 0.0, 0.0, 1e6, -1e6])


@pytest.mark.parametrize("oe_type", ["KLD", "MSE", "MAE", "MSE-margin", "MAE-margin"])
def test_get_losses_all_oe_types(vae, oe_type):
    cfg, params = vae
    key = jax.random.PRNGKey(3)
    x = jax.random.normal(key, (32, 12))
    w = jnp.ones(32)
    fn = jax.jit(functools.partial(get_losses, oe_type=oe_type, beta=2.0,
                                   lamb=5.0, margin=1.0))
    mse, kld, oe, total = fn(params, x, x + 0.5, w, w, key)
    for v in (mse, kld, oe, total):
        assert v.shape == (32,)
        assert bool(jnp.isfinite(v).all())
    np.testing.assert_allclose(np.asarray(total), np.asarray(mse + kld + oe), rtol=1e-6)


def test_loss_weights_scale(vae):
    cfg, params = vae
    key = jax.random.PRNGKey(4)
    x = jax.random.normal(key, (16, 12))
    fn = jax.jit(functools.partial(get_losses, oe_type="MAE", beta=1.0,
                                   lamb=1.0, margin=0.0))
    one = fn(params, x, x, jnp.ones(16), jnp.ones(16), key)
    two = fn(params, x, x, 2 * jnp.ones(16), 2 * jnp.ones(16), key)
    np.testing.assert_allclose(np.asarray(two[0]), 2 * np.asarray(one[0]), rtol=1e-5)


def test_fused_mlp_matches_reference_stack(vae):
    cfg, params = vae
    x = jax.random.normal(jax.random.PRNGKey(5), (300, 12))
    stack = params["encoder"]["hidden"] + [params["encoder"]["mean"]]
    ref = jax.jit(lambda s, v: mlp_apply(s, v, "relu", final_activation="linear"))(stack, x)
    fused = fused_mlp_apply(stack, x)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref), atol=1e-5)


def test_aae_forward():
    cfg = AAEConfig(input_dim=12)
    params = init_aae(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (16, 12))
    recon = jax.jit(ae_apply)(params, x)
    probs = jax.jit(discriminator_apply)(params, x)
    assert recon.shape == (16, 12)
    assert np.all(np.asarray(recon) >= 0)  # relu output, ref OE-AAE/aae.py:37
    np.testing.assert_allclose(np.asarray(probs.sum(axis=1)), 1.0, rtol=1e-5)


def test_jetid_fcn_and_cnn():
    cfg = JetIDConfig(n_classes=2, scalars=("s",), scalar_dims=(12,),
                      constituent_dim=30, nn_type="FCN")
    params = init_jetid(jax.random.PRNGKey(0), cfg)
    key = jax.random.PRNGKey(1)
    inputs = {"s": jax.random.normal(key, (8, 12)),
              "constituents": jax.random.normal(key, (8, 30))}
    probs = jax.jit(lambda p, i: jetid_apply(p, cfg, i))(params, inputs)
    np.testing.assert_allclose(np.asarray(probs.sum(axis=1)), 1.0, rtol=1e-5)

    cfg2 = JetIDConfig(n_classes=3, images=("img",), image_shapes=((12, 12),),
                       nn_type="CNN", cnn_maps=(4, 4))
    params2 = init_jetid(jax.random.PRNGKey(2), cfg2)
    probs2 = jax.jit(lambda p, i: jetid_apply(p, cfg2, i))(
        params2, {"img": jax.random.normal(key, (8, 12, 12))})
    np.testing.assert_allclose(np.asarray(probs2.sum(axis=1)), 1.0, rtol=1e-5)


def test_jetid_same_shape_images_share_multichannel_tower():
    """Images of one shape feed a single tower with stacked channels
    (ref jet-ID/models.py:12-17 concatenate axis=3)."""
    cfg = JetIDConfig(n_classes=2, images=("a", "b", "c"),
                      image_shapes=((10, 10), (10, 10), (6, 4)),
                      nn_type="CNN", cnn_maps=(4,), cnn_kernels=((3, 3),),
                      cnn_pools=((2, 2),))
    params = init_jetid(jax.random.PRNGKey(0), cfg)
    assert set(params["towers"]) == {"10x10", "6x4"}
    # shared tower sees 2 input channels, the lone tower 1
    assert params["towers"]["10x10"][0]["w"].shape == (3, 3, 2, 4)
    assert params["towers"]["6x4"][0]["w"].shape == (3, 3, 1, 4)
    key = jax.random.PRNGKey(1)
    inputs = {"a": jax.random.normal(key, (8, 10, 10)),
              "b": jax.random.normal(key, (8, 10, 10)) + 1.0,
              "c": jax.random.normal(key, (8, 6, 4))}
    probs = jax.jit(lambda p, i: jetid_apply(p, cfg, i))(params, inputs)
    np.testing.assert_allclose(np.asarray(probs.sum(axis=1)), 1.0, rtol=1e-5)
    # channel order matters: swapping a and b must change the output
    swapped = jax.jit(lambda p, i: jetid_apply(p, cfg, i))(
        params, {**inputs, "a": inputs["b"], "b": inputs["a"]})
    assert not np.allclose(np.asarray(probs), np.asarray(swapped))


def test_jetid_conv3d_tower_and_per_shape_overrides():
    """3-tuple kernels select the Conv3D tower over (h, w, channels)
    volumes (ref jet-ID/models.py:23-34); per-shape CNN dicts mirror
    ref jet-ID/classifier.py:74-77."""
    cfg = JetIDConfig(
        n_classes=2, images=("p", "q", "r", "s"),
        image_shapes=((7, 11), (7, 11), (7, 11), (7, 11)),
        nn_type="CNN",
        cnn_by_shape=(((7, 11), (5, 5), ((3, 5, 3), (3, 5, 1)),
                       ((1, 1, 1), (1, 1, 1))),))
    params = init_jetid(jax.random.PRNGKey(0), cfg)
    # 3-D kernels: (kh, kw, kd, c_in=1, maps)
    assert params["towers"]["7x11"][0]["w"].shape == (3, 5, 3, 1, 5)
    assert params["towers"]["7x11"][1]["w"].shape == (3, 5, 1, 5, 5)
    key = jax.random.PRNGKey(1)
    inputs = {n: jax.random.normal(jax.random.fold_in(key, i), (4, 7, 11))
              for i, n in enumerate("pqrs")}
    probs = jax.jit(lambda p, i: jetid_apply(p, cfg, i))(params, inputs)
    assert probs.shape == (4, 2)
    np.testing.assert_allclose(np.asarray(probs.sum(axis=1)), 1.0, rtol=1e-5)


def test_jetid_l2_penalty():
    """l2_penalty sums squared hidden kernels, excluding biases and the
    softmax output layer (ref jet-ID/models.py:10,66)."""
    from atlasvae.models.jetid import l2_penalty
    cfg = JetIDConfig(n_classes=2, scalars=("s",), scalar_dims=(4,),
                      nn_type="FCN", fcn_neurons=(8,), branch_neurons=(6,))
    params = init_jetid(jax.random.PRNGKey(0), cfg)
    expected = sum(float(np.sum(np.asarray(l["w"]) ** 2))
                   for l in params["scalars"] + params["head"])
    assert float(l2_penalty(params)) == pytest.approx(expected, rel=1e-6)
    # the training loss moves with l2 (gradient flows through the penalty)
    from atlasvae.train.jetid_loop import make_jetid_step_fns
    from atlasvae.train.step import make_optimizer
    opt = make_optimizer()
    cfg_nd = dataclasses.replace(cfg, dropout=0.0)
    cfg_l2 = dataclasses.replace(cfg, l2=1e-2, dropout=0.0)
    inputs = {"s": np.random.default_rng(0).normal(size=(16, 4)).astype(np.float32)}
    labels = np.arange(16, dtype=np.int32) % 2
    w = np.ones(16, np.float32)
    batch = ({k: v[None] for k, v in inputs.items()}, labels[None], w[None])

    def first_loss(c):
        train_epoch, _ = make_jetid_step_fns(opt, c)
        _, _, metrics = train_epoch(params, opt.init(params), np.float32(0.0),
                                    jax.random.PRNGKey(0), *batch)
        return float(np.asarray(metrics)[0, 0])

    assert first_loss(cfg_l2) == pytest.approx(
        first_loss(cfg_nd) + 1e-2 * float(l2_penalty(params)), rel=1e-5)
