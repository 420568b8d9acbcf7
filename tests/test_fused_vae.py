"""Fused Pallas encoder/decoder: numerical equality with the XLA path
in both forward values and parameter gradients (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from atlasvae.models import VAEConfig, init_vae, encode, decode
from atlasvae.losses import get_losses


@pytest.fixture(scope="module")
def setup():
    cfg = VAEConfig(fc_layers=(80, 40, 20, 10), input_dim=12)
    params = init_vae(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (300, 12))
    return cfg, params, x


def test_fused_encoder_forward(setup):
    cfg, params, x = setup
    ref_mean, ref_logvar = jax.jit(lambda p, v: encode(p, v))(params, x)
    fz_mean, fz_logvar = jax.jit(lambda p, v: encode(p, v, impl="pallas"))(params, x)
    np.testing.assert_allclose(np.asarray(fz_mean), np.asarray(ref_mean), atol=1e-5)
    np.testing.assert_allclose(np.asarray(fz_logvar), np.asarray(ref_logvar), atol=1e-5)


def test_fused_decoder_forward(setup):
    cfg, params, x = setup
    z = jax.random.normal(jax.random.PRNGKey(2), (300, 10))
    ref = jax.jit(lambda p, v: decode(p, v))(params, z)
    fused = jax.jit(lambda p, v: decode(p, v, impl="pallas"))(params, z)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref), atol=1e-5)


@pytest.mark.parametrize("oe_type", ["MAE", "KLD"])
def test_fused_loss_gradients_match_xla(setup, oe_type):
    """End-to-end loss gradients through the custom VJPs must match the
    XLA autodiff path."""
    cfg, params, x = setup
    key = jax.random.PRNGKey(3)
    noise = (jax.random.normal(key, (300, 10)), jax.random.normal(key, (300, 10)))
    w = jnp.ones(300)

    def total(p, impl):
        return get_losses(p, x, x + 0.5, w, w, key, oe_type, 2.0, 5.0, 1.0,
                          noise=noise, impl=impl)[-1].sum()

    ref_val, ref_grad = jax.jit(jax.value_and_grad(
        lambda p: total(p, "xla")))(params)
    fused_val, fused_grad = jax.jit(jax.value_and_grad(
        lambda p: total(p, "pallas")))(params)
    np.testing.assert_allclose(float(fused_val), float(ref_val), rtol=1e-5)
    flat_ref = jax.tree_util.tree_leaves_with_path(ref_grad)
    flat_fused = jax.tree_util.tree_leaves_with_path(fused_grad)
    for (path_r, leaf_r), (path_f, leaf_f) in zip(flat_ref, flat_fused):
        assert path_r == path_f
        scale = max(float(jnp.abs(leaf_r).max()), 1e-3)
        np.testing.assert_allclose(
            np.asarray(leaf_f), np.asarray(leaf_r), atol=3e-4 * scale,
            err_msg=f"grad mismatch at {path_r}")


def test_fused_training_step_runs(setup):
    cfg, params, x = setup
    from atlasvae.train.step import make_vae_step_fns, make_optimizer, batch_load
    opt = make_optimizer(1e-3)
    xb = np.asarray(x)
    w = np.ones(len(xb), np.float32)
    batches = batch_load(xb, xb + 0.5, w, w, 100)
    step_x, _ = make_vae_step_fns(opt, "MAE", 2.0, 5.0, 1.0)
    step_p, _ = make_vae_step_fns(opt, "MAE", 2.0, 5.0, 1.0, impl="pallas")
    key = jax.random.PRNGKey(4)
    lr = np.float32(1e-3)
    p1, _, m1 = step_x(params, opt.init(params), lr, key, *batches)
    p2, _, m2 = step_p(params, opt.init(params), lr, key, *batches)
    np.testing.assert_allclose(np.asarray(m2), np.asarray(m1), rtol=1e-4, atol=1e-2)
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-4)
