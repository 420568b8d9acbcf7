"""Fused conv1+pool+relu kernel parity vs the unfused XLA chain.

The kernel (ops/fused_conv.py) replaces the jet-ID tower's first
Conv2D + MaxPool2D + LeakyReLU(0) block (ref jet-ID/models.py:30-36) in
one VMEM-resident pass with a custom VJP.  Contract: forward bit-exact
(the same f32 dot + max + relu, just never materialized in HBM);
dW/db equal to f32 reassociation; dx intentionally zero (input layer
only).  Runs through the Pallas interpreter on CPU.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from atlasvae.ops.fused_conv import fused_conv1_pool_relu, supported


def _xla_chain(x, w, b, pool):
    z = jax.lax.conv_general_dilated(
        x, w, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + b
    win = (1,) + tuple(pool) + (1,)
    z = -jax.lax.reduce_window(-z, jnp.inf, jax.lax.min, win, win, "SAME")
    return jax.nn.relu(z)


SHAPES = [
    # (N, H, W, C, kh, kw, M, pool)
    (5, 16, 16, 1, 3, 3, 10, (2, 2)),    # the bench CNN shape family
    (3, 13, 11, 2, 3, 2, 7, (3, 3)),     # multi-image channels, SAME shift
    (4, 10, 10, 1, 2, 2, 5, (3, 3)),     # pool-3 ceil edge
    (2, 12, 9, 1, 3, 3, 130, (2, 2)),    # maps beyond one 128-lane tile
    (3, 9, 9, 1, 3, 3, 4, (4, 4)),       # wide pool
]


@pytest.mark.parametrize("shape", SHAPES)
def test_fused_conv_forward_and_grads_match_chain(rng, shape):
    N, H, W, C, kh, kw, M, pool = shape
    x = rng.normal(size=(N, H, W, C)).astype(np.float32)
    w = (rng.normal(size=(kh, kw, C, M)) * 0.3).astype(np.float32)
    b = (rng.normal(size=(M,)) * 0.1).astype(np.float32)
    ref = _xla_chain(x, w, b, pool)
    got = fused_conv1_pool_relu(x, w, b, pool)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))

    def loss(fn):
        return lambda w, b: jnp.sum(fn(x, w, b, pool) ** 2)

    gw_r, gb_r = jax.grad(loss(_xla_chain), argnums=(0, 1))(w, b)
    gw_f, gb_f = jax.grad(loss(fused_conv1_pool_relu), argnums=(0, 1))(w, b)
    np.testing.assert_allclose(gw_f, gw_r, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(gb_f, gb_r, rtol=2e-4, atol=2e-4)


def test_fused_conv_bf16(rng):
    x = rng.normal(size=(4, 16, 16, 1)).astype(jnp.bfloat16)
    w = (rng.normal(size=(3, 3, 1, 20)) * 0.3).astype(jnp.bfloat16)
    b = (rng.normal(size=(20,)) * 0.1).astype(jnp.bfloat16)
    ref = _xla_chain(x, w, b, (2, 2))
    got = fused_conv1_pool_relu(x, w, b, (2, 2))
    assert got.dtype == jnp.bfloat16
    # both sides accumulate the conv in f32 and round once to bf16
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=1e-2, atol=1e-2)


def test_fused_conv_dx_is_zero(rng):
    """The input-layer contract: dx is intentionally zero (images are
    data); anything differentiating through x must not use this path."""
    x = rng.normal(size=(2, 8, 8, 1)).astype(np.float32)
    w = rng.normal(size=(3, 3, 1, 4)).astype(np.float32)
    b = np.zeros(4, np.float32)
    dx = jax.grad(lambda x: jnp.sum(
        fused_conv1_pool_relu(x, w, b, (2, 2))))(x)
    assert np.all(np.asarray(dx) == 0.0)


def test_supported_gate():
    assert supported((8, 64, 64, 1), (3, 3, 1, 100), (2, 2))
    assert not supported((8, 64, 64, 1), (3, 3, 1, 100), (2, 2, 2))
    assert not supported((8, 2, 2, 1), (3, 3, 1, 100), (2, 2))
    assert not supported((8, 64, 64, 64), (3, 3, 64, 100), (2, 2))  # K>512


def test_jetid_tower_fused_matches_xla(rng):
    """End-to-end through the model: the fused input-layer path
    (ATLASVAE_CONV1=fused) must reproduce the XLA tower forward and the
    training gradients at f32 tolerance."""
    from atlasvae.models.jetid import JetIDConfig, init_jetid, jetid_apply

    config = JetIDConfig(n_classes=2, scalars=("scalars",), scalar_dims=(6,),
                         images=("img",), image_shapes=((12, 12),),
                         nn_type="CNN", cnn_maps=(8, 8),
                         cnn_kernels=((3, 3), (3, 3)),
                         cnn_pools=((2, 2), (2, 2)), dropout=0.0)
    params = init_jetid(jax.random.PRNGKey(0), config)
    inputs = {"img": rng.normal(size=(16, 12, 12)).astype(np.float32),
              "scalars": rng.normal(size=(16, 6)).astype(np.float32)}
    labels = jnp.asarray(rng.integers(0, 2, 16))

    def loss(params):
        probs = jetid_apply(params, config, inputs, train=True)
        onehot = jax.nn.one_hot(labels, 2)
        return -jnp.mean(jnp.sum(onehot * jnp.log(probs + 1e-9), axis=-1))

    old = os.environ.get("ATLASVAE_CONV1")
    try:
        os.environ["ATLASVAE_CONV1"] = "xla"
        ref_p = jetid_apply(params, config, inputs)
        ref_g = jax.grad(loss)(params)
        os.environ["ATLASVAE_CONV1"] = "fused"
        got_p = jetid_apply(params, config, inputs)
        got_g = jax.grad(loss)(params)
    finally:
        if old is None:
            os.environ.pop("ATLASVAE_CONV1", None)
        else:
            os.environ["ATLASVAE_CONV1"] = old
    np.testing.assert_array_equal(np.asarray(ref_p), np.asarray(got_p))
    for (pa, ga), (pb, gb) in zip(
            jax.tree_util.tree_leaves_with_path(ref_g),
            jax.tree_util.tree_leaves_with_path(got_g)):
        np.testing.assert_allclose(gb, ga, rtol=2e-4, atol=2e-4,
                                   err_msg=str(pa))
