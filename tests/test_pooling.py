"""maxpool_same (elementwise-backward pool) parity vs reduce_window.

The pool replaces the towers' ``-reduce_window(-z, min)`` (ref
jet-ID/models.py:31 MaxPool2D) with identical values and an elementwise
VJP (no select_and_scatter — measured 1.8-1.9x on the conv block's
fwd+bwd, ops/pooling.py).  Contract: values bitwise-equal, gradients
bitwise-equal including XLA's first-match tie routing.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from atlasvae.ops.pooling import maxpool_same


def _xla_pool(z, pool):
    win = (1,) + tuple(pool) + (1,)
    return -jax.lax.reduce_window(-z, jnp.inf, jax.lax.min, win, win, "SAME")


CASES = [
    ((4, 14, 14, 5), (2, 2)),    # the tower shape family
    ((3, 13, 10, 7), (3, 3)),    # ceil edges + SAME low-padding (13%3=1)
    ((2, 9, 9, 4), (4, 4)),      # wide window
    ((2, 7, 11, 3), (2, 3)),     # asymmetric window
    ((2, 6, 6, 5, 2), (2, 2, 3)),  # rank-3 (Conv3D tower pooling)
]


@pytest.mark.parametrize("shape,pool", CASES)
def test_maxpool_values_and_grads_bitwise(rng, shape, pool):
    z = rng.normal(size=shape).astype(np.float32)
    np.testing.assert_array_equal(np.asarray(_xla_pool(z, pool)),
                                  np.asarray(maxpool_same(z, pool)))
    # cos() makes every output's cotangent distinct, so any routing
    # difference shows up
    g_ref = jax.grad(lambda z: jnp.sum(jnp.cos(_xla_pool(z, pool))))(z)
    g_fast = jax.grad(lambda z: jnp.sum(jnp.cos(maxpool_same(z, pool))))(z)
    np.testing.assert_array_equal(np.asarray(g_ref), np.asarray(g_fast))


def test_maxpool_tie_routing_matches_xla(rng):
    """Constructed exact ties (constant windows, duplicated values):
    gradient must land on the same single element XLA picks."""
    z = np.ones((1, 6, 6, 2), np.float32)           # every window all-tied
    z[0, 2:4, 2:4, 0] = 3.0                          # one higher tied block
    cot = np.arange(1, 19, dtype=np.float32).reshape(1, 3, 3, 2)
    g_ref = jax.grad(lambda z: jnp.sum(_xla_pool(z, (2, 2)) * cot))(z)
    g_fast = jax.grad(lambda z: jnp.sum(maxpool_same(z, (2, 2)) * cot))(z)
    np.testing.assert_array_equal(np.asarray(g_ref), np.asarray(g_fast))
    # duplicated maxima across (not within) windows stay independent
    z2 = np.zeros((1, 4, 4, 1), np.float32)
    z2[0, 0, 1, 0] = z2[0, 2, 3, 0] = 5.0
    g2r = jax.grad(lambda z: jnp.sum(_xla_pool(z, (2, 2))))(z2)
    g2f = jax.grad(lambda z: jnp.sum(maxpool_same(z, (2, 2))))(z2)
    np.testing.assert_array_equal(np.asarray(g2r), np.asarray(g2f))


def test_maxpool_bf16(rng):
    z = rng.normal(size=(3, 12, 12, 4)).astype(jnp.bfloat16)
    ref, got = _xla_pool(z, (2, 2)), maxpool_same(z, (2, 2))
    assert got.dtype == jnp.bfloat16
    np.testing.assert_array_equal(np.asarray(ref, np.float32),
                                  np.asarray(got, np.float32))


def test_tower_fast_pool_matches_xla_pool(rng):
    """End-to-end through the jet-ID CNN: ATLASVAE_POOL=fast (default)
    must reproduce the reduce_window tower's forward and gradients
    bitwise (the pool is the only difference; dropout off)."""
    import os
    from atlasvae.models.jetid import JetIDConfig, init_jetid, jetid_apply

    config = JetIDConfig(n_classes=2, scalars=("s",), scalar_dims=(4,),
                         images=("img",), image_shapes=((13, 13),),
                         nn_type="CNN", cnn_maps=(6, 6),
                         cnn_kernels=((3, 3), (2, 2)),
                         cnn_pools=((2, 2), (2, 2)), dropout=0.0)
    params = init_jetid(jax.random.PRNGKey(0), config)
    inputs = {"img": rng.normal(size=(8, 13, 13)).astype(np.float32),
              "s": rng.normal(size=(8, 4)).astype(np.float32)}

    def loss(params):
        probs = jetid_apply(params, config, inputs, train=True)
        return -jnp.mean(jnp.log(probs[:, 0] + 1e-9))

    old = os.environ.get("ATLASVAE_POOL")
    try:
        os.environ["ATLASVAE_POOL"] = "xla"
        ref_p, ref_g = jetid_apply(params, config, inputs), jax.grad(loss)(params)
        os.environ["ATLASVAE_POOL"] = "fast"
        got_p, got_g = jetid_apply(params, config, inputs), jax.grad(loss)(params)
    finally:
        if old is None:
            os.environ.pop("ATLASVAE_POOL", None)
        else:
            os.environ["ATLASVAE_POOL"] = old
    np.testing.assert_array_equal(np.asarray(ref_p), np.asarray(got_p))
    for (path, ga), (_, gb) in zip(
            jax.tree_util.tree_leaves_with_path(ref_g),
            jax.tree_util.tree_leaves_with_path(got_g)):
        np.testing.assert_array_equal(np.asarray(ga), np.asarray(gb),
                                      err_msg=str(path))
