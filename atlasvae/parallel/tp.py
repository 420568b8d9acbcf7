"""Tensor-parallel layouts for the dense stacks (GSPMD path).

The flagship models are narrow MLPs, so pure data parallelism is the
production layout (SURVEY.md S2.6); this module provides the
``model``-axis tensor-parallel sharding for wide configurations and for
multi-chip validation: hidden dense kernels are column-sharded
(Megatron-style P(None, 'model')), biases sharded on their output dim,
and XLA GSPMD inserts the all-gathers/reduce-scatters.  Combined with
the batch sharded over 'data', a single jitted train step exercises a
real 2-D (dp x tp) mesh.
"""

import numpy as np

import jax
import jax.numpy as jnp
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from ..losses import get_losses
from ..train.step import clip_gradients


def tp_param_shardings(mesh, params, axis="model"):
    """PartitionSpec tree: column-shard every hidden dense kernel over
    the model axis; small heads replicated."""
    def spec(path, leaf):
        names = [getattr(p, "key", getattr(p, "name", None)) for p in path]
        if "hidden" in names:
            if leaf.ndim == 2 and leaf.shape[1] % mesh.shape[axis] == 0:
                return NamedSharding(mesh, P(None, axis))
            if leaf.ndim == 1 and leaf.shape[0] % mesh.shape[axis] == 0:
                return NamedSharding(mesh, P(axis))
        return NamedSharding(mesh, P())
    return jax.tree_util.tree_map_with_path(spec, params)


def _match_param_shardings(opt_state, param_shardings, mesh):
    """Sharding tree for an optimizer state: moments follow their
    parameters' shardings (matched by path suffix — optax states embed
    the param tree, e.g. ScaleByAdamState.mu['encoder']...); leaves with
    no param counterpart (step counts) are replicated."""
    from jax.tree_util import tree_flatten_with_path, tree_map_with_path

    p_map = {tuple(str(k) for k in path): s
             for path, s in tree_flatten_with_path(param_shardings)[0]}
    rep = NamedSharding(mesh, P())

    def spec(path, leaf):
        keys = tuple(str(k) for k in path)
        for i in range(len(keys)):
            s = p_map.get(keys[i:])
            if s is not None:
                return s
        return rep

    return tree_map_with_path(spec, opt_state)


def make_tp_train_step(optimizer, mesh, oe_type="KLD", beta=0.0, lamb=0.0,
                       margin=0.0, activation="relu", data_axis="data",
                       lr=1e-3):
    """One jitted dp x tp training step: batch sharded over 'data',
    hidden kernels sharded over 'model'; gradient reduction and weight
    re-sharding are GSPMD-inserted collectives."""

    def step(params, opt_state, key, bkg_x, ood_x, bkg_w, ood_w):
        def loss_fn(p):
            _, _, _, total = get_losses(p, bkg_x, ood_x, bkg_w, ood_w, key,
                                        oe_type, beta, lamb, margin, activation)
            return jnp.sum(total)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        grads = clip_gradients(grads)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        updates = jax.tree.map(lambda u: u * lr, updates)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    batch_sharding = NamedSharding(mesh, P(data_axis))
    # jit once at closure creation: a per-call jax.jit(step) would build a
    # fresh wrapper (own cache) and retrace/recompile every invocation
    # (~20-40 s each through the remote tunnel).
    jit_step = jax.jit(step)

    def run(params, opt_state, key, bkg_x, ood_x, bkg_w, ood_w):
        shardings = tp_param_shardings(mesh, params)
        params = jax.device_put(params, shardings)
        opt_state = jax.device_put(
            opt_state, _match_param_shardings(opt_state, shardings, mesh))
        bkg_x, ood_x = (jax.device_put(v, batch_sharding) for v in (bkg_x, ood_x))
        bkg_w, ood_w = (jax.device_put(v, batch_sharding) for v in (bkg_w, ood_w))
        return jit_step(params, opt_state, key, bkg_x, ood_x, bkg_w, ood_w)

    run.jitted = jit_step  # exposed so tests can assert cache reuse
    return run
