"""Vmapped ensemble / hyper-parameter-sweep training: G configs, one program.

The reference distributes its hyper-parameter grid as Slurm array jobs —
one full process (and GPU allocation) per configuration
(ref OE-VAE/utils.py:597-600 ``grid_search``, OE-VAE/sbatch.sh:13-16).
On TPU, G same-shape configurations instead train simultaneously as one
vmapped program.  Measured reality (bench.py ``sweep_vmap8``): the
canonical step is MXU-bound and the batched dot_general's padded FLOPs
scale linearly with G (each config's K,N <= 128 weight blocks pad to
their own 128-lane tiles — configs cannot share a tile), so the
aggregate *device-time* saving over G sequential runs rounds to
**none** (speedup ~1.0x once both sides exclude the fixed per-call
dispatch RTT; the raw-wall ratio ~1.24x at the bench shape is mostly
that RTT amortization — an artifact of this tunnel, not chip time).
The structural wins are operational and still decisive at sweep scale,
and are what the bench line records (``sweep_vmap8_compiles: 1`` vs
``sweep_seq_compiles: 8``, measured compile seconds): ONE XLA compile
instead of G (20-40 s each through the axon tunnel), data
prep/transfer (pairing, reweighting, scaling, host->device at
~60 MB/s) paid once instead of G times, and one process instead of a
Slurm array.

Mechanics: ``beta``/``lamb``/``margin``/``lr`` are traced scalars and
the PRNG key is per-config (train/step.py ``hyper_traced=True``), so
``jax.vmap`` over (params, opt_state, lr, hyper, key) with the data
batches broadcast produces one jitted program whose per-config lanes
reproduce G sequential ``train_model`` runs: identical data, identical
noise streams (same key sequence per lane), identical loss math.
Numerics note: the batched program is *f32-reassociation-equivalent*,
not bitwise — XLA fuses the vmapped Adam arithmetic differently
(measured ~1e-7 relative param delta per load on CPU), so long
trajectories on ill-conditioned configs (e.g. unscaled inputs with
X-S weights spanning 1e4) can drift visibly, exactly as any
recompilation of the sequential program could (asserted at tolerance
in tests/test_ensemble.py).  The plateau/early-stop controller
(ref OE-VAE/models.py:222-240) runs per config on the host; a
terminated config keeps its lane but freezes bit-exactly via lr=0
(updates are scaled by the traced lr).
"""

import os
import time

import jax
import numpy as np

from .step import make_vae_step_fns, make_optimizer, batch_load, LoadCache
from .loop import features, model_checkpoint
from .checkpoint import save_history


def stack_trees(trees):
    """Stack a list of identically-shaped pytrees along a new axis 0."""
    return jax.tree.map(lambda *xs: np.stack([np.asarray(x) for x in xs]),
                        *trees)


def tree_slice(tree, g):
    """Host copy of config ``g``'s slice of a stacked pytree."""
    return jax.tree.map(lambda a: np.asarray(a[g]), tree)


def init_ensemble_opt_state(optimizer, params_stack):
    """Optimizer state with EVERY leaf carrying the config axis — plain
    ``optimizer.init(params_stack)`` leaves Adam's step counter as a
    shared scalar, which vmap cannot map."""
    n_cfg = len(jax.tree.leaves(params_stack)[0])
    single = optimizer.init(tree_slice(params_stack, 0))
    return stack_trees([single] * n_cfg)


def make_vae_ensemble_step_fns(optimizer, oe_type="KLD", activation="relu",
                               impl="xla"):
    """(train_on_load, valid_losses) vmapped over a leading config axis.

    train_on_load(params, opt_state, lr, hyper, key, *batches) with
    params/opt_state stacked, lr (G,), hyper = (beta, lamb, margin)
    each (G,), key (G, 2) — batches shared across configs.
    """
    raw_train, raw_valid = make_vae_step_fns(
        optimizer, oe_type=oe_type, activation=activation, impl=impl,
        hyper_traced=True, jit=False)
    train = jax.vmap(raw_train, in_axes=(0, 0, 0, 0, 0) + (None,) * 5)
    valid = jax.vmap(raw_valid, in_axes=(0, 0, 0) + (None,) * 5)
    return jax.jit(train), jax.jit(valid)


def _split_keys(keys):
    """Per-config (key, subkey) split — jitted once; an eager vmap would
    re-trace and pay ~0.5 s/dispatch through the tunnel (CLAUDE.md)."""
    return jax.vmap(lambda k: tuple(jax.random.split(k)))(keys)


_split_keys = jax.jit(_split_keys)


def train_ensemble(params_stack, hyper, train_sample, valid_sample,
                   oe_type="KLD", n_epochs=1, batch_size=5000, lr=1e-3,
                   hist_files=None, model_outs=None, seeds=None,
                   activation="relu", valid_batch_size=int(1e6),
                   mesh=None, config_axis="config", state_file=None):
    """Train G VAE configurations as one vmapped device program.

    ``params_stack``: pytree with leading config axis G (``stack_trees``
    of G ``init_vae`` results — distinct seeds give a seed sweep).
    ``hyper``: (beta, lamb, margin) arrays of shape (G,).
    ``lr``: scalar or (G,) initial learning rates.
    ``seeds``: (G,) RNG seeds (default ``range(G)``), reproducing each
    sequential run's key sequence lane-for-lane.
    ``mesh``: optional 1-D device mesh (``parallel.config_mesh``) whose
    ``config_axis`` shards the config axis: each device trains G/n of
    the configurations with ZERO collectives (data is replicated, every
    batched op partitions cleanly along its config dimension) — the
    multi-chip form of the reference's communication-free Slurm array.
    G must be a multiple of the mesh axis size; per-config results are
    unchanged (asserted vs the unsharded program in tests).

    Returns (params_stack, histories) — histories is a list of G dicts
    with the same keys/semantics as ``train_model``'s.
    """
    optimizer = make_optimizer()
    opt_state = init_ensemble_opt_state(optimizer, params_stack)
    beta, lamb, margin = (np.asarray(h, np.float32) for h in hyper)
    n_cfg = len(beta)
    hyper = (beta, lamb, margin)
    lrs = np.broadcast_to(np.asarray(lr, np.float32), (n_cfg,)).copy()
    counts = np.zeros(n_cfg, np.int64)
    stopped = np.zeros(n_cfg, bool)
    seeds = list(range(n_cfg)) if seeds is None else list(seeds)
    keys = np.stack([np.asarray(jax.random.PRNGKey(s)) for s in seeds])

    train_on_load, valid_losses = make_vae_ensemble_step_fns(
        optimizer, oe_type, activation)

    if mesh is not None:
        from ..parallel.mesh import shard_leading
        n_shard = mesh.shape[config_axis]
        if n_cfg % n_shard:
            raise ValueError(
                f"n_configs={n_cfg} must be a multiple of the "
                f"'{config_axis}' mesh axis size {n_shard}")
        params_stack = shard_leading(mesh, params_stack, config_axis)
        opt_state = shard_leading(mesh, opt_state, config_axis)
        keys = shard_leading(mesh, keys, config_axis)

    histories = []
    for g in range(n_cfg):
        h = {"MSE": []}
        if beta[g] != 0:
            h["KLD"] = []
        if lamb[g] != 0:
            h["OE"] = []
        h.update({"Train loss": [], "Valid loss": []})
        histories.append(h)

    if state_file and os.path.isfile(state_file):
        # full ensemble train state: every lane resumes bit-for-bit
        # (params, Adam moments, per-config lr/plateau-count/stopped
        # flags, RNG keys), matching train_model's state_file semantics
        from .checkpoint import load_pytree, load_history
        state = load_pytree(state_file, {
            "params": params_stack, "opt": opt_state, "lrs": lrs,
            "counts": counts, "stopped": np.zeros(n_cfg, np.int32),
            "keys": np.asarray(keys)})
        params_stack, opt_state = state["params"], state["opt"]
        lrs = np.asarray(state["lrs"], np.float32)
        counts = np.asarray(state["counts"], np.int64)
        stopped = np.asarray(state["stopped"], bool)
        keys = np.asarray(state["keys"])
        if mesh is not None:
            from ..parallel.mesh import shard_leading
            params_stack = shard_leading(mesh, params_stack, config_axis)
            opt_state = shard_leading(mesh, opt_state, config_axis)
            keys = shard_leading(mesh, keys, config_axis)
        if hist_files:
            for g in range(n_cfg):
                if os.path.isfile(hist_files[g]):
                    histories[g] = load_history(hist_files[g])
        print(f"Resuming ensemble train state from {state_file} "
              f"({int(stopped.sum())}/{n_cfg} configs already stopped)")
        if stopped.all():
            print("All configs already terminated by the plateau schedule "
                  "— not resuming past it")
            return params_stack, histories

    def _save_state():
        from .checkpoint import save_pytree
        save_pytree(state_file, {
            "params": params_stack, "opt": opt_state, "lrs": lrs,
            "counts": counts, "stopped": stopped.astype(np.int32),
            "keys": np.asarray(keys)})

    load_cache = LoadCache()
    print(f"STARTING ENSEMBLE TRAINING ({n_cfg} configs, "
          f"loads/epoch: {len(train_sample)})")
    for epoch in range(n_epochs):
        start_time = time.time()
        print(f"\nEpoch {epoch + 1}/{n_epochs} [x{n_cfg} configs]:")
        sums = np.zeros((n_cfg, 4))
        n_seen = np.zeros(n_cfg)
        for bkg_sample, ood_sample in train_sample:
            batches = load_cache.get(
                (bkg_sample, ood_sample), (batch_size, 1),
                lambda: batch_load(features(bkg_sample), features(ood_sample),
                                   bkg_sample["weights"],
                                   ood_sample["weights"], batch_size, 1),
                mesh=mesh, data_axis=None)
            keys, subs = _split_keys(keys)
            params_stack, opt_state, metrics = train_on_load(
                params_stack, opt_state, lrs, hyper, subs, *batches)
            metrics = np.asarray(metrics)          # (G, n_batches, 5)
            sums += metrics[:, :, :4].sum(axis=1)
            n_seen += metrics[:, :, 4].sum(axis=1)
        valid_sums = np.zeros((n_cfg, 2))
        for bkg_sample, ood_sample in valid_sample:
            vbs = min(valid_batch_size, len(bkg_sample["weights"]))
            batches = load_cache.get(
                (bkg_sample, ood_sample), (vbs, 1),
                lambda: batch_load(features(bkg_sample), features(ood_sample),
                                   bkg_sample["weights"],
                                   ood_sample["weights"], vbs, 1),
                mesh=mesh, data_axis=None)
            keys, subs = _split_keys(keys)
            vmetrics = np.asarray(valid_losses(params_stack, hyper, subs,
                                               *batches))
            valid_sums += vmetrics.sum(axis=1)

        denom = np.where(n_seen > 0, n_seen, 1.0)
        per_cfg = sums / denom[:, None]
        valid_loss = valid_sums[:, 0] / np.maximum(valid_sums[:, 1], 1)
        for g in range(n_cfg):
            if stopped[g]:
                continue
            losses = {"MSE": per_cfg[g, 0]}
            if beta[g] != 0:
                losses["KLD"] = per_cfg[g, 1]
            if lamb[g] != 0:
                losses["OE"] = per_cfg[g, 2]
            losses["Train loss"] = per_cfg[g, 3]
            losses["Valid loss"] = valid_loss[g]
            for k in histories[g]:
                # a resumed history may carry keys this run doesn't
                # produce (e.g. 'KLD' saved with beta != 0, resumed with
                # beta == 0) — pad with 0.0 like train/loop.py does
                histories[g][k] = list(histories[g][k]) + [
                    float(losses[k]) if k in losses else 0.0]
            if hist_files:
                save_history(histories[g], hist_files[g])
            if epoch > 0 or len(histories[g]["Train loss"]) > 1:
                model_out = model_outs[g] if model_outs else None
                new_lr, count = _checkpoint_config(
                    params_stack, g, lrs[g], histories[g], model_out,
                    counts[g])
                if count is None:
                    stopped[g] = True
                    lrs[g] = 0.0       # bit-exact freeze: updates *= lr
                else:
                    lrs[g], counts[g] = new_lr, count
        ticker = "  ".join(
            f"cfg{g}: train={per_cfg[g, 3]:4.3e} valid={valid_loss[g]:4.3e}"
            + (" [stopped]" if stopped[g] else "")
            for g in range(n_cfg))
        print(f"{ticker}  ({time.time() - start_time:.1f}s)")
        if state_file:
            _save_state()
        if stopped.all():
            print("All configs terminated by the plateau schedule")
            break
    return params_stack, histories


def _checkpoint_config(params_stack, g, lr, history, model_out, count):
    """Per-config plateau controller; fetches config ``g``'s weights to
    host only when they improved (the save path)."""
    hist = history["Train loss"]
    improved = len(hist) > 1 and hist[-1] < np.min(hist[:-1]) - 1e-3
    params_g = (tree_slice(params_stack, g) if improved and model_out
                else None)
    return model_checkpoint(params_g, lr, history,
                            model_out if params_g is not None else None,
                            count)
