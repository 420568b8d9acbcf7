"""Supervised jet-ID training: jitted steps + Keras-callback semantics.

Replaces the reference's ``model.fit`` + callback stack
(ref jet-ID/models.py:94-99, jet-ID/classifier.py:257-271):

* weighted sparse categorical cross-entropy with optional class weights
  (ref classifier compile :79) and per-sample weights,
* ModelCheckpoint(save_best_only) + ReduceLROnPlateau(patience 5,
  factor 0.5, min_delta 1e-6) + EarlyStopping(restore_best_weights) +
  TerminateOnNaN, all watching one configurable ``monitor`` series
  ('loss' / 'accuracy' / 'val_loss' / 'val_accuracy'; the reference's
  --metrics default is train 'loss', ref jet-ID/models.py:94-99,
  classifier.py:47),
* MirroredStrategy data parallelism becomes the shard_map mesh from
  atlasvae.parallel (batch scaling n_gpus x 5e3, ref classifier.py:136-138).
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models.jetid import jetid_apply, l2_penalty
from .step import make_optimizer, clip_gradients, LoadCache, device_put_load
from .checkpoint import save_pytree


def _ce_loss(probs, labels, weights):
    # one-hot mask-and-sum instead of take_along_axis: a row gather
    # serializes on the TPU's scatter/gather unit (~50 us per 5e3-row
    # step, measured in benchmarks/anatomy_jetid.py), while the masked
    # reduction rides the VPU at full width; adding the (C-1) exact
    # zeros is bit-identical in f32
    p = jnp.sum(probs * jax.nn.one_hot(labels, probs.shape[1],
                                       dtype=probs.dtype), axis=1)
    ce = -jnp.log(jnp.maximum(p, 1e-7))
    return jnp.sum(ce * weights) / jnp.maximum(jnp.sum(weights), 1e-30)


def make_jetid_step_fns(optimizer, config, jit=True, masked=False,
                        mesh=None, data_axis="data"):
    """Build (train_epoch, eval_epoch).  With ``mesh``, both run under
    ``shard_map`` with the batch axis sharded over ``data_axis`` and
    gradients/metric sums psum-reduced over ICI — the TPU equivalent of
    the reference's ``MirroredStrategy`` synchronous data parallelism
    (ref jet-ID/models.py:69-81; per-replica batch scaling
    batch = n_devices x 5e3, ref classifier.py:136-138).  Dropout keys
    are folded with the replica index, matching MirroredStrategy's
    independent per-replica dropout masks; with dropout 0 the DP step
    equals the single-device step to f32 reduction order."""
    in_dp = mesh is not None
    if in_dp and masked:
        raise ValueError("masked fold training shards the fold axis "
                         "(make_jetid_fold_step_fns), not the data axis")
    n_shards = mesh.shape[data_axis] if in_dp else 1

    # kernel L2 term, included in train AND eval loss exactly as Keras
    # adds regularization losses to both fit and evaluate
    # (ref jet-ID/models.py:10 kernel_regularizer=l2(args.l2))
    def _reg(params):
        return config.l2 * l2_penalty(params) if config.l2 else 0.0

    def batch_loss(params, batch, key):
        inputs, labels, weights = batch
        if in_dp:
            # independent per-replica dropout masks (MirroredStrategy
            # replicas draw their own RNG, ref jet-ID/models.py:72)
            key = jax.random.fold_in(key, jax.lax.axis_index(data_axis))
        probs = jetid_apply(params, config, inputs, key=key, train=True)
        p = jnp.sum(probs * jax.nn.one_hot(labels, probs.shape[1],
                                           dtype=probs.dtype), axis=1)
        num = jnp.sum(-jnp.log(jnp.maximum(p, 1e-7)) * weights)
        den = jnp.sum(weights)
        acc_num = jnp.sum((jnp.argmax(probs, 1) == labels) * weights)
        if in_dp:
            den = jax.lax.psum(den, data_axis)
            num_global = jax.lax.psum(jax.lax.stop_gradient(num), data_axis)
            acc_num = jax.lax.psum(acc_num, data_axis)
        else:
            num_global = num
        den = jnp.maximum(den, 1e-30)
        # local loss: sum(local ce)/global weight + reg/n — psum of its
        # gradient is exactly the global weighted-mean + reg gradient
        loss = num / den + _reg(params) / n_shards
        metrics = jnp.stack([num_global / den + _reg(params), acc_num / den])
        return loss, metrics

    grad_fn = jax.grad(batch_loss, has_aux=True)

    def train_epoch(params, opt_state, lr, key, inputs, labels, weights):
        def step(carry, batch):
            params, opt_state, key = carry
            key, sub = jax.random.split(key)
            grads, metrics = grad_fn(params, batch, sub)
            if in_dp:
                grads = jax.lax.psum(grads, data_axis)
            grads = clip_gradients(grads)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            updates = jax.tree.map(lambda u: u * lr, updates)
            params = optax.apply_updates(params, updates)
            return (params, opt_state, key), metrics

        (params, opt_state, _), metrics = jax.lax.scan(
            step, (params, opt_state, key), (inputs, labels, weights))
        return params, opt_state, metrics

    def train_epoch_masked(params, opt_state, lr, key, inputs, labels,
                           weights, mask):
        """train_epoch plus a per-batch real/padding mask: a masked-out
        batch must be a bit-exact no-op — zero-weight rows already
        contribute nothing to the CE gradient, but the optimizer step
        itself is not a no-op (Adam moments decay, the L2-regularizer
        gradient is weight-independent) and the dropout key split must
        not be consumed, or an unequal k-fold grid would diverge from k
        sequential runs."""
        def step(carry, batch):
            params, opt_state, key = carry
            *data, real = batch
            new_key, sub = jax.random.split(key)
            grads, metrics = grad_fn(params, tuple(data), sub)
            grads = clip_gradients(grads)
            updates, new_opt = optimizer.update(grads, opt_state, params)
            updates = jax.tree.map(lambda u: u * lr, updates)
            new_params = optax.apply_updates(params, updates)
            keep = lambda new, old: jax.tree.map(
                lambda a, b: jnp.where(real > 0, a, b), new, old)
            return (keep(new_params, params), keep(new_opt, opt_state),
                    keep(new_key, key)), metrics

        (params, opt_state, _), metrics = jax.lax.scan(
            step, (params, opt_state, key), (inputs, labels, weights, mask))
        return params, opt_state, metrics

    if masked:
        train_epoch = train_epoch_masked

    def eval_epoch(params, inputs, labels, weights):
        def step(_, batch):
            inputs, labels, w = batch
            probs = jetid_apply(params, config, inputs, train=False)
            # (weighted-CE sum incl. reg, weight sum, weighted-correct
            # sum) — local partial sums under DP; psum gives the
            # single-device triple exactly
            p = jnp.sum(probs * jax.nn.one_hot(labels, probs.shape[1],
                                               dtype=probs.dtype), axis=1)
            num = jnp.sum(-jnp.log(jnp.maximum(p, 1e-7)) * w)
            correct = jnp.sum((jnp.argmax(probs, 1) == labels) * w)
            trip = jnp.stack([num + _reg(params) * jnp.sum(w), jnp.sum(w),
                              correct])
            return None, jax.lax.psum(trip, data_axis) if in_dp else trip

        _, metrics = jax.lax.scan(step, None, (inputs, labels, weights))
        return metrics

    if in_dp:
        from jax.sharding import PartitionSpec as P
        from jax import shard_map
        rep, sharded = P(), P(None, data_axis)
        train_epoch = shard_map(
            train_epoch, mesh=mesh,
            in_specs=(rep, rep, rep, rep, sharded, sharded, sharded),
            out_specs=(rep, rep, rep), check_vma=False)
        eval_epoch = shard_map(
            eval_epoch, mesh=mesh,
            in_specs=(rep, sharded, sharded, sharded),
            out_specs=rep, check_vma=False)

    if not jit:
        return train_epoch, eval_epoch
    return jax.jit(train_epoch), jax.jit(eval_epoch)


def make_jetid_fold_step_fns(optimizer, config):
    """(train_epoch, eval_epoch) vmapped over a leading FOLD axis —
    params, optimizer state, lr, key AND the data all carry the fold
    axis (each fold trains on its own complement), so k-fold
    cross-validation (ref jet-ID/utils.py:532-566; one Slurm task per
    fold in the reference) runs as ONE device program: one XLA compile
    and one dispatch stream instead of k (MXU FLOPs still scale with k
    — see train/ensemble.py docstring for the measured trade)."""
    raw_train, raw_eval = make_jetid_step_fns(optimizer, config, jit=False,
                                              masked=True)
    train = jax.vmap(raw_train, in_axes=(0, 0, 0, 0, 0, 0, 0, 0))
    evalf = jax.vmap(raw_eval, in_axes=(0, 0, 0, 0))
    return jax.jit(train), jax.jit(evalf)


def train_kfold_vmapped(params_list, config, fold_loads, fold_valids,
                        epochs=100, batch_size=5000, lr=1e-3, patience=10,
                        model_outs=None, seed=0, verbose=True,
                        min_delta=1e-6, monitor="val_loss"):
    """Train all k folds simultaneously as one vmapped program.

    ``fold_loads`` / ``fold_valids``: per-fold (inputs, labels, weights)
    tuples.  Folds are padded with zero-weight rows to a common batch
    grid (zero weight rows contribute nothing to loss, gradient or
    metrics).  Per-fold Keras-callback semantics mirror
    ``train_classifier_streaming`` (best-val checkpoint, plateau lr/2
    after 5, early stop restoring best); a stopped fold freezes
    bit-exactly via lr=0.  Returns (best params per fold, histories).
    """
    from .ensemble import stack_trees, tree_slice, init_ensemble_opt_state
    k = len(fold_loads)
    optimizer = make_optimizer()

    def pack_common(loads):
        """_pack each fold to the max padded length, stack along fold.

        Also returns each fold's count of REAL batches (those holding at
        least one non-padding row): a smaller fold's tail batches are
        all-padding (zero weight, ~0 loss / 0 accuracy) and must not
        dilute its logged train metrics — partially padded batches are
        exact already because the per-batch metrics are weighted means.
        """
        sizes = [len(l[1]) for l in loads]
        n_max = max(sizes)
        bs = min(batch_size, n_max)
        n_real = [max(1, -(-n // bs)) for n in sizes]
        packed = []
        for inputs, labels, weights in loads:
            n = len(labels)
            pad = n_max - n
            if pad:
                inputs = {key: np.concatenate(
                    [np.asarray(v),
                     np.zeros((pad,) + np.asarray(v).shape[1:],
                              np.asarray(v).dtype)]) for key, v in inputs.items()}
                labels = np.concatenate([labels, np.zeros(pad, np.int32)])
                weights = np.concatenate(
                    [np.asarray(weights, np.float32), np.zeros(pad, np.float32)])
            packed.append(_pack(inputs, labels, weights, bs))
        return stack_trees(packed), n_real

    packed_loads, n_real = pack_common(fold_loads)
    packed_valids, _ = pack_common(fold_valids)
    batches = device_put_load(packed_loads)
    v_batches = device_put_load(packed_valids)
    # (k, n_batches) real-batch mask: all-padding tail batches of the
    # smaller folds must be bit-exact no-ops (see train_epoch_masked)
    n_batches_common = len(packed_loads[1][0])
    batch_mask = np.zeros((k, n_batches_common), np.float32)
    for f in range(k):
        batch_mask[f, :n_real[f]] = 1.0
    train_epoch, eval_epoch = make_jetid_fold_step_fns(optimizer, config)

    params = stack_trees([jax.tree.map(np.asarray, p) for p in params_list])
    opt_state = init_ensemble_opt_state(optimizer, params)
    lrs = np.full(k, float(lr), np.float32)
    # every fold draws the SAME dropout-noise stream, matching k
    # sequential train_classifier(seed=seed) calls exactly
    keys = np.stack([np.asarray(jax.random.PRNGKey(seed))] * k)
    best_val = np.full(k, np.inf)
    best_params = [tree_slice(params, f) for f in range(k)]
    lr_wait = np.zeros(k, np.int64)
    stop_wait = np.zeros(k, np.int64)
    stopped = np.zeros(k, bool)
    histories = [{"loss": [], "val_loss": [], "accuracy": [],
                  "val_accuracy": []} for _ in range(k)]
    if monitor not in histories[0]:
        raise ValueError(f"monitor {monitor!r}: pick one of "
                         f"{list(histories[0])}")
    sign = -1.0 if "accuracy" in monitor else 1.0     # Keras mode max/min

    split2 = jax.jit(jax.vmap(lambda kk: tuple(jax.random.split(kk))))
    for epoch in range(epochs):
        start = time.time()
        keys, subs = (np.asarray(a) for a in split2(keys))
        params, opt_state, metrics = train_epoch(params, opt_state, lrs,
                                                 subs, *batches, batch_mask)
        m = np.asarray(metrics)                       # (k, n_batches, 2)
        vm = np.asarray(eval_epoch(params, *v_batches))
        val_loss = vm[:, :, 0].sum(axis=1) / vm[:, :, 1].sum(axis=1)
        if not np.isfinite(m).all():                  # TerminateOnNaN
            print("NaN loss encountered — terminating k-fold training")
            break
        val_acc = vm[:, :, 2].sum(axis=1) / vm[:, :, 1].sum(axis=1)
        for f in range(k):
            if stopped[f]:
                continue
            histories[f]["loss"].append(float(m[f, :n_real[f], 0].mean()))
            histories[f]["accuracy"].append(
                float(m[f, :n_real[f], 1].mean()))
            histories[f]["val_loss"].append(float(val_loss[f]))
            histories[f]["val_accuracy"].append(float(val_acc[f]))
            score = sign * histories[f][monitor][-1]
            if score < best_val[f] - min_delta:
                best_val[f] = score
                best_params[f] = tree_slice(params, f)
                lr_wait[f] = stop_wait[f] = 0
                if model_outs:
                    save_pytree(model_outs[f], best_params[f])
            else:
                lr_wait[f] += 1
                stop_wait[f] += 1
                if lr_wait[f] >= 5:                   # ReduceLROnPlateau
                    lrs[f] *= 0.5
                    lr_wait[f] = 0
            if stop_wait[f] >= patience:              # EarlyStopping
                stopped[f] = True
                lrs[f] = 0.0                          # bit-exact freeze
        if verbose:
            ticker = "  ".join(
                f"fold{f}: val={val_loss[f]:.4f}"
                + (" [stopped]" if stopped[f] else "") for f in range(k))
            print(f"Epoch {epoch + 1}/{epochs} [x{k} folds]: {ticker} "
                  f"({time.time() - start:.1f}s)")
        if stopped.all():
            break
    return best_params, histories


def _pack(inputs, labels, weights, batch_size):
    n = len(labels)
    n_batches = max(1, -(-n // batch_size))
    padded = n_batches * batch_size

    def pad(a):
        a = np.asarray(a)
        out = np.zeros((padded,) + a.shape[1:], a.dtype)
        out[:n] = a
        return out.reshape((n_batches, batch_size) + a.shape[1:])

    w = np.zeros(padded, np.float32)
    w[:n] = weights
    # host-side numpy: the single host->device transfer happens in
    # device_put_load (LoadCache / v_batches), where the optional
    # ATLASVAE_TRANSFER_DTYPE wire format can apply
    return ({k: pad(v) for k, v in inputs.items()},
            pad(labels.astype(np.int32)),
            w.reshape(n_batches, batch_size))


def train_classifier(params, config, inputs, labels, valid_inputs, valid_labels,
                     epochs=100, batch_size=5000, lr=1e-3, patience=10,
                     class_weight=None, sample_weight=None, model_out=None,
                     seed=0, verbose=True, state_file=None, mesh=None,
                     monitor="val_loss"):
    """Fit the classifier on an in-memory sample; returns
    (best params, history dict).  Delegates to the streaming trainer
    with a single pre-weighted load per epoch."""
    weights = np.ones(len(labels), np.float32) if sample_weight is None \
        else np.asarray(sample_weight, np.float32)
    if class_weight is not None:
        weights = weights * np.asarray([class_weight[int(l)] for l in labels],
                                       np.float32)
    return train_classifier_streaming(
        params, config, lambda: [(inputs, labels, weights)], valid_inputs,
        valid_labels, epochs, batch_size, lr, patience, model_out, seed,
        verbose, state_file=state_file, mesh=mesh, monitor=monitor)


def train_classifier_streaming(params, config, load_iter_fn, valid_inputs,
                               valid_labels, epochs=10, batch_size=5000,
                               lr=1e-3, patience=10, model_out=None, seed=0,
                               verbose=True, min_delta=1e-6, state_file=None,
                               mesh=None, monitor="val_loss"):
    """Generator-based training (ref jet-ID/classifier.py:257-266
    generator path) — the single implementation of the epoch loop.

    ``load_iter_fn()`` returns an iterable of (inputs, labels, weights)
    loads per epoch.  Callback semantics per ref jet-ID/models.py:94-99:
    ModelCheckpoint(best), ReduceLROnPlateau(patience 5, factor 0.5,
    min_delta), EarlyStopping(restore best), TerminateOnNaN.  All three
    monitor the ``monitor`` series — 'loss' / 'accuracy' / 'val_loss' /
    'val_accuracy', higher-is-better for the accuracy pair — exactly as
    the reference threads one ``--metrics`` name into every callback
    (ref jet-ID/models.py:94-99, classifier.py:47,256).

    ``state_file``: full-train-state checkpoint (params, best params,
    Adam moments, lr, callback counters, RNG key) written every epoch
    and resumed from when present — a resumed run continues bit-exactly
    (Keras' weights-only ModelCheckpoint restarts the optimizer and
    callback state, SURVEY.md S5).
    """
    import os
    from .checkpoint import load_pytree
    optimizer = make_optimizer()
    opt_state = optimizer.init(params)
    lr = float(lr)
    if mesh is not None:
        # even per-replica shards (MirroredStrategy splits its global
        # batch the same way, ref jet-ID/classifier.py:136-138)
        n_shards = mesh.shape["data"]
        batch_size = max(n_shards, batch_size - batch_size % n_shards)
    train_epoch, eval_epoch = make_jetid_step_fns(optimizer, config,
                                                  mesh=mesh)
    v_batch = min(batch_size, len(valid_labels))
    if mesh is not None:
        v_batch = max(n_shards, v_batch - v_batch % n_shards)
    v_batches = device_put_load(_pack(valid_inputs, valid_labels,
                                      np.ones(len(valid_labels), np.float32),
                                      v_batch), mesh=mesh)
    key = jax.random.PRNGKey(seed)
    history = {"loss": [], "val_loss": [], "accuracy": [],
               "val_accuracy": []}
    if monitor not in history:
        raise ValueError(f"monitor {monitor!r}: pick one of {list(history)}")
    sign = -1.0 if "accuracy" in monitor else 1.0  # Keras mode max/min
    best_val, best_params, lr_wait, stop_wait = np.inf, params, 0, 0
    monitors = ("loss", "val_loss", "accuracy", "val_accuracy")
    if state_file and os.path.isfile(state_file):
        template = {
            "params": params, "best": params, "opt": opt_state,
            "lr": np.float32(lr), "best_val": np.float32(0),
            "lr_wait": np.int32(0), "stop_wait": np.int32(0), "key": key,
            "monitor": np.int32(monitors.index(monitor))}
        try:
            st = load_pytree(state_file, template)
            saved = monitors[int(st["monitor"])]
        except KeyError:  # pre-monitor state file: always watched val_loss
            template.pop("monitor")
            st = load_pytree(state_file, template)
            saved = "val_loss"
        if saved != monitor:
            # best_val is a sign-flipped score in the saved series' units;
            # comparing it against another series corrupts every callback
            raise ValueError(
                f"{state_file} was trained monitoring {saved!r}; resuming "
                f"with monitor={monitor!r} would compare incompatible "
                "scores — pass the same --metrics or start a fresh state "
                "file")
        params, best_params, opt_state = st["params"], st["best"], st["opt"]
        lr, best_val = float(st["lr"]), float(st["best_val"])
        lr_wait, stop_wait = int(st["lr_wait"]), int(st["stop_wait"])
        key = st["key"]
        if stop_wait >= patience:  # stop decision was already recorded
            print(f"Training already early-stopped (state file {state_file})"
                  " — returning best weights")
            return best_params, history
        print(f"Resuming full classifier state from {state_file} "
              f"(lr={lr:g}, best {monitor}={sign * best_val:.4f})")
    load_cache = LoadCache()
    for epoch in range(epochs):
        start = time.time()
        sums = np.zeros(2)
        n_loads = 0
        for inputs, labels, weights in load_iter_fn():
            # key on (inputs, labels) alone when weights default to ones —
            # a per-epoch np.ones would otherwise break identity caching
            cache_key = (inputs, labels) if weights is None \
                else (inputs, labels, weights)
            w = weights

            def build():
                ww = np.ones(len(labels), np.float32) if w is None else w
                return _pack(inputs, labels, ww, batch_size)

            batches = load_cache.get(cache_key, batch_size, build, mesh=mesh)
            key, sub = jax.random.split(key)
            params, opt_state, metrics = train_epoch(params, opt_state,
                                                     np.float32(lr), sub,
                                                     *batches)
            m = np.asarray(metrics)
            if not np.isfinite(m).all():  # TerminateOnNaN (ref models.py:99)
                print("NaN loss encountered — terminating training")
                return best_params, history
            sums += m.mean(axis=0)
            n_loads += 1
        vm = np.asarray(eval_epoch(params, *v_batches))
        val_loss = vm[:, 0].sum() / vm[:, 1].sum()
        history["loss"].append(float(sums[0] / max(n_loads, 1)))
        history["accuracy"].append(float(sums[1] / max(n_loads, 1)))
        history["val_loss"].append(float(val_loss))
        history["val_accuracy"].append(float(vm[:, 2].sum() / vm[:, 1].sum()))
        if verbose:
            print(f"Epoch {epoch + 1}/{epochs}: loss={history['loss'][-1]:.4f} "
                  f"acc={100 * history['accuracy'][-1]:.2f}% "
                  f"val_loss={val_loss:.4f} ({time.time() - start:.1f}s)")
        score = sign * history[monitor][-1]
        if score < best_val - min_delta:  # ModelCheckpoint(best)
            best_val, best_params = score, params
            lr_wait = stop_wait = 0
            if model_out:
                save_pytree(model_out, params)
        else:
            lr_wait += 1
            stop_wait += 1
            if lr_wait >= 5:  # ReduceLROnPlateau (ref models.py:96)
                lr *= 0.5
                if verbose:
                    print(f"Reducing learning rate to {lr}")
                lr_wait = 0
        if state_file:
            # written BEFORE any break so the state records the stop
            # decision (stop_wait >= patience) and a rerun resumes as
            # already-stopped rather than training past it
            save_pytree(state_file, {
                "params": params, "best": best_params, "opt": opt_state,
                "lr": np.float32(lr), "best_val": np.float32(best_val),
                "lr_wait": np.int32(lr_wait), "stop_wait": np.int32(stop_wait),
                "key": key, "monitor": np.int32(monitors.index(monitor))})
        if stop_wait >= patience:
            if verbose:
                print("Early stopping — restoring best weights")
            break
    return best_params, history


@functools.lru_cache(maxsize=None)
def _predict_fn(config):
    """One jitted inference program per config: a fresh ``jax.jit``
    wrapper per call would own its own (empty) cache and re-pay the
    ~20-40 s tunnel-side compile on every predict (feature_removal and
    cross_valid call predict once per ablation/fold)."""
    return jax.jit(lambda p, i: jetid_apply(p, config, i, train=False))


def predict_classifier(params, config, inputs, batch_size=20_000):
    """Chunked class-probability inference (ref classifier predict,
    jet-ID/utils.py:547-551)."""
    try:
        apply_fn = _predict_fn(config)
    except TypeError:  # unhashable config (list-valued fields)
        apply_fn = jax.jit(lambda p, i: jetid_apply(p, config, i, train=False))
    n = len(next(iter(inputs.values())))
    out = []
    for i in range(0, n, batch_size):
        chunk = {k: jnp.asarray(np.asarray(v)[i:i + batch_size])
                 for k, v in inputs.items()}
        out.append(np.asarray(apply_fn(params, chunk)))
    return np.concatenate(out)
