"""Adversarial-autoencoder training: the 3-phase GAN cycle as jitted scans.

Re-implements the reference's ``train_AAE`` (ref OE-AAE/aae.py:119-292):

Per cycle (ref :120-121 ``epoch_dict``: AE x100 on the first cycle then
x0; Disc x5; AAE x5):
  (a) AE epochs      — weighted MAE reconstruction + lambda * OE sigmoid
                       gap on (QCD, OoD) pairs (ref :158, aae.py:60-64,88),
  (b) Disc epochs    — 3-class weighted sparse CE on {QCD: 0,
                       reconstructed QCD: 1, OoD: 2} (ref :196-210),
  (c) AAE epochs     — AE losses + beta * CE of the *frozen*
                       discriminator on reconstructions labelled
                       {bkg: 0, OoD: 1} (ref :240-252; fooling objective).

TPU redesign: Keras ``trainable=False`` freezing becomes masked updates
over disjoint parameter subtrees of ONE shared Adam state; each
phase-epoch is one ``lax.scan`` over shuffled batches inside a single
jitted program.  The reference creates a single Adam(lr=1e-6) INSTANCE
and hands it to all three compiles (ref aae.py:75,88,95,112), so its
``iterations`` counter — and hence the bias-correction power t —
advances globally across phases; ``make_gan_optimizer`` preserves that
quirk exactly (verified head-to-head in
tests/test_reference_aae_trajectory.py).

Data parallelism: with ``mesh``, every phase epoch runs under
``shard_map`` with the batch axis sharded over the ``data`` axis and
gradients psum-reduced over ICI — the MirroredStrategy pattern
(ref jet-ID/models.py:69-81) applied to the GAN cycle workload.  Each
phase's weighted-mean loss is computed as local-sum / global-weight so
the psum of per-shard gradients is exactly the global weighted-mean
gradient; the frozen-discriminator subtree never enters the reduction
(only AE-subtree grads are psummed in the AAE phase).  The cycle is
deterministic (no dropout/noise), so the DP epoch equals the
single-device epoch up to f32 reduction order.
"""

import os
import pickle
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models.aae import ae_apply, discriminator_apply
from .step import clip_gradients
from .checkpoint import save_pytree, load_pytree

AE_KEYS = ("encoder", "decoder")
DISC_KEYS = ("discriminator",)


def _subtree(params, keys):
    return {k: params[k] for k in keys}


def make_gan_optimizer(b1=0.9, b2=0.999, eps=1e-7):
    """Shared-iteration Adam over the full AAE param tree.

    The reference builds ONE ``optimizers.Adam(lr=1e-6)`` and passes it
    to the AE, Discriminator and AAE compiles (ref OE-AAE/aae.py:75,
    88,95,112).  TF-2.1-era (legacy) Keras Adam keeps per-variable
    slots but a single global ``iterations`` counter, so every
    ``train_on_batch`` of ANY phase advances the bias-correction power
    t — e.g. the first Discriminator step after 100 AE epochs runs at
    t=101, not t=1.  ``update()`` steps only the ``keys`` subtree (the
    phase's trainable variables); the frozen subtree's moments pass
    through untouched, exactly like Keras slots of variables absent
    from the phase's train op.

    The update uses the TF kernel's exact legacy formulation
    ``alpha * m / (sqrt(v) + eps)`` with
    ``alpha = sqrt(1 - b2^t) / (1 - b1^t)`` — epsilon OUTSIDE the bias
    correction — and the Keras default ``eps=1e-7``, so the head-to-head
    trajectory parity bound is f32 reduction order, not formulation.
    The returned updates are unscaled by lr (the step fns multiply by a
    traced lr, see ``make_optimizer``).
    """

    class _GanAdam:
        def init(self, params):
            return {"count": jnp.zeros((), jnp.int32),
                    "mu": jax.tree.map(jnp.zeros_like, params),
                    "nu": jax.tree.map(jnp.zeros_like, params)}

        def update(self, grads, state, keys):
            count = state["count"] + 1
            t = count.astype(jnp.float32)
            alpha = jnp.sqrt(1.0 - b2 ** t) / (1.0 - b1 ** t)
            mu = jax.tree.map(lambda m, g: b1 * m + (1.0 - b1) * g,
                              _subtree(state["mu"], keys), grads)
            nu = jax.tree.map(lambda v, g: b2 * v + (1.0 - b2) * g * g,
                              _subtree(state["nu"], keys), grads)
            updates = jax.tree.map(
                lambda m, v: -alpha * m / (jnp.sqrt(v) + eps), mu, nu)
            return updates, {"count": count,
                             "mu": {**state["mu"], **mu},
                             "nu": {**state["nu"], **nu}}

    return _GanAdam()


def _mae(x, y):
    return jnp.mean(jnp.abs(x - y), axis=-1)


def _sparse_ce(probs, labels):
    # one-hot mask-and-sum instead of take_along_axis: a row gather
    # serializes on the TPU's scatter/gather unit (~50 us per 5e3-row
    # step, measured), while the masked reduction rides the VPU at full
    # width; adding the (C-1) exact zeros is bit-identical in f32
    p = jnp.sum(probs * jax.nn.one_hot(labels, probs.shape[1],
                                       dtype=probs.dtype), axis=1)
    return -jnp.log(jnp.maximum(p, 1e-7))


def make_aae_step_fns(optimizer, lamb=0.0, beta=0.0, activation="relu",
                      lr=1.0, mesh=None, data_axis="data"):
    """Build jitted (ae_epoch, disc_epoch, aae_epoch) scan programs.

    ``optimizer`` is a shared-iteration GAN Adam from
    ``make_gan_optimizer`` (its state spans the FULL param tree and is
    threaded through all three phases, preserving the reference's
    single shared Adam instance, ref aae.py:75).  Each epoch fn takes
    (params, opt_state, perm, bkg_x, ood_x, bkg_w, ood_w)
    with batch-major (n_batches, batch, ...) arrays and a shuffled batch
    order ``perm`` (ref aae.py:149 shuffles batch order per epoch).

    With ``mesh``, all three phase epochs run under ``shard_map``, the
    batch axis sharded over ``data_axis``: per-shard gradients of
    local-sum/global-weight losses are psum-reduced, which equals the
    single-device global weighted-mean gradient exactly (the
    MirroredStrategy replacement for the GAN cycle,
    ref jet-ID/models.py:69-81 applied to ref OE-AAE/aae.py:119-292).
    """
    in_dp = mesh is not None

    def _wmean(loss, w):
        """(loss term for the gradient, metric value) weighted-mean pair.

        Under DP the loss term is local-sum / global-weight — psum of
        its per-shard gradients is the exact global weighted-mean
        gradient — and the metric is the fully psummed global mean
        (gradient-stopped).  Single-device: both are the plain
        sum(loss*w)/sum(w) weighted mean.
        """
        num = jnp.sum(loss * w)
        den = jnp.sum(w)
        if in_dp:
            den = jax.lax.psum(den, data_axis)
        den = jnp.maximum(den, 1e-30)
        local = num / den
        if not in_dp:
            return local, local
        return local, jax.lax.psum(jax.lax.stop_gradient(num), data_axis) / den

    def ae_losses(ae_params, rest, bkg_x, ood_x, bkg_w, ood_w):
        params = {**ae_params, **rest}
        recon_bkg = ae_apply(params, bkg_x, activation)
        recon_ood = ae_apply(params, ood_x, activation)
        mae_bkg = _mae(bkg_x, recon_bkg)
        mae_ood = _mae(ood_x, recon_ood)
        qcd = _wmean(mae_bkg, bkg_w)
        oe = _wmean(jax.nn.sigmoid(mae_bkg - mae_ood), ood_w)
        # the reference's out2 weighted-MAE metric = 'OoD-AE Loss'
        # (ref aae.py:90-92 weighted_metrics; recorded at :163-164,:274-275)
        _, ood_mae = _wmean(mae_ood, ood_w)
        return qcd, oe, ood_mae, recon_bkg, recon_ood

    # ---- phase (a): autoencoder
    def ae_batch_loss(ae_params, rest, batch):
        bkg_x, ood_x, bkg_w, ood_w = batch
        qcd, oe, ood_mae, _, _ = ae_losses(
            ae_params, rest, bkg_x, ood_x, bkg_w, ood_w)
        total = qcd[0] + lamb * oe[0]
        total_m = qcd[1] + lamb * oe[1]
        return total, jnp.stack([qcd[1], oe[1], total_m, ood_mae])

    ae_grad = jax.grad(ae_batch_loss, has_aux=True)

    def _reduce(grads):
        return jax.lax.psum(grads, data_axis) if in_dp else grads

    def ae_epoch(params, opt_state, perm, bkg_x, ood_x, bkg_w, ood_w):
        ae_params = _subtree(params, AE_KEYS)
        rest = _subtree(params, DISC_KEYS)

        def step(carry, idx):
            ae_params, opt_state = carry
            batch = tuple(arr[idx] for arr in (bkg_x, ood_x, bkg_w, ood_w))
            grads, metrics = ae_grad(ae_params, rest, batch)
            grads = clip_gradients(_reduce(grads))
            updates, opt_state = optimizer.update(grads, opt_state, AE_KEYS)
            updates = jax.tree.map(lambda u: u * lr, updates)
            ae_params = optax.apply_updates(ae_params, updates)
            return (ae_params, opt_state), metrics

        (ae_params, opt_state), metrics = jax.lax.scan(
            step, (ae_params, opt_state), perm)
        return {**ae_params, **rest}, opt_state, metrics

    # ---- phase (b): discriminator on {QCD, reconstructed QCD, OoD}
    def disc_batch_loss(disc_params, rest, batch):
        bkg_x, ood_x, bkg_w, ood_w = batch
        params = {**rest, **disc_params}
        recon_bkg = ae_apply(params, bkg_x, activation)
        x = jnp.concatenate([bkg_x, recon_bkg, ood_x])
        w = jnp.concatenate([bkg_w, bkg_w, ood_w])
        labels = jnp.concatenate([jnp.zeros_like(bkg_w), jnp.ones_like(bkg_w),
                                  2 * jnp.ones_like(ood_w)])
        probs = discriminator_apply(params, x, activation)
        ce = _sparse_ce(probs, labels)
        loss, loss_m = _wmean(ce, w)
        _, acc = _wmean((jnp.argmax(probs, axis=1) == labels).astype(jnp.float32), w)
        return loss, jnp.stack([loss_m, acc])

    disc_grad = jax.grad(disc_batch_loss, has_aux=True)

    def disc_epoch(params, opt_state, perm, bkg_x, ood_x, bkg_w, ood_w):
        disc_params = _subtree(params, DISC_KEYS)
        rest = _subtree(params, AE_KEYS)

        def step(carry, idx):
            disc_params, opt_state = carry
            batch = tuple(arr[idx] for arr in (bkg_x, ood_x, bkg_w, ood_w))
            grads, metrics = disc_grad(disc_params, rest, batch)
            grads = clip_gradients(_reduce(grads))
            updates, opt_state = optimizer.update(grads, opt_state, DISC_KEYS)
            updates = jax.tree.map(lambda u: u * lr, updates)
            disc_params = optax.apply_updates(disc_params, updates)
            return (disc_params, opt_state), metrics

        (disc_params, opt_state), metrics = jax.lax.scan(
            step, (disc_params, opt_state), perm)
        return {**rest, **disc_params}, opt_state, metrics

    # ---- phase (c): AAE — AE trained to fool the frozen discriminator
    def aae_batch_loss(ae_params, disc_params, batch):
        bkg_x, ood_x, bkg_w, ood_w = batch
        qcd, oe, ood_mae, recon_bkg, recon_ood = ae_losses(
            ae_params, disc_params, bkg_x, ood_x, bkg_w, ood_w)
        # reconstructions of everything, judged by the frozen disc with
        # fooling labels {bkg: 0 (QCD), OoD: 1 (recon-QCD)} (ref :240-252)
        recon_all = jnp.concatenate([recon_bkg, recon_ood])
        labels = jnp.concatenate([jnp.zeros_like(bkg_w), jnp.ones_like(ood_w)])
        w_all = jnp.concatenate([bkg_w, ood_w])
        frozen = jax.lax.stop_gradient(disc_params)
        probs = discriminator_apply({**frozen}, recon_all, activation)
        d_ce, d_ce_m = _wmean(_sparse_ce(probs, labels), w_all)
        _, d_acc = _wmean((jnp.argmax(probs, axis=1) == labels).astype(jnp.float32),
                          w_all)
        total = qcd[0] + lamb * oe[0] + beta * d_ce
        total_m = qcd[1] + lamb * oe[1] + beta * d_ce_m
        return total, jnp.stack([qcd[1], oe[1], total_m, d_ce_m, d_acc, ood_mae])

    aae_grad = jax.grad(aae_batch_loss, has_aux=True)

    def aae_epoch(params, opt_state, perm, bkg_x, ood_x, bkg_w, ood_w):
        ae_params = _subtree(params, AE_KEYS)
        disc_params = _subtree(params, DISC_KEYS)

        def step(carry, idx):
            ae_params, opt_state = carry
            batch = tuple(arr[idx] for arr in (bkg_x, ood_x, bkg_w, ood_w))
            grads, metrics = aae_grad(ae_params, disc_params, batch)
            # only the AE subtree is reduced: the frozen discriminator
            # never enters the collective (Keras trainable=False parity)
            grads = clip_gradients(_reduce(grads))
            updates, opt_state = optimizer.update(grads, opt_state, AE_KEYS)
            updates = jax.tree.map(lambda u: u * lr, updates)
            ae_params = optax.apply_updates(ae_params, updates)
            return (ae_params, opt_state), metrics

        (ae_params, opt_state), metrics = jax.lax.scan(
            step, (ae_params, opt_state), perm)
        # the REAL 3-class discriminator loss/accuracy on {bkg: 0,
        # recon-bkg: 1, OoD: 2} — what the reference records in
        # loss_history as 'Disc Loss'/'Disc Accuracy'.  It stores the
        # LAST batch's value with the post-update AE (loss_dict survives
        # the batch loop, ref OE-AAE/aae.py:270-281,:287), so one
        # evaluation after the scan is both exact parity and ~24%
        # cheaper than per-batch evaluation; the fooling d_ce/d_acc in
        # `metrics` are only PRINTED as 'D_Loss'/'D_Accuracy' (ref :282)
        last = tuple(arr[perm[-1]] for arr in (bkg_x, ood_x, bkg_w, ood_w))
        _, disc_m = disc_batch_loss(disc_params, ae_params, last)
        return {**ae_params, **disc_params}, opt_state, (metrics, disc_m)

    if in_dp:
        from jax.sharding import PartitionSpec as P
        from jax import shard_map
        rep, sharded = P(), P(None, data_axis)
        in_specs = (rep, rep, rep, sharded, sharded, sharded, sharded)
        ae_epoch = shard_map(ae_epoch, mesh=mesh, in_specs=in_specs,
                             out_specs=(rep, rep, rep), check_vma=False)
        disc_epoch = shard_map(disc_epoch, mesh=mesh, in_specs=in_specs,
                               out_specs=(rep, rep, rep), check_vma=False)
        aae_epoch = shard_map(aae_epoch, mesh=mesh, in_specs=in_specs,
                              out_specs=(rep, rep, (rep, rep)),
                              check_vma=False)
    return jax.jit(ae_epoch), jax.jit(disc_epoch), jax.jit(aae_epoch)


def train_aae(params, train_generator, n_cycles, batch_size, output_dir,
              model_out="AAE.npz", hist_file="history.pkl", ae_weights="",
              lamb=0.0, beta=0.0, lr=1e-6, seed=0, feature_key=None,
              mesh=None):
    """The full cycle schedule (ref OE-AAE/aae.py:119-292).

    Uses ONE load from the generator (the reference takes
    ``train_generator[0]``, ref :124) and runs the AE/Disc/AAE phase
    epochs per cycle.  Returns (params, loss_history) with the
    reference's (cycle, epoch_counter, value) history tuples.

    ``feature_key=None`` assembles the model inputs with the standard
    constituents+HLVs feature stack — equal to 'HLVs' at the canonical
    HLVs-only config, and consistent with the model's input_dim and the
    eval side when constituents are on.  (The reference hardcodes
    sample['HLVs'] at aae.py:124-125 while sizing the model WITH
    constituents at train.py:71 — '--constituents ON' would crash it;
    a reference bug not replicated, per SURVEY S7.)
    """
    epoch_dict = {"AE": np.full(n_cycles, 0), "Disc": np.full(n_cycles, 5),
                  "AAE": np.full(n_cycles, 5)}
    if n_cycles > 0:
        epoch_dict["AE"][0] = 100

    sample = train_generator[0]
    bkg_sample, ood_sample = sample if isinstance(sample, tuple) else (sample["bkg"], sample["OoD"])
    if feature_key is None:
        from .loop import features
        bkg_x = np.asarray(features(bkg_sample), np.float32)
        ood_x = np.asarray(features(ood_sample), np.float32)
    else:
        bkg_x = np.asarray(bkg_sample[feature_key], np.float32)
        ood_x = np.asarray(ood_sample[feature_key], np.float32)
    bkg_w = np.asarray(bkg_sample["weights"], np.float32)
    ood_w = np.asarray(ood_sample["weights"], np.float32)
    n = len(bkg_x)
    if mesh is not None:
        # even per-replica shards (MirroredStrategy splits its global
        # batch the same way, ref jet-ID/classifier.py:136-138)
        n_shards = mesh.shape["data"]
        batch_size = max(n_shards, batch_size - batch_size % n_shards)
    n_batches = int(np.ceil(n / batch_size))
    pad = n_batches * batch_size - n
    if pad:  # zero-weight tail padding
        bkg_x = np.concatenate([bkg_x, np.zeros((pad,) + bkg_x.shape[1:], np.float32)])
        ood_x = np.concatenate([ood_x, np.zeros((pad,) + ood_x.shape[1:], np.float32)])
        bkg_w = np.concatenate([bkg_w, np.zeros(pad, np.float32)])
        ood_w = np.concatenate([ood_w, np.zeros(pad, np.float32)])
    shape = (n_batches, batch_size)
    from .step import device_put_load
    batches = device_put_load(tuple(a.reshape(shape + a.shape[1:])
                                    for a in (bkg_x, ood_x, bkg_w, ood_w)),
                              mesh=mesh)

    optimizer = make_gan_optimizer()
    opt_state = optimizer.init(params)
    ae_epoch, disc_epoch, aae_epoch = make_aae_step_fns(optimizer, lamb, beta,
                                                        lr=float(lr),
                                                        mesh=mesh)

    loss_history = {k: [] for k in ["QCD-AE Loss", "OoD-AE Loss", "OE Loss",
                                    "AE Loss", "Disc Loss", "Disc Accuracy"]}
    rng = np.random.default_rng(seed)
    epoch_counter = 0

    ae_path = os.path.join(output_dir, ae_weights) if ae_weights else None
    if ae_path and os.path.isfile(ae_path):
        print("\nLoading pre-trained AE file from:", ae_path)
        # npz subtree cache or a reference-trained / exported Keras AE
        # file (ref aae.py:175 AE.save_weights), sniffed by magic bytes
        from .keras_import import sniff_weights_format, load_keras_aae
        if sniff_weights_format(ae_path) == "keras":
            ae = _subtree(load_keras_aae(ae_path, params), AE_KEYS)
        else:
            ae = load_pytree(ae_path, _subtree(params, AE_KEYS))
        params = {**params, **ae}
        epoch_dict["AE"][0] = epoch_dict["AE"][1] if n_cycles > 1 else 0

    for cycle in range(n_cycles):
        print(f"\n*** CYCLE {cycle + 1}/{n_cycles} ***")
        # (a) AE
        n_epochs = int(epoch_dict["AE"][cycle])
        if n_epochs:
            print("TRAINING AUTOENCODER")
        start = time.time()
        for epoch in range(n_epochs):
            perm = jnp.asarray(rng.permutation(n_batches))
            params, opt_state, metrics = ae_epoch(params, opt_state, perm,
                                                  *batches)
            # the reference appends the LAST batch's loss_dict (its AE
            # train_on_batch leaves reset_metrics at the default True,
            # so AE_hist is per-batch, not epoch-accumulated; the
            # surviving loss_dict is the last batch's, ref aae.py:158-171)
            m = np.asarray(metrics)[-1]
            epoch_counter += 1
            loss_history["QCD-AE Loss"].append((cycle + 1, epoch_counter, float(m[0])))
            if lamb != 0:
                loss_history["OoD-AE Loss"].append((cycle + 1, epoch_counter, float(m[3])))
                loss_history["OE Loss"].append((cycle + 1, epoch_counter, float(m[1])))
            loss_history["AE Loss"].append((cycle + 1, epoch_counter, float(m[2])))
            if (epoch + 1) % 10 == 0 or epoch + 1 == n_epochs:
                print(f"Epoch {epoch + 1}/{n_epochs}: AE Loss = {m[2]:4.3e} "
                      f"({time.time() - start:.1f}s)")
        if cycle == 0 and n_epochs and ae_path and not os.path.isfile(ae_path):
            last_ae = loss_history["AE Loss"][-1][2]
            if last_ae < 100:  # ref aae.py:172-176 sanity gate
                print("Saving pre-trained AE file to:", ae_path)
                save_pytree(ae_path, _subtree(params, AE_KEYS))
            else:
                raise RuntimeError(f"first-cycle AE loss {last_ae} >= 100 "
                                   "(reference aborts here, ref aae.py:176)")

        # (b) discriminator
        n_epochs = int(epoch_dict["Disc"][cycle])
        if n_epochs:
            print("TRAINING DISCRIMINATOR")
        start = time.time()
        for epoch in range(n_epochs):
            perm = jnp.asarray(rng.permutation(n_batches))
            params, opt_state, metrics = disc_epoch(params, opt_state, perm,
                                                    *batches)
            # V1-engine history semantics (the regime the reference ran
            # in, TF 2.1 experimental_run_tf_function=False): the
            # train_on_batch 'loss' output is the RAW batch loss, so
            # the epoch's 'Disc Loss' entry is the LAST batch's value,
            # while the 'accuracy' output is a stateful weighted metric
            # accumulated across the epoch under reset_metrics=False
            # (ref aae.py:210-219; verified head-to-head in
            # tests/test_reference_aae_trajectory.py)
            m = np.asarray(metrics)
            disc_loss_v = float(m[-1, 0])
            acc_v = float(m[:, 1].mean())
            epoch_counter += 1
            loss_history["Disc Loss"].append((cycle + 1, epoch_counter, disc_loss_v))
            loss_history["Disc Accuracy"].append((cycle + 1, epoch_counter, acc_v))
            print(f"Epoch {epoch + 1}/{n_epochs}: Disc Loss = {disc_loss_v:4.3e} "
                  f"Acc = {100 * acc_v:4.1f}% ({time.time() - start:.1f}s)")

        # (c) AAE with frozen discriminator
        n_epochs = int(epoch_dict["AAE"][cycle])
        if n_epochs:
            print("TRAINING AAE")
        start = time.time()
        for epoch in range(n_epochs):
            perm = jnp.asarray(rng.permutation(n_batches))
            params, opt_state, (metrics, disc_m) = aae_epoch(params, opt_state,
                                                             perm, *batches)
            m = np.asarray(metrics).mean(axis=0)
            disc_m = np.asarray(disc_m)
            epoch_counter += 1
            loss_history["QCD-AE Loss"].append((cycle + 1, epoch_counter, float(m[0])))
            if lamb != 0:
                loss_history["OoD-AE Loss"].append((cycle + 1, epoch_counter, float(m[5])))
                loss_history["OE Loss"].append((cycle + 1, epoch_counter, float(m[1])))
            # 'AE Loss' excludes the beta*CE fooling term (ref aae.py:277)
            loss_history["AE Loss"].append(
                (cycle + 1, epoch_counter, float(m[0] + lamb * m[1])))
            # history stores the REAL 3-class discriminator CE/accuracy
            # on {bkg, recon-bkg, OoD}, last-batch value (ref
            # aae.py:255-281,:287); the fooling values are printed only
            # (ref :282 'D_Loss'/'D_Accuracy')
            loss_history["Disc Loss"].append((cycle + 1, epoch_counter, float(disc_m[0])))
            loss_history["Disc Accuracy"].append((cycle + 1, epoch_counter, float(disc_m[1])))
            print(f"Epoch {epoch + 1}/{n_epochs}: AAE Loss = {m[2]:4.3e} "
                  f"D_Loss = {m[3]:4.3e} D_Accuracy = {100 * m[4]:4.1f}% "
                  f"Disc Loss = {disc_m[0]:4.3e} ({time.time() - start:.1f}s)")

    if hist_file:
        with open(os.path.join(output_dir, hist_file) if output_dir else hist_file,
                  "wb") as f:
            pickle.dump(loss_history, f)
    if model_out:
        save_pytree(os.path.join(output_dir, model_out) if output_dir else model_out,
                    params)
    return params, loss_history
