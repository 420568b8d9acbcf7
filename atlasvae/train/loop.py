"""VAE training loop: epochs over streamed loads, plateau LR, checkpoints.

Mirrors the reference's ``train_model`` control flow
(ref OE-VAE/models.py:135-240) with the per-batch eager loop replaced by
one jitted scan per load (see ``step.py``):

* epoch metrics are weighted per-sample means (tf.keras.metrics.Mean),
* validation runs every epoch on ~1e6-row batches (ref models.py:202),
* history is pickled every epoch and appended across restarts when
  ``model_in`` is set (ref models.py:160-161,216),
* plateau controller: monitor 'Train loss', patience 3, factor 2,
  min_delta 1e-3, min_lr 1e-4, save-best weights (ref models.py:222-240).
"""

import os
import time

import jax
import numpy as np

from .step import make_vae_step_fns, make_optimizer, batch_load, LoadCache
from .checkpoint import save_weights, save_history, load_history


def features(sample):
    """Assemble the model input matrix from a sample dict
    (ref OE-VAE/models.py:110-118)."""
    if "constituents" in sample and "HLVs" in sample:
        return np.hstack([sample["constituents"], sample["HLVs"]])
    if "constituents" in sample:
        return sample["constituents"]
    return sample["HLVs"]


def train_model(params, train_sample, valid_sample, oe_type="KLD", n_epochs=1,
                batch_size=5000, beta=0.0, lamb=0.0, margin=0.0, lr=1e-3,
                hist_file=None, model_in=None, model_out=None, mesh=None,
                seed=0, activation="relu", valid_batch_size=int(1e6),
                state_file=None, noise_source=None):
    """Train the VAE; returns (params, history).

    ``train_sample``/``valid_sample`` iterate (bkg_sample, ood_sample)
    load pairs (BatchGenerator or a list of such pairs).

    ``state_file``: full-train-state checkpoint written every epoch and
    resumed from when present — params, optimizer moments, current lr,
    plateau counter, and RNG key, so a resumed run continues the
    original run bit-for-bit (the reference's weights-only resume
    restarts Adam moments and the LR schedule, SURVEY.md S5).

    ``noise_source``: optional deterministic reparameterization-noise
    injector, ``noise_source(phase, epoch, load_idx, n_batches, batch)
    -> (noise_bkg, noise_ood)`` each shaped (n_batches, batch, latent)
    with phase in {"train", "valid"} — replaces the internal PRNG stream
    so a run can share its latent draws with another framework
    (the reference-parity harness, tests/test_reference_parity.py).
    """
    optimizer = make_optimizer()
    opt_state = optimizer.init(params)
    lr = float(lr)  # host-side; passed as a traced scalar per load
    n_devices = int(np.prod(list(mesh.shape.values()))) if mesh is not None else 1
    train_on_load, valid_losses = make_vae_step_fns(
        optimizer, oe_type, beta, lamb, margin, activation, mesh,
        external_noise=noise_source is not None)

    history = {"MSE": []}
    if beta != 0:
        history["KLD"] = []
    if lamb != 0:
        history["OE"] = []
    history.update({"Train loss": [], "Valid loss": []})
    resuming_state = state_file and os.path.isfile(state_file)
    if hist_file and os.path.isfile(hist_file) and \
            (resuming_state or (model_in and os.path.isfile(model_in))):
        history = load_history(hist_file)

    key = jax.random.PRNGKey(seed)
    count = 0
    if resuming_state:
        from .checkpoint import load_pytree
        state = load_pytree(state_file, {"params": params, "opt": opt_state,
                                         "lr": np.float32(lr),
                                         "count": np.int32(count), "key": key})
        params, opt_state = state["params"], state["opt"]
        lr, count = float(state["lr"]), int(state["count"])
        key = state["key"]
        if count < 0:  # terminal marker written when the schedule stopped
            print(f"Training already terminated by the plateau schedule "
                  f"(state file {state_file}) — not resuming past it")
            return params, history
        print(f"Resuming full train state from {state_file} "
              f"(lr={lr:g}, plateau count={count})")
    load_cache = LoadCache()
    print("STARTING TRAINING (loads/epoch: %d)" % len(train_sample))
    for epoch in range(n_epochs):
        start_time = time.time()
        print("\nEpoch %d/%d:" % (epoch + 1, n_epochs))
        sums = np.zeros(4)
        n_seen = 0.0
        # defined before the load loop: a degenerate sample with zero
        # loads (everything cut away) must still finish the epoch with
        # zeroed metrics, like the reference's idle Mean accumulators
        losses = {k: 0.0 for k in history if k != "Valid loss"}
        for load_idx, (bkg_sample, ood_sample) in enumerate(train_sample):
            batches = load_cache.get(
                (bkg_sample, ood_sample), (batch_size, n_devices),
                lambda: batch_load(features(bkg_sample), features(ood_sample),
                                   bkg_sample["weights"], ood_sample["weights"],
                                   batch_size, n_devices),
                mesh=mesh)
            if noise_source is not None:
                batches = tuple(batches) + tuple(noise_source(
                    "train", epoch, load_idx, *batches[0].shape[:2]))
            key, sub = jax.random.split(key)
            params, opt_state, metrics = train_on_load(
                params, opt_state, np.float32(lr), sub, *batches)
            metrics = np.asarray(metrics)
            sums += metrics[:, :4].sum(axis=0)
            n_seen += metrics[:, 4].sum()
            d = n_seen if n_seen > 0 else 1.0  # all-padding load guard
            losses = {"MSE": sums[0] / d}
            if beta != 0:
                losses["KLD"] = sums[1] / d
            if lamb != 0:
                losses["OE"] = sums[2] / d
            losses["Train loss"] = sums[3] / d
            ticker = "  ".join(f"{k} = {v:4.3e}" for k, v in losses.items())
            print(f"Batches {int(metrics[:, 4].sum() // max(batch_size, 1))}: "
                  f"mean losses  -->  {ticker}", flush=True)
        valid_sum, valid_n = 0.0, 0.0
        for load_idx, (bkg_sample, ood_sample) in enumerate(valid_sample):
            vbs = min(valid_batch_size, len(bkg_sample["weights"]))
            batches = load_cache.get(
                (bkg_sample, ood_sample), (vbs, n_devices),
                lambda: batch_load(features(bkg_sample), features(ood_sample),
                                   bkg_sample["weights"], ood_sample["weights"],
                                   vbs, n_devices),
                mesh=mesh)
            if noise_source is not None:
                batches = tuple(batches) + tuple(noise_source(
                    "valid", epoch, load_idx, *batches[0].shape[:2]))
            key, sub = jax.random.split(key)
            metrics = np.asarray(valid_losses(params, sub, *batches))
            valid_sum += metrics[:, 0].sum()
            valid_n += metrics[:, 1].sum()
        losses["Valid loss"] = valid_sum / max(valid_n, 1)
        print(f"Valid loss = {losses['Valid loss']:4.3e}  "
              f"({time.time() - start_time:.1f}s)")
        for k in history:
            history[k] = list(history[k]) + [float(losses[k]) if k in losses else 0.0]
        if hist_file:
            save_history(history, hist_file)
        # a resumed run has prior history to compare against, so its
        # first epoch checkpoints too (a fresh run skips epoch 0 because
        # history[:-1] is empty, ref models.py:219)
        if epoch > 0 or len(history["Train loss"]) > 1:
            lr, count = model_checkpoint(params, lr, history, model_out, count)
        if state_file:
            from .checkpoint import save_pytree
            # count = -1 records termination, so a rerun does not resume
            # training past the schedule's stop decision
            save_pytree(state_file, {"params": params, "opt": opt_state,
                                     "lr": np.float32(lr),
                                     "count": np.int32(-1 if count is None
                                                       else count),
                                     "key": key})
        if count is None:
            break
    return params, history


def model_checkpoint(params, lr, history, model_out, count,
                     metric="Train loss", patience=3, factor=2,
                     min_delta=1e-3, min_lr=1e-4):
    """Best-metric checkpointing + LR-plateau + early stop
    (ref OE-VAE/models.py:222-240, semantics preserved exactly).
    Returns (new_lr, count); count None terminates training."""
    hist = history[metric]
    if hist[-1] < np.min(hist[:-1]) - min_delta:
        print(f"{metric} improved from {np.min(hist[:-1]):4.2f} to "
              f"{hist[-1]:4.2f}"
              + (f"  -->  saving model weights to {model_out}" if model_out else ""))
        if model_out:
            save_weights(params, model_out)
        count = 0
    elif hist[-1] > np.min(hist[-(patience + 1):-1]) - min_delta:
        count += 1
    if count >= patience:
        print(f"No improvement for {count} epochs  -->  ", end="", flush=True)
        if lr < min_lr:
            print("terminating training")
            return lr, None
        new_lr = lr / factor
        print(f"reducing learning rate from {lr} to {new_lr}")
        return new_lr, 0
    return lr, count
