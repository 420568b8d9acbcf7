"""Side-by-side execution of the REFERENCE implementation.

The environment ships TensorFlow, and the reference's model/training
code (ref OE-VAE/models.py) imports cleanly.  These tests run the
reference's own ``VariationalAutoEncoder``/``train_model`` on the same
data with the same initial weights as our framework and require the
loss trajectories to agree — the direct evidence for BASELINE.md's
"reference-matching loss curves" target.

Deterministic noise injection: the ONLY stochastic divergence between
the two frameworks is the reparameterization draw (ref
OE-VAE/models.py:7-15).  Here the reference's ``tf.random.normal`` is
monkeypatched (on OUR tf module at runtime — the read-only reference
stays untouched, like the Keras-3 ``reset_states`` shim below) to pop
standard-normal draws from a precomputed stream, and the identical
stream is fed to our training loop through its ``noise_source`` hook
(train/loop.py).  With the RNG removed, the remaining divergence is
pure numerics — f32 reduction order and the Adam epsilon formulation —
measured at <= 2.5e-7 relative on every key of every epoch over the
full 5-epoch / 200-Adam-step trajectory (2026-08-20, recorded in
BASELINE.md), beating the driver's 1e-6 north star
(BASELINE.json:5).  Asserted here at 1e-6 (4x headroom over measured).

The reference code is *executed from its read-only location*, never
copied.
"""

import os
import pickle
import sys

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")
REF_PATH = "/root/reference/OE-VAE"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF_PATH),
                                reason="reference checkout not available")

import jax

from atlasvae.models import VAEConfig, init_vae
from atlasvae.train.loop import train_model as our_train_model

N, BATCH, EPOCHS, LATENT = 4000, 500, 5, 8
N_BATCHES = N // BATCH  # exact division: no tail-padding asymmetry


def _load_reference_models():
    # Keras 3 renamed reset_states -> reset_state; shim the old name so
    # the reference's TF-2.1-era training loop runs unmodified.
    if not hasattr(tf.keras.metrics.Mean, "reset_states"):
        tf.keras.metrics.Mean.reset_states = tf.keras.metrics.Mean.reset_state
    sys.path.insert(0, REF_PATH)
    try:
        import models as ref_models
        return ref_models
    finally:
        sys.path.remove(REF_PATH)


def _copy_params_to_reference(ref_vae, params):
    """Assign our parameter pytree into the reference Keras model."""
    enc = params["encoder"]
    for layer, ours in zip(ref_vae.encoder.denses, enc["hidden"]):
        layer.set_weights([np.asarray(ours["w"]), np.asarray(ours["b"])])
    ref_vae.encoder.dense_mean.set_weights(
        [np.asarray(enc["mean"]["w"]), np.asarray(enc["mean"]["b"])])
    ref_vae.encoder.dense_log_var.set_weights(
        [np.asarray(enc["logvar"]["w"]), np.asarray(enc["logvar"]["b"])])
    dec = params["decoder"]
    for layer, ours in zip(ref_vae.decoder.denses, dec["hidden"]):
        layer.set_weights([np.asarray(ours["w"]), np.asarray(ours["b"])])
    ref_vae.decoder.dense_output.set_weights(
        [np.asarray(dec["out"]["w"]), np.asarray(dec["out"]["b"])])


def _toy_data(n=N, dim=12, seed=0):
    rng = np.random.default_rng(seed)
    bkg = {"HLVs": rng.normal(0, 1, (n, dim)).astype(np.float32),
           "weights": np.ones(n, np.float32)}
    ood = {"HLVs": rng.normal(1.5, 1, (n, dim)).astype(np.float32),
           "weights": np.ones(n, np.float32)}
    return bkg, ood


def _noise_streams(seed=123):
    """One standard-normal draw per (epoch, batch, sample-kind).

    train[e][b] = (eps_bkg, eps_ood) at training batch shape;
    valid[e]    = (eps_bkg, eps_ood) at the full validation shape.
    """
    rng = np.random.default_rng(seed)
    train = [[(rng.standard_normal((BATCH, LATENT)).astype(np.float32),
               rng.standard_normal((BATCH, LATENT)).astype(np.float32))
              for _ in range(N_BATCHES)] for _ in range(EPOCHS)]
    valid = [(rng.standard_normal((N, LATENT)).astype(np.float32),
              rng.standard_normal((N, LATENT)).astype(np.float32))
             for _ in range(EPOCHS)]
    return train, valid


def _reference_draw_queue(train, valid):
    """The exact tf.random.normal call order of the reference run.

    Per training batch (MAE OE type): vae(bkg) for the reconstruction
    term (ref models.py:122), then vae(bkg) AGAIN inside get_OE_loss
    (ref models.py:98 — our graph computes this forward once and reuses
    it, so both reference bkg draws must be the same eps), then vae(ood)
    (ref models.py:99).  Per epoch the validation get_losses repeats the
    same three calls at full-sample shape (ref models.py:209).
    """
    queue = []
    for e in range(EPOCHS):
        for b in range(N_BATCHES):
            eps_b, eps_o = train[e][b]
            queue += [eps_b, eps_b, eps_o]
        eps_vb, eps_vo = valid[e]
        queue += [eps_vb, eps_vb, eps_vo]
    return queue


@pytest.fixture(scope="module")
def both_histories(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("refparity")
    ref_models = _load_reference_models()
    cfg = VAEConfig(fc_layers=(32, 16, LATENT), input_dim=12)
    params = init_vae(jax.random.PRNGKey(0), cfg)
    bkg, ood = _toy_data()
    noise_train, noise_valid = _noise_streams()

    # ---- reference implementation, executed in place, with the
    # reparameterization draws popped from the shared stream
    ref_vae = ref_models.VariationalAutoEncoder([32, 16, LATENT], 12, seed=0)
    ref_vae(bkg["HLVs"][:2])  # build variables (before the normal patch)
    _copy_params_to_reference(ref_vae, params)
    hist_file = str(tmp / "ref_history.pkl")

    queue = _reference_draw_queue(noise_train, noise_valid)
    orig_normal = tf.random.normal

    def injected_normal(shape, mean=0.0, stddev=1.0, **kwargs):
        eps = queue.pop(0)
        shape = tuple(np.asarray(shape))
        assert shape == eps.shape, f"draw-order mismatch: {shape} vs {eps.shape}"
        return mean + stddev * tf.constant(eps)

    tf.random.normal = injected_normal
    try:
        ref_models.train_model(
            ref_vae, [[bkg, ood]], [[bkg, ood]], OE_type="MAE",
            n_epochs=EPOCHS, batch_size=BATCH, beta=2.0, lamb=5.0,
            margin=1.0, lr=1e-3, hist_file=hist_file,
            model_in=str(tmp / "none"),
            model_out=str(tmp / "ref.weights.h5"))
    finally:
        tf.random.normal = orig_normal
    assert not queue, f"{len(queue)} injected draws left unconsumed"
    with open(hist_file, "rb") as f:
        ref_hist = pickle.load(f)

    # ---- our implementation: identical weights/data/config/noise
    def noise_source(phase, epoch, load_idx, n_batches, batch):
        if phase == "train":
            per_batch = noise_train[epoch]
            assert (n_batches, batch) == (N_BATCHES, BATCH)
            return (np.stack([per_batch[i][0] for i in range(n_batches)]),
                    np.stack([per_batch[i][1] for i in range(n_batches)]))
        assert (n_batches, batch) == (1, N)
        return noise_valid[epoch][0][None], noise_valid[epoch][1][None]

    _, our_hist = our_train_model(params, [(bkg, ood)], [(bkg, ood)],
                                  oe_type="MAE", n_epochs=EPOCHS,
                                  batch_size=BATCH, beta=2.0, lamb=5.0,
                                  margin=1.0, lr=1e-3,
                                  noise_source=noise_source)
    return ref_hist, our_hist


# Honest measured bound (see module docstring): with the noise stream
# shared, max rel diff over all 5 keys x 5 epochs measured 2.5e-7
# (2026-08-20; MSE 1.6e-7, KLD 2.5e-7, OE 5.1e-8, Train 8.2e-8,
# Valid 2.1e-7).  Asserted at the driver's 1e-6 north star — 4x
# headroom over measured.
REL_BOUND = 1e-6


def test_first_epoch_losses_match(both_histories):
    """Identical weights + identical injected noise: epoch-1 losses are
    the same f32 computation in both frameworks."""
    ref_hist, our_hist = both_histories
    for key in ("MSE", "KLD", "OE", "Train loss", "Valid loss"):
        ref_val, our_val = float(ref_hist[key][0]), float(our_hist[key][0])
        assert abs(our_val - ref_val) / abs(ref_val) < REL_BOUND, \
            f"{key}: ours {our_val} vs reference {ref_val}"


def test_loss_trajectories_match(both_histories):
    """Whole 200-Adam-step trajectories agree to 1e-6 rel on every key
    of every epoch, and both decrease."""
    ref_hist, our_hist = both_histories
    for key in ("MSE", "KLD", "OE", "Train loss", "Valid loss"):
        ref_traj = np.asarray(ref_hist[key], float)
        our_traj = np.asarray(our_hist[key], float)
        rel = np.abs(our_traj - ref_traj) / np.abs(ref_traj)
        assert rel.max() < REL_BOUND, f"{key}: rel diff {rel}"
    assert our_hist["Train loss"][-1] < our_hist["Train loss"][0]
    assert ref_hist["Train loss"][-1] < ref_hist["Train loss"][0]
