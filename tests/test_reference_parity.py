"""Side-by-side execution of the REFERENCE implementation.

The environment ships TensorFlow, and the reference's model/training
code (ref OE-VAE/models.py) imports cleanly.  These tests run the
reference's own ``VariationalAutoEncoder``/``train_model`` on the same
data with the same initial weights as our framework and require the
loss trajectories to agree — the direct evidence for BASELINE.md's
"reference-matching loss curves" target.

The reference code is *executed from its read-only location*, never
copied.  Stochasticity differs only through the reparameterization
draws (different RNGs), so epoch-mean losses are compared at percent
tolerance over thousands of samples.
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


def _toy_data(n=4000, dim=12, seed=0):
    rng = np.random.default_rng(seed)
    bkg = {"HLVs": rng.normal(0, 1, (n, dim)).astype(np.float32),
           "weights": np.ones(n, np.float32)}
    ood = {"HLVs": rng.normal(1.5, 1, (n, dim)).astype(np.float32),
           "weights": np.ones(n, np.float32)}
    return bkg, ood


@pytest.fixture(scope="module")
def both_histories(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("refparity")
    ref_models = _load_reference_models()
    cfg = VAEConfig(fc_layers=(32, 16, 8), input_dim=12)
    params = init_vae(jax.random.PRNGKey(0), cfg)
    bkg, ood = _toy_data()

    # ---- reference implementation, executed in place
    ref_vae = ref_models.VariationalAutoEncoder([32, 16, 8], 12, seed=0)
    ref_vae(bkg["HLVs"][:2])  # build variables
    _copy_params_to_reference(ref_vae, params)
    hist_file = str(tmp / "ref_history.pkl")
    ref_models.train_model(ref_vae, [[bkg, ood]], [[bkg, ood]], OE_type="MAE",
                           n_epochs=5, batch_size=500, beta=2.0, lamb=5.0,
                           margin=1.0, lr=1e-3, hist_file=hist_file,
                           model_in=str(tmp / "none"),
                           model_out=str(tmp / "ref.weights.h5"))
    with open(hist_file, "rb") as f:
        ref_hist = pickle.load(f)

    # ---- our implementation, identical weights/data/config
    _, our_hist = our_train_model(params, [(bkg, ood)], [(bkg, ood)],
                                  oe_type="MAE", n_epochs=5, batch_size=500,
                                  beta=2.0, lamb=5.0, margin=1.0, lr=1e-3)
    return ref_hist, our_hist


def test_first_epoch_losses_match(both_histories):
    """Identical initial weights: epoch-1 mean losses agree to a few %
    (residual difference = reparameterization RNG)."""
    ref_hist, our_hist = both_histories
    for key in ("MSE", "KLD", "Train loss"):
        ref_val, our_val = float(ref_hist[key][0]), float(our_hist[key][0])
        assert abs(our_val - ref_val) / abs(ref_val) < 0.05, \
            f"{key}: ours {our_val} vs reference {ref_val}"


def test_loss_trajectories_track(both_histories):
    """Whole 5-epoch trajectories agree within 10% everywhere and both
    decrease monotonically."""
    ref_hist, our_hist = both_histories
    for key in ("MSE", "Train loss", "Valid loss"):
        ref_traj = np.asarray(ref_hist[key], float)
        our_traj = np.asarray(our_hist[key], float)
        rel = np.abs(our_traj - ref_traj) / np.abs(ref_traj)
        assert rel.max() < 0.10, f"{key}: rel diff {rel}"
    assert our_hist["Train loss"][-1] < our_hist["Train loss"][0]
    assert ref_hist["Train loss"][-1] < ref_hist["Train loss"][0]
