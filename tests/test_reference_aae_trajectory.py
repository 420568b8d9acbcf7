"""Head-to-head execution of the reference's ``train_AAE``.

The reference's GAN cycle (ref OE-AAE/aae.py:73-292) is built with
``create_model`` and executed from its read-only location in a
subprocess (tests/ref_aae_worker.py: tf_keras V1 engine — the TF-2.1
``experimental_run_tf_function=False`` regime the code was written
for — with OUR initial parameters copied in and the batch-order
shuffle fed from the same ``np.random.default_rng(seed)`` stream our
``train_aae`` consumes).  The cycle is fully deterministic (relu MLPs,
no sampling layer, no dropout), so with identical weights, data, batch
order and the shared-iterations legacy Adam preserved
(train/aae_loop.py::make_gan_optimizer), every history series must
agree to f32-reduction-order precision.

Measured 2026-08-20 over the full 1-cycle schedule (AE x100, Disc x5,
AAE x5 epochs; 2 batches/epoch; 220 shared-counter Adam steps),
non-uniform exact-quarter weights, lamb=0.3, beta=0.5:

  QCD-AE Loss   n=105  max rel 1.5e-7
  OoD-AE Loss   n=105  max rel 1.9e-7
  OE Loss       n=105  max rel 1.5e-7
  AE Loss       n=105  max rel 1.3e-7
  Disc Loss     n= 10  max rel 1.0e-7
  Disc Accuracy n= 10  bit-exact

Asserted at 1e-6 rel (5x headroom), the driver's north star bound
(BASELINE.json:5).  Recorded in BASELINE.md "AAE head-to-head".

Weights are constructed so each per-batch f32 sum is EXACTLY the batch
size: Keras reduces per-output losses as sum(w*l)/batch while our
weighted mean is sum(w*l)/sum(w), so exact-sum weights make the two
denominators identical while still exercising every weighted path with
non-uniform values.
"""

import os
import pickle
import subprocess
import sys

import numpy as np
import pytest

REF_PATH = "/root/reference/OE-AAE"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF_PATH),
                                reason="reference checkout not available")
pytest.importorskip("tensorflow")

import jax

from atlasvae.models import AAEConfig, init_aae
from atlasvae.train.aae_loop import train_aae

N, B, DIM, SEED = 256, 128, 12, 17
LAMB, BETA = 0.3, 0.5
AE_LAYERS = (32, 16)
WORKER = os.path.join(os.path.dirname(__file__), "ref_aae_worker.py")


def _exact_weights(rng, n, batch):
    """Non-uniform weights whose per-batch f32 sum is exactly ``batch``.

    Pairs (1+d, 1-d) with d in {0, 0.25, 0.5}: every value and every
    partial sum is an exact binary fraction, so summation in any order
    gives exactly ``batch`` (see module docstring for why that makes
    the Keras and weighted-mean loss denominators coincide)."""
    w = np.empty(n, np.float32)
    for s in range(0, n, batch):
        d = rng.choice([0.0, 0.25, 0.5], size=batch // 2)
        pair = np.stack([1.0 + d, 1.0 - d], 1).ravel().astype(np.float32)
        w[s:s + batch] = rng.permutation(pair)
    return w


@pytest.fixture(scope="module")
def both_histories(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("aae_traj")
    rng = np.random.default_rng(5)
    bkg_x = rng.normal(0, 1, (N, DIM)).astype(np.float32)
    ood_x = rng.normal(1.2, 1, (N, DIM)).astype(np.float32)
    bkg_w = _exact_weights(rng, N, B)
    ood_w = _exact_weights(rng, N, B)

    cfg = AAEConfig(input_dim=DIM, ae_layers=AE_LAYERS,
                    disc_layers=(100, 100, 3))  # ref aae.py:76 hardcoded
    params = init_aae(jax.random.PRNGKey(0), cfg)

    arrs, i = {}, 0
    for comp in ("encoder", "decoder", "discriminator"):
        for lyr in list(params[comp]["hidden"]) + [params[comp]["out"]]:
            arrs[f"k{i}_w"] = np.asarray(lyr["w"])
            arrs[f"k{i}_b"] = np.asarray(lyr["b"])
            i += 1
    in_npz = str(tmp / "in.npz")
    np.savez(in_npz, bkg_x=bkg_x, ood_x=ood_x, bkg_w=bkg_w, ood_w=ood_w,
             dim=DIM, ae_layers=np.array(AE_LAYERS), lamb=LAMB, beta=BETA,
             seed=SEED, batch_size=B, n_cycles=1, **arrs)

    ref_dir = str(tmp / "ref")
    r = subprocess.run([sys.executable, WORKER, in_npz, ref_dir],
                       capture_output=True, text=True, timeout=560)
    assert r.returncode == 0, f"reference worker failed:\n{r.stderr[-4000:]}"
    with open(os.path.join(ref_dir, "hist.pkl"), "rb") as f:
        ref_hist = pickle.load(f)

    sample = {"bkg": {"HLVs": bkg_x, "weights": bkg_w},
              "OoD": {"HLVs": ood_x, "weights": ood_w}}
    ours_dir = str(tmp / "ours")
    os.makedirs(ours_dir, exist_ok=True)
    _, our_hist = train_aae(params, [sample], n_cycles=1, batch_size=B,
                            output_dir=ours_dir, lamb=LAMB, beta=BETA,
                            lr=1e-6, seed=SEED, feature_key="HLVs")
    return ref_hist, our_hist


REL_BOUND = 1e-6  # measured 1.9e-7 (module docstring); 5x headroom

LOSS_KEYS = ("QCD-AE Loss", "OoD-AE Loss", "OE Loss", "AE Loss", "Disc Loss")


def test_history_indices_match(both_histories):
    """Same keys, same number of entries, same (cycle, epoch) indices —
    the cycle schedule itself (AE x100 first cycle, Disc x5, AAE x5,
    ref aae.py:120-121) and which phases record which series."""
    ref_hist, our_hist = both_histories
    assert set(ref_hist) == set(our_hist)
    for key in ref_hist:
        ref_idx = [(c, e) for c, e, _ in ref_hist[key]]
        our_idx = [(c, e) for c, e, _ in our_hist[key]]
        assert ref_idx == our_idx, f"{key}: schedule mismatch"
    assert len(ref_hist["QCD-AE Loss"]) == 105  # 100 AE + 5 AAE epochs
    assert len(ref_hist["Disc Loss"]) == 10     # 5 Disc + 5 AAE epochs


def test_loss_trajectories_match(both_histories):
    """All five loss series agree to 1e-6 rel over the full 220-step
    shared-counter Adam trajectory."""
    ref_hist, our_hist = both_histories
    for key in LOSS_KEYS:
        rv = np.asarray([v for _, _, v in ref_hist[key]], float)
        ov = np.asarray([v for _, _, v in our_hist[key]], float)
        rel = np.abs(ov - rv) / np.maximum(np.abs(rv), 1e-12)
        assert rel.max() < REL_BOUND, \
            f"{key}: max rel {rel.max():.3e} at entry {rel.argmax()}"
    # and the AE actually learned during the trajectory
    qcd = [v for _, _, v in our_hist["QCD-AE Loss"]]
    assert qcd[99] < qcd[0]


def test_disc_accuracy_matches(both_histories):
    """Weighted 3-class accuracy (argmax counts) — measured bit-exact;
    asserted at 1e-3 to allow a borderline argmax tie to flip on a
    different BLAS without masking a real semantic divergence."""
    ref_hist, our_hist = both_histories
    rv = np.asarray([v for _, _, v in ref_hist["Disc Accuracy"]], float)
    ov = np.asarray([v for _, _, v in our_hist["Disc Accuracy"]], float)
    np.testing.assert_allclose(ov, rv, atol=1e-3)
