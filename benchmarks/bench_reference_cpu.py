"""Same-hardware head-to-head: the REFERENCE's own eager-TF training
loop (executed from the read-only checkout, ref OE-VAE/models.py:135-220)
vs our JAX loop, both on CPU, identical canonical config and data.

This replaces BASELINE.md's provisional ~1e6 jets/s estimate of the
reference's throughput with an empirical ratio measured on identical
hardware.  Method: time a 1-epoch call and a (1+N)-epoch call for each
implementation and take the marginal per-epoch rate, which excludes
one-time setup (TF variable building / XLA compilation) from both sides.

Usage:  python benchmarks/bench_reference_cpu.py [--n_jets 100000]
Prints one JSON line with both jets/s figures and the speedup ratio.
"""

import argparse
import json
import os
import sys
import time

os.environ.setdefault("ATLASVAE_PLATFORM", "cpu")  # before atlasvae import
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REF_PATH = "/root/reference/OE-VAE"

CANONICAL = dict(OE_type="MAE", beta=2.0, lamb=5.0, margin=1.0, lr=1e-3)
FC_LAYERS = [80, 40, 20, 10]
INPUT_DIM = 12
BATCH = 10_000


def _toy_loads(n, dim=INPUT_DIM, seed=0):
    rng = np.random.default_rng(seed)
    bkg = {"HLVs": rng.normal(0, 1, (n, dim)).astype(np.float32),
           "weights": np.ones(n, np.float32)}
    ood = {"HLVs": rng.normal(1.5, 1, (n, dim)).astype(np.float32),
           "weights": np.ones(n, np.float32)}
    # tiny validation load so both loops pay a negligible, equal valid cost
    small = {k: v[:BATCH] for k, v in bkg.items()}
    small_ood = {k: v[:BATCH] for k, v in ood.items()}
    return bkg, ood, small, small_ood


def time_reference(n_jets, extra_epochs, tmp):
    import tensorflow as tf
    tf.config.set_visible_devices([], "GPU")
    if not hasattr(tf.keras.metrics.Mean, "reset_states"):  # Keras 3 rename
        tf.keras.metrics.Mean.reset_states = tf.keras.metrics.Mean.reset_state
    sys.path.insert(0, REF_PATH)
    try:
        import models as ref_models
    finally:
        sys.path.remove(REF_PATH)

    bkg, ood, vb, vo = _toy_loads(n_jets)

    import pickle

    def run(n_epochs, tag):
        vae = ref_models.VariationalAutoEncoder(FC_LAYERS, INPUT_DIM, seed=0)
        vae(bkg["HLVs"][:2])
        hist_file = os.path.join(tmp, f"ref_{tag}.pkl")
        start = time.perf_counter()
        ref_models.train_model(vae, [[bkg, ood]], [[vb, vo]],
                               n_epochs=n_epochs, batch_size=BATCH,
                               hist_file=hist_file,
                               model_in=os.path.join(tmp, "none"),
                               model_out=os.path.join(tmp, f"ref_{tag}.weights.h5"),
                               **CANONICAL)
        elapsed = time.perf_counter() - start
        with open(hist_file, "rb") as f:
            epochs_ran = len(pickle.load(f)["Train loss"])
        return elapsed, epochs_ran

    t1, e1 = run(1, "a")
    t_n, e_n = run(1 + extra_epochs, "b")
    assert e_n > e1, "reference early-stopped before the marginal epochs"
    return n_jets * (e_n - e1) / max(t_n - t1, 1e-9)


def time_ours(n_jets, extra_epochs):
    import jax
    from atlasvae.models import VAEConfig, init_vae
    from atlasvae.train.loop import train_model

    cfg = VAEConfig(fc_layers=tuple(FC_LAYERS), input_dim=INPUT_DIM)
    bkg, ood, vb, vo = _toy_loads(n_jets)

    def run(n_epochs):
        params = init_vae(jax.random.PRNGKey(0), cfg)
        start = time.perf_counter()
        _, hist = train_model(params, [(bkg, ood)], [(vb, vo)],
                              oe_type=CANONICAL["OE_type"], n_epochs=n_epochs,
                              batch_size=BATCH, beta=CANONICAL["beta"],
                              lamb=CANONICAL["lamb"], margin=CANONICAL["margin"],
                              lr=CANONICAL["lr"])
        return time.perf_counter() - start, len(hist["Train loss"])

    t1, e1 = run(1)
    t_n, e_n = run(1 + extra_epochs)
    assert e_n > e1, "our loop early-stopped before the marginal epochs"
    return n_jets * (e_n - e1) / max(t_n - t1, 1e-9)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n_jets", type=int, default=100_000)
    # marginal-epoch counts per side: the reference runs ~5 s/epoch on CPU
    # so 3 epochs give a clean signal; ours runs ~50 ms/epoch, so it needs
    # many more marginal epochs to dominate compile-time jitter.
    ap.add_argument("--ref_extra_epochs", type=int, default=3)
    ap.add_argument("--ours_extra_epochs", type=int, default=60)
    args = ap.parse_args()
    if not os.path.isdir(REF_PATH):
        print(json.dumps({"error": "reference checkout not available"}))
        return

    import tempfile
    with tempfile.TemporaryDirectory() as tmp:
        ref_jps = time_reference(args.n_jets, args.ref_extra_epochs, tmp)
    ours_jps = time_ours(args.n_jets, args.ours_extra_epochs)

    print(json.dumps({
        "metric": "cpu_same_hardware_train_jets_per_sec",
        "ours": round(ours_jps, 1),
        "reference_eager_tf": round(ref_jps, 1),
        "speedup": round(ours_jps / ref_jps, 2),
        "unit": "jets/s",
        "config": f"batch={BATCH} fc=80/40/20/10 in=12 OE=MAE beta=2 lamb=5 "
                  f"n_jets={args.n_jets} marginal epochs "
                  f"ref={args.ref_extra_epochs} ours={args.ours_extra_epochs}",
    }))


if __name__ == "__main__":
    main()
