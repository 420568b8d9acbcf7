"""jet-ID CNN bf16-vs-f32 AUC parity over seeds.

The `--mixed_precision AUTO` default trains the CNN tower in bfloat16
(ref jet-ID/models.py:74-75 mixed_float16; cli/jetid.py:137-166), and
its quality claim rested on ONE paired run (AUC 0.684 bf16 vs 0.680
f32, docs/PERF.md).  This sweep repeats the comparison over several
seeds so the default's AUC-parity claim is a distribution, not a
sample.

Task: the same synthetic calorimeter-image classification the original
probe used — top-vs-QCD, 64x64 pt-weighted constituent images (the
reference's image size, ref jet-ID/classifier.py:34), conv maps
100/100, batch 500, dropout 0.1, l2 1e-7, lr 1e-3 Adam.  Per
(dtype, seed): fresh `init_jetid(PRNGKey(seed))`, a per-seed dropout
stream, 15 epochs through the production `make_jetid_step_fns` train
epoch, validation AUC tracked every epoch (best-epoch AUC mirrors the
CLI's best-checkpoint selection; the final epoch is reported too).
Both dtypes share the identical data, seeds, schedule and step
functions — the ONLY difference is `JetIDConfig.compute_dtype`.

Runs on the real TPU (~6 min: 4 compiles + 2x5 trainings).  Writes one
JSON line; the table is recorded in docs/PERF.md.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("ATLASVAE_PRNG", "rbg")
# isolated data dir: the canonical-scale generator may be writing the
# shared data/ registry concurrently (HDF5 is not read-while-write safe)
os.environ.setdefault("ATLASVAE_DATA_DIR", "data_sweep")

SEEDS = (0, 1, 2, 3, 4)
EPOCHS = 15
BATCH = 500
PX = 64
N_PER_CLASS = 20_000  # 20k train + 20k valid after the shuffled split


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax
    from atlasvae.data import make_sample, ensure_synthetic_registry
    from atlasvae.data.jets import constituent_images
    from atlasvae.models.jetid import JetIDConfig, init_jetid, jetid_apply
    from atlasvae.train.jetid_loop import make_jetid_step_fns, _pack
    from atlasvae.train.step import make_optimizer, device_put_load
    from atlasvae.eval.jetid_eval import make_labels, discriminant
    from atlasvae.eval.roc import auc_score

    ensure_synthetic_registry(n_events=2 * N_PER_CLASS, n_const_max=100,
                              names=["QCD-Geneva", "top-Geneva"])
    sample = make_sample("QCD-Geneva", "top-Geneva", 2 * N_PER_CLASS,
                         2 * N_PER_CLASS, (), 100, 3, "ON", "OFF",
                         shuffling=True)
    labels = make_labels(sample)  # top (JZW=-1) -> 0 = signal
    imgs = np.array(constituent_images(sample["constituents"], PX,
                                       n_dims=3), np.float32)  # writable copy
    n = len(labels)
    tr, va = np.arange(n // 2), np.arange(n // 2, n)
    imgs /= max(float(imgs[tr].max()), 1e-6)  # train-fit scale (cli/jetid.py)
    t_lab, v_lab = labels[tr], labels[va]
    packed = _pack({"images": imgs[tr]}, t_lab,
                   np.ones(len(tr), np.float32), BATCH)
    print(f"{len(tr)} train / {len(va)} valid jets, "
          f"{len(tr) // BATCH} steps/epoch", flush=True)
    batches = device_put_load(packed)
    v_batched = jnp.asarray(
        imgs[va].reshape(-1, BATCH, PX, PX))
    optimizer = make_optimizer()
    lr = np.float32(1e-3)
    results = {}

    for dtype in ("float32", "bfloat16"):
        config = JetIDConfig(n_classes=2, images=("images",),
                             image_shapes=((PX, PX),), nn_type="CNN",
                             dropout=0.1, l2=1e-7, compute_dtype=dtype)
        train_epoch, _ = make_jetid_step_fns(optimizer, config)

        @jax.jit
        def probs_fn(params, vb, _config=config):
            # vb arrives as an argument: closing over the ~650 MB array
            # would embed it as an HLO constant (the tunnel's remote
            # compile endpoint rejects such request bodies with HTTP 413)
            def step(_, x):
                return None, jetid_apply(params, _config, {"images": x},
                                         train=False)
            _, ps = lax.scan(step, None, vb)
            return ps.reshape(-1, 2)

        per_seed = []
        for seed in SEEDS:
            t0 = time.time()
            params = init_jetid(jax.random.PRNGKey(seed), config)
            opt_state = optimizer.init(params)
            key = jax.random.PRNGKey(seed)
            aucs = []
            for _ in range(EPOCHS):
                key, sub = jax.random.split(key)
                params, opt_state, _ = train_epoch(params, opt_state, lr,
                                                   sub, *batches)
                probs = np.asarray(probs_fn(params, v_batched))
                view, d_lab, disc = discriminant(
                    {"weights": np.ones(len(va), np.float32)}, v_lab, probs)
                aucs.append(auc_score(d_lab, disc, view["weights"]))
            per_seed.append({"seed": seed, "best": max(aucs),
                             "final": aucs[-1],
                             "best_epoch": int(np.argmax(aucs)) + 1})
            print(f"{dtype} seed {seed}: best AUC {max(aucs):.4f} "
                  f"(epoch {np.argmax(aucs) + 1}) final {aucs[-1]:.4f} "
                  f"[{time.time() - t0:.0f} s]", flush=True)
        best = np.array([r["best"] for r in per_seed])
        results[dtype] = {"per_seed": per_seed,
                          "best_mean": float(best.mean()),
                          "best_std": float(best.std(ddof=1))}

    f32, bf16 = results["float32"], results["bfloat16"]
    paired = np.array([b["best"] - a["best"] for a, b in
                       zip(f32["per_seed"], bf16["per_seed"])])
    line = {
        "metric": "cnn_bf16_auc_delta_mean", "unit": "AUC",
        "value": round(float(paired.mean()), 5),
        "delta_std": round(float(paired.std(ddof=1)), 5),
        "f32_best_mean": round(f32["best_mean"], 4),
        "f32_best_std": round(f32["best_std"], 4),
        "bf16_best_mean": round(bf16["best_mean"], 4),
        "bf16_best_std": round(bf16["best_std"], 4),
        "seeds": list(SEEDS), "epochs": EPOCHS,
        "detail": results,
    }
    print(json.dumps(line), flush=True)


if __name__ == "__main__":
    main()
