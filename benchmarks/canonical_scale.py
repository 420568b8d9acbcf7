"""Canonical production-scale run: vae.sh at its real size, once, recorded.

The reference's actual workload is ONE invocation of vae.py at
8e6 train / 1e6 valid / 1e6 sig jets for 20 epochs (ref
OE-VAE/vae.sh:3-11) inside a 2-day Slurm allocation (ref
OE-VAE/sbatch.sh:10).  BASELINE.md demonstrates the full pipeline at 1M
scale and a 10M-jet streaming soak, but never the canonical scale as a
single end-to-end training job.  This script owns that run:

* ``--gen``: chunked synthetic builds of exactly the three datasets the
  command touches — QCD-Geneva at n_train+n_valid, OoD-H at the CLI's
  n_OoD default (1e7, vae.sh passes nothing), 2HDM-Geneva at n_sig —
  registered under the production ``data/synthetic_<name>.h5`` names.
  Files are generated at 20 stored constituents: the canonical command
  trains on the 12 HLV columns only (``--constituents=OFF``), so the
  stored constituent width never enters the measured workload, and
  width 20 keeps the one-core host generation to ~7 min instead of ~80.
* ``--run``: the literal vae.sh command line (sizes untouched, only
  ``--output_dir`` bound; ``ATLASVAE_TRANSFER_DTYPE=float16`` — the
  production wire format for this 60 MB/s host->device tunnel), timed
  end-to-end: data load + scaler fit + OoD pairing + reweighting +
  20 training epochs + the complete evaluation/plotting suite.  After
  the CLI returns, the trained model's sig-vs-bkg ROC AUC on the MAE
  discriminant is recomputed at the library surface (the CLI only
  embeds AUC in plot legends) and everything lands in one JSON line.

Usage (real TPU; ~7 min gen + the measured run):
    python benchmarks/canonical_scale.py --gen
    python benchmarks/canonical_scale.py --run
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# own data dir: the default data/ holds small git-tracked fixture files
# which the multi-GB canonical builds must not overwrite
os.environ.setdefault("ATLASVAE_DATA_DIR", "data_canonical")

# sizes of vae.sh:3-11 (n_OoD is the vae.py default, not passed there);
# SCALE=1 is the canonical run, SCALE=1000 a CPU smoke test of the
# identical path
SCALE = 1
N_TRAIN, N_VALID, N_SIG, N_OOD = 8_000_000, 1_000_000, 1_000_000, 10_000_000


def sizes():
    return tuple(n // SCALE for n in (N_TRAIN, N_VALID, N_SIG, N_OOD))


def datasets():  # logical name -> (generator class, events needed)
    n_train, n_valid, n_sig, n_ood = sizes()
    return {
        "QCD-Geneva": ("QCD", n_train + n_valid),
        "OoD-H": ("H-OoD", n_ood),
        "2HDM-Geneva": ("2HDM", n_sig),
    }


def canonical_argv():
    """OE-VAE/vae.sh:3-11 verbatim (output_dir bound by the caller)."""
    n_train, n_valid, n_sig, n_ood = sizes()
    argv = [
        f"--n_train={n_train}", f"--n_valid={n_valid}", f"--n_sig={n_sig}",
        f"--batch_size={10_000 // SCALE}", "--n_epochs=20", "--lr=1e-3",
        "--beta=2", "--lamb=5", "--n_const=100",
        "--OE_type=MAE", "--weight_type=X-S",
        "--plotting=ON", "--apply_cut=OFF",
        "--decorrelation=ON",
        "--constituents=OFF", "--const_scaler_type=QuantileTransformer",
        "--HLVs=ON", "--HLV_scaler_type=RobustScaler",
        "--slurm_id=0",
    ]
    if SCALE != 1:
        argv += [f"--n_OoD={n_ood}", "--npe=20"]  # smoke: keep eval small
    return argv


def gen_phase():
    from soak_streaming import build_big_file
    from atlasvae.data.registry import data_dir
    root = data_dir()
    root.mkdir(parents=True, exist_ok=True)
    t0 = time.time()
    for i, (name, (kind, n)) in enumerate(datasets().items()):
        path = root / f"synthetic_{name}.h5"
        print(f"building {path} ({kind}, {n:,} events)", flush=True)
        build_big_file(str(path), kind, n, n_const_max=20, seed=100 + i)
    print(f"gen wall {time.time() - t0:.0f} s", flush=True)


def final_auc(args_ns, out_root):
    """Sig-vs-bkg ROC AUC of the trained model's MAE discriminant on the
    validation slice — the same sample/scaler/filter path _evaluate uses
    (cli/vae.py:188-241), reduced to the one number."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from atlasvae.data import make_sample, apply_scaler
    from atlasvae.data.loader import filtering
    from atlasvae.data.scalers import Scaler
    from atlasvae.models import VAEConfig, init_vae, vae_apply
    from atlasvae.train.keras_import import load_params_auto
    from atlasvae.train.loop import features
    from atlasvae.eval.metrics import loss_function
    from atlasvae.eval.roc import auc_score
    from atlasvae.cli.vae import _select_samples

    hlv_list, input_dim, _, valid_cuts = _select_samples(args_ns)
    config = VAEConfig(fc_layers=(80, 40, 20, 10), input_dim=input_dim)
    params = load_params_auto(out_root + "/model.npz",
                              init_vae(jax.random.PRNGKey(0), config), "vae")
    scaler = Scaler.load(out_root + "/HLV_RobustScaler.pkl")
    # _select_samples mutates n_valid into the [n_train, end] window —
    # a raw n_valid here would score the TRAINING region (the exact bug
    # cli/vae.py::_grid_configs documents)
    sample = make_sample("QCD-Geneva", "2HDM-Geneva", args_ns.n_valid,
                         sizes()[2], valid_cuts, 100, 3, "OFF", "ON",
                         hlv_list)
    y_true = (sample["JZW"] != -1).astype(int)
    sample["weights"][y_true == 0] /= 1e3  # Geneva sig (ref vae.py:151)
    sample["HLVs"] = apply_scaler(sample["HLVs"], 3, scaler)
    x_true = features(sample)
    predict = jax.jit(lambda p, x, k: vae_apply(p, x, k)[0])
    chunks = [predict(params, jnp.asarray(x_true[i:i + 100_000]),
                      jax.random.PRNGKey(0))
              for i in range(0, len(x_true), 100_000)]
    x_pred = np.concatenate([np.asarray(c) for c in chunks])
    y_true, x_true, x_pred, sample = filtering(y_true, x_true, x_pred, sample)
    mae = loss_function(x_true, x_pred, n_dims=3, metric="MAE")
    return auc_score(y_true, mae, sample["weights"])


def run_phase(out_root):
    os.environ.setdefault("ATLASVAE_TRANSFER_DTYPE", "float16")
    os.environ.setdefault("ATLASVAE_PRNG", "rbg")
    import h5py
    from atlasvae.data.registry import register_file, data_dir
    from atlasvae.cli.vae import main, build_parser
    n_train, n_valid, n_sig, n_ood = sizes()
    for name, (_, n) in datasets().items():
        path = data_dir() / f"synthetic_{name}.h5"
        with h5py.File(path, "r") as f:
            have = len(f["weights"])
            assert f.attrs.get("complete", False) and have >= n, \
                f"{path}: {have} < {n} events — run --gen first"
        register_file(name, path)
    argv = canonical_argv() + [f"--output_dir={out_root}"]
    print("RUN:", " ".join(argv), flush=True)
    t0 = time.time()
    rc = main(argv)
    wall = time.time() - t0
    assert rc in (0, None), rc
    args_ns = build_parser().parse_args(argv)
    from atlasvae.cli.vae import _wire_paths
    root = _wire_paths(args_ns)
    t1 = time.time()
    auc = final_auc(args_ns, root)
    line = {
        "metric": "canonical_scale_wall_s", "value": round(wall, 1),
        "unit": "s",
        "jets_per_sec_e2e": round(n_train * 20 / wall, 1),
        "n_train": n_train, "n_valid": n_valid, "n_sig": n_sig,
        "n_ood": n_ood, "n_epochs": 20,
        "final_auc_mae": round(auc, 4),
        "auc_eval_extra_s": round(time.time() - t1, 1),
        "transfer_dtype": os.environ["ATLASVAE_TRANSFER_DTYPE"],
    }
    print(json.dumps(line), flush=True)
    return line


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--gen", action="store_true")
    ap.add_argument("--run", action="store_true")
    ap.add_argument("--smoke", action="store_true",
                    help="1/1000-scale CPU validation of the identical "
                         "path (own data/output dirs)")
    ap.add_argument("--output_dir", default="outputs/canonical_scale")
    a = ap.parse_args()
    if a.smoke:
        SCALE = 1000
        os.environ["ATLASVAE_PLATFORM"] = "cpu"
        os.environ["ATLASVAE_DATA_DIR"] = "data_smoke"
        a.output_dir = "outputs/canonical_smoke"
        gen_phase()
        run_phase(a.output_dir)
    else:
        if a.gen:
            gen_phase()
        if a.run:
            run_phase(a.output_dir)
