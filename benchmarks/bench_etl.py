"""ETL conversion benchmark: ROOT -> HDF5 at ntuple scale.

Times the full ``atlasvae.etl.root2h5.convert`` pipeline (basket decode,
leading-jet padding, Lorentz canonicalization, weights, shuffled lzf
HDF5 write) on a synthetic raw-ATLAS-layout ntuple
(``vector<vector<float>>`` constituents), with the native basket
decoder (default) and with ``ATLASVAE_NO_NATIVE=1`` (pure-Python
fallback).  The reference pays the decode inside uproot's compiled
interpreters + a 32-process host fan-out (ref tools/root_utils.py:16-28,
:55-90); this pipeline is single-process columnar.

Prints one JSON line.  Pure host benchmark (no TPU): run the host
health probe first (benchmarks/hostmem_probe.py) — a degraded host
measures the hypervisor, not the framework.

Usage: python benchmarks/bench_etl.py [--n 200000] [--const 40]
"""

import argparse
import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("ATLASVAE_PLATFORM", "cpu")

from atlasvae.etl import rootio  # noqa: E402
from atlasvae.etl.root2h5 import (SCALARS, MEV_SCALARS, convert)  # noqa: E402


def make_ntuple(path, n, max_const, rng):
    out = {}
    for key in SCALARS:
        scale = 1000.0 if key in MEV_SCALARS else 1.0
        out[key] = (rng.uniform(0.5, 3.0, n) * scale).astype(np.float32)
    out["weight_mc"] = rng.uniform(0.5, 2.0, n).astype(np.float32)
    out["weight_pileup"] = rng.uniform(0.9, 1.1, n).astype(np.float32)
    out["rljet_topTag_DNN19_qqb_score"] = rng.uniform(0, 1, n).astype(
        np.float32)
    counts = rng.integers(1, max_const + 1, n)
    out["rljet_n_constituents"] = counts.astype(np.int32)
    # raw ATLAS layout: vector<vector<float>> with the leading jet first
    for key, lo, hi in (("rljet_assoc_cluster_pt", 1e3, 2e5),
                        ("rljet_assoc_cluster_eta", -2.0, 2.0),
                        ("rljet_assoc_cluster_phi", -3.0, 3.0)):
        out[key] = [[rng.uniform(lo, hi, c).astype(np.float32)]
                    for c in counts]
    rootio.write_tree(path, "nominal", out)
    return os.path.getsize(path)


def run_convert(indir, outdir):
    t0 = time.time()
    convert(indir, outdir, "topo-dijet", tag=0)
    return time.time() - t0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=200_000)
    ap.add_argument("--const", type=int, default=40)
    args = ap.parse_args()
    rng = np.random.default_rng(0)
    with tempfile.TemporaryDirectory() as td:
        indir = os.path.join(td, "in")
        # DSID-encoded dataset directory (ref tools/root2h5.py layout)
        dsdir = os.path.join(indir, "user.x.361023.ds")
        os.makedirs(dsdir)
        size = make_ntuple(os.path.join(dsdir, "part._000001.root"),
                           args.n, args.const, rng)
        from atlasvae.etl import rootnative
        native_ok = rootnative.load_lib() is not None
        if not native_ok:
            print("WARNING: native decoder unavailable (no toolchain?) — "
                  "the 'native' phase below runs the pure-Python path",
                  file=sys.stderr)
        t_native = min(run_convert(indir, os.path.join(td, f"o{i}"))
                       for i in range(2))
        os.environ["ATLASVAE_NO_NATIVE"] = "1"
        try:
            t_py = run_convert(indir, os.path.join(td, "op"))
        finally:
            del os.environ["ATLASVAE_NO_NATIVE"]
    print(json.dumps({
        "metric": "etl_convert_events_per_s",
        "value": round(args.n / t_native, 1),
        "unit": "events/s",
        "native_decoder": native_ok,
        "n_events": args.n,
        "max_const": args.const,
        "file_mb": round(size / 1e6, 1),
        "wall_native_s": round(t_native, 2),
        "wall_python_s": round(t_py, 2),
        "native_speedup": round(t_py / t_native, 2),
    }))


if __name__ == "__main__":
    main()
