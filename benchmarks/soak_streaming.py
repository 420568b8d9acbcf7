"""Streaming soak at reference design scale (ref OE-VAE/utils.py:36-73).

Drives one (or more) multi-load training epochs through the production
path — BatchGenerator double-buffered prefetch -> pairing -> reweighting
-> scaling -> train_model — at the reference's 10M-jet scale
(ref OE-VAE/vae.py:16-19 defaults, utils.py:48 30GB chunk budget), and
reports per-load host-prep vs consume walls so the prefetch overlap is
measured, not asserted.

Usage (real TPU, ~5-10 min cold for the full 10M):
    python benchmarks/soak_streaming.py                 # 10M jets
    python benchmarks/soak_streaming.py --n_events 1e6  # quick pass

Writes one JSON line; results are recorded in BASELINE.md.
"""

import argparse
import json
import os
import sys
import tempfile
import time

import numpy as np
import h5py

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_big_file(path, kind, n_events, n_const_max, chunk=1_000_000, seed=0):
    """Chunked synthetic HDF5 writer (memory-bounded at any n_events).

    Reuse requires the 'complete' attribute (set only after the final
    chunk lands) AND a matching n_const_max — datasets are pre-allocated
    at full length, so a bare length check would accept a file whose
    build was interrupted (zero-filled tail) or built at another width."""
    from atlasvae.data.synthetic import make_synthetic_dataset
    if os.path.exists(path):
        with h5py.File(path, "r") as f:
            if (f.attrs.get("complete", False)
                    and f.attrs.get("n_const_max", -1) == n_const_max
                    and len(f["weights"]) == n_events):
                return path
        os.remove(path)
    tmp = tempfile.mktemp(suffix=".h5")
    out = None
    try:
        for i, lo in enumerate(range(0, n_events, chunk)):
            n = min(chunk, n_events - lo)
            make_synthetic_dataset(tmp, kind, n, n_const_max, seed=seed + i)
            with h5py.File(tmp, "r") as src:
                if out is None:
                    out = h5py.File(path, "w")
                    for key in src:
                        shape = src[key].shape
                        out.create_dataset(
                            key, shape=(n_events,) + shape[1:],
                            dtype=src[key].dtype, chunks=(min(65536, n),) + shape[1:])
                for key in src:
                    out[key][lo:lo + n] = src[key][:]
            print(f"  {kind}: {lo + n:,}/{n_events:,}")
        out.attrs["complete"] = True
        out.attrs["n_const_max"] = n_const_max
    finally:
        if out is not None:
            out.close()
        if os.path.exists(tmp):
            os.remove(tmp)
    return path


class TimedGenerator:
    """BatchGenerator wrapper timing worker-side prep and consumer-side
    queue waits per load — the overlap evidence: with working prefetch,
    the consumer only ever waits for the FIRST load (plus any residual
    when prep is slower than training).

    ``epoch_starts`` records a timestamp each time iteration begins
    (train_model iterates once per epoch), giving per-epoch walls from a
    SINGLE train_model call — separate per-epoch train_model calls would
    rebuild their jit wrappers and re-pay full XLA compilation every
    epoch, poisoning the soak numbers."""

    def __init__(self, gen):
        self.gen = gen
        self.prep_walls = []
        self.wait_walls = []
        self.epoch_starts = []

    def __len__(self):
        return len(self.gen)

    def __iter__(self):
        import queue
        import threading
        self.epoch_starts.append(time.time())
        n = len(self.gen)
        out = queue.Queue(maxsize=1)

        def worker():
            for i in range(n):
                t0 = time.time()
                load = self.gen[i]
                self.prep_walls.append(time.time() - t0)
                out.put(load)

        thread = threading.Thread(target=worker, daemon=True)
        thread.start()
        for _ in range(n):
            t0 = time.time()
            load = out.get()
            self.wait_walls.append(time.time() - t0)
            yield load
        thread.join()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n_events", type=float, default=10e6)
    ap.add_argument("--n_ood", type=float, default=2e6)
    ap.add_argument("--n_const", type=int, default=40)
    ap.add_argument("--n_dims", type=int, default=3)
    ap.add_argument("--mem_gb", type=float, default=0.6,
                    help="chunk budget; 0.6 -> ~1.25M-jet loads at 40x3 "
                         "(scaled-down analog of the reference's 30 GB "
                         "budget, ref OE-VAE/utils.py:48)")
    ap.add_argument("--n_epochs", type=int, default=2,
                    help="epoch 1 pays jit compile; epoch 2 is the soak")
    ap.add_argument("--batch_size", type=int, default=10000)
    ap.add_argument("--data_dir", default="/tmp/atlasvae_soak")
    ap.add_argument("--transfer_dtype", default="float16")
    args = ap.parse_args()
    if args.transfer_dtype:
        os.environ["ATLASVAE_TRANSFER_DTYPE"] = args.transfer_dtype

    # the soak is host-prep-bound on this 1-core VM: gate the number on
    # host memory health so a degraded hypervisor (fresh-page faults at
    # ~10-35 MB/s, see hostmem_probe.py) cannot masquerade as a
    # framework regression
    from hostmem_probe import probe
    mem_health = probe()
    print(f"host memory: fresh {mem_health['fresh_mb_s']} MB/s, "
          f"warm {mem_health['warm_mb_s']} MB/s"
          + ("  [DEGRADED — numbers will measure the hypervisor, "
             "not the framework]" if mem_health["degraded"] else ""))

    import jax
    from atlasvae.data import registry
    from atlasvae.data.loader import load_data
    from atlasvae.data.generator import BatchGenerator
    from atlasvae.data.scalers import fit_scaler
    from atlasvae.models.vae import init_vae, VAEConfig
    from atlasvae.train.loop import train_model, features

    n_events, n_ood = int(args.n_events), int(args.n_ood)
    os.makedirs(args.data_dir, exist_ok=True)
    print(f"backend: {jax.default_backend()}, devices: {jax.device_count()}")
    print("building synthetic files (cached across runs)...")
    qcd = build_big_file(f"{args.data_dir}/soak_QCD_{n_events}.h5", "QCD",
                         n_events, args.n_const)
    ood = build_big_file(f"{args.data_dir}/soak_OoD_{n_ood}.h5", "H-OoD",
                         n_ood, args.n_const, seed=777)
    registry.register_file("soak-QCD", qcd)
    registry.register_file("soak-OoD", ood)

    # scalers fit on a leading slice (production flow, ref vae.py:115-124)
    head = load_data("soak-QCD", 200_000, n_const=args.n_const,
                     n_dims=args.n_dims, constituents="ON", hlvs="ON",
                     verbose=False)
    const_scaler = fit_scaler(head["constituents"], args.n_dims,
                              scaler_type="MaxAbsScaler", verbose=False)
    hlv_scaler = fit_scaler(head["HLVs"], args.n_dims,
                            scaler_type="RobustScaler", verbose=False)
    ood_sample = load_data("soak-OoD", n_ood, n_const=args.n_const,
                           n_dims=args.n_dims, constituents="ON", hlvs="ON",
                           verbose=False)

    gen = BatchGenerator("soak-QCD", "soak-OoD", args.n_const, args.n_dims,
                         [0, n_events], ood_sample, weight_type="X-S",
                         constituents="ON", hlvs="ON",
                         bin_sizes={"m": 10, "pt": 20},
                         hlv_scaler=hlv_scaler, const_scaler=const_scaler,
                         is_train=True, mem_gb=args.mem_gb)
    n_loads = len(gen)
    print(f"{n_events:,} jets in {n_loads} loads of <= {gen.load_size:,}")
    assert n_loads >= 4, "soak must exercise the multi-load regime"

    input_dim = features(head).shape[1]
    params = init_vae(jax.random.PRNGKey(0),
                      VAEConfig(fc_layers=(80, 40, 20, 10),
                                input_dim=input_dim))
    timed = TimedGenerator(gen)
    # ONE train_model call: epoch 1 pays the jit compile in-process,
    # later epochs reuse it (separate calls would recompile per epoch)
    t0 = time.time()
    params, hist = train_model(params, timed, [], oe_type="MAE",
                               n_epochs=args.n_epochs,
                               batch_size=args.batch_size,
                               beta=0.1, lamb=1.0)
    edges = timed.epoch_starts + [time.time()]
    epoch_walls = [b - a for a, b in zip(edges[:-1], edges[1:])]
    for epoch, w in enumerate(epoch_walls):
        print(f"epoch {epoch}: wall {w:.1f}s  "
              f"loss {hist['Train loss'][epoch]:.3f}")
    wall = epoch_walls[-1]
    n_per_epoch = len(timed.wait_walls) // max(args.n_epochs, 1)
    last_waits = timed.wait_walls[-n_per_epoch:]
    last_preps = timed.prep_walls[-n_per_epoch:]
    prep = sum(last_preps)
    # prep time not hidden by training = queue waits beyond the
    # unavoidable first-load wait (warm epoch only)
    exposed = sum(last_waits) - last_waits[0]
    result = {
        "metric": "streaming_soak_jets_per_s",
        "value": round(n_events / wall, 1),
        "unit": "jets/s",
        "n_events": n_events,
        "n_loads": n_loads,
        "epoch_wall_s": round(wall, 2),
        "cold_epoch_wall_s": round(epoch_walls[0], 2),
        "host_prep_s": round(prep, 2),
        "first_load_wait_s": round(last_waits[0], 2),
        "exposed_prep_s": round(exposed, 2),
        "prep_hidden_frac": round(1 - exposed / max(prep, 1e-9), 3),
        "transfer_dtype": args.transfer_dtype or "float32",
        "input_dim": input_dim,
        "backend": jax.default_backend(),
        "hostmem_fresh_mb_s": mem_health["fresh_mb_s"],
        "hostmem_degraded": mem_health["degraded"],
    }
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
