"""Host memory health probe for benchmark gating.

The streaming benchmarks (``soak_streaming.py``) and the generator path
are host-prep-bound on this 1-core VM, so their numbers are only
meaningful when guest memory behaves normally.  This environment's VM
can enter a degraded state where every FIRST touch of a fresh page
faults through the hypervisor at ~10-35 MB/s (measured 2026-08-17:
a 400 MB ``np.float32`` fill took 61 s; re-touching the same pages runs
at ~2 GB/s, and freed pages return to the host so the cost recurs per
allocation).  In that state any multi-GB benchmark measures the
hypervisor, not the framework.

Run this first; it prints one JSON line.  ``fresh_mb_s`` below ~200
means the host is degraded — do not record soak/streaming numbers.

Usage:
    python benchmarks/hostmem_probe.py [--mb 256]
"""

import argparse
import json
import time

import numpy as np


def probe(mb=256):
    n = mb * 1024 * 1024 // 4
    t0 = time.time()
    a = np.ones(n, np.float32)          # fresh pages: faults + fill
    fresh_s = time.time() - t0
    a[::1024] += 1                      # make sure it is resident
    t0 = time.time()
    a *= np.float32(1.0)                # warm pages: pure bandwidth
    warm_s = time.time() - t0
    return {
        "metric": "hostmem_fresh_mb_s",
        "value": round(mb / fresh_s, 1),
        "unit": "MB/s",
        "fresh_mb_s": round(mb / fresh_s, 1),
        "warm_mb_s": round(mb / warm_s, 1),
        "probe_mb": mb,
        "degraded": bool(mb / fresh_s < 200),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mb", type=int, default=256)
    args = ap.parse_args()
    print(json.dumps(probe(args.mb)))


if __name__ == "__main__":
    main()
