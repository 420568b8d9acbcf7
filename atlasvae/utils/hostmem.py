"""Host allocator tuning for streaming (multi-load) epochs.

The streaming generator (data/generator.py) allocates and frees large
NumPy buffers every load: h5 slices, pt-sort/pad intermediates, paired
OoD copies, scaled outputs.  All of them exceed glibc's default 128 KB
``M_MMAP_THRESHOLD``, so every load mmaps fresh pages and munmaps them
on free — each load re-pays page zeroing plus first-touch fault cost
(the reference pays the same cost inside each of its worker processes,
ref OE-VAE/utils.py:36-73, just hidden behind the process pool).  On a
healthy host that is a few hundred ms per GB; on a fault-throttled
hypervisor it can be 100x the actual prep compute.

``enable_heap_reuse`` raises ``M_MMAP_THRESHOLD`` and
``M_TRIM_THRESHOLD`` so large buffers are served from the main heap and
freed memory stays in the arena: after the first load, every later load
reuses already-faulted pages (measured: first-touch 6 MB/s degraded /
~GB/s healthy -> >7 GB/s reused).  Trade-off: the process's RSS stays
at its high-water mark — acceptable for a training process whose peak
is bounded by the generator's memGB budget.  Opt out with
``ATLASVAE_HEAP_REUSE=0``.
"""

import ctypes
import os

_M_TRIM_THRESHOLD = -1
_M_MMAP_THRESHOLD = -3

_applied = False


def enable_heap_reuse(threshold_bytes=1 << 30):
    """Keep freed large buffers in the malloc arena for reuse (glibc
    ``mallopt``).  Idempotent; no-op (returns False) when opted out via
    ``ATLASVAE_HEAP_REUSE=0`` or on non-glibc platforms."""
    global _applied
    if os.environ.get("ATLASVAE_HEAP_REUSE", "1") == "0":
        return False
    if _applied:
        return True
    try:
        libc = ctypes.CDLL("libc.so.6", use_errno=True)
        ok = (libc.mallopt(_M_MMAP_THRESHOLD, int(threshold_bytes))
              and libc.mallopt(_M_TRIM_THRESHOLD, int(threshold_bytes)))
    except OSError:
        return False
    _applied = bool(ok)
    return _applied
