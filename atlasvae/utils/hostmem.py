"""Host allocator tuning for streaming (multi-load) epochs.

Streaming paths (data/generator.py, the jet-ID --generator chunk loop)
allocate and free large NumPy buffers every load: h5 slices,
pt-sort/pad intermediates, paired OoD copies, scaled outputs.  All of
them exceed glibc's default 128 KB ``M_MMAP_THRESHOLD``, so every load
mmaps fresh pages and munmaps them on free — each load re-pays page
zeroing plus first-touch fault cost (the reference pays the same cost
inside each of its worker processes, ref OE-VAE/utils.py:36-73, just
hidden behind the process pool).  On a healthy host that is a few
hundred ms per GB; on a fault-throttled hypervisor it can be 100x the
actual prep compute.

``enable_heap_reuse`` raises ``M_MMAP_THRESHOLD`` / ``M_TRIM_THRESHOLD``
so large buffers are served from the heap and freed memory stays in the
arena (measured: first-touch 6 MB/s degraded / ~GB/s healthy -> >7 GB/s
reused), and pins ``M_ARENA_MAX`` to 1 so the prefetch worker thread
shares the main arena — non-main glibc arenas grow in 64 MB mmap'd
heaps and cannot hold GB-scale buffers, which would silently put the
worker's allocations back on the mmap path.  Coverage limit: ``mallopt``
values are C ints, so single allocations above ~2 GiB always mmap
regardless (the memGB-budget constituents block at the reference's
30 GB setting stays uncovered; the sub-2-GiB intermediates that
dominate allocation count are).  Trade-off: the process RSS holds at
its high-water mark — acceptable for a training process whose peak is
bounded by the generator's memGB budget.  Opt out with
``ATLASVAE_HEAP_REUSE=0``.
"""

import ctypes
import os

_M_TRIM_THRESHOLD = -1
_M_MMAP_THRESHOLD = -3
_M_ARENA_MAX = -8
_C_INT_MAX = 2**31 - 1

_applied = 0  # highest threshold applied so far


def enable_heap_reuse(threshold_bytes=1 << 30):
    """Keep freed large buffers in the malloc arena for reuse (glibc
    ``mallopt``); single-arena so worker threads share it.  Monotonic
    (re-calls can only raise the threshold, capped at C-int max);
    no-op (returns False) when opted out via ``ATLASVAE_HEAP_REUSE=0``
    or on non-glibc platforms."""
    global _applied
    if os.environ.get("ATLASVAE_HEAP_REUSE", "1") == "0":
        return False
    threshold = min(int(threshold_bytes), _C_INT_MAX)
    if threshold <= _applied:
        return True
    try:
        libc = ctypes.CDLL("libc.so.6", use_errno=True)
        ok = (libc.mallopt(_M_MMAP_THRESHOLD, threshold)
              and libc.mallopt(_M_TRIM_THRESHOLD, threshold)
              and libc.mallopt(_M_ARENA_MAX, 1))
    except OSError:
        return False
    if ok:
        _applied = threshold
    return bool(ok)
