"""Tracing and profiling utilities.

The reference's observability is wall-clock prints around hot sections
(SURVEY.md S5 "Tracing/profiling: none ... TPU equivalent:
jax.profiler traces + per-step timing").  This module provides both:

* ``trace``: context manager wrapping ``jax.profiler.trace`` — dumps a
  TensorBoard-compatible device trace of everything inside,
* ``annotate``: named sub-spans inside a trace (TraceAnnotation),
* ``StepTimer``: per-step wall-clock accumulator that forces device
  completion (the axon tunnel's block_until_ready does not synchronize;
  see bench.py) and prints reference-style timing lines.
"""

import contextlib
import time

import numpy as np


@contextlib.contextmanager
def trace(log_dir, enabled=True):
    """Device trace of the enclosed block -> ``log_dir`` (view with
    TensorBoard's profile plugin or xprof)."""
    if not enabled:
        yield
        return
    import jax
    jax.profiler.start_trace(str(log_dir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name):
    """Named span inside an active trace."""
    import jax
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Wall-clock step timing with forced device synchronization."""

    def __init__(self, name="step"):
        self.name = name
        self.times = []
        self._start = None

    def __enter__(self):
        self._start = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.times.append(time.perf_counter() - self._start)
        return False

    @staticmethod
    def sync(tree):
        """Force completion by fetching one element of every leaf (the
        only reliable sync through the axon remote-device tunnel).  The
        slice happens DEVICE-side before the fetch, so the wire cost is
        O(1) bytes per leaf — np.asarray(leaf) would device_get whole
        arrays and turn the sync itself into the bottleneck."""
        import jax
        for leaf in jax.tree.leaves(tree):
            if np.ndim(leaf) and np.size(leaf) > 65536:
                # eager slice dispatch costs ~0.5 s here, so only pay it
                # where the full fetch would cost more
                np.asarray(jax.numpy.ravel(leaf)[:1])
            else:
                np.asarray(leaf)
        return tree

    def report(self, items_per_step=None):
        times = np.asarray(self.times)
        if len(times) == 0:
            return ""
        med = float(np.median(times))
        line = f"{self.name}: median {med * 1e3:.2f} ms over {len(times)} steps"
        if items_per_step:
            line += f" ({items_per_step / med:,.0f} items/s)"
        print(line)
        return line
