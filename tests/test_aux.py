"""Auxiliary subsystem smoke tests: profiling, multihost, sweep grid."""

import numpy as np

from atlasvae.utils.profiling import StepTimer, trace, annotate
from atlasvae.parallel.multihost import host_shard_range, initialize
from atlasvae.cli.sweep import grid_search, _parse_grid


def test_step_timer_sync_and_report(capsys):
    import jax.numpy as jnp
    timer = StepTimer("op")
    for _ in range(3):
        with timer:
            StepTimer.sync(jnp.ones((64, 64)) @ jnp.ones((64, 64)))
    line = timer.report(items_per_step=64)
    assert "op: median" in line and "items/s" in line


def test_trace_writes_files(tmp_path):
    import jax.numpy as jnp
    with trace(tmp_path / "trace"):
        with annotate("matmul"):
            StepTimer.sync(jnp.ones((32, 32)) @ jnp.ones((32, 32)))
    files = [f for _, _, fs in __import__("os").walk(tmp_path) for f in fs]
    assert files  # profiler produced trace artifacts


def test_host_shard_range_single_host():
    assert initialize() is False  # single host: no-op
    lo, hi = host_shard_range(1000)
    assert (lo, hi) == (0, 1000)


def test_grid_search_matches_reference():
    # ref OE-VAE/utils.py:597-600
    single = grid_search(n_const=[20, 40, 60])
    assert single == {0: 20, 1: 40, 2: 60}
    double = grid_search(beta=[0, 1], lamb=[5, 10])
    assert double[0] == (0, 5) and double[3] == (1, 10)


def test_parse_grid():
    grid = _parse_grid(["beta=0,1,10", "lamb=1,5"])
    assert grid == {"beta": ["0", "1", "10"], "lamb": ["1", "5"]}
