"""Test configuration: 8 virtual CPU devices for multi-chip simulation.

This is the idiomatic JAX fake backend for exercising shard_map/psum
collectives without hardware (SURVEY.md S4): tests always run on CPU
with xla_force_host_platform_device_count=8, so sharding tests see
jax.device_count() == 8.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

# The axon TPU plugin ignores the JAX_PLATFORMS env var; the config
# update is authoritative.
jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu" and jax.device_count() == 8

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np
import pytest

from atlasvae.data import synthetic, registry


@pytest.fixture(scope="session")
def synth_dir(tmp_path_factory):
    """Small synthetic datasets registered under the standard names."""
    directory = tmp_path_factory.mktemp("synth")
    synthetic.ensure_synthetic_registry(directory, n_events=4000, n_const_max=30)
    return directory


@pytest.fixture()
def rng(request):
    """Per-test deterministic rng, seeded by the test's nodeid.

    Was session-scoped (one shared stream), which made every test's
    data depend on how much earlier tests consumed — adding a test
    anywhere silently reshuffled all later tests' draws, and ordering-
    dependent near-tie failures were unreproducible in isolation.
    crc32, not hash(): hash() is salted per process."""
    import zlib
    return np.random.default_rng(zlib.crc32(request.node.nodeid.encode()))
