"""Multi-host initialization and per-host data sharding.

The reference's only multi-node story is communication-free Slurm
arrays (SURVEY.md S2.6/S5).  The TPU-native replacement: one global
mesh over all hosts' chips via ``jax.distributed.initialize``, with
deterministic per-host slices of the event axis feeding each host's
local devices (replacing MirroredStrategy's dataset splitting).
"""

import numpy as np

import jax


def _already_initialized():
    """True when the JAX distributed runtime has a live client."""
    try:
        from jax._src import distributed as _dist
        return _dist.global_state.client is not None
    except Exception:
        return False


def initialize(coordinator_address=None, num_processes=None, process_id=None):
    """Bring up the JAX distributed runtime.

    Returns True when this call initialized the runtime, False when it
    was a no-op (single host with no coordinator given, or already
    initialized).  Genuine initialization failures (bad address,
    unreachable coordinator, inconsistent process counts) PROPAGATE —
    they must not be swallowed as "already initialized".

    Validated in this environment: single-host no-op, already-initialized
    detection, and error propagation (tests/test_aux.py), plus LIVE
    two-process bring-up — 2 OS processes x 4 CPU devices joining one
    8-device runtime and running the DP train step to single-device
    parity (tests/test_multihost_live.py).
    """
    if coordinator_address is None:
        # no coordinator: nothing to do on a single host; on Slurm-style
        # auto-detect environments the caller passes the address in
        return False
    if _already_initialized():
        return False
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)
    return True


def host_shard_range(n_events, n_hosts=None, host=None):
    """This host's contiguous [start, stop) slice of the global event
    axis — deterministic per-host data sharding.  Uneven splits spread
    the remainder over the leading hosts (linspace edges), and hosts
    beyond n_events get empty ranges."""
    n_hosts = jax.process_count() if n_hosts is None else int(n_hosts)
    host = jax.process_index() if host is None else int(host)
    if not 0 <= host < n_hosts:
        raise ValueError(f"host {host} not in [0, {n_hosts})")
    edges = np.linspace(0, n_events, n_hosts + 1).astype(np.int64)
    return int(edges[host]), int(edges[host + 1])


def global_mesh(axes=(("data", -1),)):
    """Mesh over every chip of every host (gradients psum over ICI
    within a slice and DCN across slices, both inserted by XLA)."""
    from .mesh import make_mesh
    return make_mesh(axes, jax.devices())
