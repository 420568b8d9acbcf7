"""Multi-host initialization and per-host data sharding.

The reference's only multi-node story is communication-free Slurm
arrays (SURVEY.md S2.6/S5).  The TPU-native replacement: one global
mesh over all hosts' chips via ``jax.distributed.initialize``, with
deterministic per-host slices of the event axis feeding each host's
local devices (replacing MirroredStrategy's dataset splitting).
"""

import numpy as np

import jax


def initialize(coordinator_address=None, num_processes=None, process_id=None):
    """Bring up the JAX distributed runtime (no-op on a single host or
    when already initialized)."""
    try:
        if coordinator_address is not None:
            jax.distributed.initialize(coordinator_address=coordinator_address,
                                       num_processes=num_processes,
                                       process_id=process_id)
        elif jax.process_count() == 1:
            return False
    except RuntimeError:
        return False  # already initialized
    return True


def host_shard_range(n_events):
    """This host's contiguous [start, stop) slice of the global event
    axis — deterministic per-host data sharding."""
    n_hosts = jax.process_count()
    host = jax.process_index()
    edges = np.linspace(0, n_events, n_hosts + 1, dtype=np.int64)
    return int(edges[host]), int(edges[host + 1])


def global_mesh(axes=(("data", -1),)):
    """Mesh over every chip of every host (gradients psum over ICI
    within a slice and DCN across slices, both inserted by XLA)."""
    from .mesh import make_mesh
    return make_mesh(axes, jax.devices())
