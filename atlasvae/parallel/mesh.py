"""Device mesh construction and sharding helpers.

The reference's entire distribution story is single-node
MirroredStrategy over <=8 GPUs (ref jet-ID/models.py:69-81) plus
communication-free Slurm job arrays (SURVEY.md S2.6).  The TPU-native
replacement is one ``jax.sharding.Mesh`` over all chips:

* ``data`` axis — batch/event sharding (DP); gradients psum over ICI,
* ``model`` axis — optional tensor-parallel axis for wide dense layers
  (the flagship models are narrow MLPs, so DP is the production layout;
  the model axis exists for scale-out of wider configurations).

Multi-host: call ``jax.distributed.initialize()`` before building the
mesh; ``shard_batch`` lays per-host data onto local devices only.
"""

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(axes=(("data", -1),), devices=None):
    """Build a mesh from (name, size) pairs; size -1 absorbs the rest."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    names = [a[0] for a in axes]
    sizes = [a[1] for a in axes]
    known = int(np.prod([s for s in sizes if s != -1])) or 1
    sizes = [len(devices) // known if s == -1 else s for s in sizes]
    if int(np.prod(sizes)) != len(devices):
        raise ValueError(f"mesh {dict(zip(names, sizes))} != {len(devices)} devices")
    return Mesh(devices.reshape(sizes), tuple(names))


def data_parallel_mesh(n_devices=None):
    devices = jax.devices()[:n_devices] if n_devices else jax.devices()
    return make_mesh((("data", len(devices)),), devices)


def config_mesh(n_devices=None):
    """1-D mesh whose axis shards a *config* (ensemble/sweep/fold) axis:
    each device trains its slice of the configurations with ZERO
    collectives (the multi-chip form of the reference's Slurm job array,
    ref OE-VAE/sbatch.sh:13-16 — communication-free by construction)."""
    devices = jax.devices()[:n_devices] if n_devices else jax.devices()
    return make_mesh((("config", len(devices)),), devices)


def shard_leading(mesh, tree, axis="config"):
    """Commit a stacked pytree with its leading dimension sharded over
    ``axis`` (every leaf carries the stacked axis 0, see
    train/ensemble.py stack_trees)."""
    def put(x):
        spec = [axis] + [None] * (np.ndim(x) - 1)
        return jax.device_put(np.asarray(x), NamedSharding(mesh, P(*spec)))
    return jax.tree.map(put, tree)


def replicate(mesh, tree):
    """Replicate a pytree (params/opt state) across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def shard_batch(mesh, tree, axis="data", batch_dim=1):
    """Place batch arrays with dimension ``batch_dim`` sharded over the
    data axis (load layout is (n_batches, batch, ...), see step.py)."""
    def put(x):
        spec = [None] * np.ndim(x)
        spec[batch_dim] = axis
        return jax.device_put(x, NamedSharding(mesh, P(*spec)))
    return jax.tree.map(put, tree)
