"""Worker for the LIVE two-process multi-host parity test.

Launched twice by tests/test_multihost_live.py (process ids 0 and 1),
each with 4 virtual CPU devices.  Both processes join one JAX
distributed runtime (8 global devices), run the data-parallel VAE train
step over the global mesh with each host feeding only its local half of
the batch rows, and independently assert the result matches the
single-device step — the multi-controller analogue of
tests/test_train.py::test_dp_matches_single_device, replacing the
capability of MirroredStrategy (ref jet-ID/models.py:69-81) across
hosts rather than merely across one host's chips.

Not collected by pytest (no test_ prefix).
"""

import os
import sys

PID, PORT = int(sys.argv[1]), sys.argv[2]
NPROCS = int(sys.argv[3]) if len(sys.argv) > 3 else 2
LOCAL_DEVICES = 8 // NPROCS
os.environ.pop("XLA_FLAGS", None)  # parent pytest pins 8 host devices
os.environ["ATLASVAE_PLATFORM"] = "cpu"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

jax.config.update("jax_num_cpu_devices", LOCAL_DEVICES)

from atlasvae.models import VAEConfig, init_vae
from atlasvae.parallel.multihost import global_mesh, host_shard_range, initialize
from atlasvae.train.step import batch_load, make_optimizer, make_vae_step_fns

assert initialize(f"127.0.0.1:{PORT}", num_processes=NPROCS,
                  process_id=PID) is True
assert jax.process_count() == NPROCS and jax.process_index() == PID
assert jax.device_count() == 8 and len(jax.local_devices()) == LOCAL_DEVICES

# deterministic identical inputs on both processes
cfg = VAEConfig(fc_layers=(16, 8), input_dim=6)
params = jax.tree.map(np.asarray, init_vae(jax.random.PRNGKey(0), cfg))
rng = np.random.default_rng(0)
x = rng.normal(0, 1, (256, 6)).astype(np.float32)
ood = rng.normal(3, 1, (256, 6)).astype(np.float32)
w = np.ones(256, dtype=np.float32)
batches = batch_load(x, ood, w, w, 64, n_devices=8)
key = np.asarray(jax.random.PRNGKey(7))
lr = np.float32(1e-3)

opt = make_optimizer(lr)
opt_state0 = jax.tree.map(np.asarray, opt.init(params))

# single-device baseline on one local device
single_step, _ = make_vae_step_fns(opt, "KLD", 1.0, 1.0, 1.0)
with jax.default_device(jax.local_devices()[0]):
    p1, _, m1 = single_step(params, opt_state0, lr, key, *batches)
p1 = jax.tree.map(np.asarray, p1)
m1 = np.asarray(m1)

# global-mesh DP step: this host commits ONLY its local half of each batch
mesh = global_mesh()
dp_step, _ = make_vae_step_fns(opt, "KLD", 1.0, 1.0, 1.0, mesh=mesh)

from jax.sharding import NamedSharding, PartitionSpec as P

lo, hi = host_shard_range(batches[0].shape[1])  # rows of each batch
rows = 64 // NPROCS
assert (lo, hi) == (rows * PID, rows * (PID + 1)), (lo, hi)


def to_global(b):
    spec = P(*((None, "data") + (None,) * (b.ndim - 2)))
    return jax.make_array_from_process_local_data(
        NamedSharding(mesh, spec), np.ascontiguousarray(b[:, lo:hi]), b.shape)


gbatches = tuple(to_global(b) for b in batches)
p2, _, m2 = dp_step(params, opt_state0, lr, key, *gbatches)

# outputs are replicated: every process holds full copies
leaves2 = [np.asarray(l.addressable_shards[0].data) for l in jax.tree.leaves(p2)]
m2 = np.asarray(m2.addressable_shards[0].data)

np.testing.assert_allclose(m1[:, :4].sum(0), m2[:, :4].sum(0), rtol=2e-3)
for a, b in zip(jax.tree.leaves(p1), leaves2):
    np.testing.assert_allclose(np.asarray(a), b, atol=5e-4)

print(f"PARITY-OK proc={PID} shard=[{lo},{hi})", flush=True)
