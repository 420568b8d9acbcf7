"""Worker for the LIVE multi-process STREAMING-epoch test.

Launched N times by tests/test_multihost_live.py.  Each process joins
one JAX distributed runtime and runs the full production data pipeline
end-to-end for one streaming epoch: ``host_shard_range`` of the event
axis -> its own ``BatchGenerator`` (h5 read -> OoD pairing ->
reweighting) over ONLY its host shard -> per-host commit of its row
block of every global batch (``make_array_from_process_local_data``) ->
the sharded DP train step per load.  Every process independently
asserts the epoch's global loss and final parameters match a
single-device run over the identically composed global batches — the
multi-controller replacement of MirroredStrategy's dataset splitting
(ref jet-ID/models.py:69-81; SURVEY.md S5 "Distributed communication
backend").

Not collected by pytest (no test_ prefix).
"""

import os
import sys

PID, PORT = int(sys.argv[1]), sys.argv[2]
NPROCS = int(sys.argv[3])
DATA_DIR = sys.argv[4]
LOCAL_DEVICES = 8 // NPROCS
os.environ.pop("XLA_FLAGS", None)  # parent pytest pins 8 host devices
os.environ["ATLASVAE_PLATFORM"] = "cpu"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

jax.config.update("jax_num_cpu_devices", LOCAL_DEVICES)

from atlasvae.data import (BatchGenerator, load_data,
                           ensure_synthetic_registry, HLV_LIST)
from atlasvae.models import VAEConfig, init_vae
from atlasvae.parallel.multihost import (global_mesh, host_shard_range,
                                         initialize)
from atlasvae.train.loop import features
from atlasvae.train.step import batch_load, make_optimizer, make_vae_step_fns

assert initialize(f"127.0.0.1:{PORT}", num_processes=NPROCS,
                  process_id=PID) is True
assert jax.process_count() == NPROCS and jax.process_index() == PID

# the parent test pre-generated these files; this call only registers
ensure_synthetic_registry(DATA_DIR, n_events=4000, n_const_max=30)

N_TRAIN, N_OOD, BATCH = 2048, 1500, 128
N_CONST, N_DIMS = 20, 3
# ~512 events/load -> a 4-load streaming epoch per host shard
MEM_GB = 512 * N_CONST * N_DIMS * 4 / 1e9
B_LOCAL = BATCH // NPROCS

ood_sample = load_data("OoD-H", N_OOD, (), N_CONST, N_DIMS, "OFF", "ON",
                       list(HLV_LIST))


def make_gen(lo, hi):
    return BatchGenerator("QCD-Geneva", "OoD-H", N_CONST, N_DIMS, [lo, hi],
                          ood_sample, "X-S", (), "OFF", "ON", list(HLV_LIST),
                          {"m": 10, "pt": 20}, None, None, is_train=True,
                          mem_gb=MEM_GB)


def pack_load(gen, idx, b_rows, n_dev):
    bkg, ood = gen[idx]
    return batch_load(features(bkg), features(ood), bkg["weights"],
                      ood["weights"], b_rows, n_devices=n_dev)


lo, hi = host_shard_range(N_TRAIN)
assert hi - lo == N_TRAIN // NPROCS, (lo, hi)
my_gen = make_gen(lo, hi)
n_loads = len(my_gen)
assert n_loads >= 2, f"want a genuinely streaming epoch, got {n_loads} load(s)"

cfg = VAEConfig(fc_layers=(16, 8), input_dim=len(HLV_LIST))
params0 = jax.tree.map(np.asarray, init_vae(jax.random.PRNGKey(0), cfg))
opt = make_optimizer()
opt_state0 = jax.tree.map(np.asarray, opt.init(params0))
lr = np.float32(1e-3)
epoch_key = jax.random.PRNGKey(7)

# ---- the live path: this process streams ONLY its host shard ----------
mesh = global_mesh()
dp_step, _ = make_vae_step_fns(opt, "KLD", 1.0, 1.0, 1.0, mesh=mesh)

from jax.sharding import NamedSharding, PartitionSpec as P


def to_global(b):
    spec = P(*((None, "data") + (None,) * (b.ndim - 2)))
    gshape = (b.shape[0], b.shape[1] * NPROCS) + b.shape[2:]
    return jax.make_array_from_process_local_data(
        NamedSharding(mesh, spec), np.ascontiguousarray(b), gshape)


params, opt_state = params0, opt_state0
dp_metrics = []
for i in range(n_loads):
    local = pack_load(my_gen, i, B_LOCAL, LOCAL_DEVICES)
    gbatches = tuple(to_global(b) for b in local)
    key = np.asarray(jax.random.fold_in(epoch_key, i))
    params, opt_state, m = dp_step(params, opt_state, lr, key, *gbatches)
    dp_metrics.append(np.asarray(m.addressable_shards[0].data))
dp_leaves = [np.asarray(l.addressable_shards[0].data)
             for l in jax.tree.leaves(params)]
dp_metrics = np.concatenate(dp_metrics)
dp_loss = dp_metrics[:, 3].sum() / dp_metrics[:, 4].sum()

# ---- single-device baseline over the identical global composition -----
# Rebuild every host's loads (the prep is deterministic: same files,
# same shard edges, same pairing seed) and concatenate the per-host row
# blocks exactly as the commit above laid them out.
single_step, _ = make_vae_step_fns(opt, "KLD", 1.0, 1.0, 1.0)
gens = [make_gen(*host_shard_range(N_TRAIN, NPROCS, h))
        for h in range(NPROCS)]
assert all(len(g) == n_loads for g in gens)
with jax.default_device(jax.local_devices()[0]):
    params1, opt1 = params0, opt_state0
    s_metrics = []
    for i in range(n_loads):
        per_host = [pack_load(g, i, B_LOCAL, LOCAL_DEVICES) for g in gens]
        gbatches = tuple(np.concatenate([ph[j] for ph in per_host], axis=1)
                         for j in range(5))
        key = np.asarray(jax.random.fold_in(epoch_key, i))
        params1, opt1, m = single_step(params1, opt1, lr, key, *gbatches)
        s_metrics.append(np.asarray(m))
s_metrics = np.concatenate(s_metrics)
s_loss = s_metrics[:, 3].sum() / s_metrics[:, 4].sum()

np.testing.assert_allclose(s_loss, dp_loss, rtol=2e-5)
for a, b in zip(jax.tree.leaves(params1), dp_leaves):
    np.testing.assert_allclose(np.asarray(a), b, atol=5e-5)

print(f"STREAM-OK proc={PID} loads={n_loads} shard=[{lo},{hi}) "
      f"loss={dp_loss:.6f}", flush=True)
