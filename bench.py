"""Benchmark: OE-VAE training throughput (jets/sec/chip) on real hardware.

Canonical configuration = the reference's production run
(ref OE-VAE/vae.sh:3-11): batch 1e4, FC layers 80/40/20/10, 12 HLV
inputs, MAE outlier exposure, beta=2, lambda=5.  One "load" of 100
batches (1e6 jets) is scanned per jitted call; throughput is measured
after compilation.

vs_baseline: the reference publishes no numbers (BASELINE.md); the
denominator is a provisional estimate of its eager-TF single-GPU
throughput at the same config (~1e6 jets/s: ~10 ms/batch of 1e4 — three
uncompiled VAE forwards + tape backward + per-batch Python dispatch,
ref OE-VAE/models.py:177-200).  To be replaced by an empirical
measurement when the reference can be run side-by-side.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
"""

import json
import os
import time

import numpy as np

# Production PRNG: XLA RngBitGenerator (~18% faster step than threefry at
# this model size; deterministic per key+platform — see atlasvae/__init__).
os.environ.setdefault("ATLASVAE_PRNG", "rbg")

REFERENCE_EAGER_JETS_PER_SEC = 1.0e6  # provisional, see module docstring


def main():
    import jax
    import jax.numpy as jnp
    from atlasvae.models import VAEConfig, init_vae
    from atlasvae.train.step import make_vae_step_fns, make_optimizer, batch_load
    from atlasvae.ops import fused_mlp_apply

    backend = jax.default_backend()
    config = VAEConfig(fc_layers=(80, 40, 20, 10), input_dim=12)
    params = init_vae(jax.random.PRNGKey(0), config)
    optimizer = make_optimizer()
    opt_state = optimizer.init(params)
    lr = np.float32(1e-3)
    train_on_load, _ = make_vae_step_fns(optimizer, oe_type="MAE", beta=2.0,
                                         lamb=5.0, margin=1.0)

    # One jitted call per load, like the reference's epoch structure: the
    # 30 GB load budget (ref OE-VAE/utils.py:48) holds the whole canonical
    # 8e6-jet HLV epoch in ONE load, so a large n_batches-per-call is the
    # production shape (and amortizes the ~40 ms remote-tunnel latency).
    batch_size = 10_000
    n_batches = 1000
    n = batch_size * n_batches
    rng = np.random.default_rng(0)
    x = rng.normal(size=(n, 12)).astype(np.float32)
    w = np.ones(n, np.float32)
    batches = batch_load(x, x + 0.5, w, w, batch_size)
    batches = jax.device_put(batches)
    key = jax.random.PRNGKey(1)

    # compile + warmup
    p, o, m = train_on_load(params, opt_state, lr, key, *batches)
    jax.block_until_ready((p, o, m))
    # timed runs.  block_until_ready does NOT synchronize through the
    # axon remote-device tunnel; a device->host transfer does, so each
    # rep fetches the (tiny) metrics array to force completion.
    reps = 5
    times = []
    for _ in range(reps):
        start = time.perf_counter()
        p, o, m = train_on_load(p, o, lr, key, *batches)
        np.asarray(m)
        times.append(time.perf_counter() - start)
    train_jps = n / float(np.median(times))

    # inference throughput: deterministic encoder+decoder via the fused
    # Pallas dense-stack kernel (the predict path, ref OE-VAE/vae.py:165)
    stack = (params["encoder"]["hidden"] + [params["encoder"]["mean"]])
    xb = jnp.asarray(x)
    out = fused_mlp_apply(stack, xb)
    np.asarray(out[:1])
    times = []
    for _ in range(reps):
        start = time.perf_counter()
        out = fused_mlp_apply(stack, xb)
        np.asarray(out[-1:])  # force completion through the tunnel
        times.append(time.perf_counter() - start)
    infer_jps = n / float(np.median(times))

    print(json.dumps({
        "metric": "oe_vae_train_jets_per_sec_per_chip",
        "value": round(train_jps, 1),
        "unit": "jets/s",
        "vs_baseline": round(train_jps / REFERENCE_EAGER_JETS_PER_SEC, 3),
        "infer_encode_jets_per_sec": round(infer_jps, 1),
        "backend": backend,
        "config": "batch=1e4 fc=80/40/20/10 in=12 OE=MAE beta=2 lamb=5 prng=rbg",
    }))


if __name__ == "__main__":
    main()
