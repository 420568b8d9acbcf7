"""jet-ID FCN step anatomy: where does the 5e3-jet step spend its time?

Mirrors the OE-VAE train-step anatomy in docs/PERF.md — ablations that
isolate dropout, metrics, gradient clipping, optimizer, and batch-size
effects, plus the padded-tile structural floor, so the measured
throughput has an explanation rather than just a number.  Run on the
real TPU (several compiles through the tunnel, ~10 min).  Reference
workload: jet-ID/models.py:94-99 fit at batch n_gpus x 5e3
(classifier.py:30).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("ATLASVAE_PRNG", "rbg")   # match bench.py:51


# the dispatch-latency probe is bench.py's — one copy of the
# methodology, so a correction there propagates here
from bench import _measure_dispatch_latency as _dispatch_latency  # noqa: E402


def _timed(fn, reps=9):
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(fn())
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


def main():
    import jax
    import jax.numpy as jnp
    import optax

    from atlasvae.models.jetid import JetIDConfig, init_jetid, jetid_apply
    from atlasvae.train.jetid_loop import make_jetid_step_fns, _pack, _ce_loss

    n = 1_000_000
    rng = np.random.default_rng(0)
    scalars = rng.normal(size=(n, 16)).astype(np.float32)
    labels_all = rng.integers(0, 2, n)

    def packed(batch):
        inputs, labels, weights = _pack({"scalars": scalars}, labels_all,
                                        np.ones(n, np.float32), batch)
        return (jax.device_put(inputs), jax.device_put(labels),
                jax.device_put(weights))

    key = jax.random.PRNGKey(1)
    lr = np.float32(1e-3)

    lat = _dispatch_latency(jax)
    print(f"dispatch latency: {lat*1e3:.2f} ms (subtracted)", flush=True)

    def run(name, config, optimizer, batch=5_000):
        params = init_jetid(jax.random.PRNGKey(0), config)
        inputs_p, labels_p, weights_p = packed(batch)
        n_batches = n // batch
        train_epoch, _ = make_jetid_step_fns(optimizer, config)
        state = {"p": params, "o": optimizer.init(params)}

        def epoch():
            p, o, m = train_epoch(state["p"], state["o"], lr, key,
                                  inputs_p, labels_p, weights_p)
            state["p"], state["o"] = p, o
            return m

        print(f"compiling {name}...", flush=True)
        np.asarray(epoch())
        wall = _timed(epoch)
        real = max(wall - lat, 0.1 * wall)
        print(f"{name}: wall {wall / n_batches * 1e6:.1f} us/step; "
              f"device {real / n_batches * 1e6:.1f} us/step "
              f"({n / real / 1e6:.1f}M jets/s)", flush=True)

    base = JetIDConfig(n_classes=2, scalars=("scalars",), scalar_dims=(16,),
                       nn_type="FCN")
    run("full step (fwd+bwd+Adam, dropout 0.1)", base, optax.adam(1.0))
    run("- dropout (rate 0)",
        JetIDConfig(n_classes=2, scalars=("scalars",), scalar_dims=(16,),
                    nn_type="FCN", dropout=0.0), optax.adam(1.0))
    run("- Adam (plain SGD)", base, optax.sgd(1.0))
    run("batch 1e4 (2x reference)", base, optax.adam(1.0), batch=10_000)
    run("batch 1e4, no dropout",
        JetIDConfig(n_classes=2, scalars=("scalars",), scalar_dims=(16,),
                    nn_type="FCN", dropout=0.0), optax.adam(1.0),
        batch=10_000)

    # forward only (dropout on, train-mode parity with the step above)
    params = init_jetid(jax.random.PRNGKey(0), base)
    inputs_p, labels_p, weights_p = packed(5_000)

    @jax.jit
    def fwd_epoch(params, key, inputs, labels, weights):
        def step(key, b):
            inp, lab, w = b
            key, sub = jax.random.split(key)
            probs = jetid_apply(params, base, inp, key=sub, train=True)
            return key, _ce_loss(probs, lab, w)
        _, ces = jax.lax.scan(step, key, (inputs, labels, weights))
        return ces

    print("compiling forward only...", flush=True)
    np.asarray(fwd_epoch(params, key, inputs_p, labels_p, weights_p))
    wall = _timed(lambda: fwd_epoch(params, key, inputs_p, labels_p,
                                    weights_p))
    real = max(wall - lat, 0.1 * wall)
    print(f"forward only: wall {wall / (n // 5000) * 1e6:.1f} us/step; "
          f"device {real / (n // 5000) * 1e6:.1f} us/step "
          f"({n / real / 1e6:.1f}M jets/s)", flush=True)

    # structural floor: padded MXU FLOPs at 128-lane tiles, batch 5e3
    def pad(x):
        return int(np.ceil(x / 128) * 128)

    batch = 5_000
    layers = [(16, 200), (200, 200), (200, 200), (200, 2)]
    fwd_flops = sum(2 * batch * pad(k) * pad(m) for k, m in layers)
    total = 3 * fwd_flops
    print(f"padded fwd FLOPs/step = {fwd_flops/1e9:.2f} GFLOP; "
          f"train (3x) = {total/1e9:.2f} GFLOP", flush=True)
    print(f"floor at f32 (~98.5 TFLOP/s): {total/98.5e12*1e6:.1f} us/step",
          flush=True)


if __name__ == "__main__":
    main()
