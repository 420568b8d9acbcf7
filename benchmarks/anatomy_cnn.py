"""jet-ID CNN step anatomy: where does the conv step spend its time?

Companion to anatomy_jetid.py (the FCN anatomy) for the CNN tower —
the reference's image classifier (ref jet-ID/models.py:9-36, Conv2D
100/100 maps + MaxPool 2x2 + LeakyReLU + Dropout at batch 5e3 images,
64x64 calorimeter grids).  Ablations isolate the conv FLOPs, the
max-pool backward (XLA lowers overlapping/reduce_window pooling
gradients to select_and_scatter, which serializes on TPU), dropout
mask traffic, and the f32/bf16 split, against the padded-FLOP floor.

Run on the real TPU (several compiles through the tunnel, ~10 min).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("ATLASVAE_PRNG", "rbg")   # match bench.py

from bench import _measure_dispatch_latency as _dispatch_latency  # noqa: E402

BATCH = 500
N = 20_000
H = W = 64


def _timed(fn, reps=5):
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

    rng = np.random.default_rng(0)
    images = rng.uniform(0, 1, size=(N, H, W)).astype(np.float32)
    labels_all = rng.integers(0, 2, N)

    def packed(batch=BATCH):
        inputs, labels, weights = _pack({"image": images}, labels_all,
                                        np.ones(N, np.float32), batch)
        return (jax.device_put(inputs), jax.device_put(labels),
                jax.device_put(weights))

    key = jax.random.PRNGKey(1)
    lr = np.float32(1e-3)
    lat = _dispatch_latency(jax)
    print(f"dispatch latency: {lat*1e3:.2f} ms (subtracted)", flush=True)

    def cfg(**kw):
        base = dict(n_classes=2, images=("image",), image_shapes=((H, W),),
                    nn_type="CNN")
        base.update(kw)
        return JetIDConfig(**base)

    inputs_p, labels_p, weights_p = packed()
    n_batches = N // BATCH

    def run(name, config):
        params = init_jetid(jax.random.PRNGKey(0), config)
        train_epoch, _ = make_jetid_step_fns(optax.adam(1.0), config)
        state = {"p": params, "o": optax.adam(1.0).init(params)}

        def epoch():
            p, o, m = train_epoch(state["p"], state["o"], lr, key,
                                  inputs_p, labels_p, weights_p)
            state["p"], state["o"] = p, o
            return m

        print(f"compiling {name}...", flush=True)
        np.asarray(epoch())
        wall = _timed(epoch)
        real = max(wall - lat, 0.1 * wall)
        print(f"{name}: device {real / n_batches * 1e3:.2f} ms/step "
              f"({N / real / 1e3:.1f}k jets/s)", flush=True)

    run("full step f32", cfg())
    run("full step bf16", cfg(compute_dtype="bfloat16"))
    run("bf16 - dropout", cfg(compute_dtype="bfloat16", dropout=0.0))
    run("f32 - dropout", cfg(dropout=0.0))

    # forward only (bf16, train-mode dropout on)
    config = cfg(compute_dtype="bfloat16")
    params = init_jetid(jax.random.PRNGKey(0), config)

    @jax.jit
    def fwd_epoch(params, key, inputs, labels, weights):
        def step(key, b):
            inp, lab, w = b
            key, sub = jax.random.split(key)
            probs = jetid_apply(params, config, inp, key=sub, train=True)
            return key, _ce_loss(probs, lab, w)
        _, ces = jax.lax.scan(step, key, (inputs, labels, weights))
        return ces

    print("compiling forward only bf16...", flush=True)
    np.asarray(fwd_epoch(params, key, inputs_p, labels_p, weights_p))
    wall = _timed(lambda: fwd_epoch(params, key, inputs_p, labels_p,
                                    weights_p))
    real = max(wall - lat, 0.1 * wall)
    print(f"forward only bf16: device {real / n_batches * 1e3:.2f} ms/step",
          flush=True)

    # bare tower fwd+bwd, three pooling formulations (no dense head, no
    # loss): conv-only, reduce_window pool (select_and_scatter backward),
    # reshape pool (pad to multiple + reshape + max: select backward)
    towers = init_jetid(jax.random.PRNGKey(0), cfg())["towers"]
    convs = jax.tree.map(lambda a: a.astype(jnp.bfloat16),
                         towers[next(iter(towers))])
    imgs = jax.device_put(
        images[:BATCH].reshape(BATCH, H, W, 1).astype(jnp.bfloat16))

    def conv2(x, w):
        return jax.lax.conv_general_dilated(
            x, w, window_strides=(1, 1), padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    def pool_rw(x):
        return -jax.lax.reduce_window(-x, jnp.inf, jax.lax.min,
                                      (1, 2, 2, 1), (1, 2, 2, 1), "SAME")

    def pool_rs(x):
        n, h, w, c = x.shape
        oh, ow = -(-h // 2), -(-w // 2)
        neg = jnp.finfo(x.dtype).min
        x = jnp.pad(x, ((0, 0), (0, oh * 2 - h), (0, ow * 2 - w), (0, 0)),
                    constant_values=neg)
        return jnp.max(x.reshape(n, oh, 2, ow, 2, c), axis=(2, 4))

    def tower(pool):
        def fwd(convs, x):
            for conv in convs:
                x = conv2(x, conv["w"]) + conv["b"]
                if pool is not None:
                    x = pool(x)
                x = jax.nn.relu(x)
            return jnp.sum(x.astype(jnp.float32))
        return jax.jit(jax.grad(fwd))

    for name, pool in (("conv-only (no pool) fwd+bwd", None),
                       ("conv+reduce_window pool fwd+bwd", pool_rw),
                       ("conv+reshape pool fwd+bwd", pool_rs)):
        fn = tower(pool)
        print(f"compiling {name}...", flush=True)
        np.asarray(jax.tree.leaves(fn(convs, imgs))[0])
        wall = _timed(lambda: jax.tree.leaves(fn(convs, imgs))[0])
        real = max(wall - lat, 0.02 * wall)
        print(f"{name}: device {real * 1e3:.2f} ms/step (batch {BATCH})",
              flush=True)

    # padded-FLOP floor (contraction dim padded to the MXU tile)
    flops = 0
    spatial, c_in = (H, W), 1
    for maps in (100, 100):
        oh, ow = spatial[0] - 2, spatial[1] - 2
        flops += 2 * BATCH * oh * ow * 9 * c_in * maps
        spatial, c_in = (-(-oh // 2), -(-ow // 2)), maps
    print(f"conv fwd FLOPs/step = {flops/1e9:.1f} GFLOP; train (3x) = "
          f"{3*flops/1e9:.1f} GFLOP", flush=True)
    print(f"floor: f32 (~98.5 TF/s) {3*flops/98.5e12*1e3:.2f} ms; "
          f"bf16 (~197 TF/s) {3*flops/197e12*1e3:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
