"""Fused conv1+pool+relu Pallas kernel vs the XLA chain, on-chip.

docs/PERF.md "jet-ID CNN step anatomy" pins the tower's gap to its
padded-FLOP floor on the HBM traffic of the first conv's pre-pool
activation block ((500, 62, 62, 100): 384 MB bf16), and estimates a
~1.5x ceiling for fusing conv1+pool+relu with its backward.  This probe
measures that kernel (ops/fused_conv.py) against the unfused chain at
the anatomy shape, fwd-only and fwd+bwd (dW/db; the image is the
network input, so dx is not part of either side), f32 and bf16.

Also measures ``fastpool``: the chain with ops/pooling.py's
``maxpool_same`` (identical reduce_window forward, elementwise VJP) —
the fix that actually shipped.

Run on the real TPU (a few compiles through the tunnel).

Measured (v5e, batch 500, 64x64x1 -> 100 maps, pool 2x2,
dispatch-latency-corrected; chain/fused from two clean runs
2026-08-19, fastpool ratios from two degraded-host runs the same day
— absolute walls there are inflated, the same-run ratios agree):

    chain    fwd  f32 1.27-1.52 ms | bf16 1.24-1.32 ms   (clean runs)
    chain   f+bwd f32 5.75-5.89 ms | bf16 1.43 ms        (clean runs)
    fastpool f+bwd f32 1.8x the chain | bf16 2.3x the chain  (same-run)
    fused    fwd  f32 10.6-11.4 ms | bf16 does not compile (Mosaic)
    fused   f+bwd f32 28.5-30.8 ms | bf16 does not compile

Readings — BOTH round-4 attacks on the block's backward lost to XLA:
(a) the Pallas fused kernel is 8-9x slower — the in-kernel im2col pays
a Mosaic vector relayout per tap (lane-major input slabs pivoting onto
the patch matrix's sublane axis), which swamps the HBM traffic the
fusion saves; bf16 hits a Mosaic limitation outright; (b) the
elementwise pool VJP (no select_and_scatter) is 1.8-2.3x slower than
the chain's own backward — its three conv-resolution upsample/compare
passes out-cost the scatter's serialization, extending round 3's
finding that the select_and_scatter folklore does not apply to
window==stride pooling.  Both kept as validated opt-ins
(ATLASVAE_CONV1=fused / ATLASVAE_POOL=fast), the ops/fused_vae.py
precedent.  Full history in docs/PERF.md.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B, H, W, M = 500, 64, 64, 100
POOL = (2, 2)


def _timed(fn, reps=5):
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(jax.tree.leaves(fn())[0])
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


def main():
    global jax
    import jax
    import jax.numpy as jnp

    from bench import _measure_dispatch_latency
    from atlasvae.ops.fused_conv import fused_conv1_pool_relu
    from atlasvae.ops.pooling import maxpool_same

    def xla_chain(x, w, b, pool=POOL):
        z = jax.lax.conv_general_dilated(
            x, w, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + b
        win = (1,) + tuple(pool) + (1,)
        z = -jax.lax.reduce_window(-z, jnp.inf, jax.lax.min, win, win, "SAME")
        return jax.nn.relu(z)

    def fastpool_chain(x, w, b, pool=POOL):
        z = jax.lax.conv_general_dilated(
            x, w, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + b
        return jax.nn.relu(maxpool_same(z, tuple(pool)))

    lat = _measure_dispatch_latency(jax)
    print(f"dispatch latency: {lat*1e3:.2f} ms (subtracted)", flush=True)

    rng = np.random.default_rng(0)
    x32 = rng.normal(size=(B, H, W, 1)).astype(np.float32)
    w32 = (rng.normal(size=(3, 3, 1, M)) * 0.2).astype(np.float32)
    b32 = (rng.normal(size=(M,)) * 0.1).astype(np.float32)

    for dtype in (jnp.float32, jnp.bfloat16):
        x = jax.device_put(x32.astype(dtype))
        w = jax.device_put(w32.astype(dtype))
        b = jax.device_put(b32.astype(dtype))
        np.asarray(x)

        def loss(fn):
            return jax.jit(lambda w, b: jnp.sum(
                fn(x, w, b).astype(jnp.float32) ** 2))

        def grad(fn):
            return jax.jit(jax.grad(
                lambda w, b: jnp.sum(fn(x, w, b).astype(jnp.float32) ** 2),
                argnums=(0, 1)))

        variants = [
            ("chain fwd", loss(xla_chain)),
            ("fastpool fwd", loss(fastpool_chain)),
            ("fused fwd", loss(fused_conv1_pool_relu)),
            ("chain fwd+bwd", grad(xla_chain)),
            ("fastpool fwd+bwd", grad(fastpool_chain)),
            ("fused fwd+bwd", grad(fused_conv1_pool_relu)),
        ]
        outs = {}
        for name, fn in variants:
            print(f"compiling {name} {dtype.__name__}...", flush=True)
            try:
                outs[name] = jax.tree.map(np.asarray, fn(w, b))
            except Exception as exc:  # e.g. Mosaic bf16 reshape limit
                print(f"{name} {dtype.__name__}: FAILED "
                      f"({type(exc).__name__}: {str(exc)[:120]})", flush=True)
                continue
            wall = _timed(lambda fn=fn: fn(w, b))
            real = max(wall - lat, 0.05 * wall)
            print(f"{name} {dtype.__name__}: {real*1e3:.2f} ms device",
                  flush=True)
        dw_c, _ = outs["chain fwd+bwd"]
        for other in ("fastpool fwd+bwd", "fused fwd+bwd"):
            if other not in outs:
                continue
            dw_o, _ = outs[other]
            rel = np.max(
                np.abs(dw_c.astype(np.float32) - dw_o.astype(np.float32))
                / (np.abs(dw_c.astype(np.float32)) + 1e-3))
            print(f"dw max rel delta, {other} ({dtype.__name__}): {rel:.2e}",
                  flush=True)


if __name__ == "__main__":
    main()
