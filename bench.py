"""Benchmark: all four hot paths on real hardware, ONE JSON line.

Primary metric = OE-VAE training throughput (jets/sec/chip) at the
reference's canonical configuration (ref OE-VAE/vae.sh:3-11): batch 1e4,
FC layers 80/40/20/10, 12 HLV inputs, MAE outlier exposure, beta=2,
lambda=5.  One "load" of 1000 batches (1e7 jets) is scanned per jitted
call; throughput is measured after compilation.

Extra keys (so regressions in the non-flagship paths are
driver-visible, VERDICT r1 #6):
* ``infer_encode_jets_per_sec`` — deterministic encoder via the fused
  dense-stack kernel (the predict path, ref OE-VAE/vae.py:165),
* ``aae_cycle_jets_per_sec`` — one AE + Disc + AAE phase-epoch triplet
  at the canonical AAE config (ref OE-AAE/train.sh:3-12: 1e6 jets,
  batch 5e3, AE 100/100/100, disc 100/100/3, HLVs-only),
* ``jetid_train_jets_per_sec`` — supervised FCN epoch at the reference
  batch of 5e3/chip (ref jet-ID/classifier.py:137),
* ``bump_scan_warm_s`` — warm wall of the production statistics shapes:
  100-cut local-sigma scan + one npe=1000 global pseudo-experiment scan
  (ref OE-VAE/plots.py:262-291 workload).

* ``sweep_vmap8_jets_per_sec`` — aggregate throughput of 8 VAE
  hyper-parameter configs trained as ONE vmapped program
  (train/ensemble.py; replaces the reference's Slurm-array grid,
  ref OE-VAE/utils.py:597-600) and ``sweep_vmap8_speedup_vs_seq`` =
  aggregate / single-config rate (8.0 would mean 8 configs for the
  price of one).

Two baseline ratios are emitted (VERDICT r2 #6):
* ``vs_baseline`` (= ``vs_baseline_est``): denominator is a provisional
  ESTIMATE of the reference's eager-TF single-GPU throughput at the
  same config (~1e6 jets/s, per-batch Python dispatch,
  ref OE-VAE/models.py:177-200) — the reference publishes no numbers
  (BASELINE.md).
* ``vs_reference_cpu_measured``: denominator is the MEASURED throughput
  of the reference's own train_model executed on this machine's CPU at
  identical config/data (23.1-23.4k jets/s; midpoint 23.25k;
  benchmarks/bench_reference_cpu.py, BASELINE.md) — a defensible
  same-code anchor, though on different silicon than the TPU numerator.

Methodology (round 3): every timed wall has the environment's fixed
~29 ms dispatch+fetch round-trip subtracted
(``dispatch_latency_ms_subtracted`` in the line; measured per run by a
trivial jitted call, cross-checked by the linear intercept of a
step-count sweep, docs/PERF.md).  The tunnel RTT is transport, not chip
time — production loops hide it by pipelining dispatch — and leaving it
in understated the short-wall paths by 2-4x (jet-ID epoch: 50 ms wall
of which 29 ms was RTT).  Rounds <= 2 recorded raw walls; their train
number is comparable after adding the RTT back (~25% at the 1000-step
flagship shape).
"""

import json
import os
import sys
import time

import numpy as np

# Production PRNG: XLA RngBitGenerator (~18% faster step than threefry at
# this model size; deterministic per key+platform — see atlasvae/__init__).
os.environ.setdefault("ATLASVAE_PRNG", "rbg")

REFERENCE_EAGER_JETS_PER_SEC = 1.0e6  # provisional, see module docstring
REFERENCE_CPU_MEASURED_JETS_PER_SEC = 23.25e3  # measured, BASELINE.md:44


def _log(msg):
    print(msg, file=sys.stderr, flush=True)


_DISPATCH_LATENCY_S = 0.0  # measured in main(); subtracted by _timed


def _timed(fn, fetch, reps=9):
    """Median wall of fn() minus the fixed dispatch+fetch latency;
    fetch(out) must move data to host — block_until_ready does NOT
    synchronize through the axon tunnel.

    Through this environment's remote-device tunnel every timed rep
    carries a ~29 ms fixed round-trip that is pure transport, not chip
    time (measured: a trivial jitted program costs 29.1 ms wall; a
    1000-step scan sweep extrapolates to the same intercept,
    docs/PERF.md "dispatch latency").  Production training loops hide
    it entirely (async dispatch pipelines the next epoch while the
    previous executes), so device throughput — the quantity these
    metrics name — is wall minus that intercept.  The floor guard keeps
    the correction sane if the latency estimate ever exceeds a real
    wall (e.g. on a local CPU backend where the intercept is ~0)."""
    times = []
    for _ in range(reps):
        start = time.perf_counter()
        fetch(fn())
        times.append(time.perf_counter() - start)
    wall = float(np.median(times))
    return max(wall - _DISPATCH_LATENCY_S, 0.1 * wall)


def _measure_dispatch_latency(jax):
    """Fixed per-call wall of a trivial jitted program + scalar fetch."""
    import jax.numpy as jnp

    @jax.jit
    def triv(x):
        return x + jnp.float32(1.0)

    x = jax.device_put(np.float32(0.0))
    np.asarray(triv(x))  # compile
    times = []
    for _ in range(15):
        start = time.perf_counter()
        np.asarray(triv(x))
        times.append(time.perf_counter() - start)
    return float(np.median(times))


def bench_vae(jax, jnp):
    from atlasvae.models import VAEConfig, init_vae
    from atlasvae.train.step import make_vae_step_fns, make_optimizer, batch_load
    from atlasvae.ops import fused_mlp_apply

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
    batches = jax.device_put(batch_load(x, x + 0.5, w, w, batch_size))
    key = jax.random.PRNGKey(1)

    _log("compiling VAE train step...")
    state = [params, opt_state]
    p, o, m = train_on_load(state[0], state[1], lr, key, *batches)
    np.asarray(m)
    state[0], state[1] = p, o

    def step():
        p, o, m = train_on_load(state[0], state[1], lr, key, *batches)
        state[0], state[1] = p, o
        return m

    train_jps = n / _timed(step, lambda m: np.asarray(m), reps=11)

    # inference: deterministic encoder via the fused dense-stack kernel
    stack = (params["encoder"]["hidden"] + [params["encoder"]["mean"]])
    xb = jnp.asarray(x)
    _log("compiling fused inference kernel...")
    np.asarray(fused_mlp_apply(stack, xb)[:1])
    infer_jps = n / _timed(lambda: fused_mlp_apply(stack, xb),
                           lambda out: np.asarray(out[-1:]), reps=11)
    return train_jps, infer_jps


def bench_sweep(jax, train_jps):
    """8 hyper-parameter configs as one vmapped program vs sequential."""
    from atlasvae.models import VAEConfig, init_vae
    from atlasvae.train.ensemble import (make_vae_ensemble_step_fns,
                                         init_ensemble_opt_state, stack_trees)
    from atlasvae.train.step import make_optimizer, batch_load

    G = 8
    config = VAEConfig(fc_layers=(80, 40, 20, 10), input_dim=12)
    stacked = stack_trees([init_vae(jax.random.PRNGKey(s), config)
                           for s in range(G)])
    optimizer = make_optimizer()
    opt_state = init_ensemble_opt_state(optimizer, stacked)
    train, _ = make_vae_ensemble_step_fns(optimizer, "MAE")

    batch_size, n_batches = 10_000, 300
    n = batch_size * n_batches
    rng = np.random.default_rng(0)
    x = rng.normal(size=(n, 12)).astype(np.float32)
    w = np.ones(n, np.float32)
    batches = jax.device_put(batch_load(x, x + 0.5, w, w, batch_size))
    hyper = tuple(rng.uniform(0.5, 5.0, G).astype(np.float32)
                  for _ in range(3))
    lrs = np.full(G, 1e-3, np.float32)
    keys = np.stack([np.asarray(jax.random.PRNGKey(s)) for s in range(G)])

    state = {"p": stacked, "o": opt_state}

    def step():
        p, o, m = train(state["p"], state["o"], lrs, hyper, keys, *batches)
        state["p"], state["o"] = p, o
        return m

    _log("compiling vmapped 8-config sweep step...")
    np.asarray(step())
    sweep_jps = G * n / _timed(step, lambda m: np.asarray(m), reps=7)
    return sweep_jps, sweep_jps / train_jps


def bench_aae(jax):
    from atlasvae.models.aae import AAEConfig, init_aae
    from atlasvae.train.aae_loop import make_aae_step_fns
    import optax

    config = AAEConfig(input_dim=12)
    params = init_aae(jax.random.PRNGKey(0), config)
    optimizer = optax.adam(1.0)
    ae_epoch, disc_epoch, aae_epoch = make_aae_step_fns(
        optimizer, lamb=5.0, beta=2.0, lr=1e-6)

    n, batch = 1_000_000, 5_000
    nb = n // batch
    rng = np.random.default_rng(0)
    shape = (nb, batch, 12)
    bkg = jax.device_put(rng.normal(size=shape).astype(np.float32))
    ood = jax.device_put(rng.normal(1.0, 1.0, size=shape).astype(np.float32))
    w = jax.device_put(np.ones((nb, batch), np.float32))
    perm = jax.device_put(np.arange(nb, dtype=np.int32))

    from atlasvae.train.aae_loop import _subtree, AE_KEYS, DISC_KEYS
    opt_ae = optimizer.init(_subtree(params, AE_KEYS))
    opt_disc = optimizer.init(_subtree(params, DISC_KEYS))

    state = {"p": params, "ae": opt_ae, "disc": opt_disc}

    def cycle():
        p, oa, m1 = ae_epoch(state["p"], state["ae"], perm, bkg, ood, w, w)
        p, od, m2 = disc_epoch(p, state["disc"], perm, bkg, ood, w, w)
        p, oa2, (m3, disc_m) = aae_epoch(p, oa, perm, bkg, ood, w, w)
        state["p"], state["ae"], state["disc"] = p, oa2, od
        return disc_m

    _log("compiling AAE phase epochs...")
    np.asarray(cycle())
    return 3 * n / _timed(cycle, lambda m: np.asarray(m), reps=9)


def bench_jetid(jax):
    from atlasvae.models.jetid import JetIDConfig, init_jetid
    from atlasvae.train.jetid_loop import make_jetid_step_fns, _pack
    import optax

    config = JetIDConfig(n_classes=2, scalars=("scalars",), scalar_dims=(16,),
                         nn_type="FCN")
    params = init_jetid(jax.random.PRNGKey(0), config)
    optimizer = optax.adam(1.0)
    train_epoch, _ = make_jetid_step_fns(optimizer, config)

    n, batch = 1_000_000, 5_000  # ref batch = n_gpus x 5e3, 1 chip here
    rng = np.random.default_rng(0)
    inputs = {"scalars": rng.normal(size=(n, 16)).astype(np.float32)}
    labels = rng.integers(0, 2, n)
    inputs, labels, weights = _pack(inputs, labels, np.ones(n, np.float32),
                                    batch)
    inputs = jax.device_put(inputs)
    labels = jax.device_put(labels)
    weights = jax.device_put(weights)
    state = {"p": params, "o": optimizer.init(params)}
    key = jax.random.PRNGKey(1)
    lr = np.float32(1e-3)

    def epoch():
        p, o, m = train_epoch(state["p"], state["o"], lr, key, inputs, labels,
                              weights)
        state["p"], state["o"] = p, o
        return m

    _log("compiling jet-ID train epoch...")
    np.asarray(epoch())
    return n / _timed(epoch, lambda m: np.asarray(m), reps=9)


def bench_bump(jax):
    from atlasvae.stats.bumphunter import batched_local_sigma, batched_bump_sigma

    widths, steps = (2, 3, 4, 5, 6), (1, 1, 1, 1, 1)
    rng = np.random.default_rng(0)
    nbins = 160  # the padded production shape (eval/bump.py pads to x32)
    bkg = np.maximum(1e4 * np.exp(-np.arange(nbins) / 20.0), 1.0)
    data = rng.poisson(np.tile(bkg, (101, 1))).astype(np.float64)
    data[:, 60:63] *= 1.05  # mild excess

    _log("compiling bump scans...")
    np.asarray(batched_local_sigma(data, np.tile(bkg, (101, 1)), widths, steps)[0])
    np.asarray(batched_bump_sigma(data[:1], bkg[None], widths, steps, npe=1000)[1])
    local = _timed(lambda: batched_local_sigma(data, np.tile(bkg, (101, 1)),
                                               widths, steps),
                   lambda out: np.asarray(out[0]), reps=9)
    glob = _timed(lambda: batched_bump_sigma(data[:1], bkg[None], widths,
                                             steps, npe=1000),
                  lambda out: np.asarray(out[1]), reps=9)
    return local + glob


def _host_health():
    """Small host-memory probe (benchmarks/hostmem_probe.py) so recorded
    numbers carry their environmental context: this VM intermittently
    degrades to ~3-35 MB/s fresh-page faults (vs ~3 GB/s healthy), which
    inflates every wall measured through the tunnel by ~10-20%."""
    try:
        sys.path.insert(0, os.path.join(os.path.dirname(__file__),
                                        "benchmarks"))
        from hostmem_probe import probe
        # 256 MB matches the gate's calibration: smaller probes can be
        # satisfied from the process's freed-page pool and read healthy
        # while fresh faults still crawl (measured: 32 MB -> 1.2 GB/s
        # "healthy" vs 256 MB -> 10.7 MB/s degraded, same minute)
        h = probe(mb=256)
        return h["fresh_mb_s"], h["degraded"]
    except Exception:
        return None, None


def _backend_watchdog(seconds=480):
    """Backend-init deadline: the remote TPU tunnel can wedge server-side
    and hang the first device query forever (no local process to blame —
    observed during round 3).  Emit ONE diagnosable JSON line and exit
    instead of hanging the driver.  A daemon THREAD (not SIGALRM): the
    hang sits inside a blocking C call, so a Python signal handler would
    never get to run; ``os._exit`` works from any thread.  Deadline:
    uncontended init+first-compile measures ~62 s; 480 s rides out a
    degraded-host episode or a concurrent CPU job on this 1-core VM
    (a 300 s deadline once fired exactly that way) while still failing
    fast on a truly dead tunnel."""
    import threading

    done = threading.Event()

    def watch():
        if not done.wait(seconds):
            print(json.dumps({
                "metric": "oe_vae_train_jets_per_sec_per_chip",
                "value": 0.0, "unit": "jets/s", "vs_baseline": 0.0,
                "error": f"backend init exceeded {seconds}s "
                         "(TPU tunnel unresponsive)"}), flush=True)
            os._exit(1)

    threading.Thread(target=watch, daemon=True).start()
    return done.set


def main():
    cancel_watchdog = _backend_watchdog()
    import atlasvae  # noqa: F401 — applies ATLASVAE_PLATFORM/_PRNG overrides
    import jax
    import jax.numpy as jnp

    backend = jax.default_backend()
    # first dispatch confirmed by FETCHING the result: block_until_ready
    # does not sync through the axon tunnel (CLAUDE.md), so it would
    # cancel the watchdog before the dispatch actually completed
    np.asarray(jax.jit(lambda x: x + 1)(0.0))
    cancel_watchdog()
    host_fresh_mb_s, host_degraded = _host_health()
    global _DISPATCH_LATENCY_S
    _DISPATCH_LATENCY_S = _measure_dispatch_latency(jax)
    _log(f"dispatch latency: {_DISPATCH_LATENCY_S * 1e3:.1f} ms "
         "(subtracted from every timed wall)")
    train_jps, infer_jps = bench_vae(jax, jnp)
    sweep_jps, sweep_speedup = bench_sweep(jax, train_jps)
    aae_jps = bench_aae(jax)
    jetid_jps = bench_jetid(jax)
    bump_warm = bench_bump(jax)

    print(json.dumps({
        "metric": "oe_vae_train_jets_per_sec_per_chip",
        "value": round(train_jps, 1),
        "unit": "jets/s",
        "vs_baseline": round(train_jps / REFERENCE_EAGER_JETS_PER_SEC, 3),
        "vs_baseline_est": round(train_jps / REFERENCE_EAGER_JETS_PER_SEC, 3),
        "vs_reference_cpu_measured": round(
            train_jps / REFERENCE_CPU_MEASURED_JETS_PER_SEC, 1),
        "infer_encode_jets_per_sec": round(infer_jps, 1),
        "sweep_vmap8_jets_per_sec": round(sweep_jps, 1),
        "sweep_vmap8_speedup_vs_seq": round(sweep_speedup, 2),
        "aae_cycle_jets_per_sec": round(aae_jps, 1),
        "jetid_train_jets_per_sec": round(jetid_jps, 1),
        "bump_scan_warm_s": round(bump_warm, 3),
        "backend": backend,
        "dispatch_latency_ms_subtracted": round(
            _DISPATCH_LATENCY_S * 1e3, 2),
        "host_fresh_mb_s": host_fresh_mb_s,
        "host_degraded": host_degraded,
        "config": "batch=1e4 fc=80/40/20/10 in=12 OE=MAE beta=2 lamb=5 prng=rbg",
    }))


def _main_with_retry():
    """Run main() in a subprocess; retry ONCE if backend init timed out.

    The axon tunnel intermittently refuses a new client for several
    minutes after the previous one disconnects (observed twice in round
    3: a fresh `python bench.py` hung in backend init past the watchdog
    while a probe minutes earlier had connected in 62 s).  A transient
    wedge must not zero the round's recorded benchmark, so on the
    watchdog's init-timeout line we cool down and try once more.  The
    final attempt's stdout is re-emitted verbatim — still ONE JSON line.
    """
    import subprocess
    env = dict(os.environ, ATLASVAE_BENCH_CHILD="1")
    for attempt in (1, 2):
        proc = subprocess.run([sys.executable, os.path.abspath(__file__)],
                              env=env, stdout=subprocess.PIPE, text=True)
        out = proc.stdout
        if attempt == 1 and "backend init exceeded" in out:
            _log("backend init timed out; cooling down 120 s and "
                 "retrying once (tunnel client-release lag)")
            time.sleep(120)
            continue
        sys.stdout.write(out)
        sys.stdout.flush()
        sys.exit(proc.returncode)


if __name__ == "__main__":
    if os.environ.get("ATLASVAE_BENCH_CHILD"):
        main()
    else:
        _main_with_retry()
