"""EMD/KSD device-metric tests: KS vs scipy exact; EMD vs brute-force OT
on tiny problems and metric properties."""

import os

import numpy as np

from atlasvae.ops.emd import emd_pairs, ks_pairs


def test_ks_matches_scipy(rng):
    from scipy.stats import ks_2samp
    p = rng.normal(0, 1, (50, 40)).astype(np.float32)
    q = rng.normal(0.3, 1.2, (50, 40)).astype(np.float32)
    ours = ks_pairs(p, q)
    ref = np.array([ks_2samp(p[i], q[i]).statistic for i in range(50)])
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_ks_tie_heavy_matches_scipy(rng):
    # the co-sort+cumsum formulation evaluates the ECDF gap only at the
    # LAST element of an equal-value run; heavy cross-sample ties are
    # exactly where that mask must match scipy's right-continuous ECDFs
    from scipy.stats import ks_2samp
    p = np.round(rng.normal(0, 1, (60, 37)), 1).astype(np.float32)
    q = np.round(rng.normal(0.2, 1.1, (60, 41)), 1).astype(np.float32)
    ours = ks_pairs(p[:, :37], q[:, :37])
    ref = np.array([ks_2samp(p[i, :37], q[i, :37]).statistic
                    for i in range(60)])
    np.testing.assert_allclose(ours, ref, atol=1e-6)
    # self-KS on tie-heavy rows: cumsum rounding of k*(1/n) leaves a
    # ~1e-8 float residue inside long equal runs (distinct-value rows
    # cancel exactly pairwise and give a hard 0, test above)
    assert ks_pairs(p, p).max() < 1e-6


def _brute_force_emd(p, q, r=1.0):
    """Exact tiny-problem EMD by linear programming."""
    from scipy.optimize import linprog
    pt_p, pt_q = p[:, 0], q[:, 0]
    dy = p[:, None, 1] - q[None, :, 1]
    dphi = np.mod(p[:, None, 2] - q[None, :, 2] + np.pi, 2 * np.pi) - np.pi
    cost = np.sqrt(dy ** 2 + dphi ** 2) / r
    n, m = len(pt_p), len(pt_q)
    # balanced transport of min(sum_p, sum_q) mass
    a = pt_p / pt_p.sum()
    b = pt_q / pt_q.sum()
    A_eq = []
    for i in range(n):
        row = np.zeros((n, m))
        row[i, :] = 1
        A_eq.append(row.ravel())
    for j in range(m):
        row = np.zeros((n, m))
        row[:, j] = 1
        A_eq.append(row.ravel())
    # drop the (redundant) final column constraint to keep the LP feasible
    A = np.array(A_eq)[:-1]
    b_vec = np.concatenate([a, b])[:-1]
    res = linprog(cost.ravel(), A_eq=A, b_eq=b_vec, bounds=(0, None),
                  method="highs")
    assert res.status == 0, res.message
    return res.fun * min(pt_p.sum(), pt_q.sum()) + abs(pt_p.sum() - pt_q.sum())


def test_emd_close_to_exact_ot(rng):
    jets_p = rng.uniform(0.2, 2.0, (6, 5, 3)).astype(np.float32)
    jets_q = rng.uniform(0.2, 2.0, (6, 5, 3)).astype(np.float32)
    jets_p[..., 1:] = rng.normal(0, 0.5, (6, 5, 2))
    jets_q[..., 1:] = rng.normal(0, 0.5, (6, 5, 2))
    ours = emd_pairs(jets_p, jets_q, n_iters=300, eps_final=0.002)
    exact = np.array([_brute_force_emd(jets_p[i], jets_q[i]) for i in range(6)])
    np.testing.assert_allclose(ours, exact, rtol=0.08, atol=0.02)


def test_emd_discriminant_fidelity_vs_exact_ot(rng):
    """EMD is used as an anomaly DISCRIMINANT (ref OE-VAE/utils.py:
    327-343 computes exact OT via energyflow): what matters downstream
    is the score ranking, not absolute values.  Gate the Sinkhorn
    scores against the exact LP optimum at the PRODUCTION settings
    (n_iters=100, eps_final=0.01) on reconstruction-style jet pairs:
    |dAUC| < 1e-3, Spearman rank corr > 0.999, and the cut-scan's
    chosen working point must not move.  Full-size numbers (1000
    jets/class at 16 and 32 const): dAUC 1.2e-4 / 3.6e-5, Spearman
    0.9997 / 0.9996, cut unchanged — recorded in BASELINE.md
    (benchmarks/emd_fidelity.py, 2026-08-20).  The Altschuler rounding
    epilogue in ops/emd.py is what holds the rank correlation here
    (0.9966 without it at this budget)."""
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "benchmarks"))
    try:
        from emd_fidelity import run
    finally:
        sys.path.pop(0)
    for n_per_class, n_const in ((250, 16), (150, 32)):
        res = run(n_per_class, n_const, rng)
        assert res["auc_delta"] < 1e-3, res
        assert res["spearman"] > 0.999, res
        assert not res["best_cut_moved"], res


def test_emd_identity_and_symmetry(rng):
    jets = rng.uniform(0.2, 2.0, (4, 6, 3)).astype(np.float32)
    jets[..., 1:] = rng.normal(0, 0.5, (4, 6, 2))
    self_d = emd_pairs(jets, jets)
    assert np.all(self_d < 0.05)  # ~0 at finite epsilon
    other = jets.copy()
    other[..., 1] += 1.0
    d_ab = emd_pairs(jets, other)
    d_ba = emd_pairs(other, jets)
    np.testing.assert_allclose(d_ab, d_ba, rtol=1e-2, atol=1e-3)  # Sinkhorn asymmetric updates
    assert np.all(d_ab > self_d)


def test_emd_mass_penalty(rng):
    jets = rng.uniform(0.5, 1.0, (2, 4, 3)).astype(np.float32)
    jets[..., 1:] = 0.0
    scaled = jets.copy()
    scaled[..., 0] *= 2.0  # same positions, double pt
    d = emd_pairs(jets, scaled)
    total = jets[..., 0].sum(axis=1)
    np.testing.assert_allclose(d, total, rtol=0.05)  # pure extra-mass term


def test_emd_pallas_matches_xla_kernel(rng):
    """The VMEM-resident Pallas Sinkhorn (ops/emd_pallas.py — measured
    at parity with the XLA kernel on v5e, kept as the opt-in
    ``ATLASVAE_EMD=pallas``) must match the XLA staged kernel to f32
    tolerance, including zero-pt padding slots and non-128 batch/const
    counts (runs the Pallas interpreter on CPU)."""
    import jax.numpy as jnp
    from atlasvae.ops.emd import _emd_batch_xla
    from atlasvae.ops.emd_pallas import emd_batch_pallas

    for n_jets, n_const in ((6, 8), (3, 20)):
        jp = np.zeros((n_jets, n_const, 3), np.float32)
        jq = np.zeros((n_jets, n_const, 3), np.float32)
        for arr in (jp, jq):
            arr[..., 0] = rng.uniform(0.1, 2.0, (n_jets, n_const))
            arr[..., 1:] = rng.normal(0, 0.5, (n_jets, n_const, 2))
        jp[:, int(n_const * 0.6):] = 0.0      # zero-padded tails
        jq[:, int(n_const * 0.55):] = 0.0
        ref = _emd_batch_xla(jnp.asarray(jp), jnp.asarray(jq), 1.0, 30, 0.01)
        got = emd_batch_pallas(jnp.asarray(jp), jnp.asarray(jq), 1.0, 30,
                               0.01)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-5, atol=1e-6)


def test_emd_ks_mesh_sharded_match_single_device(rng):
    """mesh= shards the jet axis over the data mesh with zero
    collectives (VERDICT r3 #8: the slowest eval kernel, 8.6k jets/s at
    100 const single-chip, scales with chips); results must equal the
    single-device kernels, including non-divisible jet counts (padding
    rows are computed and discarded)."""
    import jax
    from atlasvae.parallel.mesh import make_mesh
    from atlasvae.ops.emd import emd_pairs, ks_pairs
    mesh = make_mesh((("data", 4),), jax.devices()[:4])
    for n in (16, 13):  # divisible and padded
        jets_a = np.abs(rng.normal(1, 0.5, (n, 8, 3))).astype(np.float32)
        jets_b = np.abs(rng.normal(1, 0.5, (n, 8, 3))).astype(np.float32)
        e1 = emd_pairs(jets_a, jets_b, n_iters=20)
        eN = emd_pairs(jets_a, jets_b, n_iters=20, mesh=mesh)
        assert eN.shape == (n,)
        np.testing.assert_allclose(e1, eN, rtol=1e-5, atol=1e-7)
        k1 = ks_pairs(jets_a[:, :, 0], jets_b[:, :, 0])
        kN = ks_pairs(jets_a[:, :, 0], jets_b[:, :, 0], mesh=mesh)
        np.testing.assert_array_equal(k1, kN)


def test_emd_pallas_opt_in_under_mesh(rng, monkeypatch):
    """The ``ATLASVAE_EMD=pallas`` opt-in must work under mesh=
    sharding too: a ``pallas_call`` inside ``jax.shard_map`` requires
    ``check_vma=False`` (regression — the runtime drive caught the
    ValueError the XLA-path tests could not)."""
    import jax
    from atlasvae.parallel.mesh import make_mesh
    from atlasvae.ops.emd import emd_pairs
    mesh = make_mesh((("data", 4),), jax.devices()[:4])
    jets_a = np.abs(rng.normal(1, 0.5, (13, 8, 3))).astype(np.float32)
    jets_b = np.abs(rng.normal(1, 0.5, (13, 8, 3))).astype(np.float32)
    ref = emd_pairs(jets_a, jets_b, n_iters=20)
    monkeypatch.setenv("ATLASVAE_EMD", "pallas")
    got = emd_pairs(jets_a, jets_b, n_iters=20, mesh=mesh)
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=1e-6)
