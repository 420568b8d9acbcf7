"""Discriminant-level fidelity of the Sinkhorn EMD vs exact optimal
transport.

The reference computes exact per-jet EMD with energyflow's OT solver
(ref OE-VAE/utils.py:327-343) and uses it as an anomaly DISCRIMINANT —
what matters downstream is the score ranking (ROC/AUC), not the
absolute values.  Our ``ops/emd.py`` is entropic-regularized (staged
eps-scaling Sinkhorn).  This experiment measures, at the production
settings (n_iters=100, eps_final=0.01, R=1), on jet-like paired clouds
(original vs reconstruction-style distortion, bkg lightly / sig heavily
distorted):

* per-jet relative error vs the exact LP optimum,
* ROC AUC delta of the sig-vs-bkg discriminant,
* Spearman rank correlation of the scores,
* whether the best cut chosen by the cut-scan objective moves.

Usage: python benchmarks/emd_fidelity.py [n_jets_per_class] [n_const ...]
Prints one JSON line per constituent count.  Gated (smaller) version:
tests/test_emd.py::test_emd_discriminant_fidelity_vs_exact_ot.
"""

import json
import os
import sys

os.environ.setdefault("ATLASVAE_PLATFORM", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def exact_emd_lp(p, q, r=1.0):
    """Exact EMD by linear programming (the tests/test_emd.py oracle,
    scaled: drop one redundant marginal constraint, HiGHS solver)."""
    from scipy.optimize import linprog
    keep_p, keep_q = p[:, 0] > 0, q[:, 0] > 0
    p, q = p[keep_p], q[keep_q]
    pt_p, pt_q = p[:, 0].astype(np.float64), q[:, 0].astype(np.float64)
    dy = p[:, None, 1] - q[None, :, 1]
    dphi = np.mod(p[:, None, 2] - q[None, :, 2] + np.pi, 2 * np.pi) - np.pi
    cost = np.sqrt(dy ** 2 + dphi ** 2) / r
    n, m = len(pt_p), len(pt_q)
    a = pt_p / pt_p.sum()
    b = pt_q / pt_q.sum()
    rows, cols, vals = [], [], []
    for i in range(n):
        rows += [i] * m
        cols += list(range(i * m, (i + 1) * m))
        vals += [1.0] * m
    for j in range(m - 1):  # final column constraint is redundant
        rows += [n + j] * n
        cols += list(range(j, n * m, m))
        vals += [1.0] * n
    from scipy.sparse import csr_matrix
    A = csr_matrix((vals, (rows, cols)), shape=(n + m - 1, n * m))
    b_vec = np.concatenate([a, b[:-1]])
    res = linprog(cost.ravel(), A_eq=A, b_eq=b_vec, bounds=(0, None),
                  method="highs")
    assert res.status == 0, res.message
    return res.fun * min(pt_p.sum(), pt_q.sum()) + abs(pt_p.sum() - pt_q.sum())


def make_pairs(rng, n, n_const, pos_sigma, pt_jitter):
    """(original, distorted) constituent-cloud pairs: falling-pt jets
    with Gaussian (y, phi) cores; the distortion models a
    reconstruction of the original jet."""
    pt = rng.exponential(1.0, (n, n_const)).astype(np.float32)
    pt = np.sort(pt, axis=1)[:, ::-1]
    pos = rng.normal(0, 0.4, (n, n_const, 2)).astype(np.float32)
    orig = np.concatenate([pt[..., None], pos], axis=2)
    dist = orig.copy()
    dist[..., 1:] += rng.normal(0, pos_sigma, (n, n_const, 2))
    dist[..., 0] *= np.maximum(
        1.0 + rng.normal(0, pt_jitter, (n, n_const)), 0.05)
    return np.ascontiguousarray(orig), np.ascontiguousarray(dist)


def auc(scores, labels):
    """ROC AUC by rank statistic (Mann-Whitney)."""
    order = np.argsort(scores, kind="mergesort")
    ranks = np.empty(len(scores))
    ranks[order] = np.arange(1, len(scores) + 1)
    # midranks for ties
    s_sorted = scores[order]
    i = 0
    while i < len(s_sorted):
        j = i
        while j + 1 < len(s_sorted) and s_sorted[j + 1] == s_sorted[i]:
            j += 1
        if j > i:
            ranks[order[i:j + 1]] = 0.5 * (i + j) + 1
        i = j + 1
    n_sig = int(labels.sum())
    n_bkg = len(labels) - n_sig
    return (ranks[labels == 1].sum() - n_sig * (n_sig + 1) / 2) / (n_sig * n_bkg)


def best_cut_index(scores, labels, n_cuts=20):
    """The cut-scan objective the eval driver optimizes: significance
    proxy s/sqrt(b) over a quantile cut grid; returns the argmax index
    (a moved index = the bump-scan would choose a different working
    point)."""
    qs = np.quantile(scores, np.linspace(0.0, 0.95, n_cuts))
    sig = scores[labels == 1]
    bkg = scores[labels == 0]
    s = np.array([(sig >= c).sum() for c in qs], float)
    b = np.array([(bkg >= c).sum() for c in qs], float)
    z = s / np.sqrt(np.maximum(b, 1.0))
    return int(np.argmax(z)), qs


def run(n_per_class, n_const, rng, n_iters=100, eps_final=0.01):
    from atlasvae.ops.emd import emd_pairs
    bkg_o, bkg_d = make_pairs(rng, n_per_class, n_const,
                              pos_sigma=0.05, pt_jitter=0.05)
    sig_o, sig_d = make_pairs(rng, n_per_class, n_const,
                              pos_sigma=0.20, pt_jitter=0.25)
    orig = np.concatenate([bkg_o, sig_o])
    dist = np.concatenate([bkg_d, sig_d])
    labels = np.concatenate([np.zeros(n_per_class), np.ones(n_per_class)])

    sink = emd_pairs(orig, dist, n_iters=n_iters, eps_final=eps_final)
    exact = np.array([exact_emd_lp(orig[i], dist[i])
                      for i in range(len(orig))])

    from scipy.stats import spearmanr
    rel = np.abs(sink - exact) / np.maximum(exact, 1e-12)
    auc_s, auc_e = auc(sink, labels), auc(exact, labels)
    rho = float(spearmanr(sink, exact).statistic)
    cut_s, _ = best_cut_index(sink, labels)
    cut_e, _ = best_cut_index(exact, labels)
    return {
        "n_jets": 2 * n_per_class, "n_const": n_const,
        "n_iters": n_iters, "eps_final": eps_final,
        "mean_rel_err": float(rel.mean()), "max_rel_err": float(rel.max()),
        "auc_sinkhorn": float(auc_s), "auc_exact": float(auc_e),
        "auc_delta": float(abs(auc_s - auc_e)),
        "spearman": rho,
        "best_cut_sinkhorn": cut_s, "best_cut_exact": cut_e,
        "best_cut_moved": bool(cut_s != cut_e),
    }


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
    consts = [int(c) for c in sys.argv[2:]] or [16, 32]
    rng = np.random.default_rng(42)
    for nc in consts:
        print(json.dumps(run(n, nc, rng)))
