"""Outlier-exposure pairing as a single device program.

The reference pairs each QCD jet with an OoD jet of similar (m, pt) by a
per-jet Python loop: binary-search an m-window, filter pt, and keep
doubling the window until it is non-empty, fanned out over <=16 host
processes (ref OE-VAE/utils.py:193-227 ``OoD_pairing``).

TPU-first redesign: quantize (m, pt) onto a 2^13 x 2^13 grid with the
reference's base window (10 GeV in both axes) as the cell size, and give
every jet a Morton (Z-order) code.  Sorting the OoD sample once by Morton
code makes every coarsened cell — obtained by dropping the low 2*level
bits — a *contiguous* range, so "widen the window until non-empty"
becomes: find the finest level whose range is non-empty via a stack of
``searchsorted`` calls, then draw a uniform index inside that range.
Dropping one bit alternately doubles the pt- then the m-window, matching
the reference's alternating widening.  Everything is fixed-shape,
vmapped over jets, and jit-compiled; no host loop, no processes.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

_BITS = 13            # bins per axis = 8192; covers m<=81 TeV at 10 GeV cells
_BASE_M_WIDTH = 10.0  # ref OE-VAE/utils.py:203 (m_width=10)
_BASE_PT_WIDTH = 10.0  # ref OE-VAE/utils.py:203 (pt_width=10)


def _part1by1(x):
    """Spread the low 16 bits of x so there is a 0 bit between each."""
    x = x & 0x0000FFFF
    x = (x | (x << 8)) & 0x00FF00FF
    x = (x | (x << 4)) & 0x0F0F0F0F
    x = (x | (x << 2)) & 0x33333333
    x = (x | (x << 1)) & 0x55555555
    return x


def _morton(im, ipt):
    """Interleave pt-bits into the even (first-dropped) positions and
    m-bits into the odd positions: coarsening one level doubles the
    pt-window first, then the m-window, matching the reference's
    alternating widening order (ref OE-VAE/utils.py:204-211 doubles
    pt_width before m_width)."""
    return _part1by1(ipt) | (_part1by1(im) << 1)


def _codes(m, pt, m0, pt0):
    im = jnp.clip(((m - m0) / _BASE_M_WIDTH).astype(jnp.int32), 0, (1 << _BITS) - 1)
    ipt = jnp.clip(((pt - pt0) / _BASE_PT_WIDTH).astype(jnp.int32), 0, (1 << _BITS) - 1)
    return _morton(im, ipt)


@functools.partial(jax.jit, static_argnames=("n_levels",))
def _pair_indices(key, m_bkg, pt_bkg, sorted_codes, m0, pt0, n_levels=2 * _BITS):
    codes = _codes(m_bkg, pt_bkg, m0, pt0)
    # Range [lo, hi) of OoD jets sharing the bkg jet's cell at each level,
    # all levels resolved in TWO batched searchsorted calls (an unrolled
    # per-level loop emitted 54 separate sorted scans and dominated the
    # program's one-time compile through the remote-compile tunnel)
    levels = jnp.arange(n_levels + 1, dtype=jnp.int32)[:, None]   # (L+1, 1)
    prefix = codes[None, :] >> levels                             # (L+1, B)
    lo = jnp.searchsorted(sorted_codes, (prefix << levels).ravel(),
                          side="left").reshape(prefix.shape)
    hi = jnp.searchsorted(sorted_codes, ((prefix + 1) << levels).ravel(),
                          side="left").reshape(prefix.shape)
    nonempty = hi > lo
    # Finest non-empty level (argmax returns the first True).
    level = jnp.argmax(nonempty, axis=0)
    take = lambda arr: jnp.take_along_axis(arr, level[None, :], axis=0)[0]
    lo, hi = take(lo), take(hi)
    count = jnp.maximum(hi - lo, 1)
    draw = jax.random.randint(key, m_bkg.shape, 0, 1 << 30) % count
    return lo + draw


def ood_pairing(bkg_sample, ood_sample, seed=0, verbose=True):
    """Pair every background jet with a kinematically-matched OoD jet.

    Returns the OoD sample re-indexed to align 1:1 with ``bkg_sample``
    (same contract as ref OE-VAE/utils.py:193-227).
    """
    import time
    start = time.time()
    if verbose:
        print("Pairing OoD with QCD", end=" ", flush=True)
    m_ood = np.asarray(ood_sample["m"], dtype=np.float32)
    pt_ood = np.asarray(ood_sample["pt"], dtype=np.float32)
    m_bkg = np.asarray(bkg_sample["m"], dtype=np.float32)
    pt_bkg = np.asarray(bkg_sample["pt"], dtype=np.float32)
    m0 = np.float32(min(m_ood.min(), m_bkg.min()))
    pt0 = np.float32(min(pt_ood.min(), pt_bkg.min()))
    codes = np.asarray(_codes(jnp.asarray(m_ood), jnp.asarray(pt_ood), m0, pt0))
    order = np.argsort(codes, kind="stable")
    sorted_codes = jnp.asarray(codes[order])
    key = jax.random.PRNGKey(seed)
    picked = []
    chunk = 2_000_000
    for i in range(0, len(m_bkg), chunk):
        key, sub = jax.random.split(key)
        idx = _pair_indices(sub, jnp.asarray(m_bkg[i:i + chunk]),
                            jnp.asarray(pt_bkg[i:i + chunk]), sorted_codes, m0, pt0)
        picked.append(np.asarray(idx))
    indices = order[np.concatenate(picked)]
    if verbose:
        print(f"( {time.time() - start:2.1f} s)")
    return {key_: np.take(val, indices, axis=0) for key_, val in ood_sample.items()}


def ood_sampling(bkg_sample, ood_sample, adjust_weights=False, seed=None):
    """Random resample of the OoD sample to the background's size
    (ref OE-VAE/utils.py:184-190)."""
    rng = np.random.default_rng(seed)
    source = len(next(iter(ood_sample.values())))
    target = len(next(iter(bkg_sample.values())))
    indices = rng.choice(source, target, replace=source < target)
    out = {key: np.take(val, indices, axis=0) for key, val in ood_sample.items()}
    if adjust_weights:
        out["weights"] = out["weights"] * np.float32(source / target)
    return out
