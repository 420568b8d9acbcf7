"""Jet-constituent array kernels as jitted device programs.

The reference implements these with host numpy spread over
``multiprocessing.Process`` fan-outs (ref OE-VAE/utils.py:293-308,
551-594).  Here each kernel is a single fixed-shape XLA program: the
(jets, constituents, 4) tensors map straight onto VPU lanes and the
per-jet sorts/reductions vectorize over the batch with no host loop.
Host-facing wrappers accept numpy, process in device-sized chunks, and
return numpy so the loaders stay memory-budgeted (ref OE-VAE/utils.py:48).
"""

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

# Chunk length for host->device streaming of multi-10M-jet arrays.
_CHUNK = 1_000_000


def _chunked(fn, jets, *args, chunk=_CHUNK):
    jets = np.asarray(jets)
    if len(jets) <= chunk:
        return np.asarray(fn(jets, *args))
    parts = [np.asarray(fn(jets[i:i + chunk], *args)) for i in range(0, len(jets), chunk)]
    return np.concatenate(parts, axis=0)


@jax.jit
def _sort_by_pt(jets):
    """Sort each jet's (E,px,py,pz) constituent blocks by descending pt.

    Device rewrite of ``jets_sorting`` (ref OE-VAE/utils.py:564-571):
    one batched argsort instead of a 16-process host fan-out.
    """
    n = jets.shape[1] // 4
    jets = jets.reshape(-1, n, 4).astype(jnp.float32)
    pt = jnp.sqrt(jets[:, :, 1] ** 2 + jets[:, :, 2] ** 2)
    order = jnp.argsort(-pt, axis=-1, stable=True)
    jets = jnp.take_along_axis(jets, order[:, :, None], axis=1)
    return jets.reshape(jets.shape[0], -1)


def sort_constituents_by_pt(jets):
    return _chunked(_sort_by_pt, jets)


def pad_constituents(jets, n_const):
    """Truncate/zero-pad the flat (E,px,py,pz) layout to 4*n_const columns
    (ref OE-VAE/utils.py:91-97)."""
    jets = np.asarray(jets, dtype=np.float32)
    want = 4 * n_const
    if jets.shape[1] >= want:
        return jets[:, :want]
    pad = np.zeros((jets.shape[0], want - jets.shape[1]), dtype=np.float32)
    return np.hstack([jets, pad])


@jax.jit
def _jets_4v(jets):
    """Summed-constituent jet kinematics: (pt_calo, m_calo).

    Device rewrite of ``get_4v`` (ref OE-VAE/utils.py:300-308).
    """
    n = jets.shape[1] // 4
    four = jnp.sum(jets.reshape(-1, n, 4).astype(jnp.float32), axis=1)
    e, px, py, pz = four[:, 0], four[:, 1], four[:, 2], four[:, 3]
    pt = jnp.sqrt(px ** 2 + py ** 2)
    m = jnp.sqrt(jnp.maximum(0.0, e ** 2 - px ** 2 - py ** 2 - pz ** 2))
    return pt, m


def jets_4v(jets):
    jets = np.asarray(jets)
    if len(jets) == 0:  # empty slice: match the other _chunked wrappers
        return {"pt_calo": np.zeros(0, np.float32),
                "m_calo": np.zeros(0, np.float32)}
    pt, m = zip(*[
        _jets_4v(jets[i:i + _CHUNK]) for i in range(0, len(jets), _CHUNK)
    ])
    return {
        "pt_calo": np.concatenate([np.asarray(p) for p in pt]),
        "m_calo": np.concatenate([np.asarray(v) for v in m]),
    }


@functools.partial(jax.jit, static_argnums=(1,))
def _jets_3v(jets, n_dims):
    """Per-constituent (pt, rapidity, phi) triplets.

    Device rewrite of ``jets_3v`` (ref OE-VAE/utils.py:330-343); the
    NaN-to-zero rapidity guard is preserved via ``jnp.where``.
    """
    jets = jets.astype(jnp.float32).reshape(jets.shape[0], -1, n_dims)
    if n_dims == 3:
        px, py, pz = jets[..., 0], jets[..., 1], jets[..., 2]
        e = jnp.sqrt(px ** 2 + py ** 2 + pz ** 2)
    else:
        e, px, py, pz = jets[..., 0], jets[..., 1], jets[..., 2], jets[..., 3]
    pt = jnp.sqrt(px ** 2 + py ** 2)
    ratio = (e + pz) / (e - pz)
    y = jnp.where((ratio > 0) & jnp.isfinite(ratio), jnp.log(jnp.where(ratio > 0, ratio, 1.0)) / 2, 0.0)
    phi = jnp.arctan2(py, px)
    return jnp.stack([pt, y, phi], axis=-1)


def jets_3v(jets, n_dims):
    return _chunked(lambda x: _jets_3v(x, n_dims), jets)


def drop_energy_component(jets):
    """(E,px,py,pz) -> (px,py,pz) flat layout for n_dims=3 training
    (ref OE-VAE/utils.py:115-119)."""
    jets = np.asarray(jets, dtype=np.float32)
    n = jets.shape[1] // 4
    return jets.reshape(-1, n, 4)[..., 1:].reshape(jets.shape[0], -1)


@jax.jit
def _count_constituents(jets):
    """Number of non-zero constituents per jet (ref OE-VAE/utils.py:582-594).

    A constituent is counted when any of its 4 components is non-zero;
    padding is all-zero by construction, so the count is the number of
    blocks with non-zero L1 norm.
    """
    n = jets.shape[1] // 4
    mags = jnp.sum(jnp.abs(jets.reshape(-1, n, 4).astype(jnp.float32)), axis=2)
    return jnp.sum(mags > 0, axis=1).astype(jnp.int32)


def count_constituents(jets):
    return _chunked(_count_constituents, jets)


def _image_bins(jets, n_pixels, extent, n_dims):
    """Shared binning math for the calorimeter-style images: per
    constituent -> (flat pixel index, pt weight masked by liveness)."""
    n = jets.shape[1] // n_dims
    p = jets.reshape(-1, n, n_dims).astype(jnp.float32)
    if n_dims == 4:
        px, py, pz = p[..., 1], p[..., 2], p[..., 3]
    else:  # (px, py, pz) layout
        px, py, pz = p[..., 0], p[..., 1], p[..., 2]
    pt = jnp.sqrt(px ** 2 + py ** 2)
    p_tot = jnp.sqrt(px ** 2 + py ** 2 + pz ** 2)
    ratio = jnp.clip(pz / jnp.maximum(p_tot, 1e-30), -1 + 1e-6, 1 - 1e-6)
    eta = jnp.arctanh(ratio)
    phi = jnp.arctan2(py, px)
    alive = (jnp.abs(p).sum(axis=-1) > 0).astype(jnp.float32)
    # pt-weighted jet axis; constituents are binned relative to it, so
    # off-origin production jets are centered like the reference's ETL
    w_sum = jnp.maximum(jnp.sum(pt * alive, axis=1, keepdims=True), 1e-30)
    eta_axis = jnp.sum(eta * pt * alive, axis=1, keepdims=True) / w_sum
    # circular mean for phi (avoids the -pi/pi seam)
    sin_axis = jnp.sum(jnp.sin(phi) * pt * alive, axis=1, keepdims=True)
    cos_axis = jnp.sum(jnp.cos(phi) * pt * alive, axis=1, keepdims=True)
    phi_axis = jnp.arctan2(sin_axis, cos_axis)
    deta = eta - eta_axis
    dphi = jnp.mod(phi - phi_axis + jnp.pi, 2 * jnp.pi) - jnp.pi
    ix = jnp.clip(((deta + extent) / (2 * extent) * n_pixels).astype(jnp.int32),
                  0, n_pixels - 1)
    iy = jnp.clip(((dphi + extent) / (2 * extent) * n_pixels).astype(jnp.int32),
                  0, n_pixels - 1)
    return ix * n_pixels + iy, pt * alive


@functools.partial(jax.jit, static_argnums=(1, 2, 3))
def _const_images(jets, n_pixels, extent, n_dims):
    """pt-weighted (delta-eta, delta-phi) calorimeter-style images from
    constituents, binned around the pt-weighted jet axis — the
    device-side equivalent of the reference's detector images fed to the
    jet-ID CNN towers (ref jet-ID/classifier.py:74-77 image shapes; the
    reference's ETL centers jets before imaging,
    ref tools/root_utils.py:122-154).  Scatter-add formulation — fastest
    on the CPU host-prep path."""
    flat_idx, wts = _image_bins(jets, n_pixels, extent, n_dims)

    def one(idx, weight):
        return jnp.zeros(n_pixels * n_pixels).at[idx].add(weight)

    images = jax.vmap(one)(flat_idx, wts)
    return images.reshape(-1, n_pixels, n_pixels)


@functools.partial(jax.jit, static_argnums=(1, 2, 3, 4))
def _const_images_mxu(jets, n_pixels, extent, n_dims, block=4096):
    """Same images via a one-hot batched matvec instead of scatter-add:
    TPU scatters serialize, while ``(idx == cell)`` one-hot contraction
    rides the MXU (measured 3.3x on v5e at 16x16 images, 60
    constituents).  Binning math is byte-identical to ``_const_images``;
    only summation order (and hence f32 rounding at bin edges) differs."""
    flat_idx, wts = _image_bins(jets, n_pixels, extent, n_dims)
    n_jets = flat_idx.shape[0]
    pad = (-n_jets) % block
    flat_idx = jnp.pad(flat_idx, ((0, pad), (0, 0)))
    wts = jnp.pad(wts, ((0, pad), (0, 0)))
    cells = jnp.arange(n_pixels * n_pixels, dtype=jnp.int32)

    def blk(args):
        idx, w = args
        one_hot = (idx[:, :, None] == cells[None, None, :]).astype(jnp.float32)
        return jnp.einsum("nc,ncp->np", w, one_hot)

    nb = flat_idx.shape[0] // block
    out = jax.lax.map(blk, (flat_idx.reshape(nb, block, -1),
                            wts.reshape(nb, block, -1)))
    return out.reshape(-1, n_pixels, n_pixels)[:n_jets]


def constituent_images(jets, n_pixels=16, extent=1.0, n_dims=4):
    """(jets, n_dims*n_const) flat constituents -> (jets, n_pixels,
    n_pixels) pt-weighted (delta-eta, delta-phi) images centered on the
    jet axis, chunked over the sample.  ``n_dims`` selects the layout:
    4 = (E,px,py,pz) blocks, 3 = (px,py,pz).

    ``ATLASVAE_IMAGES=mxu`` switches accelerator backends to the
    one-hot-contraction kernel: 3.3x warm throughput on v5e, but a much
    costlier XLA compile (260 s vs 41 s through this environment's
    remote tunnel — docs/PERF.md), so the scatter path stays the
    default: image prep is ~20x faster than its CNN-training consumer
    either way, making cold-start the binding cost."""
    jets = np.asarray(jets)
    if jets.shape[1] % n_dims != 0:
        raise ValueError(f"constituent width {jets.shape[1]} is not a "
                         f"multiple of n_dims={n_dims}")
    use_mxu = (os.environ.get("ATLASVAE_IMAGES") == "mxu"
               and jax.default_backend() != "cpu")
    if use_mxu:
        return _chunked(
            lambda x: _const_images_mxu(x, n_pixels, extent, n_dims), jets)
    return _chunked(lambda x: _const_images(x, n_pixels, extent, n_dims),
                    jets)


@jax.jit
def _cumulative_pt(jets):
    """pt of the cumulative constituent sum (ref OE-VAE/utils.py:551-561)."""
    n = jets.shape[1] // 4
    csum = jnp.cumsum(jets.reshape(-1, n, 4).astype(jnp.float32), axis=1)
    return jnp.sqrt(csum[:, :, 1] ** 2 + csum[:, :, 2] ** 2)


def constituent_pt_cumulative(jets):
    return _chunked(_cumulative_pt, jets)
