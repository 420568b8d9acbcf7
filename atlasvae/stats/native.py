"""ctypes bridge to the native BumpHunter oracle (_native/bumphunter_oracle.cpp).

Builds the shared library on demand with g++ (no pybind11 in this
environment) and exposes ``oracle_scan``: an independent long-double
implementation of the reference scan loop used for golden testing of
the vectorized JAX scan and as a host-side fallback.
"""

import ctypes
import subprocess

import numpy as np

from atlasvae import _native

_LIB = None


def _build():
    return _native.build("bumphunter_oracle")


def load_oracle():
    """Load (building if needed) the native library; returns None when no
    C++ toolchain is available."""
    global _LIB
    if _LIB is not None:
        return _LIB
    try:
        lib = ctypes.CDLL(_build())
    except (OSError, subprocess.CalledProcessError, FileNotFoundError):
        return None
    lib.bh_scan_many.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
        ctypes.c_int, ctypes.c_int, ctypes.POINTER(ctypes.c_int),
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int),
    ]
    lib.bh_log_gammainc.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
        ctypes.c_int, ctypes.c_int, ctypes.POINTER(ctypes.c_double),
    ]
    _LIB = lib
    return lib


def oracle_log_gammainc(a, x, lower=True):
    """Long-double log P(a,x) (lower=True) or log Q(a,x) — the oracle's
    own tail functions, exported for sweeping the float32 JAX versions
    (atlasvae/ops/gammainc.py) over adversarial (a, x) grids."""
    lib = load_oracle()
    if lib is None:
        raise RuntimeError("native oracle unavailable (g++ not found)")
    a = np.ascontiguousarray(np.atleast_1d(a), np.float64)
    x = np.ascontiguousarray(np.atleast_1d(x), np.float64)
    a, x = np.broadcast_arrays(a, x)
    a = np.ascontiguousarray(a)
    x = np.ascontiguousarray(x)  # the C loop reads a.size elements of BOTH
    out = np.empty(a.shape, np.float64)
    lib.bh_log_gammainc(
        a.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        a.size, 1 if lower else 0,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
    return out


def oracle_scan(hists, ref, widths, scan_step=1, mode="excess"):
    """Scan K histograms with the native oracle.

    Returns (min_logp, min_loc, min_width) float64/int arrays of
    shape (K,).  Raises RuntimeError when the toolchain is missing.
    """
    lib = load_oracle()
    if lib is None:
        raise RuntimeError("native oracle unavailable (g++ not found)")
    hists = np.ascontiguousarray(np.atleast_2d(hists), np.float64)
    ref = np.ascontiguousarray(ref, np.float64)
    widths = np.ascontiguousarray(widths, np.int32)
    k, nbins = hists.shape
    min_logp = np.empty(k, np.float64)
    min_loc = np.empty(k, np.int32)
    min_width = np.empty(k, np.int32)
    lib.bh_scan_many(
        hists.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        ref.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        k, nbins,
        widths.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        len(widths), int(scan_step), 0 if mode == "excess" else 1,
        min_logp.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        min_loc.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        min_width.ctypes.data_as(ctypes.POINTER(ctypes.c_int)))
    return min_logp, min_loc, min_width
