"""ctypes bridge to the native STL basket decoder (native/rootio_decode.cpp).

The pure-Python decoder in :mod:`atlasvae.etl.rootio` parses one header
per entry/inner-vector with ``struct.unpack_from`` — ~12 µs per entry,
which makes basket decode the bottleneck of the ROOT→HDF5 conversion at
the reference's 10M-event design scale (the reference pays the same cost
inside uproot's compiled basket interpreters, ref
tools/root_utils.py:16-28).  This module builds a small C++ decoder on
demand with g++ (no pybind11 in this environment) and exposes
``decode_stl_basket``; rootio falls back to the Python loop when no
toolchain is available or ``ATLASVAE_NO_NATIVE=1`` is set.
"""

import ctypes
import os
import subprocess
import tempfile
import threading

import numpy as np

_LIB = None
_FAILED = False
_BUILD_LOCK = threading.Lock()  # read_root_files decodes from a thread pool

_ERRORS = {
    -1: "entry header reaches past the basket payload",
    -2: "negative element count",
    -3: "element data reaches past the basket payload",
    -4: "decoded size exceeds the payload bound "
        "(overlapping entry offsets?)",
}

_I64P = ctypes.POINTER(ctypes.c_longlong)
_U8P = ctypes.POINTER(ctypes.c_ubyte)


def _repo_root():
    return os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))))


def _build():
    src = os.path.join(_repo_root(), "native", "rootio_decode.cpp")
    out = os.path.join(_repo_root(), "native", "librootio_decode.so")
    if (not os.path.isfile(out)
            or os.path.getmtime(out) < os.path.getmtime(src)):
        # compile to a temp path + atomic rename so a concurrent loader
        # (or another process) never dlopens a half-written .so
        fd, tmp = tempfile.mkstemp(suffix=".so", dir=os.path.dirname(out))
        os.close(fd)
        try:
            subprocess.run(["g++", "-O2", "-shared", "-fPIC",
                            "-o", tmp, src], check=True)
            os.replace(tmp, out)
        finally:
            if os.path.exists(tmp):
                os.unlink(tmp)
    return out


def load_lib():
    """Load (building if needed) the decoder; None when unavailable or
    disabled via ``ATLASVAE_NO_NATIVE`` (checked on every call so tests
    can toggle the fallback).  Thread-safe: the first decode may happen
    inside read_root_files's file thread pool."""
    global _LIB, _FAILED
    if os.environ.get("ATLASVAE_NO_NATIVE"):
        return None
    if _LIB is not None:
        return _LIB
    with _BUILD_LOCK:
        if _LIB is not None or _FAILED:
            return _LIB
        try:
            lib = ctypes.CDLL(_build())
        except (OSError, subprocess.CalledProcessError, FileNotFoundError):
            _FAILED = True
            return None
        lib.rio_decode_stl.argtypes = [
            _U8P, ctypes.c_longlong,            # payload, plen
            _I64P, ctypes.c_longlong,           # starts, n_entries
            ctypes.c_int, ctypes.c_int,         # depth, isz
            _U8P, ctypes.c_longlong, _I64P,     # flat, flat_cap, flat_len
            _I64P,                              # outer
            _I64P, ctypes.c_longlong, _I64P,    # inner, inner_cap, n_inner
            _I64P,                              # err_entry
        ]
        lib.rio_decode_stl.restype = ctypes.c_longlong
        _LIB = lib
        return lib


def decode_stl_basket(payload, starts, depth, dtype):
    """Decode one basket's STL entries natively.

    payload: decompressed basket bytes; starts: int64 byte offsets of
    each entry's bytecount word; depth: 1 or 2; dtype: big-endian
    element dtype.

    Returns ``(flat, outer, inner)`` — flat is a 1-D array of ``dtype``
    in NATIVE byte order (the decoder byteswaps while copying),
    outer/inner are int64 counts (inner is None for depth 1) — or None
    when the native library is unavailable.  Malformed input raises
    ValueError (converted to the named ``CorruptRecordError`` family at
    rootio's decode boundary).
    """
    lib = load_lib()
    if lib is None:
        return None
    buf = np.frombuffer(payload, np.uint8)
    starts = np.ascontiguousarray(starts, np.int64)
    n_entries = len(starts)
    plen = len(buf)
    flat = np.empty(plen, np.uint8)
    outer = np.zeros(max(n_entries, 1), np.int64)
    inner_cap = plen // 4 + 1 if depth == 2 else 1
    inner = np.empty(inner_cap, np.int64)
    flat_len = ctypes.c_longlong(0)
    n_inner = ctypes.c_longlong(0)
    err_entry = ctypes.c_longlong(-1)
    code = lib.rio_decode_stl(
        buf.ctypes.data_as(_U8P), plen,
        starts.ctypes.data_as(_I64P), n_entries,
        int(depth), int(dtype.itemsize),
        flat.ctypes.data_as(_U8P), plen, ctypes.byref(flat_len),
        outer.ctypes.data_as(_I64P),
        inner.ctypes.data_as(_I64P), inner_cap, ctypes.byref(n_inner),
        ctypes.byref(err_entry))
    if code != 0:
        raise ValueError(
            f"STL basket entry {err_entry.value}: "
            f"{_ERRORS.get(code, f'decode error {code}')}")
    # copy the decoded slices so the payload-sized scratch buffers are
    # freed immediately (headers are ~10-30% of a basket; holding the
    # full plen buffer per branch adds up at 10M-event scale)
    flat = flat[:flat_len.value].copy().view(dtype.newbyteorder("="))
    outer = outer[:n_entries]
    return flat, outer, (inner[:n_inner.value].copy()
                         if depth == 2 else None)
