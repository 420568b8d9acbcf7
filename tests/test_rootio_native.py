"""Native STL basket decoder (etl/rootnative + atlasvae/_native/rootio_decode.cpp).

The native fast path must be byte-for-byte value-equivalent to the
pure-Python decoder on every supported layout, keep the named-error
contract on malformed input, and the vectorized ``leading_padded``
must match the row-by-row padding it replaces
(ref tools/root_utils.py:42-46).
"""

import numpy as np
import pytest

from atlasvae.etl import rootio, rootnative
from atlasvae.etl.rootcodec import CorruptRecordError
from atlasvae.etl.source import RootIOSource, pad_leading

HAVE_NATIVE = rootnative.load_lib() is not None

needs_native = pytest.mark.skipif(not HAVE_NATIVE,
                                  reason="no C++ toolchain")


def _vv(rng, n, kind="f4", max_outer=3, max_inner=5):
    return [[rng.integers(-50, 50, rng.integers(0, max_inner)).astype(kind)
             for _ in range(rng.integers(0, max_outer))]
            for _ in range(n)]


def _read_both(path, name, monkeypatch):
    t = rootio.read_tree(path, "nominal")
    fast = t.array(name)
    jag = t.array_jagged(name)
    monkeypatch.setenv("ATLASVAE_NO_NATIVE", "1")
    t2 = rootio.read_tree(path, "nominal")
    slow = t2.array(name)
    jag2 = t2.array_jagged(name)
    monkeypatch.delenv("ATLASVAE_NO_NATIVE")
    return fast, slow, jag, jag2


def _assert_same(a, b):
    assert len(a) == len(b)
    for u, v in zip(a, b):
        if isinstance(u, list) or isinstance(v, list):
            _assert_same(u, v)
        else:
            np.testing.assert_array_equal(np.asarray(u), np.asarray(v))


@needs_native
@pytest.mark.parametrize("kind", ["f4", "f8", "i4", "i8", "i2", "u1"])
@pytest.mark.parametrize("memberwise", [False, True])
def test_native_matches_python_vv(tmp_path, rng, monkeypatch, kind,
                                  memberwise):
    entries = _vv(rng, 300, kind)
    entries[0] = []                          # empty outer
    entries[1] = [np.zeros(0, kind)]         # empty inner
    p = str(tmp_path / "vv.root")
    rootio.write_tree(p, "nominal", {"vv": entries}, basket_entries=64,
                      stl_memberwise=memberwise)
    fast, slow, jag, jag2 = _read_both(p, "vv", monkeypatch)
    _assert_same(fast, slow)
    _assert_same(fast, entries)
    for x, y in zip(jag, jag2):
        np.testing.assert_array_equal(x, y)
    flat, outer, inner = jag
    assert outer.sum() == sum(len(e) for e in entries)
    assert inner.sum() == len(flat) == sum(
        len(v) for e in entries for v in e)


@needs_native
@pytest.mark.parametrize("kind", ["f4", "i8"])
def test_native_matches_python_v(tmp_path, rng, monkeypatch, kind):
    entries = [rng.integers(-50, 50, rng.integers(0, 7)).astype(kind)
               for _ in range(500)]
    p = str(tmp_path / "v.root")
    rootio.write_tree(p, "nominal", {"v": entries}, basket_entries=128)
    fast, slow, jag, jag2 = _read_both(p, "v", monkeypatch)
    _assert_same(fast, slow)
    _assert_same(fast, entries)
    flat, outer, inner = jag
    assert inner is None and outer.sum() == len(flat)
    np.testing.assert_array_equal(outer, jag2[1])


def test_array_jagged_leaf_list(tmp_path, rng):
    """array_jagged also covers counter-jagged leaf lists and flat
    branches (no native decode needed — already columnar)."""
    trk = [rng.normal(size=c).astype(np.float32)
           for c in rng.integers(0, 5, 200)]
    pt = rng.uniform(0, 100, 200).astype(np.float32)
    p = str(tmp_path / "leaf.root")
    rootio.write_tree(p, "nominal", {"trk": trk, "pt": pt})
    t = rootio.read_tree(p, "nominal")
    flat, cnt, inner = t.array_jagged("trk")
    assert inner is None
    np.testing.assert_array_equal(cnt, [len(v) for v in trk])
    np.testing.assert_array_equal(flat, np.concatenate(trk))
    vals, none1, none2 = t.array_jagged("pt")
    assert none1 is None and none2 is None
    np.testing.assert_array_almost_equal(vals, pt)


@pytest.mark.parametrize("layout", ["vv", "v", "leaf", "flat"])
def test_leading_padded_matches_loop(tmp_path, rng, layout):
    n, n_const = 250, 4
    if layout == "vv":
        data = _vv(rng, n, "f4", max_inner=7)
    elif layout == "v":
        data = [rng.normal(size=c).astype(np.float32)
                for c in rng.integers(0, 7, n)]
    elif layout == "leaf":
        data = [rng.normal(size=c).astype(np.float32)
                for c in rng.integers(0, 7, n)]
    else:
        data = rng.uniform(0, 9, n).astype(np.float32)
    p = str(tmp_path / f"{layout}.root")
    if layout == "v":
        # force the STL path (leaf-list jagged writes by default)
        rootio.write_tree(p, "nominal", {"x": data}, basket_entries=64,
                          stl_branches=["x"])
    else:
        rootio.write_tree(p, "nominal", {"x": data}, basket_entries=64)
    src = RootIOSource(p)
    vec = src.leading_padded("x", n_const)
    loop = pad_leading(src.leading_list("x"), n_const)
    np.testing.assert_array_equal(vec, loop)
    assert vec.shape == (n, n_const) and vec.dtype == np.float64


@needs_native
def test_native_corrupt_offsets_named_error(tmp_path, rng):
    """Entry offsets pointing outside the payload must surface as
    CorruptRecordError, not a crash or silent garbage."""
    entries = _vv(rng, 64, "f4")
    p = str(tmp_path / "c.root")
    rootio.write_tree(p, "nominal", {"vv": entries}, basket_entries=64)
    t = rootio.read_tree(p, "nominal")
    br = t.branches["vv"]
    # parse the basket, then lie about the entry starts
    payload = rootio._Key.parse(t.buf, br.basket_seeks[0]).payload(t.buf)
    starts = np.array([len(payload) + 100], np.int64)
    with pytest.raises(ValueError, match="past the basket payload"):
        rootnative.decode_stl_basket(payload, starts, 2, np.dtype(">f4"))
    starts = np.array([0], np.int64)  # points at real data = garbage header
    try:
        rootnative.decode_stl_basket(payload, starts, 2, np.dtype(">f4"))
    except ValueError:
        pass                                 # named at the boundary


def test_no_native_env_disables(tmp_path, monkeypatch):
    monkeypatch.setenv("ATLASVAE_NO_NATIVE", "1")
    assert rootnative.load_lib() is None
    assert rootnative.decode_stl_basket(b"\0" * 16,
                                        np.zeros(1, np.int64), 1,
                                        np.dtype(">f4")) is None


def test_fallback_negative_count_named_error():
    """The pure-Python fallback must reject negative counts like the
    native decoder (np.frombuffer would read 'all remaining' garbage)."""
    import struct
    payload = (struct.pack(">I", 10) + struct.pack(">h", 6)
               + struct.pack(">i", -3))
    for depth in (1, 2):
        with pytest.raises(ValueError, match="negative element count"):
            rootio._decode_stl_py(payload, np.zeros(1, np.int64), depth,
                                  np.dtype(">f4"))
    inner_neg = (struct.pack(">I", 14) + struct.pack(">h", 6)
                 + struct.pack(">i", 1) + struct.pack(">i", -2))
    with pytest.raises(ValueError, match="negative element count"):
        rootio._decode_stl_py(inner_neg, np.zeros(1, np.int64), 2,
                              np.dtype(">f4"))


def test_leading_padded_clamps_inconsistent_counts(tmp_path, rng):
    """Counts exceeding the flat data (a lying leafcount in a corrupt
    file) must zero-pad like the old row loop, not raise IndexError."""
    data = [rng.normal(size=3).astype(np.float32) for _ in range(2)]
    p = str(tmp_path / "c.root")
    rootio.write_tree(p, "nominal", {"x": data})
    src = RootIOSource(p)
    src._tree.array_jagged = lambda k: (np.arange(3, dtype=np.float64),
                                        np.array([2, 5]), None)
    out = src.leading_padded("x", 4)
    np.testing.assert_array_equal(out, [[0, 1, 0, 0], [2, 0, 0, 0]])


def _padded_jets(rng, n_jets, n_const, lo=1.0, hi=200.0):
    counts = rng.integers(0, n_const + 1, n_jets)
    pt = np.zeros((n_jets, n_const))
    eta, phi = np.zeros_like(pt), np.zeros_like(pt)
    for i, c in enumerate(counts):
        pt[i, :c] = rng.uniform(lo, hi, c)
        eta[i, :c] = rng.uniform(-2, 2, c)
        phi[i, :c] = rng.uniform(-3, 3, c)
    return pt, eta, phi


@needs_native
def test_final_jets_native_matches_numpy(rng, monkeypatch):
    """The fused kernel must be bit-identical to the numpy pipeline on
    constituents/E/pt_calo; m_calo of (near-)massless jets is pure
    cancellation noise (E^2 - p^2 ~ 1e-16 rel in both paths, summed in
    different orders), so those entries get an absolute tolerance."""
    from atlasvae.etl.root2h5 import final_jets
    pt, eta, phi = _padded_jets(rng, 5000, 30)
    pt[17, 3] = -4.0                      # non-positive pt is masked dead
    pt[18, :] = 0.0                       # fully padded jet
    nat = rootnative.final_jets_native(pt, eta, phi)
    assert nat is not None
    monkeypatch.setenv("ATLASVAE_NO_NATIVE", "1")
    ref = final_jets(pt, eta, phi)
    def _f16_ulp(a, b):
        # distance on the monotone-mapped float16 grid
        def m(x):
            u = x.view(np.uint16).astype(np.int32)
            return np.where(u & 0x8000, 0x8000 - (u & 0x7fff),
                            0x8000 + (u & 0x7fff))
        return np.abs(m(a.ravel()) - m(b.ravel()))

    for key in ("constituents", "E", "pt_calo"):
        # bit-equal except (a) signed zeros — the aligned leading-pz
        # residual is +-1e-17 cancellation noise whose sign depends on
        # numpy's pairwise summation order — and (b) at most 1 ulp at
        # float16 halfway points, where the kernel's sequential
        # accumulation vs numpy's pairwise sums can land a double within
        # ~1e-16 rel of a rounding boundary (~1e-13/element odds)
        ulp = _f16_ulp(nat[key], ref[key])
        assert ulp.max(initial=0) <= 1, key
        nonzero_diff = (ulp > 0) & (ref[key].ravel() != 0)
        assert np.mean(nonzero_diff) < 1e-4, key
    a, b = np.float64(nat["m_calo"]), np.float64(ref["m_calo"])
    mism = a != b
    assert np.abs(b[mism]).max(initial=0) < 1e-4     # all near-massless
    np.testing.assert_allclose(a[mism], b[mism], atol=2e-4)


@needs_native
def test_final_jets_nonfinite_poison_contract(monkeypatch):
    """Garbage kinematics (|eta| overflowing sinh) NaN-poison the whole
    jet through the 4-vector totals in BOTH paths.  Exact NaN layout is
    not parity (the kernel short-circuits padding to zeros; numpy
    smears NaN over pads via the NaN rotation angle) — the contract
    that matters downstream is that a poisoned jet stays detectably
    non-finite (data/loader.py filtering drops such rows), and that the
    NaN-last sort comparator keeps healthy jets untouched."""
    from atlasvae.etl.root2h5 import final_jets
    pt = np.array([[5.0, 7.0, 3.0, 0.0], [5.0, 7.0, 3.0, 0.0]])
    eta = np.array([[800.0, 0.1, -0.2, 0.0], [0.5, 0.1, -0.2, 0.0]])
    phi = np.array([[0.3, -1.0, 2.0, 0.0], [0.3, -1.0, 2.0, 0.0]])
    nat = rootnative.final_jets_native(pt, eta, phi)
    monkeypatch.setenv("ATLASVAE_NO_NATIVE", "1")
    ref = final_jets(pt, eta, phi)
    for out in (nat, ref):
        c = np.float64(out["constituents"].reshape(2, 4, 4))
        assert not np.isfinite(c[0]).all()      # poisoned jet flagged
        assert np.isfinite(c[1]).all()          # healthy jet untouched
    np.testing.assert_array_equal(nat["constituents"][1],
                                  ref["constituents"][1])


@needs_native
def test_final_jets_dispatches_native(rng):
    """root2h5.final_jets must route through the kernel when available,
    for both 2-D array and variable-length list inputs."""
    from atlasvae.etl.root2h5 import final_jets
    pt, eta, phi = _padded_jets(rng, 200, 8)
    out = final_jets(pt, eta, phi)
    nat = rootnative.final_jets_native(pt, eta, phi)
    for key in out:
        np.testing.assert_array_equal(out[key], nat[key])
    counts = rng.integers(0, 5, 100)
    lists = ([rng.uniform(1, 50, c) for c in counts],
             [rng.uniform(-2, 2, c) for c in counts],
             [rng.uniform(-3, 3, c) for c in counts])
    out_l = final_jets(*lists)
    assert out_l["constituents"].shape == (100, 4 * max(counts.max(), 1))


@needs_native
def test_d2h_matches_numpy_cast(rng):
    """The kernel's direct double->half rounding vs numpy's float64 ->
    float16 cast: every representable half round-trips, every exact
    halfway point rounds to even, and adversarial ranges (overflow,
    subnormals, +-0, inf, nan) agree bit-for-bit."""
    lib = rootnative.load_lib()
    import ctypes
    def d2h(x):
        x = np.ascontiguousarray(x, np.float64)
        out = np.empty(len(x), np.uint16)
        lib.rio_d2h(x.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
                    len(x),
                    out.ctypes.data_as(ctypes.POINTER(ctypes.c_ushort)))
        return out

    halves = np.arange(65536, dtype=np.uint16).view(np.float16)
    finite = halves[np.isfinite(halves)]
    exact = np.float64(finite)
    np.testing.assert_array_equal(d2h(exact), finite.view(np.uint16))
    # midpoints between consecutive positive halves -> round to even
    pos = np.sort(exact[exact >= 0])
    mids = (pos[:-1] + pos[1:]) / 2.0
    with np.errstate(over="ignore"):
        want = np.float16(mids)
    np.testing.assert_array_equal(d2h(mids), want.view(np.uint16))
    np.testing.assert_array_equal(d2h(-mids), np.float16(-mids).view(np.uint16))
    # adversarial: overflow, double-subnormal, nan payloads, signed zero
    adv = np.concatenate([
        rng.uniform(-1e6, 1e6, 2000) * 10.0 ** rng.integers(-12, 6, 2000),
        [np.inf, -np.inf, np.nan, 0.0, -0.0, 65504.0, 65519.999, 65520.0,
         1e-300, -1e-300, 2.0 ** -25, -(2.0 ** -25), 2.0 ** -24, 5.96e-8],
    ])
    with np.errstate(over="ignore"):
        want = np.float16(adv)
    got = d2h(adv)
    nan = np.isnan(want)
    np.testing.assert_array_equal(got[~nan], want[~nan].view(np.uint16))
    assert np.all(np.isnan(got[nan].view(np.float16)))


def test_concurrent_first_decode_builds_once(tmp_path, rng, monkeypatch):
    """Hammer load_lib from many threads with no prebuilt .so — every
    thread must get a working decoder (no corrupt dlopen, no permanent
    fallback from the build race)."""
    import os as _os
    from concurrent.futures import ThreadPoolExecutor
    from atlasvae import _native
    so = _native._output_path("rootio_decode")
    if _os.path.exists(so):
        _os.unlink(so)
    monkeypatch.setattr(rootnative, "_LIB", None)
    monkeypatch.setattr(rootnative, "_FAILED", False)
    entries = _vv(rng, 50, "f4")
    p = str(tmp_path / "r.root")
    rootio.write_tree(p, "nominal", {"vv": entries}, basket_entries=16)

    def read():
        t = rootio.read_tree(p, "nominal")
        return t.array("vv")

    with ThreadPoolExecutor(8) as ex:
        results = list(ex.map(lambda _: read(), range(8)))
    assert rootnative.load_lib() is not None
    for r in results:
        _assert_same(r, entries)
