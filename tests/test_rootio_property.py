"""Property-based round-trip fuzzing of the ROOT-format I/O.

Hypothesis generates arbitrary trees — mixed branch layouts (flat,
counter-jagged leaf list, ``vector<T>``, ``vector<vector<T>>``), element
dtypes, basket sizes, codecs and STL streaming modes — and asserts that

* the written container passes the INDEPENDENT spec walker's record
  tiling / key / compression-frame validation (rootio_spec_fixture,
  which shares no code with rootio),
* ``Tree.array`` reproduces the input values exactly through both the
  native decoder and the pure-Python fallback,
* ``Tree.array_jagged`` count totals are consistent with the data.

(The reference delegates all format handling to uproot,
ref tools/root_utils.py:16-52, and has no tests at all — SURVEY §4.)
"""

import os
import tempfile

import numpy as np
from hypothesis import HealthCheck, given, settings, strategies as st

from atlasvae.etl import rootio
from rootio_spec_fixture import walk_records

KINDS = ["f4", "f8", "i4", "i8", "i2", "u1", "u2", "u4", "u8"]
LAYOUTS = ["flat", "leaf", "stl1", "vv"]


@st.composite
def tree_case(draw):
    n = draw(st.integers(1, 20))
    branches, layouts, stl1 = {}, {}, []
    for i in range(draw(st.integers(1, 3))):
        kind = draw(st.sampled_from(KINDS))
        layout = draw(st.sampled_from(LAYOUTS))
        name = f"b{i}_{layout}"
        lo, hi = ((0, 200) if kind == "u1"
                  else (2**31, 2**31 + 100) if kind == "u4"
                  else (2**63, 2**63 + 100) if kind == "u8"
                  else (0, 60000) if kind == "u2"
                  else (-100, 100))

        def vec(size):
            return np.array(draw(st.lists(st.integers(lo, hi),
                                          min_size=size, max_size=size)),
                            kind)

        if layout == "flat":
            branches[name] = vec(n)
        elif layout in ("leaf", "stl1"):
            branches[name] = [vec(draw(st.integers(0, 4)))
                              for _ in range(n)]
            if layout == "stl1":
                stl1.append(name)
        else:
            entries = [[vec(draw(st.integers(0, 3)))
                        for _ in range(draw(st.integers(0, 2)))]
                       for _ in range(n)]
            # anchor the doubly-jagged layout detection
            entries[0] = [vec(2)] + entries[0]
            branches[name] = entries
        layouts[name] = layout
    comp = draw(st.sampled_from([None, "zlib", "lz4", "zstd"]))
    be = draw(st.integers(1, n + 3))
    mw = draw(st.booleans())
    return n, branches, layouts, stl1, comp, be, mw


def _check_equal(layout, got, want):
    if layout == "flat":
        np.testing.assert_array_equal(np.asarray(got), want)
        return
    assert len(got) == len(want)
    for g, w in zip(got, want):
        if layout == "vv":
            assert len(g) == len(w)
            for gi, wi in zip(g, w):
                np.testing.assert_array_equal(np.asarray(gi), wi)
        else:
            np.testing.assert_array_equal(np.asarray(g), w)


@settings(max_examples=40, deadline=None,
          suppress_health_check=[HealthCheck.too_slow,
                                 HealthCheck.data_too_large])
@given(tree_case())
def test_roundtrip_any_tree(case):
    n, branches, layouts, stl1, comp, be, mw = case
    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "t.root")
        rootio.write_tree(path, "t", branches, compression=comp,
                          basket_entries=be, stl_memberwise=mw,
                          stl_branches=stl1)
        # independent container validation (spec walker, no rootio code)
        walk_records(path)
        saved = os.environ.get("ATLASVAE_NO_NATIVE")
        for env in ("", "1"):
            if env:
                os.environ["ATLASVAE_NO_NATIVE"] = env
            try:
                tree = rootio.read_tree(path, "t")
                assert tree.num_entries == n
                for name, layout in layouts.items():
                    _check_equal(layout, tree.array(name), branches[name])
                    flat, outer, inner = tree.array_jagged(name)
                    if layout == "flat":
                        assert outer is None and inner is None
                        assert len(flat) == n
                    elif layout == "vv":
                        assert outer.sum() == sum(
                            len(e) for e in branches[name])
                        assert inner.sum() == len(flat)
                    else:
                        assert inner is None
                        assert outer.sum() == len(flat) == sum(
                            len(v) for v in branches[name])
            finally:
                # restore, don't pop: an externally-set value (e.g. a
                # suite launched with ATLASVAE_NO_NATIVE=1) must survive
                if saved is None:
                    os.environ.pop("ATLASVAE_NO_NATIVE", None)
                else:
                    os.environ["ATLASVAE_NO_NATIVE"] = saved
