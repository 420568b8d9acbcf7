"""ETL tests: Lorentz canonicalization invariants, pt ordering,
shuffle-merge round trip, DSID weight tables."""

import numpy as np
import h5py

from atlasvae.etl import (pt_eta_phi_m_to_epxpypz, canonicalize_jets,
                          pt_order_jets, summed_4v, file_processing)
from atlasvae.etl.root2h5 import final_jets, id_weights


def _random_jets(rng, n_jets=50, n_const=12):
    pt = rng.uniform(1, 100, (n_jets, n_const))
    eta = rng.normal(0, 1.5, (n_jets, n_const))
    phi = rng.uniform(-np.pi, np.pi, (n_jets, n_const))
    # zero-pad a tail
    pt[:, 9:] = 0
    return pt, eta, phi


def test_ptepm_conversion_golden(rng):
    pt, eta, phi = rng.uniform(1, 50, 10), rng.normal(0, 2, 10), rng.uniform(-3, 3, 10)
    m = rng.uniform(0, 5, 10)
    p4 = pt_eta_phi_m_to_epxpypz(pt, eta, phi, m)
    # invariants: transverse momentum and mass round-trip
    np.testing.assert_allclose(np.hypot(p4[:, 1], p4[:, 2]), pt, rtol=1e-10)
    m2 = p4[:, 0] ** 2 - p4[:, 1] ** 2 - p4[:, 2] ** 2 - p4[:, 3] ** 2
    np.testing.assert_allclose(np.sqrt(np.maximum(m2, 0)), m, rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(p4[:, 3], pt * np.sinh(eta), rtol=1e-10)


def test_canonicalize_invariants(rng):
    pt, eta, phi = _random_jets(rng)
    alive = pt > 0
    p4 = pt_eta_phi_m_to_epxpypz(pt, eta, phi, 0.0) * alive[..., None]
    out = canonicalize_jets(p4)
    # rotations+boost preserve each constituent's invariant mass (0)
    m2 = out[..., 0] ** 2 - out[..., 1] ** 2 - out[..., 2] ** 2 - out[..., 3] ** 2
    np.testing.assert_allclose(m2, 0.0, atol=1e-6)
    # jet invariant mass is preserved
    before = summed_4v(p4)["m_calo"]
    after = summed_4v(out)["m_calo"]
    np.testing.assert_allclose(after, before, rtol=1e-6, atol=1e-6)
    # after RotateZ(-phi) + z-deboost the total jet points along +x:
    total = out.sum(axis=1)
    np.testing.assert_allclose(total[:, 2], 0.0, atol=1e-6 * np.abs(total[:, 1]).max())
    np.testing.assert_allclose(total[:, 3], 0.0, atol=1e-5 * np.abs(total[:, 1]).max())
    assert np.all(total[:, 1] > 0)
    # padding rows remain exactly zero
    assert np.all(out[~alive] == 0)


def test_pt_order(rng):
    pt, eta, phi = _random_jets(rng, n_jets=5)
    p4 = pt_eta_phi_m_to_epxpypz(pt, eta, phi, 0.0) * (pt > 0)[..., None]
    ordered = pt_order_jets(p4)
    opt = np.hypot(ordered[..., 1], ordered[..., 2])
    assert np.all(np.diff(opt, axis=1) <= 1e-9)


def test_final_jets_pipeline(rng):
    pt = [rng.uniform(1, 50, rng.integers(3, 10)) for _ in range(20)]
    eta = [rng.normal(0, 1, len(p)) for p in pt]
    phi = [rng.uniform(-3, 3, len(p)) for p in pt]
    out = final_jets(pt, eta, phi)
    assert out["constituents"].dtype == np.float16
    assert len(out["m_calo"]) == 20
    assert np.all(np.asarray(out["pt_calo"], np.float64) >= 0)


def test_id_weights_tables():
    w = id_weights("topo-dijet")
    assert len(w) == 10
    # weight = xsec * filt_eff / N (ref tools/root2h5.py:92-95)
    np.testing.assert_allclose(w["361023"],
                               26454000000.0 * 3.2012e-04 / 15362751, rtol=1e-6)


def test_shuffle_merge_roundtrip(tmp_path, rng):
    src = tmp_path / "parts"
    src.mkdir()
    totals = []
    for i, n in enumerate([37, 53, 41]):
        with h5py.File(src / f"in_{i}.h5", "w") as f:
            f.create_dataset("constituents", data=rng.normal(size=(n, 8)).astype(np.float16))
            f.create_dataset("weights", data=np.full(n, i, np.float32))
        totals.append(n)
    out = file_processing(str(src), n_constituents=2, n_files=4)
    with h5py.File(out, "r") as f:
        assert len(f["constituents"]) == sum(totals)
        # every input file's rows survive the mix
        counts = [int(np.sum(f["weights"][:] == i)) for i in range(3)]
        assert counts == totals
        # mixing actually interleaves the sources
        first_quarter = f["weights"][:sum(totals) // 4]
        assert len(np.unique(first_quarter)) > 1
