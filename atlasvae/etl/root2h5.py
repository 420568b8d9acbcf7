"""ROOT -> HDF5 conversion (ref tools/root2h5.py, tools/root_utils.py).

The readers use ``uproot``/``awkward`` (no PyROOT: the TLorentzVector
math is re-derived in ``lorentz.py``).  When uproot is absent (as in
this environment) the reader entry points raise a clear error; the
array-level processing (``final_jets``) is importable and tested
regardless.

Physics constants (DSIDs, cross sections in fb, filter efficiencies,
event counts / weight sums, luminosities) are detector metadata carried
over verbatim from ref tools/root2h5.py:38-95.
"""

import os

import numpy as np
import h5py

from .lorentz import (pt_eta_phi_m_to_epxpypz, canonicalize_jets,
                      pt_order_jets, summed_4v)

SCALARS = [
    "rljet_m_calo", "rljet_m_comb", "rljet_pt_calo", "rljet_pt_comb",
    "rljet_ECF3", "rljet_C2", "rljet_D2", "rljet_Tau1_wta", "rljet_Tau2_wta",
    "rljet_Tau3_wta", "rljet_Tau32_wta", "rljet_FoxWolfram2",
    "rljet_PlanarFlow", "rljet_Angularity", "rljet_Aplanarity",
    "rljet_ZCut12", "rljet_Split12", "rljet_Split23", "rljet_KtDR",
    "rljet_Qw", "rljet_eta", "rljet_phi",
]  # ref tools/root2h5.py:28-32
JET_VAR = ["rljet_assoc_cluster_pt", "rljet_assoc_cluster_eta",
           "rljet_assoc_cluster_phi"]
OTHERS = ["weight_mc", "weight_pileup", "rljet_topTag_DNN19_qqb_score",
          "rljet_n_constituents"]

LUMINOSITY = {"topo-dijet": 36.07456, "topo-ttbar": 36.07456,
              "UFO-dijet": 58.45010, "UFO-ttbar": 58.45010, "BSM": 58.45010}

# DSID weight tables (ref tools/root2h5.py:45-95)
_TABLES = {
    "topo-dijet": dict(
        dsids=["361023", "361024", "361025", "361026", "361027",
               "361028", "361029", "361030", "361031", "361032"],
        cross_sec=[26454000000.00, 254630000.000, 4553500.0, 257530.0, 16215.0,
                   625.04, 19.639, 1.1962, 0.042259, 0.0010367],
        filt_eff=[3.2012e-04, 5.3137e-04, 9.2395e-04, 9.4270e-04, 3.9280e-04,
                  1.0166e-02, 1.2077e-02, 5.9083e-03, 2.6734e-03, 4.2592e-04],
        denom=[15362751, 15925231, 15993500, 17834000, 15983000,
               15999000, 13915500, 13985000, 15948000, 15995600]),
    "UFO-dijet": dict(
        dsids=["364703", "364704", "364705", "364706", "364707",
               "364708", "364709", "364710", "364711", "364712"],
        cross_sec=[26450000000.00, 254610000.000, 4552900.0, 257540.0, 16215.0,
                   625.06, 19.639, 1.1962, 0.042263, 0.0010367],
        filt_eff=[1.1658e-02, 1.3366e-02, 1.4526e-02, 9.4734e-03, 1.1097e-02,
                  1.0156e-02, 1.2056e-02, 5.8933e-03, 2.6730e-03, 4.2889e-04],
        denom=[258.536, 8.67297, 0.345287, 0.0389311, 0.00535663,
               0.00154999, 0.000271431, 3.20958e-05, 1.6965e-05, 9.86921e-06]),
    "topo-ttbar": dict(
        dsids=["410284", "410285", "410286", "410287", "410288"],
        cross_sec=[7.2978e+05, 7.2976e+05, 7.2978e+05, 7.2975e+05, 7.2975e+05],
        filt_eff=[3.8208e-03, 1.5782e-03, 6.9112e-04, 4.1914e-04, 2.3803e-04],
        denom=[3.17751e+08, 1.00548e+08, 4.96933e+07, 3.87139e+07, 2.32803e+07]),
    "UFO-ttbar": dict(
        dsids=["410284", "410285", "410286", "410287", "410288"],
        cross_sec=[7.2978e+05, 7.2976e+05, 7.2978e+05, 7.2975e+05, 7.2975e+05],
        filt_eff=[3.8208e-03, 1.5782e-03, 6.9112e-04, 4.1914e-04, 2.3803e-04],
        denom=[4.23372e+08, 1.78314e+08, 8.72442e+07, 8.33126e+07, 3.69924e+07]),
}


def id_weights(sample_type):
    """DSID -> per-event weight = xsec * filter-eff / N
    (ref tools/root2h5.py:92-95)."""
    t = _TABLES[sample_type]
    return dict(zip(t["dsids"],
                    np.array(t["cross_sec"]) * np.array(t["filt_eff"])
                    / np.array(t["denom"])))


def final_jets(pt, eta, phi, n_constituents=None):
    """Constituent (pt, eta, phi) ragged arrays -> processed flat
    (E,px,py,pz) blocks + summed kinematics (ref tools/root_utils.py:55-90
    ``final_jets``/``transform_jets``, vectorized, MeV->GeV upstream).

    pt/eta/phi: lists of per-jet variable-length arrays, or a
    (J, C) array zero-padded.
    """
    if isinstance(pt, np.ndarray) and pt.ndim == 2:
        jets_ptep = np.stack([pt, eta, phi, np.zeros_like(pt)], axis=-1)
    else:
        n_max = n_constituents or max(len(p) for p in pt)
        jets_ptep = np.zeros((len(pt), n_max, 4))
        for i, (p, e, f) in enumerate(zip(pt, eta, phi)):
            k = min(len(p), n_max)
            jets_ptep[i, :k, 0] = p[:k]
            jets_ptep[i, :k, 1] = e[:k]
            jets_ptep[i, :k, 2] = f[:k]
    alive = jets_ptep[..., 0] > 0
    p4 = pt_eta_phi_m_to_epxpypz(jets_ptep[..., 0], jets_ptep[..., 1],
                                 jets_ptep[..., 2], jets_ptep[..., 3])
    p4 = p4 * alive[..., None]
    p4 = canonicalize_jets(p4)
    p4 = pt_order_jets(p4)
    out = summed_4v(p4)
    flat = p4.reshape(len(p4), -1).astype(np.float16)
    return {"constituents": flat, "E": np.float16(out["E"]),
            "pt_calo": np.float16(out["pt_calo"]),
            "m_calo": np.float16(out["m_calo"])}


def get_files(input_path, data_paths):
    """Recursive .root discovery (ref tools/root_utils.py:10-13)."""
    files = []
    for path in data_paths:
        for root, _, names in os.walk(os.path.join(input_path, path)):
            files += [os.path.join(root, n) for n in names if n.endswith(".root")]
    return sorted(files)


def read_root_files(root_files, var_list, sample_type, weights_table,
                    n_constituents, tree="nominal"):
    """uproot-based branch reader (ref tools/root_utils.py:16-52).
    Raises ImportError when uproot is unavailable."""
    try:
        import uproot
    except ImportError as exc:  # pragma: no cover - environment gate
        raise ImportError(
            "uproot is required for ROOT reading; this environment ships "
            "without it.  Convert upstream or install uproot.") from exc
    out = {key: [] for key in var_list}
    out["DSID"] = []
    out["JZW"] = []
    for path in root_files:
        dsid = path.split(".")[2] if len(path.split(".")) > 2 else "0"
        with uproot.open(path) as f:
            events = f[tree]
            for key in var_list:
                if key in JET_VAR:
                    arr = events[key].array(library="np")
                    out[key].append(arr)
                else:
                    arr = np.asarray(events[key].array(library="np"))
                    if key == "weight_mc" and dsid in weights_table:
                        arr = arr * weights_table[dsid]
                    out[key].append(arr)
            n = len(out[var_list[0]][-1])
            out["DSID"].append(np.full(n, float(dsid)))
            jzw = (_TABLES[sample_type]["dsids"].index(dsid)
                   if sample_type in _TABLES and dsid in _TABLES[sample_type]["dsids"]
                   else -1)
            out["JZW"].append(np.full(n, float(jzw)))
    return {key: np.concatenate(val) if not isinstance(val[0], list) else val
            for key, val in out.items()}


def convert(input_path, output_path, sample_type, n_constituents="unknown",
            tag=0, seed=0):
    """Full conversion flow (ref tools/root2h5.py:110-133)."""
    table = _TABLES.get(sample_type, {})
    weights_table = id_weights(sample_type) if sample_type in _TABLES else {}
    if sample_type in ("topo-dijet", "UFO-dijet"):
        id_list = [table["dsids"][int(tag)]]
        output_file = f"{sample_type}_{id_list[0]}.h5"
    else:
        id_list = table.get("dsids", [])
        output_file = f"{sample_type}.h5"
    if not os.path.isdir(input_path):
        raise SystemExit(f"input_path '{input_path}' does not exist — point "
                         "it at a directory of ROOT ntuples "
                         "(ref tools/root2h5.py input layout)")
    data_paths = sorted(p for p in os.listdir(input_path)
                        if len(p.split(".")) > 2 and p.split(".")[2] in id_list)
    if not data_paths:
        raise SystemExit(f"no ROOT files matching DSIDs {id_list} under "
                         f"'{input_path}'")
    root_files = get_files(input_path, data_paths)
    var_list = SCALARS + JET_VAR + OTHERS
    data = read_root_files(root_files, var_list, sample_type, weights_table,
                           n_constituents)
    pt, eta, phi = (data.pop(k) for k in JET_VAR)
    # MeV -> GeV for cluster pt (ref tools/root_utils.py:43-45)
    data.update(final_jets([np.asarray(p) / 1000.0 for p in pt], eta, phi,
                           None if n_constituents == "unknown" else n_constituents))
    data["weights"] = (LUMINOSITY[sample_type] * data.pop("weight_mc")
                       * data.pop("weight_pileup"))
    rng = np.random.default_rng(seed)
    order = rng.permutation(len(data["weights"]))
    os.makedirs(output_path, exist_ok=True)
    with h5py.File(os.path.join(output_path, output_file), "w") as f:
        for key, val in data.items():
            f.create_dataset(key, data=np.asarray(val)[order], compression="lzf")
    return os.path.join(output_path, output_file)
