"""Sample loading: HDF5 -> dict-of-arrays with derived kinematics.

Re-implements the reference's loader semantics (ref OE-VAE/utils.py:76-130
``load_data``, :133-142 ``make_sample``, :145-149 ``split_sample``,
:168-181 ``sample_cuts``) with jitted device kernels for the per-jet math
(see ``atlasvae.data.jets``) and the safe cut DSL (``atlasvae.utils.expr``)
in place of ``eval``.
"""

import time

import numpy as np
import h5py

from ..utils.expr import evaluate_cut, CutError
from .registry import get_file
from .jets import sort_constituents_by_pt, pad_constituents, jets_4v, drop_energy_component

# Canonical high-level-variable list (ref OE-VAE/vae.py:72-73).
HLV_LIST = [
    "rljet_Tau1_wta", "rljet_Tau2_wta", "rljet_Tau3_wta", "rljet_eta",
    "rljet_ECF3", "ECF2", "d12", "d23", "pt", "m", "tau21", "tau32",
]



def _on(flag):
    """Accept the reference's 'ON'/'OFF' strings or booleans."""
    if isinstance(flag, str):
        return flag.upper() == "ON"
    return bool(flag)


def load_data(data_type, idx, cuts=(), n_const=20, n_dims=3, constituents="OFF",
              hlvs="ON", hlv_list=None, var_list=None, dsids=None,
              adjust_weights=False, verbose=True, pt_scaling=False):
    """Load a slice of one sample into a dict of float32 numpy arrays.

    Follows ref OE-VAE/utils.py:76-130: slice the HDF5 by index range,
    pt-sort + pad constituents, derive (pt, m) from constituent sums when
    absent, default JZW/weights, apply cuts, optionally drop the energy
    component (n_dims=3) and assemble the HLV matrix with tau21/tau32.
    """
    start = time.time()
    if np.isscalar(idx):
        idx = (0, int(idx))
    hlv_list = list(hlv_list) if hlv_list is not None else list(HLV_LIST)
    data_file = get_file(data_type)
    with h5py.File(data_file, "r") as data:
        if verbose:
            print("Loading", data_file.split("/")[-1], end="", flush=True)
        keys = set(data.keys()) if var_list is None else set(data.keys()) & set(var_list)
        sample = {
            key: np.asarray(data[key][idx[0]:idx[1]])
            for key in keys if "constituents" not in key
        }
        # derive from constituents when EITHER kinematic family is
        # missing: a file carrying only pt (or only m) columns must not
        # KeyError at the pop below — the derived pt_calo/m_calo fill
        # whichever side is absent (stored comb columns still win)
        need_derived = (
            len(set(sample) & {"rljet_pt_comb", "pt_calo"}) == 0
            or len(set(sample) & {"rljet_m_comb", "m_calo"}) == 0)
        if _on(constituents) or need_derived:
            raw = np.asarray(data["constituents"][idx[0]:idx[1], :])
            sorted_const = sort_constituents_by_pt(raw)
            if _on(constituents):
                sample["constituents"] = pad_constituents(sorted_const, n_const)
                if need_derived:
                    # derived kinematics use the TRUNCATED constituents,
                    # as the reference does (ref OE-VAE/utils.py:91,98-99)
                    sample.update(jets_4v(sample["constituents"]))
            elif need_derived:
                # constituents OFF + no stored kinematics: the reference
                # would crash here (utils.py:100 KeyError); derive from
                # the full array as a robustness extension
                sample.update(jets_4v(sorted_const))

    sample["pt"] = sample.pop("rljet_pt_comb" if "rljet_pt_comb" in sample else "pt_calo")
    sample["m"] = sample.pop("rljet_m_comb" if "rljet_m_comb" in sample else "m_calo")
    size = len(next(iter(sample.values())))
    if "JZW" not in sample:
        sample["JZW"] = np.full(size, 0.0 if "QCD" in str(data_type).upper() else -1.0,
                                dtype=np.float32)
    if "weights" not in sample:
        sample["weights"] = np.full(size, 1.0, dtype=np.float32)

    sample = sample_cuts(sample, cuts, dsids)

    if adjust_weights:
        from .weights import weights_factors
        sample["weights"] = sample["weights"] * weights_factors(sample["JZW"], data_file)
    if pt_scaling and "constituents" in sample:
        sample["constituents"] = sample["constituents"] / np.float32(sample["pt"][:, None])
    if "constituents" in sample and n_dims == 3:
        sample["constituents"] = drop_energy_component(sample["constituents"])
    if verbose:
        print(f" ({time.time() - start:2.1f} s)")
    if _on(hlvs):
        if "tau21" in hlv_list:
            sample["tau21"] = sample["rljet_Tau2_wta"] / np.maximum(sample["rljet_Tau1_wta"], 1e-16)
        if "tau32" in hlv_list:
            sample["tau32"] = sample["rljet_Tau3_wta"] / np.maximum(sample["rljet_Tau2_wta"], 1e-16)
        sample["HLVs"] = np.hstack(
            [np.float32(sample[key])[:, None] for key in hlv_list]
        )
    return sample


def sample_cuts(sample, cuts, dsids=None):
    """Apply DSL cut strings + optional DSID selection
    (ref OE-VAE/utils.py:168-181, with eval() replaced by the safe DSL)."""
    size = len(next(iter(sample.values())))
    masks = [np.full(size, True)]
    for cut in cuts or ():
        if not cut:
            continue
        try:
            masks.append(evaluate_cut(cut, sample))
        except CutError as exc:
            print(f"WARNING: invalid cut: {cut} ({exc})")
    mask = np.logical_and.reduce(masks)
    if dsids is not None:
        if np.isscalar(dsids):
            dsids = [dsids]
        dsid_mask = np.logical_or.reduce([sample["DSID"] == int(n) for n in dsids])
        mask = np.logical_and(mask, dsid_mask)
    if not np.all(mask):
        sample = {key: val[mask] for key, val in sample.items()}
    return sample


def make_sample(bkg_data, sig_data, bkg_idx=1, sig_idx=1, cuts=(), n_const=20, n_dims=4,
                constituents="ON", hlvs="ON", hlv_list=None, var_list=None, dsids=None,
                adjust_weights=False, shuffling=False, verbose=True):
    """Concatenated background+signal evaluation sample
    (ref OE-VAE/utils.py:133-142)."""
    sig_sample = load_data(sig_data, sig_idx, cuts, n_const, n_dims, constituents,
                           hlvs, hlv_list, var_list, dsids, adjust_weights, verbose)
    bkg_sample = load_data(bkg_data, bkg_idx, cuts, n_const, n_dims, constituents,
                           hlvs, hlv_list, var_list, dsids, adjust_weights, verbose)
    if "OoD" in str(sig_data):
        from .pairing import ood_sampling
        sig_sample = ood_sampling(bkg_sample, sig_sample)
    keys = set(bkg_sample) & set(sig_sample)
    sample = {key: np.concatenate([bkg_sample[key], sig_sample[key]]) for key in keys}
    if shuffling:
        rng = np.random.default_rng(0)
        order = rng.permutation(len(next(iter(sample.values()))))
        sample = {key: val[order] for key, val in sample.items()}
    return sample


def merge_samples(data_files, idx, cuts=(), n_const=20, n_dims=3,
                  constituents="ON", hlvs="OFF", hlv_list=None, verbose=True):
    """Load a global index range spanning multiple HDF5 files
    (ref jet-ID/utils.py:207-246 ``batch_idx``/``merge_samples``: global
    event indices are mapped onto per-file slices and concatenated)."""
    sizes = []
    for path in data_files:
        with h5py.File(get_file(path), "r") as f:
            sizes.append(len(next(iter(f.values()))))
    edges = np.concatenate([[0], np.cumsum(sizes)])
    lo, hi = int(idx[0]), int(idx[1])
    parts = []
    for i, path in enumerate(data_files):
        a = max(lo, edges[i])
        b = min(hi, edges[i + 1])
        if a >= b:
            continue
        parts.append(load_data(path, (a - edges[i], b - edges[i]), cuts,
                               n_const, n_dims, constituents, hlvs, hlv_list,
                               verbose=verbose))
    if not parts:
        raise ValueError(
            f"index range {(lo, hi)} selects no rows across {len(data_files)} "
            f"files totalling {int(edges[-1])} rows")
    keys = set(parts[0])
    for p in parts[1:]:
        keys &= set(p)
    return {key: np.concatenate([p[key] for p in parts]) for key in keys}


def split_sample(sample):
    """Split into (background, signal) by the JZW label
    (ref OE-VAE/utils.py:145-149)."""
    jzw = sample["JZW"]
    bkg = {key: val[jzw != -1] for key, val in sample.items()}
    sig = {key: val[jzw == -1] for key, val in sample.items()}
    return bkg, sig


def filtering(y_true, x_true, x_pred, sample):
    """Drop rows whose predictions are non-finite before metrics
    (ref OE-VAE/utils.py:532-538)."""
    good = np.all(np.isfinite(x_pred), axis=tuple(range(1, x_pred.ndim)))
    sample = {key: val[good] for key, val in sample.items()}
    return y_true[good], x_true[good], x_pred[good], sample
