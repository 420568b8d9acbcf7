"""Dataset registry: logical sample names -> HDF5 paths.

Mirrors the reference's host-keyed ``get_file`` map
(ref OE-VAE/utils.py:12-33) with the same logical names, but resolves
the data directory from the ``ATLASVAE_DATA_DIR`` environment variable
(falling back to ``./data``) and supports runtime registration so tests
and the synthetic-data path can inject files.
"""

import os
from pathlib import Path

# Logical name -> file name, matching the reference registry
# (ref OE-VAE/utils.py:15-32).
DATA_FILES = {
    "QCD-Geneva": "formatted_converted_20210629_QCDjj_pT_450_1200_nevents_10M_dPhifixed_float32.h5",
    "top-Geneva": "formatted_converted_20211213_ttbar_allhad_pT_450_1200_nevents_10M_dPhifixed_float32.h5",
    "2HDM-Geneva": "formatted_converted_delphes_H_HpHm_generation_mh2_5000_mhc_500_nevents_1M_float32.h5",
    "VZ-Geneva": "formatted_converted_delphes_z_zprime_tt_allhad_MVz_5000_MT_500_nevents_1M_float32.h5",
    "QCD-Delphes": "Delphes_dijet.h5",
    "top-Delphes": "Delphes_ttbar.h5",
    "QCD-topo": "Atlas_topo-dijet.h5",
    "top-topo": "Atlas_topo-ttbar.h5",
    "QCD-UFO": "Atlas_UFO-dijet.h5",
    "top-UFO": "Atlas_UFO-ttbar.h5",
    "BSM": "Atlas_BSM.h5",
    "OoD-W": "resamples_oe_w.h5",
    "OoD-H": "formatted_converted_Outliers_delphes_H_HpHm_generationredo_float32.h5",
}

_OVERRIDES = {}


def data_dir():
    return Path(os.environ.get("ATLASVAE_DATA_DIR", "data"))


def register_file(data_type, path):
    """Register/override the HDF5 path for a logical sample name."""
    _OVERRIDES[data_type] = str(path)


def get_file(data_type):
    """Resolve a logical sample name (or literal path) to an HDF5 path."""
    if data_type in _OVERRIDES:
        return _OVERRIDES[data_type]
    if data_type in DATA_FILES:
        return str(data_dir() / DATA_FILES[data_type])
    if os.path.isfile(data_type):
        return data_type
    raise KeyError(
        f"unknown dataset {data_type!r}: not registered, not in DATA_FILES, "
        f"and not a file path"
    )
