"""Multi-file sample merging tests (ref jet-ID/utils.py:207-246)."""

import numpy as np
import h5py

from atlasvae.data import register_file
from atlasvae.data.loader import merge_samples


def _write(path, n, offset):
    rng = np.random.default_rng(offset)
    jets = np.abs(rng.normal(10, 3, (n, 8, 4))).astype(np.float32)
    with h5py.File(path, "w") as f:
        f.create_dataset("constituents", data=jets.reshape(n, -1))
        f.create_dataset("rljet_pt_comb", data=np.full(n, float(offset), np.float32))
        f.create_dataset("rljet_m_comb", data=np.arange(n, dtype=np.float32))
        f.create_dataset("weights", data=np.ones(n, np.float32))
        f.create_dataset("JZW", data=np.zeros(n, np.float32))


def test_merge_samples_spans_files(tmp_path):
    for i, n in enumerate([30, 50, 20]):
        _write(tmp_path / f"part{i}.h5", n, offset=100 * (i + 1))
        register_file(f"mf-part{i}", tmp_path / f"part{i}.h5")
    files = ["mf-part0", "mf-part1", "mf-part2"]
    # global range [20, 90) spans all three files: 10 + 50 + 10 rows
    sample = merge_samples(files, (20, 90), n_const=8, n_dims=3,
                           constituents="ON", hlvs="OFF", verbose=False)
    assert len(sample["pt"]) == 70
    counts = {v: int(np.sum(sample["pt"] == v)) for v in (100.0, 200.0, 300.0)}
    assert counts == {100.0: 10, 200.0: 50, 300.0: 10}
    # per-file local indices preserved
    assert sample["m"][0] == 20.0  # first file starts at local index 20
    assert sample["m"][10] == 0.0  # second file starts at local index 0
