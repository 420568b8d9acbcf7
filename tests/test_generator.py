"""BatchGenerator tests: load arithmetic, double-buffered iteration."""

import numpy as np

from atlasvae.data import BatchGenerator, load_data


def test_generator_load_count_and_budget(synth_dir):
    # tiny memory budget forces multiple loads per epoch
    gen = BatchGenerator("QCD-Geneva", "OoD-H", n_const=20, n_dims=3,
                         n_bkg=[0, 3000], constituents="OFF", hlvs="ON",
                         mem_gb=20 * 3 * 4 * 1000 / 1e9)  # 1000-jet loads
    assert gen.load_size == 1000
    assert len(gen) == 3


def test_generator_prefetch_iteration_matches_indexing(synth_dir):
    ood = load_data("OoD-H", 4000, n_const=20, n_dims=3, constituents="OFF",
                    hlvs="ON", verbose=False)
    kwargs = dict(n_const=20, n_dims=3, n_bkg=[0, 2000], ood_sample=ood,
                  weight_type="None", constituents="OFF", hlvs="ON",
                  bin_sizes={"m": 10, "pt": 20},
                  mem_gb=20 * 3 * 4 * 1000 / 1e9)
    gen = BatchGenerator("QCD-Geneva", "OoD-H", **kwargs)
    direct = [gen[i] for i in range(len(gen))]
    iterated = list(iter(BatchGenerator("QCD-Geneva", "OoD-H", **kwargs)))
    assert len(iterated) == len(direct) == 2
    for (b1, o1), (b2, o2) in zip(direct, iterated):
        np.testing.assert_array_equal(b1["HLVs"], b2["HLVs"])
        np.testing.assert_array_equal(o1["HLVs"], o2["HLVs"])
        assert len(b1["m"]) == len(o1["m"])  # pairing aligns 1:1
