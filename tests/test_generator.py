"""BatchGenerator tests: load arithmetic, double-buffered iteration."""

import numpy as np
import pytest

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


def test_stream_prep_placement(monkeypatch):
    """Multi-load streaming prep pins to the host CPU backend on
    accelerators ('auto'), stays put on CPU backends, and honors the
    explicit 'device'/'cpu' overrides (ATLASVAE_STREAM_PREP)."""
    import contextlib
    import jax
    from atlasvae.data.generator import _stream_prep_context

    # on the CPU test backend: always a no-op context
    assert isinstance(_stream_prep_context(8), contextlib.nullcontext)

    # pretend we're on an accelerator
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    ctx = _stream_prep_context(8)
    assert not isinstance(ctx, contextlib.nullcontext)
    with ctx:  # usable as a context manager and pins to a cpu device
        assert jax.numpy.zeros(3).devices() == {jax.devices("cpu")[0]}

    # single-load epochs keep device prep (LoadCache pays it once)
    assert isinstance(_stream_prep_context(1), contextlib.nullcontext)
    monkeypatch.setenv("ATLASVAE_STREAM_PREP", "cpu")
    assert not isinstance(_stream_prep_context(1), contextlib.nullcontext)
    monkeypatch.setenv("ATLASVAE_STREAM_PREP", "device")
    assert isinstance(_stream_prep_context(8), contextlib.nullcontext)


def test_iter_propagates_worker_exception(synth_dir):
    """A failing load in the prefetch worker must raise in the consumer,
    not leave it blocked forever on an empty queue."""
    gen = BatchGenerator("QCD-Geneva", "OoD-H", 10, 3, [0, 3000],
                         weight_type="None", constituents="OFF", hlvs="ON",
                         mem_gb=12e-6)
    assert len(gen) >= 3
    boom = RuntimeError("simulated load failure")

    orig = gen._prepare_load

    def failing(idx):
        if idx == 1:
            raise boom
        return orig(idx)

    gen._prepare_load = failing
    it = iter(gen)
    next(it)  # load 0 succeeds
    with pytest.raises(RuntimeError, match="simulated load failure"):
        next(it)


def test_self_paired_ood_is_scaled(synth_dir):
    """With ood_sample=None the OoD side is derived from the raw
    background load; its features must get the same scaling as the
    background or the OE loss compares mismatched feature spaces."""
    from atlasvae.data.scalers import fit_scaler
    head = load_data("QCD-Geneva", 2000, n_const=10, n_dims=3,
                     constituents="OFF", hlvs="ON", verbose=False)
    scaler = fit_scaler(head["HLVs"], 3, scaler_type="RobustScaler",
                        verbose=False)
    gen = BatchGenerator("QCD-Geneva", "QCD-Geneva", 10, 3, [0, 2000],
                         ood_sample=None, weight_type="None",
                         constituents="OFF", hlvs="ON", hlv_scaler=scaler)
    bkg, ood = gen[0]
    # scaled feature spaces overlap: per-column scale of the OoD side
    # matches the background side (raw HLVs differ by orders of magnitude)
    b_spread = np.percentile(bkg["HLVs"], 95, axis=0) - \
        np.percentile(bkg["HLVs"], 5, axis=0)
    o_spread = np.percentile(ood["HLVs"], 95, axis=0) - \
        np.percentile(ood["HLVs"], 5, axis=0)
    ratio = o_spread / np.maximum(b_spread, 1e-9)
    assert np.all((ratio > 0.2) & (ratio < 5.0)), ratio


def test_multi_load_generator_yields_host_arrays(synth_dir):
    """Streaming loads hand out plain numpy (no committed device buffers
    leak into the trainer), and the double-buffered iterator covers the
    full index range exactly once."""
    from atlasvae.data.generator import BatchGenerator
    gen = BatchGenerator("QCD-Geneva", "OoD-H", 10, 3, [0, 3000],
                         weight_type="None", constituents="OFF", hlvs="ON",
                         mem_gb=12e-6)  # tiny budget -> multi-load
    assert len(gen) >= 3
    total = 0
    for bkg, ood in gen:
        assert type(bkg["HLVs"]) is np.ndarray
        assert type(ood["weights"]) is np.ndarray
        total += len(bkg["HLVs"])
    assert total == 3000


def test_heap_reuse_knob(monkeypatch):
    """Streaming epochs enable malloc-arena reuse (utils/hostmem.py):
    applies on glibc, idempotent, and honors the ATLASVAE_HEAP_REUSE=0
    opt-out."""
    import atlasvae.utils.hostmem as hm
    monkeypatch.setattr(hm, "_applied", 0)
    monkeypatch.setenv("ATLASVAE_HEAP_REUSE", "0")
    assert hm.enable_heap_reuse() is False
    monkeypatch.delenv("ATLASVAE_HEAP_REUSE")
    assert hm.enable_heap_reuse() is True     # glibc in this image
    assert hm.enable_heap_reuse() is True     # idempotent
