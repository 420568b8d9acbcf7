"""Plotting smoke tests: every plot function writes its artifact."""

import os

import numpy as np
import pytest

from atlasvae.plotting import (plot_bump_histogram, plot_stat_distribution,
                               plot_tomography, plot_history,
                               plot_distributions, sample_distributions,
                               combine_roc_curves, bin_meshgrid,
                               plot_discriminant, binary_dics_eff)
from atlasvae.plotting.performance import (plot_sigma_scan, loss_distributions,
                                           mass_correlation, roc_curves)
from atlasvae.plotting.pedagogy import deco_example, cal_images


@pytest.fixture()
def sample(rng):
    n = 3000
    return {
        "m": rng.uniform(30, 500, n).astype(np.float32),
        "pt": rng.uniform(450, 1100, n).astype(np.float32),
        "weights": np.ones(n, np.float32),
        "JZW": np.where(rng.random(n) < 0.2, -1.0, 0.0).astype(np.float32),
    }


def test_bump_plots(tmp_path, rng):
    bins = np.linspace(0, 100, 21)
    bkg = np.full(20, 100.0)
    data = rng.poisson(bkg).astype(float)
    sig = rng.normal(0, 1, 20)
    plot_bump_histogram(data, bkg, bins, sig, (30, 50), (0, 100),
                        filename=str(tmp_path / "bump.png"))
    plot_stat_distribution(rng.exponential(2, 101), 0.3, True,
                           str(tmp_path / "stat.png"))
    plot_tomography(bins, [np.full(20, 0.5), np.full(20, 0.3)], (2, 3),
                    str(tmp_path / "tomo.png"))
    assert {"bump.png", "stat.png", "tomo.png"} <= set(os.listdir(tmp_path))


def test_history_and_distributions(tmp_path, sample):
    plot_history({"Train loss": [3.0, 2.0, 1.5], "Valid loss": [3.2, 2.4, 1.9]},
                 tmp_path)
    sample_distributions(sample, "top-Geneva", tmp_path, "drive")
    plot_distributions([sample, {k: v[:100] for k, v in sample.items()}],
                       "2HDM", "m", {"m": 10, "pt": 20}, tmp_path, "cutpair.png")
    names = set(os.listdir(tmp_path))
    assert {"train_history.png", "drive_m.png", "drive_pt.png",
            "cutpair.png"} <= names


def test_performance_plots(tmp_path, rng, sample):
    y_true = np.where(sample["JZW"] == -1, 0, 1)
    losses = {"MAE": np.clip(rng.beta(2, 2, len(y_true)) + (y_true == 0) * 0.2, 0, 1),
              "KLD": rng.random(len(y_true))}
    plot_sigma_scan(np.logspace(-2, 2, 40), rng.uniform(0, 5, 40), "bkg",
                    1e-2, 100, str(tmp_path / "BH_sigma.png"))
    roc_curves(y_true, losses, sample["weights"], ["MAE", "KLD"], tmp_path)
    mass_correlation(y_true, losses, sample["m"], sample["weights"],
                     ["MAE"], "MAE", tmp_path)
    loss_distributions(y_true, losses["MAE"], sample["weights"], "MAE",
                       tmp_path, {"metric": "MAE", "loss": 0.6})
    names = set(os.listdir(tmp_path))
    assert {"BH_sigma.png", "bkg_rejection.png", "signal_gain.png",
            "mass_correlation.png", "metrics_losses"} <= names


def test_aae_and_extra_plots(tmp_path, rng, sample):
    y_true = np.where(sample["JZW"] == -1, 0, 1)
    loss = np.clip(rng.beta(2, 2, len(y_true)) + (y_true == 0) * 0.15, 0, 1)
    plot_discriminant(y_true, loss, sample["weights"], tmp_path, "Top",
                      {"Autoencoder": 0.6}, "Autoencoder")
    binary_dics_eff(rng.uniform(0, 1, 50), rng.uniform(1e-4, 1, 50), tmp_path)
    combine_roc_curves({"A": (np.linspace(1e-3, 1, 30), np.linspace(0.3, 1, 30))},
                       tmp_path)
    bin_meshgrid([0, 1], [0, 1], rng.uniform(1, 3, (2, 2)),
                 str(tmp_path / "grid.png"))
    deco_example(y_true, sample, loss, tmp_path)
    imgs = rng.exponential(1, (200, 8, 8))
    cal_images(imgs, y_true[:200], tmp_path)
    names = set(os.listdir(tmp_path))
    assert {"discriminant_Autoencoder.png", "ROC_2d_cuts.png", "ROC_curves.png",
            "grid.png", "deco_example.png", "cal_images_mean.png"} <= names


def test_deco_walkthrough_full_bank(tmp_path):
    """The analytic figure bank (ref OE-AAE/plots.py:1140-1688): all
    panels emit, and the flattening math is exact — the pushforward of
    the background under its own CDF is uniform, and on a base-e logit
    axis its density peaks at exactly 1/4."""
    from atlasvae.plotting.pedagogy import (deco_walkthrough,
                                            _pushforward_hist,
                                            _quartic_coeff, _poly_pdf,
                                            _poly_cdf, _maxwell_cdf)
    c = _quartic_coeff()
    # the quartic satisfies its defining constraints (f(0)=f(1)=0, int=1)
    assert abs(_poly_pdf(0.0, c)) < 1e-12
    assert abs(_poly_pdf(1.0, c)) < 1e-12
    assert abs(_poly_cdf(1.0, c) - 1.0) < 1e-12
    F_bkg = lambda v: _poly_cdf(v, c)                      # noqa: E731
    F_sig = lambda v: 1 - _maxwell_cdf(1 - v, 0.12)        # noqa: E731
    new_x, hist_bkg, hist_sig = _pushforward_hist(F_bkg, F_sig)
    g = hist_bkg / np.diff(new_x)
    assert abs(g.mean() - 1.0) < 1e-3 and g.std() < 0.02   # uniform
    files = deco_walkthrough(tmp_path, extras=True)
    names = {os.path.basename(f) for f in files}
    assert {"deco_0.png", "deco_1a.png", "deco_1b.png", "deco_1c.png",
            "deco_1d.png", "deco_2a.png", "deco_2b.png", "deco_2c.png",
            "deco_2d.png", "deco_AUC.png", "deco_uncut.png", "deco_cut.png",
            "deco_distributions.png", "deco_ROC_curve.png",
            "deco_gain_curve.png", "deco_sigma_curve.png"} == names
    assert all(os.path.getsize(f) > 0 for f in files)


def test_jetid_track_scalar_debug_plots(tmp_path, rng):
    """Track/scalar debug plots (ref jet-ID/plots.py:449-550)."""
    from atlasvae.plotting.pedagogy import (plot_tracks, plot_scalars,
                                            plot_vertex)
    tracks = rng.normal(0, 0.01, (300, 12, 5))
    tracks[rng.uniform(size=(300, 12)) > 0.6] = 0  # variable track counts
    labels = rng.integers(0, 3, 300)
    for var in ("efrac", "deta", "d0"):
        out1, out2 = plot_tracks(tracks, labels, var, tmp_path)
        assert os.path.getsize(out1) and os.path.getsize(out2)
    s = {"pt": rng.exponential(1, 400)}
    st = {"pt": rng.uniform(-1, 1, 400)}
    assert os.path.getsize(plot_scalars(s, st, "pt", tmp_path))
    assert os.path.getsize(plot_vertex(rng.integers(0, 9, 500), tmp_path))


def test_class_distributions_and_background_rejection(tmp_path, rng):
    """Per-class probability distributions (ref jet-ID/plots.py:128-244)
    and background rejection at fixed signal efficiencies
    (ref jet-ID/utils.py:601-606)."""
    from atlasvae.plotting.performance import (class_distributions,
                                               background_rejection)
    n = 2000
    labels = rng.integers(0, 2, n)
    probs = np.zeros((n, 2), np.float32)
    # class 0 (signal) gets high signal-probability scores
    probs[:, 0] = np.clip(rng.normal(0.8, 0.15, n) * (labels == 0)
                          + rng.normal(0.2, 0.15, n) * (labels == 1), 0, 1)
    probs[:, 1] = 1 - probs[:, 0]
    w = rng.uniform(0.5, 2.0, n)
    class_distributions(labels, probs, w, tmp_path)
    assert os.path.getsize(os.path.join(tmp_path, "distributions.png"))
    rej = background_rejection(labels, probs, w)
    assert set(rej) == {90, 80, 70}
    # rejection grows monotonically as the working point tightens
    assert rej[70] >= rej[80] >= rej[90] >= 1.0
