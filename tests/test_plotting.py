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
