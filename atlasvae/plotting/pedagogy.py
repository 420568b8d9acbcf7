"""Pedagogical / debug figures.

Compact equivalents of the reference's teaching and debug plots:
``deco_example`` — how per-cell CDF flattening decorrelates the
discriminant (ref OE-AAE/plots.py:1140-1688, a multi-panel walkthrough);
``cal_images`` — mean calorimeter images per class (ref
jet-ID/plots.py:382-448).
"""

import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

from ..eval.deco import cum_distribution, _apply_cdf, mass_deco


def deco_example(y_true, sample, x_loss, output_dir, m_window=(100, 200)):
    """Three-panel decorrelation walkthrough: (1) discriminant before,
    (2) the background CDF in one mass window, (3) discriminant after
    2-D flattening (ref OE-AAE/plots.py:1140-1688, condensed)."""
    y_true = np.asarray(y_true)
    x_loss = np.asarray(x_loss, np.float64)
    mass = np.asarray(sample["m"])
    in_window = (mass >= m_window[0]) & (mass < m_window[1])
    bkg_cell = x_loss[(y_true == 1) & in_window]
    fig, axes = plt.subplots(figsize=(18, 5), ncols=3)
    bins = np.linspace(0, 1, 40)
    for n, (label, color) in enumerate([("signal", "tab:orange"),
                                        ("QCD", "tab:blue")]):
        axes[0].hist(x_loss[y_true == n], bins, histtype="step", lw=2,
                     label=label, color=color, density=True)
    axes[0].set_xlabel("discriminant")
    axes[0].set_title("before decorrelation")
    axes[0].legend()
    values, cdf = cum_distribution(bkg_cell)
    grid = np.linspace(0, 1, 200)
    axes[1].plot(grid, _apply_cdf((values, cdf), grid), lw=2, color="tab:blue")
    axes[1].set_xlabel("discriminant")
    axes[1].set_ylabel("background CDF")
    axes[1].set_title(f"QCD CDF in m in [{m_window[0]}, {m_window[1]}) GeV")
    flat = mass_deco(y_true, sample, x_loss.copy(), deco="2d")
    for n, (label, color) in enumerate([("signal", "tab:orange"),
                                        ("QCD", "tab:blue")]):
        axes[2].hist(flat[y_true == n], bins, histtype="step", lw=2,
                     label=label, color=color, density=True)
    axes[2].set_xlabel("decorrelated discriminant")
    axes[2].set_title("after 2-D CDF flattening")
    axes[2].legend()
    out = f"{output_dir}/deco_example.png"
    print("Saving decorrelation example to:", out)
    plt.savefig(out, bbox_inches="tight")
    plt.close(fig)
    return flat


def cal_images(images, labels, output_dir, class_names=("signal", "background"),
               mode="mean"):
    """Mean (or std) detector image per class
    (ref jet-ID/plots.py:382-448, condensed to the per-class panels)."""
    images = np.asarray(images, np.float64)
    labels = np.asarray(labels)
    classes = sorted(set(labels))
    fig, axes = plt.subplots(figsize=(6 * len(classes), 5), ncols=len(classes))
    if len(classes) == 1:
        axes = [axes]
    for ax, cls in zip(axes, classes):
        img = images[labels == cls]
        panel = img.mean(axis=0) if mode == "mean" else img.std(axis=0)
        im = ax.imshow(panel, origin="lower", cmap="viridis", aspect="auto")
        name = class_names[cls] if cls < len(class_names) else f"class {cls}"
        ax.set_title(f"{name} ({mode})")
        plt.colorbar(im, ax=ax, fraction=0.046)
    out = f"{output_dir}/cal_images_{mode}.png"
    print("Saving calorimeter images to:", out)
    plt.savefig(out, bbox_inches="tight")
    plt.close(fig)
