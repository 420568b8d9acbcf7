"""Training-history plot (ref OE-VAE/plots.py:946-963)."""

import pickle

import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np


def plot_history(hist_file, output_dir, first_epoch=0, x_step=10):
    print("PLOTTING TRAINING HISTORY:")
    if isinstance(hist_file, dict):
        losses = hist_file
    else:
        with open(hist_file, "rb") as f:
            losses = pickle.load(f)
    fig = plt.figure(figsize=(13, 8))
    axes = plt.gca()
    axes.grid(True)
    epochs = np.arange(1 + first_epoch, len(next(iter(losses.values()))) + 1)
    if len(epochs) <= 1:
        return
    for key, loss in losses.items():
        plt.plot(epochs, loss[first_epoch:], label=key, lw=2)
    plt.xlim(1, epochs[-1])
    plt.xticks(np.append(1, np.arange(x_step, epochs[-1] + x_step, x_step)))
    train = np.asarray(losses["Train loss"])
    if len(train) > 1 and np.isfinite(train[1:]).all():
        plt.ylim(0, min(50, float(np.max(train[1:]))))
    plt.xlabel("Epoch", fontsize=25)
    plt.ylabel("Loss", fontsize=25)
    plt.legend(loc="upper right", fontsize=18)
    file_name = str(output_dir) + "/train_history.png"
    print("Saving training history  to:", file_name)
    plt.savefig(file_name)
    plt.close(fig)
