"""Weighted ROC rates and threshold selection on device.

The reference computes ROC curves with sklearn on the host
(ref OE-VAE/plots.py:228-232 ``get_rates``, :235-247 ``best_threshold``,
:250-259 ``make_cut``).  Here the sorted cumulative-weight sweep is one
jitted program; multi-million-jet curves take one device launch.
Convention preserved: the *signal* carries label 0 (``pos_label=0``),
fpr/tpr are percentages, and zero-fpr points are dropped.
"""

import jax
import jax.numpy as jnp
import numpy as np


@jax.jit
def _roc_kernel(scores, is_positive, weights):
    order = jnp.argsort(-scores)
    s = scores[order]
    pos_w = (weights * is_positive)[order]
    neg_w = (weights * (1.0 - is_positive))[order]
    tps = jnp.cumsum(pos_w)
    fps = jnp.cumsum(neg_w)
    return s, tps / jnp.maximum(tps[-1], 1e-30), fps / jnp.maximum(fps[-1], 1e-30)


def roc_rates(y_true, scores, weights=None):
    """(fpr, tpr, thresholds) with pos_label=0 (signal), descending
    thresholds; fractional rates in [0, 1]."""
    y_true = np.asarray(y_true)
    scores = np.asarray(scores, np.float32)
    if weights is None:
        weights = np.ones_like(scores)
    is_pos = (y_true == 0).astype(np.float32)
    thr, tpr, fpr = map(np.asarray, _roc_kernel(
        jnp.asarray(scores), jnp.asarray(is_pos),
        jnp.asarray(np.asarray(weights, np.float32))))
    # keep last point per unique threshold (sklearn-style curve); float32
    # cumsum jitter can break monotonicity by ~1e-7 — enforce it
    keep = np.append(np.diff(thr) != 0, True)
    fpr = np.maximum.accumulate(fpr[keep])
    tpr = np.maximum.accumulate(tpr[keep])
    return fpr, tpr, thr[keep]


def get_rates(y_true, x_loss, weights, metric=None, return_dict=None):
    """Percent-scaled rates with fpr==0 points dropped
    (ref OE-VAE/plots.py:228-232)."""
    fpr, tpr, thresholds = roc_rates(y_true, x_loss, weights)
    mask = fpr != 0
    out = (100 * fpr[mask], 100 * tpr[mask], thresholds[mask])
    if return_dict is None:
        return out
    return_dict[metric] = out


def auc_score(y_true, scores, weights=None):
    """Weighted ROC AUC (signal = label 0), trapezoidal."""
    fpr, tpr, _ = roc_rates(y_true, scores, weights)
    fpr = np.concatenate([[0.0], fpr, [1.0]])
    tpr = np.concatenate([[0.0], tpr, [1.0]])
    return float(np.trapezoid(tpr, fpr))


def best_threshold(y_true, positive_rates, weights, cut_type, min_tpr=1.0):
    """Best gain (tpr/fpr) or significance (tpr/sqrt(fpr)) cut
    (ref OE-VAE/plots.py:235-247)."""
    fpr, tpr, thresholds = positive_rates
    sel = tpr > min_tpr
    fpr, tpr, thresholds = fpr[sel], tpr[sel], thresholds[sel]
    if cut_type == "gain":
        cut_values = tpr / fpr
        factor = 1.0
    elif cut_type == "sigma":
        cut_values = tpr / np.sqrt(fpr)
        n_sig = np.sum(weights[y_true == 0])
        n_bkg = np.sum(weights[y_true == 1])
        factor = n_sig / np.sqrt(n_bkg) / 10
    else:
        raise ValueError(cut_type)
    idx = int(np.argmax(cut_values))
    return thresholds[idx], cut_values[idx] * factor


def make_cut(y_true, x_loss, sample, positive_rates, metric, cut_type,
             bkg_eff=None):
    """Apply the best (or fixed-bkg-eff) threshold to the sample dict
    (ref OE-VAE/plots.py:250-259)."""
    if bkg_eff is None:
        loss_cut, loss_val = best_threshold(y_true, positive_rates,
                                            sample["weights"], cut_type)
        print(f"Best {metric} cut on {cut_type:4s}  -->  {metric} >= "
              f"{loss_cut:.3f} / best {cut_type:4s} = {loss_val:>4.2f}")
    else:
        fpr, tpr, thresholds = positive_rates
        loss_cut = thresholds[int(np.argmin(np.abs(fpr - bkg_eff)))]
    return {key: val[x_loss > loss_cut] for key, val in sample.items()}
