"""AAE evaluation: discriminants, weight adjustment, cut scans.

Re-implements the OE-AAE eval layer (ref OE-AAE/utils.py:39-79
``get_data``, :406-413 ``adjust_weights``, :471-506
``make_discriminant``; OE-AAE/plots.py:262-385 ``bump_scan`` /
``bump_scan_2d``) on the batched device programs:

* the two inference heads (AE reconstruction, discriminator class-2
  probability) are jitted chunked forwards,
* the n_cuts^2 two-discriminant grid — 10,000 BumpHunter runs in the
  reference, one OS process each — becomes a 3-D histogram over
  (cut-rank-1, cut-rank-2, mass) followed by two suffix cumulative sums
  (every cut pair's mass spectrum at once) and ONE vmapped local-sigma
  scan (stats.batched_local_sigma).
"""

import numpy as np
import jax
import jax.numpy as jnp

from ..models.aae import ae_apply, discriminator_apply
from ..utils.chunks import bin_edges
from ..stats import batched_local_sigma
from .roc import get_rates
from .deco import mass_deco
from .bump import _adaptive_bins, bump_hunter, pad_hist_matrices, \
    _WIDTHS, _STEPS


def aae_loss_mapping(x):
    """AAE variant of the [0,1] mapping (ref OE-AAE/utils.py:41-47:
    the negative branch uses 1/(1-x))."""
    x = np.asarray(x)
    if np.all((x >= 0) & (x <= 1)):
        return x
    if np.all((x >= -1) & (x <= 0)):
        return x + 1
    if np.all(x >= 0):
        return x / (1 + x)
    if np.all(x <= 0):
        return 1 / (1 - x)
    return (x / (np.abs(x) + 1) + 1) / 2


def adjust_weights(sample, y_true, bin_size=5, m_range=None, factor=10 ** 0.5):
    """Signal-peak normalization factor (ref OE-AAE/utils.py:406-413)."""
    m_sig, m_bkg = sample["m"][y_true == 0], sample["m"][y_true == 1]
    w_sig, w_bkg = sample["weights"][y_true == 0], sample["weights"][y_true == 1]
    m_bins = bin_edges(np.max(m_sig), bin_size)
    h_sig = np.histogram(m_sig, m_bins, m_range, weights=w_sig)[0]
    h_bkg = np.histogram(m_bkg, m_bins, m_range, weights=w_bkg)[0]
    idx = np.argmax(h_sig)
    return factor * h_sig[idx] / max(h_bkg[idx], 1e-30)


def make_discriminant(p, q, metric="MAE", delta=1e-32):
    """Per-jet discriminant between true/reconstructed feature matrices
    (ref OE-AAE/utils.py:471-506; JSD here is the sqrt variant)."""
    p = np.asarray(p, np.float64)
    q = np.asarray(q, np.float64)
    if metric in ("JSD", "KLD", "X-S", "MARE"):
        p = np.maximum(p, delta)
        q = np.maximum(q, delta)
    if metric == "MSE":
        return np.mean((p - q) ** 2, axis=1)
    if metric == "MAE":
        return np.mean(np.abs(p - q), axis=1)
    if metric == "MARE":
        return np.mean(np.abs(p - q) / p, axis=1)

    def kld(a, b):
        with np.errstate(all="ignore"):
            return np.nan_to_num(a * np.log2(a / b))

    if metric in ("JSD", "KLD", "X-S"):
        p = p / np.sum(p, axis=1)[:, None]
        q = q / np.sum(q, axis=1)[:, None]
    if metric == "KLD":
        return np.sum(kld(p, q), axis=1)
    if metric == "JSD":
        m = (p + q) / 2
        return np.sqrt(np.sum((kld(p, m) + kld(q, m)) / 2, axis=1))
    if metric == "X-S":
        return np.sum(kld(p, p * q), axis=1)
    raise ValueError(metric)


def aae_inference(params, x_true, chunk=100_000):
    """(AE reconstructions, discriminator class-2 probabilities)."""
    recon_fn = jax.jit(ae_apply)
    disc_fn = jax.jit(discriminator_apply)
    x_true = np.asarray(x_true, np.float32)
    recon, disc = [], []
    for i in range(0, len(x_true), chunk):
        xb = jnp.asarray(x_true[i:i + chunk])
        recon.append(np.asarray(recon_fn(params, xb)))
        disc.append(np.asarray(disc_fn(params, xb)))
    return np.concatenate(recon), np.concatenate(disc)


def get_data(params, sample, y_true, x_true, normal_loss="ON", deco="OFF"):
    """Assemble the three AAE discriminants (+mapping, +decorrelation)
    (ref OE-AAE/utils.py:39-79).  ``sample['weights']`` should already
    carry the adjust_weights normalization."""
    x_auto, x_disc = aae_inference(params, x_true)
    x_loss = {
        "Autoencoder": make_discriminant(x_true, x_auto, metric="MAE"),
        "Discriminator": x_disc[:, 2],
    }
    x_loss["Auto+Disc"] = (x_loss["Autoencoder"] + x_loss["Discriminator"]) / 2
    on = lambda f: (f.upper() == "ON") if isinstance(f, str) else bool(f)
    if on(normal_loss) or deco in ("m", "pt", "2d"):
        x_loss = {k: aae_loss_mapping(v) for k, v in x_loss.items()}
    if deco in ("m", "pt", "2d"):
        x_loss = {k: mass_deco(y_true, sample, v, deco=deco)
                  for k, v in x_loss.items()}
    return x_loss


def aae_bump_scan(y_true, x_loss, disc_name, sample, sig_label, output_dir,
                  n_cuts=100, m_range=(0, 800), make_plots=True):
    """Normalized significance scan over one discriminant's cuts
    (ref OE-AAE/plots.py:262-314: sigma_cut/sigma_uncut curves, BH_uncut
    + BH_best artifacts).  Returns the best-cut record."""
    fpr, tpr, thresholds = get_rates(y_true, x_loss, sample["weights"])
    x_min = np.min(fpr)
    eff_val = np.logspace(np.log10(x_min), np.log10(100), num=n_cuts)
    idx = np.minimum(np.searchsorted(fpr, eff_val, side="right"), len(fpr) - 1)
    sample = {key: sample[key] for key in ("JZW", "m", "pt", "weights")}

    data_hists, bkg_hists, kept = [], [], []
    for i in idx:
        cut = x_loss >= thresholds[i]
        jzw_c, m_c, w_c = sample["JZW"][cut], sample["m"][cut], sample["weights"][cut]
        bkg_m, bkg_w = m_c[jzw_c != -1], w_c[jzw_c != -1]
        if len(bkg_m) < 100:
            continue
        try:
            bins = _adaptive_bins(bkg_m, m_range, 5)
        except Exception:
            continue
        data_hists.append(np.histogram(m_c, bins=bins, weights=w_c)[0])
        bkg_hists.append(np.histogram(bkg_m, bins=bins, weights=bkg_w)[0])
        kept.append(i)
    if not kept:
        return None
    data_mat, bkg_mat = pad_hist_matrices(data_hists, bkg_hists, n_cuts)
    loc_sigma, _, _, bin_sigma = map(np.asarray, batched_local_sigma(
        data_mat, bkg_mat, _WIDTHS, _STEPS))
    loc_sigma = loc_sigma[:len(data_hists)]
    bin_sigma = bin_sigma[:len(data_hists)]
    max_sigma = bin_sigma.max(axis=1)
    finite = np.isfinite(loc_sigma) & np.isfinite(max_sigma)
    kept = np.asarray(kept)[finite]
    loc_sigma, max_sigma = loc_sigma[finite], max_sigma[finite]
    if len(kept) == 0:
        return None
    cut_thresholds = np.take(thresholds, kept)
    cut_eff = np.take(fpr, kept)
    opt_max_sigma = float(np.max(max_sigma))
    # normalized curve sigma_cut / sigma_uncut (ref plots.py:296-297).
    # Only the LOCAL-sigma curve is plotted: the reference normalizes
    # max_sigma too but its max-sigma trace is commented out in
    # plot_significance (ref OE-AAE/plots.py:398-399)
    loc_norm = loc_sigma / loc_sigma[-1]
    best = int(np.argmax(loc_norm))
    best_cut = {"cuts": {disc_name: cut_thresholds[best]}}
    best_cut["sig_eff"] = tpr[np.argmin(np.abs(thresholds - cut_thresholds[best]))]
    best_cut["bkg_eff"] = fpr[np.argmin(np.abs(thresholds - cut_thresholds[best]))]
    if make_plots and output_dir is not None:
        from ..plotting.performance import plot_sigma_scan
        plot_sigma_scan(cut_eff, loc_norm, "bkg", max(x_min, 1e-4), 100,
                        str(output_dir) + "/BH_sigma.png")
        cut_sample = {k: v[x_loss > cut_thresholds[best]] for k, v in sample.items()}
        bump_hunter(sample, str(output_dir) + "/BH_uncut.png", sig_label,
                    max_sigma=opt_max_sigma)
        bump_hunter(cut_sample, str(output_dir) + "/BH_best.png", sig_label,
                    max_sigma=opt_max_sigma)
        from ..plotting.distributions import sample_distributions
        sample_distributions([sample, cut_sample], sig_label, output_dir,
                             "BH_bkg_supp", bin_sizes={"m": 5, "pt": 10})
    return best_cut


def aae_bump_scan_2d(y_true, x_loss, sample, sig_label, output_dir,
                     n_cuts=40, m_range=(0, 800), make_plots=True):
    """Two-discriminant (AE x Disc) threshold grid scan
    (ref OE-AAE/plots.py:317-385: n_cuts^2 BumpHunter runs via mp.Pool).

    TPU redesign: a single 3-D weighted histogram over (AE-cut rank,
    Disc-cut rank, mass bin) + suffix cumsums along the two rank axes
    yields EVERY cut pair's mass spectrum; local sigmas come from one
    vmapped scan.  Shared adaptive bins derived from the uncut
    background (the reference re-merges per cut; divergence documented).
    Returns the best 2-D cut record.
    """
    names = ("Autoencoder", "Discriminator")
    loss_1, loss_2 = (np.asarray(x_loss[n], np.float64) for n in names)
    sample = {key: sample[key] for key in ("JZW", "m", "pt", "weights")}
    w = sample["weights"]

    def cut_grid(loss):
        fpr, _, thresholds = get_rates(y_true, loss, w)
        eff_val = np.logspace(np.log10(np.min(fpr)), np.log10(100), num=n_cuts)
        idx = np.minimum(np.searchsorted(fpr, eff_val, side="left"), len(fpr) - 1)
        return np.take(thresholds, idx)

    thr_1, thr_2 = cut_grid(loss_1), cut_grid(loss_2)
    # rank of the finest threshold each jet passes: jet contributes to all
    # cut pairs (i, j) with thr_1[i] <= loss_1 and thr_2[j] <= loss_2
    order_1 = np.argsort(thr_1)
    order_2 = np.argsort(thr_2)
    r1 = np.searchsorted(thr_1[order_1], loss_1, side="right") - 1
    r2 = np.searchsorted(thr_2[order_2], loss_2, side="right") - 1
    bkg_mask = y_true == 1
    bins = _adaptive_bins(sample["m"][bkg_mask], m_range, 5)
    m_idx = np.clip(np.digitize(sample["m"], bins), 1, len(bins) - 1) - 1
    nbins = len(bins) - 1

    def grid_hist(select):
        keep = select & (r1 >= 0) & (r2 >= 0)
        h = np.zeros((n_cuts, n_cuts, nbins), np.float64)
        np.add.at(h, (r1[keep], r2[keep], m_idx[keep]), w[keep])
        # suffix cumsum: pair (i, j) sums all ranks >= (i, j)
        h = np.cumsum(h[::-1], axis=0)[::-1]
        h = np.cumsum(h[:, ::-1], axis=1)[:, ::-1]
        return h

    inside = (sample["m"] >= bins[0]) & (sample["m"] <= bins[-1])
    data_h = grid_hist(inside)
    bkg_h = grid_hist(inside & bkg_mask)
    sig_h = grid_hist(inside & ~bkg_mask)
    flat_data = data_h.reshape(-1, nbins).astype(np.float32)
    flat_bkg = bkg_h.reshape(-1, nbins).astype(np.float32)
    loc_sigma, _, _, bin_sigma = map(np.asarray, batched_local_sigma(
        flat_data, flat_bkg, _WIDTHS, _STEPS))
    max_sigma = bin_sigma.max(axis=1)
    tpr = sig_h.sum(axis=2).reshape(-1) / max(np.sum(w[~bkg_mask]), 1e-30)
    fpr = bkg_h.sum(axis=2).reshape(-1) / max(np.sum(w[bkg_mask]), 1e-30)

    finite = np.isfinite(loc_sigma) & (flat_bkg.sum(axis=1) > 0)
    if not np.any(finite):
        return None
    flat_idx = np.arange(n_cuts * n_cuts)[finite]
    best_flat = flat_idx[int(np.argmax(loc_sigma[finite]))]
    i, j = best_flat // n_cuts, best_flat % n_cuts
    best_cuts = {
        "cuts": {names[0]: thr_1[order_1][i], names[1]: thr_2[order_2][j]},
        "sig_eff": 100 * tpr[best_flat],
        "bkg_eff": 100 * fpr[best_flat],
    }
    if make_plots and output_dir is not None:
        from ..plotting.aae_plots import binary_dics_eff
        binary_dics_eff(tpr, fpr, output_dir, sig_label, fpr[best_flat])
        cuts = (loss_1 >= best_cuts["cuts"][names[0]]) & \
               (loss_2 >= best_cuts["cuts"][names[1]])
        cut_sample = {k: v[cuts] for k, v in sample.items()}
        opt_max = float(max_sigma[best_flat])
        bump_hunter(sample, str(output_dir) + "/BH_uncut.png", sig_label,
                    max_sigma=opt_max)
        if np.sum(cuts & bkg_mask) >= 100:
            bump_hunter(cut_sample, str(output_dir) + "/BH_best.png", sig_label,
                        max_sigma=opt_max)
        from ..plotting.distributions import sample_distributions
        sample_distributions([sample, cut_sample], sig_label, output_dir,
                             "BH_bkg_supp", bin_sizes={"m": 5, "pt": 10})
    return best_cuts
