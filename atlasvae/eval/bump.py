"""Significance scans over discriminant cuts.

* ``bump_hunter``: one BumpHunter pass on a cut sample with adaptive
  min-count bins and a Gaussian fit of the bin-significance profile
  (ref OE-VAE/utils.py:467-529).
* ``bump_scan``: significance vs background-efficiency curve over ~100
  logit-spaced cuts.  The reference fans one OS process per cut, each
  running a full Python BumpHunter with npe=1000 pseudo-experiments whose
  global p-value is then *discarded* — only the data-only local sigma is
  plotted (ref OE-VAE/plots.py:285-291 + utils.py:494).  Here all cuts'
  histograms are built host-side (cheap) and the data scans execute as
  ONE vmapped device program (stats.batched_local_sigma) — ~1000x less
  work for the identical curve.
* ``generate_cuts``: background-suppression plots at fixed efficiencies
  (ref OE-VAE/plots.py:88-104).
"""

import os

import numpy as np

from ..utils.chunks import bin_edges, merged_bins
from ..stats import BumpHunter1D, batched_local_sigma, fit_gaussian
from .roc import get_rates, make_cut

_WIDTHS = (2, 3, 4, 5, 6)     # ref OE-VAE/utils.py:483
_STEPS = (1, 1, 1, 1, 1)


def pad_hist_matrices(data_hists, bkg_hists, n_rows_min):
    """Stack per-cut histograms into fixed compile-friendly matrices:
    the padded width is rounded up to a multiple of 32 and the row count
    up to the full cut grid, because the scan's one-time XLA compile
    (~20 s via the remote tunnel) is cached per shape while the adaptive
    bin count and surviving-cut count vary per evaluation.  Trailing
    zero bins/rows never scan (bkg=0 -> every window invalid).  Shared
    by the VAE and AAE cut scans — the alignment policy must not
    diverge between them."""
    nbins = -(-max(len(h) for h in data_hists) // 32) * 32
    n_rows = max(len(data_hists), n_rows_min)
    pad = lambda h: np.pad(h, (0, nbins - len(h)))
    data_mat = np.zeros((n_rows, nbins))
    bkg_mat = np.zeros((n_rows, nbins))
    data_mat[:len(data_hists)] = np.stack([pad(h) for h in data_hists])
    bkg_mat[:len(bkg_hists)] = np.stack([pad(h) for h in bkg_hists])
    return data_mat, bkg_mat


def _adaptive_bins(bkg_m, m_range, bin_size, logspace=False):
    m_min = max(m_range[0], float(np.min(bkg_m)))
    m_max = min(m_range[1], float(np.max(bkg_m)))
    if logspace:
        base = np.logspace(np.log10(max(1, m_min)), np.log10(m_max), num=100)
    else:
        base = bin_edges(m_max, bin_size, m_min)
    return merged_bins(bkg_m, base, min_bin_count=20)  # ref utils.py:477


def bump_hunter(sample, filename=None, sig_label=None, max_sigma=None,
                m_range=(0, 800), bin_size=5, print_info=False, logspace=False,
                npe=1000):
    """Full BumpHunter treatment of one (cut) sample; returns
    (loc_sigma, max_sigma) (ref OE-VAE/utils.py:467-501)."""
    y_true = np.where(sample["JZW"] == -1, 0, 1)
    data, data_weights = sample["m"], sample["weights"]
    bkg, bkg_weights = data[y_true == 1], data_weights[y_true == 1]
    bins = _adaptive_bins(bkg, m_range, bin_size, logspace)
    data_hist = np.histogram(data, bins=bins, range=m_range, weights=data_weights)[0]
    bkg_hist = np.histogram(bkg, bins=bins, range=m_range, weights=bkg_weights)[0]
    hunter = BumpHunter1D(rang=list(m_range), width_min=2, width_max=6,
                          width_step=1, scan_step=1, npe=npe, seed=None,
                          bins=bins)
    verbose = filename is not None and print_info
    hunter.bump_scan(data_hist, bkg_hist, is_hist=True, verbose=verbose)
    bin_sigma, bump_range = hunter.plot_bump(data_hist, bkg_hist, is_hist=True)
    gaussian_par = None
    try:
        gaussian_par = fit_gaussian(bins, bin_sigma, bump_range)
    except Exception:
        try:
            gaussian_par = fit_gaussian(bins, bin_sigma)
        except Exception:
            pass
    loc_sigma = hunter.bump_info(data_hist, is_hist=True, verbose=verbose)
    if max_sigma is None and gaussian_par is not None:
        max_sigma = gaussian_par[0] * gaussian_par[3]
    if filename is not None:
        from ..plotting.performance import plot_bump_result
        plot_bump_result(data, data_weights, y_true, bins, bin_sigma, loc_sigma,
                         max_sigma, bump_range, m_range, gaussian_par,
                         sig_label, filename)
    return loc_sigma, max_sigma


def bump_scan(y_true, x_loss, loss_metric, sample, sig_data, output_dir,
              n_cuts=100, eff_type="bkg", npe=1000, m_range=(0, 800),
              bin_size=5, make_plots=True):
    """Significance vs cut-efficiency curve; returns the best-cut record
    {'metric', 'eff', 'loss'} (ref OE-VAE/plots.py:262-332).

    TPU redesign: per-cut adaptive binning stays on the host; the
    n_cuts x (1 + npe) window scans run as one vmapped program.
    """
    def logit(x):
        return np.log10(x) - np.log10(1 - x)

    def inverse_logit(x):
        return 1 / (1 + 10 ** (-x))

    fpr, tpr, thresholds = get_rates(y_true, x_loss, sample["weights"])
    if eff_type == "sig":
        eff = tpr
        x_min, x_max = 10 * np.floor(tpr[0] / 10), 100
        eff_val = np.linspace(tpr[0], x_max, n_cuts)
    else:
        eff = fpr
        # the lowest threshold can pass zero bkg events (fpr == 0,
        # common on small/weighted samples): use the smallest positive
        # fpr so the logit grid and the log-x plot stay finite
        pos = fpr[fpr > 0]
        min_fpr = pos.min() if len(pos) else 1e-4
        x_min = min(10 ** np.ceil(np.log10(min_fpr)), 50.0)
        x_max = 100
        eff_val = np.append(
            100 * inverse_logit(np.linspace(logit(x_min / 100),
                                            -logit(x_min / 100), n_cuts)), 100)
    idx = np.minimum(np.searchsorted(eff, eff_val, side="right"), len(eff) - 1)
    sample = {key: sample[key] for key in ("JZW", "m", "pt", "weights")}

    # Build every cut's histograms host-side with its own adaptive bins.
    data_hists, bkg_hists, all_bins, kept = [], [], [], []
    for i in idx:
        cut = x_loss > thresholds[i]
        m_cut, w_cut = sample["m"][cut], sample["weights"][cut]
        jzw_cut = sample["JZW"][cut]
        bkg_m, bkg_w = m_cut[jzw_cut != -1], w_cut[jzw_cut != -1]
        if len(bkg_m) < 100:
            continue
        try:
            bins = _adaptive_bins(bkg_m, m_range, bin_size)
            data_hists.append(np.histogram(m_cut, bins=bins, weights=w_cut)[0])
            bkg_hists.append(np.histogram(bkg_m, bins=bins, weights=bkg_w)[0])
            all_bins.append(bins)
            kept.append(i)
        except Exception:
            continue
    if not kept:
        return None
    data_mat, bkg_mat = pad_hist_matrices(data_hists, bkg_hists, n_cuts + 1)
    # the plotted quantity is the data-only LOCAL sigma — no pseudo
    # experiments needed for the per-cut curve (the reference runs the
    # full npe=1000 pseudo scan per cut and then uses only loc_sigma,
    # ref OE-VAE/plots.py:285-291 + utils.py:494 return)
    loc_sigma, _, _, _ = map(np.asarray, batched_local_sigma(
        data_mat, bkg_mat, _WIDTHS, _STEPS))
    sigma = loc_sigma[:len(data_hists)]
    kept = np.asarray(kept)
    thresholds_k, eff_k = np.take(thresholds, kept), np.take(eff, kept)
    finite = np.isfinite(sigma)
    thresholds_k, eff_k, sigma = thresholds_k[finite], eff_k[finite], sigma[finite]
    if len(sigma) == 0:
        return None

    best = int(np.argmax(sigma))
    best_loss = {"metric": loss_metric, "eff": eff_k[best],
                 "loss": thresholds_k[best]}
    if make_plots and output_dir is not None:
        from ..plotting.performance import plot_sigma_scan
        plot_sigma_scan(eff_k, sigma, eff_type, x_min, x_max,
                        str(output_dir) + "/BH_sigma.png")
        cut_sample = {key: val[x_loss > best_loss["loss"]]
                      for key, val in sample.items()}
        sig_label = _sig_label(sig_data)
        bump_hunter(cut_sample, str(output_dir) + "/BH_best.png", sig_label,
                    print_info=False, npe=npe)
        from ..plotting.distributions import sample_distributions
        sample_distributions([sample, cut_sample], sig_data, output_dir,
                             "BH_bkg_supp", bin_sizes={"m": 2.5, "pt": 10})
    return best_loss


def _sig_label(sig_data):
    for token, tag in [("top", "Top"), ("VZ", "VZ"), ("BSM", "BSM"),
                       ("OoD", "OoD"), ("2HDM", "2HDM")]:
        if token in str(sig_data):
            return tag
    return "N.A."


def generate_cuts(y_true, sample, x_loss, loss_metric, sig_data, output_dir,
                  cut_types=("bkg_eff", "gain")):
    """Background-suppression plots at fixed bkg efficiencies and at the
    best gain/sigma cut (ref OE-VAE/plots.py:88-104)."""
    from ..plotting.distributions import sample_distributions
    print("\nAPPLYING CUTS ON SAMPLE:")
    out = os.path.join(str(output_dir), "bkg_suppression")
    os.makedirs(out, exist_ok=True)
    positive_rates = get_rates(y_true, x_loss, sample["weights"])
    for cut_type in cut_types:
        if cut_type == "bkg_eff":
            for bkg_eff in (1e-4, 1e-3, 1e-2, 1e-1, 1e0, 1e1):
                cut_sample = make_cut(y_true, x_loss, sample, positive_rates,
                                      loss_metric, cut_type, bkg_eff)
                name = f"bkg_suppression/bkg_eff_{bkg_eff:1.0e}"
                sample_distributions([sample, cut_sample], sig_data,
                                     output_dir, name)
        if cut_type in ("gain", "sigma"):
            cut_sample = make_cut(y_true, x_loss, sample, positive_rates,
                                  loss_metric, cut_type)
            sample_distributions([sample, cut_sample], sig_data, output_dir,
                                 f"bkg_suppression/best_{cut_type}")
