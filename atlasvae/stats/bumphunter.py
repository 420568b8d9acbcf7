"""BumpHunter1D as a vectorized TPU program.

Re-implements the reference's vendored pyBumpHunter fork
(ref OE-VAE/BumpHunter/bumphunter_1dim.py, arXiv:1101.0390) with the
same public surface (``bump_scan``, ``plot_bump``, ``bump_info``,
``plot_stat``, ``plot_tomography``, ``signal_inject``,
``save_state``/``load_state``/``reset``) and a redesigned core:

* the (width x position) window scan is one fixed-shape array program:
  windowed counts via cumulative sums, per-window Poisson p-values via
  the log-space regularized incomplete gamma (atlasvae.ops.gammainc),
  masked min-reduction over windows (ref ``_scan_hist``
  :326-475 loops in Python per width and position);
* the npe pseudo-experiments are one ``jax.random.poisson`` draw and a
  vmapped scan — data + 1000 pseudo scans execute as a single device
  launch (ref loops one thread per scan, :1108-1190);
* p-values are carried as **log p** end-to-end, so extreme significances
  need no mpmath (ref :17, dps=1000; see ops/gammainc.py docstring) and
  the sigma ceiling disappears.

Behavioral parity notes: t = -ln(min p) (ref :1194); global p-value =
fraction of pseudo t >= t_data with the 0-case lower limit
-ndtri(1/npe) (ref :1196-1219 #DG); per-bin signed significances as in
``plot_bump`` (ref :1772-1794); empty-window widths fall back to p=1
(ref :402-407).
"""

import abc
import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.gammainc import log_gammainc_lower, log_gammainc_upper, sigma_from_log_pval
from .deprecation import deprecated, warn_legacy_arg


# --------------------------------------------------------------- core scan

@functools.partial(jax.jit, static_argnames=("widths", "scan_steps", "mode",
                                              "use_sideband", "sideband_width"))
def scan_histograms(hists, ref, widths, scan_steps, hinf, hsup, mode="excess",
                    use_sideband=False, sideband_width=None):
    """Scan K histograms against one reference in a single program.

    Args:
      hists: (K, nbins) data + pseudo-data histograms.
      ref: (nbins,) background histogram.
      widths: static tuple of window widths (bins).
      scan_steps: static tuple of per-width position strides.
      hinf, hsup: scan range [hinf, hsup) from the first/last non-empty
        reference bins (ref :365-367), dynamic scalars.
    Returns:
      min_log_pval: (K,) log of the min window p-value per histogram.
      min_loc: (K,) window start bin.
      min_width: (K,) window width (bins).
      signal_eval: (K,) data-minus-reference in the min window.
      log_pvals: (n_widths, K, nbins) per-window log p-values (masked
        windows = 0), for res_ar/tomography.
    """
    nbins = ref.shape[0]
    k = hists.shape[0]
    pos = jnp.arange(nbins)

    def window_sums(x, w):
        """Direct sum of w consecutive bins along the last axis.

        NOT a cumsum difference: differencing float32 cumulative sums
        catastrophically cancels once the histogram total exceeds
        float32's 2^24 integer range (~1.7e7 counts — well inside the
        reference's 1e7-jet production scale), silently corrupting the
        minimum window.  A windowed tree-reduction carries only ~log2(w)
        ulps of error regardless of the histogram total."""
        two_d = x.ndim == 1
        if two_d:
            x = x[None, :]
        out = jax.lax.reduce_window(x, 0.0, jax.lax.add,
                                    window_dimensions=(1, w),
                                    window_strides=(1, 1), padding="VALID")
        return out[0] if two_d else out

    if use_sideband:
        vinf, vsup = hinf, hsup
        if sideband_width is not None:
            hinf = hinf + sideband_width
            hsup = hsup - sideband_width
        in_range = (pos >= vinf) & (pos < vsup)
        ref_total = jnp.sum(jnp.where(in_range, ref, 0.0))
        hist_total = jnp.sum(jnp.where(in_range[None, :], hists, 0.0), axis=1)

    all_logp, all_nh, all_nr = [], [], []
    for w, step in zip(widths, scan_steps):
        nh = window_sums(hists, w)             # (K, nbins-w+1)
        nr = window_sums(ref, w)               # (nbins-w+1,)
        pad = nbins - nh.shape[1]
        nh = jnp.pad(nh, ((0, 0), (0, pad)))
        nr = jnp.pad(nr, (0, pad))
        p = pos
        valid = (p >= hinf) & (p + w <= hsup) & ((p - hinf) % step == 0)
        nr_b = jnp.broadcast_to(nr[None, :], nh.shape)
        if use_sideband:
            scale = (hist_total[:, None] - nh) / jnp.maximum(ref_total - nr_b, 1e-12)
            nr_b = nr_b * scale
        if mode == "excess":
            window_ok = (nh > nr_b) & (nr_b > 0)
            logp = log_gammainc_lower(nh, jnp.maximum(nr_b, 1e-30))
        else:  # deficit
            window_ok = nh < nr_b
            logp = log_gammainc_upper(nh + 1.0, jnp.maximum(nr_b, 1e-30))
        logp = jnp.where(window_ok & valid[None, :], logp, 0.0)
        all_logp.append(logp)
        all_nh.append(nh)
        all_nr.append(nr_b)

    log_pvals = jnp.stack(all_logp)            # (W, K, nbins)
    nh_all = jnp.stack(all_nh)
    nr_all = jnp.stack(all_nr)

    flat = log_pvals.transpose(1, 0, 2).reshape(k, -1)   # (K, W*nbins)
    arg = jnp.argmin(flat, axis=1)
    min_log_pval = jnp.take_along_axis(flat, arg[:, None], axis=1)[:, 0]
    w_idx = arg // nbins
    min_loc = arg % nbins
    widths_arr = jnp.asarray(widths)
    min_width = widths_arr[w_idx]
    nh_flat = nh_all.transpose(1, 0, 2).reshape(k, -1)
    nr_flat = nr_all.transpose(1, 0, 2).reshape(k, -1)
    signal_eval = (jnp.take_along_axis(nh_flat, arg[:, None], 1)
                   - jnp.take_along_axis(nr_flat, arg[:, None], 1))[:, 0]
    # no qualifying window anywhere (all log p masked to 0): argmin picks
    # the arbitrary flat index 0 — report 0 evaluated signal like the
    # reference's dummy-window branch (ref bumphunter_1dim.py:402-407)
    signal_eval = jnp.where(min_log_pval >= 0.0, 0.0, signal_eval)
    return min_log_pval, min_loc, min_width, signal_eval, log_pvals


def _threefry_key(seed):
    """Poisson sampling is only implemented for the threefry generator,
    so BumpHunter keys are pinned to it regardless of the session-wide
    ``jax_default_prng_impl`` (e.g. ATLASVAE_PRNG=rbg)."""
    return jax.random.key(seed, impl="threefry2x32")


@functools.partial(jax.jit, static_argnames=("npe",))
def _poisson_pseudo(key, ref, npe):
    return jax.random.poisson(key, ref, shape=(npe,) + ref.shape).astype(jnp.float32)


@jax.jit
def _bin_significance(data_hist, ref_hist):
    """Per-bin signed significance (ref plot_bump :1772-1794)."""
    excess = (data_hist > ref_hist) & (ref_hist > 0)
    deficit = data_hist < ref_hist
    logp_e = log_gammainc_lower(data_hist, jnp.maximum(ref_hist, 1e-30))
    logp_d = log_gammainc_upper(data_hist + 1.0, jnp.maximum(ref_hist, 1e-30))
    logp = jnp.where(excess, logp_e, jnp.where(deficit, logp_d, 0.0))
    sig = sigma_from_log_pval(logp)
    sig = jnp.where(excess | deficit, sig, 0.0)
    sig = jnp.maximum(sig, 0.0)                     # ref :1792
    sig = jnp.where(jnp.isfinite(sig), sig, 0.0)    # ref :1793
    return jnp.where(deficit, -sig, sig)            # ref :1794


# ------------------------------------------------------------------ class

class BumpHunter1D:
    """Drop-in equivalent of the reference BumpHunter1D
    (ref bumphunter_1dim.py:19-317 constructor surface)."""

    def __init__(self, rang=None, mode="excess", width_min=1, width_max=None,
                 width_step=1, scan_step=1, npe=100, bins=60, weights=None,
                 nworker=4, sigma_limit=5, str_min=0.5, str_step=0.25,
                 str_scale="lin", signal_exp=None, flip_sig=True,
                 npe_inject=100, seed=None, use_sideband=False,
                 sideband_width=None, Nworker=None, useSideBand=None,
                 Npe=None):
        # Legacy kwarg spellings, remapped with a FutureWarning
        # (ref :149-151 decorators + :290-295 inline remap).
        if useSideBand is not None:
            warn_legacy_arg("BumpHunter1D", "useSideBand", "use_sideband")
            use_sideband = useSideBand
        if Nworker is not None:
            warn_legacy_arg("BumpHunter1D", "Nworker", "nworker")
            nworker = Nworker
        if Npe is not None:
            warn_legacy_arg("BumpHunter1D", "Npe", "npe")
            npe = Npe
        self.rang = rang
        self.mode = mode
        self.width_min = width_min
        self.width_max = width_max
        self.width_step = width_step
        self.scan_step = scan_step
        self.npe = npe
        self.bins = bins
        self.weights = weights
        self.nworker = nworker  # kept for API parity; scans are vectorized
        self.sigma_limit = sigma_limit
        self.str_min = str_min
        self.str_step = str_step
        self.str_scale = str_scale
        self.signal_exp = signal_exp
        self.flip_sig = flip_sig
        self.npe_inject = npe_inject
        self.seed = seed
        self.use_sideband = use_sideband
        self.sideband_width = sideband_width
        self.reset()

    # ------------------------------------------------------------- utils

    def reset(self):
        """Clear result state (ref :704-727)."""
        self.global_Pval = 0
        self.significance = 0
        self.res_ar = []
        self.min_Pval_ar = []
        self.log_Pval_ar = []
        self.min_loc_ar = []
        self.min_width_ar = []
        self.t_ar = []
        self.signal_eval = 0
        self.norm_scale = None
        self.signal_min = 0
        self.signal_ratio = None
        self.data_inject = []
        self.sigma_ar = []
        self.str_ar = []

    def save_state(self):
        """Snapshot every knob + result into a dict (ref :729-779).

        The flip_sig setting is stored under the reference's dict key
        'sig_flip' (ref :757) so state dicts interchange both ways."""
        keys = ["mode", "rang", "bins", "weights", "width_min", "width_max",
                "width_step", "scan_step", "npe", "nworker", "seed",
                "sigma_limit", "str_min", "str_step", "str_scale",
                "signal_exp", "npe_inject", "use_sideband",
                "global_Pval", "significance", "res_ar", "min_Pval_ar",
                "log_Pval_ar", "min_loc_ar", "min_width_ar", "t_ar",
                "signal_eval", "norm_scale", "signal_min", "signal_ratio",
                "data_inject"]
        state = {k: getattr(self, k) for k in keys}
        state["sig_flip"] = self.flip_sig
        return state

    def load_state(self, state):
        """Restore from a save_state dict (ref :781-919).

        Accepts the reference's 'sig_flip' key AND restores it into the
        live ``flip_sig`` attribute — the reference loads it into a dead
        ``self.sig_flip`` (ref :875-878) while signal_inject reads
        ``self.flip_sig``, losing the setting; a bug not replicated."""
        defaults = BumpHunter1D().__dict__
        for k, v in defaults.items():
            setattr(self, k, state.get(k, v))
        for k, v in state.items():
            if k != "sig_flip":
                setattr(self, k, v)
        if "sig_flip" in state:
            self.flip_sig = state["sig_flip"]
        elif "flip_sig" in state:  # dicts written by older snapshots here
            self.flip_sig = state["flip_sig"]

    # --------------------------------------------------------- internals

    def _widths(self, nbins):
        wmax = self.width_max if self.width_max is not None else nbins // 2
        self.width_max = wmax
        widths = tuple(range(self.width_min, wmax + 1, self.width_step))
        if self.scan_step == "full":
            steps = widths
        elif self.scan_step == "half":
            steps = tuple(max(1, w // 2) for w in widths)
        else:
            steps = tuple(int(self.scan_step) for _ in widths)
        return widths, steps

    def _histogram(self, data, bkg, is_hist):
        if not is_hist:
            bkg_hist, bins = np.histogram(bkg, bins=self.bins,
                                          weights=self.weights, range=self.rang)
            data_hist = np.histogram(data, bins=bins, range=self.rang)[0]
            self.bins = bins
        else:
            bkg_hist = np.asarray(bkg, dtype=np.float64)
            if self.weights is not None:
                bkg_hist = bkg_hist * self.weights
            data_hist = np.asarray(data, dtype=np.float64)
        return data_hist.astype(np.float32), bkg_hist.astype(np.float32)

    def _scan_range(self, ref):
        non0 = np.nonzero(ref > 0)[0]
        if len(non0) == 0:
            return 0, len(ref)
        return int(non0.min()), int(non0.max()) + 1

    # ------------------------------------------------------------ public

    def bump_scan(self, data, bkg, is_hist=False, do_pseudo=True,
                  multi_chan=False, verbose=True):
        """Full BumpHunter scan: data + npe pseudo-experiments, global
        p-value and significance (ref :922-1226).  ``multi_chan=True``
        takes per-channel lists and combines channels per ref
        ``_scan_hist_multi`` (:478-700)."""
        if multi_chan:
            return self._bump_scan_multi(data, bkg, is_hist, do_pseudo, verbose)
        data_hist, bkg_hist = self._histogram(data, bkg, is_hist)
        widths, steps = self._widths(len(data_hist))
        hinf, hsup = self._scan_range(bkg_hist)
        # pad nbins up to a multiple of 32 so evaluations with different
        # adaptive bin counts share one compiled scan (the one-time XLA
        # compile costs ~20 s through the remote-compile tunnel); widths
        # and the [hinf, hsup) scan range come from the TRUE bin count,
        # so padded zero bins are never scanned
        nbins_true = len(data_hist)
        tail = (-nbins_true) % 32
        if tail:
            data_hist = np.pad(data_hist, (0, tail)).astype(np.float32)
            bkg_hist = np.pad(bkg_hist, (0, tail)).astype(np.float32)
        if verbose:
            print(f"{len(widths)} values of width will be tested")
            print("SCAN")

        if do_pseudo:
            key = _threefry_key(0 if self.seed is None else self.seed)
            pseudo = _poisson_pseudo(key, jnp.asarray(bkg_hist), self.npe)
            hists = jnp.concatenate([jnp.asarray(data_hist)[None, :], pseudo])
        else:
            hists = jnp.asarray(data_hist)[None, :]

        out = scan_histograms(hists, jnp.asarray(bkg_hist), widths, steps,
                              hinf, hsup, self.mode, self.use_sideband,
                              self.sideband_width)
        min_logp, min_loc, min_width, signal_eval, log_pvals = map(np.asarray, out)

        if not do_pseudo and np.size(self.log_Pval_ar) > 1:
            # Reuse the cached pseudo-experiment distribution from the
            # previous scan: only slot 0 (the data) is replaced
            # (ref :1086-1096 keeps min_Pval_ar when do_pseudo=False).
            min_logp = np.concatenate([min_logp, self.log_Pval_ar[1:]])
            min_loc = np.concatenate([min_loc, self.min_loc_ar[1:]])
            min_width = np.concatenate([min_width, self.min_width_ar[1:]])

        self.log_Pval_ar = min_logp
        with np.errstate(under="ignore"):
            self.min_Pval_ar = np.exp(min_logp.astype(np.float64))
        self.min_loc_ar = min_loc.astype(int)
        self.min_width_ar = min_width.astype(int)
        self.signal_eval = float(signal_eval[0])
        self.res_ar = [np.exp(log_pvals[w, 0, :nbins_true].astype(np.float64))
                       for w in range(len(widths))]
        self.t_ar = -min_logp.astype(np.float64)  # t = -ln(min p), ref :1194

        if self.use_sideband:
            # best-window sideband scale of the data scan, for plot_bump
            # (ref :419,453-454,475 stores min_scale as norm_scale)
            loc, w = int(min_loc[0]), int(min_width[0])
            nh = float(np.sum(data_hist[loc:loc + w]))
            nr = float(np.sum(bkg_hist[loc:loc + w]))
            hist_total = float(np.sum(data_hist[hinf:hsup]))
            ref_total = float(np.sum(bkg_hist[hinf:hsup]))
            self.norm_scale = (hist_total - nh) / max(ref_total - nr, 1e-12)

        if len(self.t_ar) > 1:
            tdat = self.t_ar[0]
            s = int(np.sum(self.t_ar[1:] >= tdat))
            self.global_Pval = s / self.npe
            if verbose:
                print(f"Global p-value : {self.global_Pval:1.4f}  ({s} / {self.npe})")
            if self.global_Pval == 1:
                self.significance = 0
            elif self.global_Pval == 0:
                # lower limit -ndtri(1/npe), ref :1212 #DG
                self.significance = float(sigma_from_log_pval(np.log(1.0 / self.npe)))
                if verbose:
                    print(f"Significance > {self.significance:1.5f} (lower limit)")
            else:
                self.significance = float(sigma_from_log_pval(np.log(self.global_Pval)))
                if verbose:
                    print(f"Significance = {self.significance:1.5f}")
        elif verbose:
            print("No pseudo data found : can't compute global p-value")

    def _bump_scan_multi(self, data, bkg, is_hist=False, do_pseudo=True,
                         verbose=True):
        """Multi-channel scan (ref ``_scan_hist_multi`` :478-700): each
        channel is scanned independently; channels combine only when the
        per-channel best windows *overlap* in physical coordinates, and
        the combined statistic is t = -ln(prod of per-channel min p)
        (ref :696).  No-overlap scans get p = 1 (ref :649-656).

        Note: the reference's overlap-clipping contains a latent bug
        (``min_loc_current -= min_loc_current - 1`` pins the left edge to
        bin 1, ref :667-669) and its right-edge clip rounds outward —
        the decrement-then-``+1`` loop (ref :669-672) lands one bin past
        the intersection even when bin edges align exactly.  The
        intended interval intersection is implemented instead for both
        edges (SURVEY.md S7 fix policy); the executed head-to-head in
        tests/test_reference_utils_parity.py asserts the one-bin quirk
        offset explicitly.
        """
        n_chan = len(data)
        bins_in = self.bins if isinstance(self.bins, list) else \
            [self.bins for _ in range(n_chan)]
        per_chan = []
        key = _threefry_key(0 if self.seed is None else self.seed)
        for ch in range(n_chan):
            self_bins = bins_in[ch]
            saved_bins, self.bins = self.bins, self_bins
            data_hist, bkg_hist = self._histogram(data[ch], bkg[ch], is_hist)
            bins_in[ch] = self.bins
            self.bins = saved_bins
            widths, steps = self._widths(len(data_hist))
            hinf, hsup = self._scan_range(bkg_hist)
            if do_pseudo:
                key, sub = jax.random.split(key)
                pseudo = _poisson_pseudo(sub, jnp.asarray(bkg_hist), self.npe)
                hists = jnp.concatenate([jnp.asarray(data_hist)[None, :], pseudo])
            else:
                hists = jnp.asarray(data_hist)[None, :]
            out = scan_histograms(hists, jnp.asarray(bkg_hist), widths, steps,
                                  hinf, hsup, self.mode, self.use_sideband,
                                  self.sideband_width)
            per_chan.append(tuple(map(np.asarray, out[:4])))
        self.bins = bins_in

        k = len(per_chan[0][0])
        logp = np.stack([c[0] for c in per_chan])         # (C, K)
        locs = np.stack([c[1] for c in per_chan]).astype(int)
        widths_arr = np.stack([c[2] for c in per_chan]).astype(int)
        # physical window edges per channel/scan
        lo = np.stack([np.asarray(bins_in[ch])[locs[ch]] for ch in range(n_chan)])
        hi = np.stack([np.asarray(bins_in[ch])[locs[ch] + widths_arr[ch]]
                       for ch in range(n_chan)])
        inter_lo = np.max(lo, axis=0)
        inter_hi = np.min(hi, axis=0)
        overlap = inter_lo < inter_hi
        combined_logp = np.where(overlap, logp.sum(axis=0), 0.0)

        self.log_Pval_ar = combined_logp
        with np.errstate(under="ignore"):
            self.min_Pval_ar = np.exp(logp.astype(np.float64)).T  # (K, C)
        self.min_loc_ar = locs.T
        self.min_width_ar = widths_arr.T
        self.signal_eval = np.array([per_chan[ch][3][0] for ch in range(n_chan)])
        self.t_ar = -combined_logp.astype(np.float64)
        if k > 1:
            tdat = self.t_ar[0]
            s = int(np.sum(self.t_ar[1:] >= tdat))
            self.global_Pval = s / self.npe
            if self.global_Pval == 1:
                self.significance = 0
            elif self.global_Pval == 0:
                self.significance = float(sigma_from_log_pval(np.log(1.0 / self.npe)))
            else:
                self.significance = float(sigma_from_log_pval(np.log(self.global_Pval)))
            if verbose:
                print(f"Global p-value : {self.global_Pval:1.4f}  "
                      f"significance = {self.significance:1.5f}")
        return (inter_lo[0], inter_hi[0]) if overlap[0] else None

    def bump_info(self, data, is_hist=False, verbose=True):
        """Result summary; returns the *local* significance
        -ndtri(min p of data), unbounded (ref :2018-2127 #DG return).
        Multi-channel state reports the combined overlap window
        (ref :2055-2060)."""
        if np.ndim(self.min_loc_ar) == 2:  # multi-channel scan state
            bins_list = self.bins
            locs = self.min_loc_ar[0]
            widths = self.min_width_ar[0]
            lo = max(np.asarray(bins_list[ch])[locs[ch]]
                     for ch in range(len(locs)))
            hi = min(np.asarray(bins_list[ch])[locs[ch] + widths[ch]]
                     for ch in range(len(locs)))
            bmin, bmax = lo, hi
        else:
            bins = self.bins if is_hist or not np.isscalar(self.bins) else \
                np.histogram_bin_edges(data, bins=self.bins, range=self.rang)
            if np.isscalar(bins):  # is_hist scan with no edges: bin coords
                bins = np.arange(int(bins) + 1)
            bmin = bins[self.min_loc_ar[0]]
            bmax = bins[self.min_loc_ar[0] + self.min_width_ar[0]]
        loc_sigma = float(sigma_from_log_pval(self.log_Pval_ar[0]))
        if verbose:
            sig_ev = float(np.sum(self.signal_eval))
            min_p = float(np.prod(np.atleast_1d(self.min_Pval_ar[0])))
            print(f"\nBump edges : [{bmin:.3g}, {bmax:.3g}]"
                  f"  (loc={self.min_loc_ar[0]}, width={self.min_width_ar[0]})")
            print(f"Bump mean | width : {(bmax + bmin) / 2:.3g} | {bmax - bmin:.3g}")
            print(f"Evaluated number of signal events : {sig_ev:.3g}")
            print(f"Local p-value | test statistic : {min_p:.5g}"
                  f" | {self.t_ar[0]:.5g}")
            print(f"Local significance : {loc_sigma:.5g}")
            print(f"Global p-value : {self.global_Pval:.5g}")
            if self.global_Pval == 0:
                print(f"Global significance : >{self.significance:.3g}  (lower limit)")
            else:
                print(f"Global significance : {self.significance:.3g}")
        return loc_sigma

    def plot_bump(self, data, bkg, is_hist=False, use_sideband=None, label="",
                  filename=None, make_histo=False, useSideBand=None):
        """Per-bin signed significances + optional bump plot; returns
        (bin_sigma, (Bmin, Bmax)) (ref :1646-1860)."""
        if useSideBand is not None:  # ref :1645 + :1696-1697
            warn_legacy_arg("plot_bump", "useSideBand", "use_sideband")
            use_sideband = useSideBand
        data_hist, bkg_hist = self._histogram(data, bkg, is_hist)
        bins = self.bins
        bmin = bins[self.min_loc_ar[0]]
        bmax = bins[self.min_loc_ar[0] + self.min_width_ar[0]]
        if use_sideband is None:
            use_sideband = self.use_sideband
        if use_sideband and self.norm_scale is not None:
            bkg_hist = bkg_hist * self.norm_scale
        sig = np.asarray(_bin_significance(jnp.asarray(data_hist),
                                           jnp.asarray(bkg_hist)))
        if make_histo or filename is not None:
            from ..plotting.bump import plot_bump_histogram
            plot_bump_histogram(data_hist, bkg_hist, bins, sig, (bmin, bmax),
                                self.rang, label, filename)
        return sig, (bmin, bmax)

    def plot_stat(self, show_Pval=False, filename=None):
        """BumpHunter test-statistic distribution plot (ref :1867-1918)."""
        from ..plotting.bump import plot_stat_distribution
        plot_stat_distribution(self.t_ar, self.global_Pval, show_Pval, filename)

    def plot_tomography(self, data, is_hist=False, filename=None):
        """p-value vs window position per width (ref :1513-1644)."""
        from ..plotting.bump import plot_tomography as _plot
        widths, _ = self._widths(len(self.res_ar[0]) if self.res_ar else 1)
        _plot(self.bins, self.res_ar, widths, filename)

    def signal_inject(self, sig, bkg, is_hist=False, verbose=True):
        """Signal-injection sensitivity scan: raise the injected strength
        until the median significance reaches sigma_limit
        (ref :1233-1506)."""
        if not is_hist:
            bkg_hist, bins = np.histogram(bkg, bins=self.bins,
                                          weights=self.weights, range=self.rang)
            sig_base = np.histogram(sig, bins=bins, range=self.rang)[0]
            self.bins = bins
            if self.signal_exp is None:
                self.signal_exp = len(np.asarray(sig))
            sig_scale = self.signal_exp / max(len(np.asarray(sig)), 1)
        else:
            bkg_hist = np.asarray(bkg, dtype=np.float64)
            if self.weights is not None:
                bkg_hist = bkg_hist * self.weights
            sig_base = np.asarray(sig, dtype=np.float64)
            if self.signal_exp is None:
                self.signal_exp = float(sig_base.sum())
            sig_scale = self.signal_exp / max(float(sig_base.sum()), 1e-12)
        bkg_hist = bkg_hist.astype(np.float32)
        widths, steps = self._widths(len(bkg_hist))
        hinf, hsup = self._scan_range(bkg_hist)
        key = _threefry_key(0 if self.seed is None else self.seed)

        # Background-only t distribution.
        key, sub = jax.random.split(key)
        pseudo_bkg = _poisson_pseudo(sub, jnp.asarray(bkg_hist), self.npe)
        bkg_res = scan_histograms(pseudo_bkg, jnp.asarray(bkg_hist),
                                  widths, steps, hinf, hsup, self.mode,
                                  self.use_sideband, self.sideband_width)
        t_bkg = -np.asarray(bkg_res[0])
        bkg_logp, bkg_loc, bkg_width = (np.asarray(bkg_res[0]),
                                        np.asarray(bkg_res[1]),
                                        np.asarray(bkg_res[2]))

        self.sigma_ar = []
        self.str_ar = []
        self.global_Pval, self.significance = 1.0, 0.0
        strength, i = 0.0, 1
        data_hist = bkg_hist
        t_inj = np.zeros(0)
        while (self.significance < self.sigma_limit
               and self.global_Pval > 1 / self.npe):
            if self.str_scale == "lin":
                strength = self.str_min if i == 1 else strength + self.str_step
            elif self.str_scale == "log":
                if i == 1:
                    strength = 10 ** self.str_min
                    self.str_step = strength
                else:
                    strength += self.str_step
                    if abs(strength - 10 * self.str_step) < 1e-6:
                        self.str_step *= 10
            else:
                print("ERROR : Bad str_scale value ! Must be either 'lin' or 'log'")
                return
            if verbose:
                print(f"   STEP {i} : signal strength = {strength}")
            self.signal_min = self.signal_exp * strength
            if self.mode == "deficit":
                self.signal_min = -self.signal_min
            sig_hist = sig_base * strength * sig_scale
            if self.mode == "deficit" and self.flip_sig:
                sig_hist = -sig_hist
            data_hist = (bkg_hist + sig_hist).astype(np.float32)
            key, sub = jax.random.split(key)
            pseudo_data = _poisson_pseudo(sub, jnp.asarray(np.maximum(data_hist, 0)),
                                          self.npe_inject)
            inj_res = scan_histograms(pseudo_data, jnp.asarray(bkg_hist),
                                      widths, steps, hinf, hsup, self.mode,
                                      self.use_sideband, self.sideband_width)
            t_inj = -np.asarray(inj_res[0])
            inj_logp, inj_loc, inj_width = (np.asarray(inj_res[0]),
                                            np.asarray(inj_res[1]),
                                            np.asarray(inj_res[2]))
            tdat, tinf, tsup = (np.median(t_inj), np.quantile(t_inj, 0.16),
                                np.quantile(t_inj, 0.84))
            qs = [np.sum(t_bkg > t) / self.npe for t in (tdat, tinf, tsup)]
            self.global_Pval = qs[0]
            sigmas = [float(sigma_from_log_pval(np.log(max(q, 1.0 / self.npe))))
                      for q in qs]
            self.significance = sigmas[0]
            self.sigma_ar.append([sigmas[0], abs(sigmas[0] - sigmas[1]),
                                  abs(sigmas[0] - sigmas[2])])
            self.str_ar.append(strength)
            if verbose:
                print(f"Global p-value : {self.global_Pval:1.4f}   "
                      f"significance = {self.significance:1.5f}")
            i += 1
        if verbose:
            if self.significance > self.sigma_limit:
                print("REACHED SIGMA LIMIT")
            elif self.global_Pval <= 1 / self.npe:
                print(f"REACHED STAT LIMIT AT {self.significance:.3f} SIGMA")
        self.signal_ratio = abs(self.signal_min / self.signal_exp)
        self.data_inject = data_hist
        # background results + the last injection's results, like the
        # reference's append at :1495-1500 — plot_bump/bump_info after
        # signal_inject read these arrays
        self.t_ar = np.append(t_bkg, t_inj)
        if len(t_inj):
            self.min_Pval_ar = np.exp(np.append(bkg_logp, inj_logp)
                                      .astype(np.float64))
            self.min_loc_ar = np.append(bkg_loc, inj_loc).astype(int)
            self.min_width_ar = np.append(bkg_width, inj_width).astype(int)
        else:  # loop never ran (sigma_limit <= 0): background scans only
            self.min_Pval_ar = np.exp(bkg_logp.astype(np.float64))
            self.min_loc_ar = bkg_loc.astype(int)
            self.min_width_ar = bkg_width.astype(int)
        self.sigma_ar = np.array(self.sigma_ar)
        self.str_ar = np.array(self.str_ar)

    def plot_inject(self, filename=None):
        """Significance vs injected signal strength after signal_inject,
        with the 16/84-quantile band as asymmetric error bars and upper
        limits where the band saturates (ref :1921-2014).  For
        str_scale='log' a second log-x panel is saved alongside
        (filename may be a (linear, log) pair as in the reference)."""
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        sigma = np.asarray(self.sigma_ar)
        strengths = np.asarray(self.str_ar)[:len(sigma)]
        is_sat = sigma[:, 2] == 0

        def draw(log_x, fname):
            fig = plt.figure(figsize=(12, 8))
            plt.title("Significance vs signal strength", size="xx-large")
            plt.errorbar(strengths, sigma[:, 0],
                         yerr=[sigma[:, 1], sigma[:, 2]], marker="o",
                         linewidth=2, uplims=is_sat)
            if log_x:
                plt.xscale("log")
            plt.xlabel("Signal strength", size="xx-large")
            plt.ylabel("Significance", size="xx-large")
            if fname is None:
                plt.show()
            else:
                plt.savefig(fname, bbox_inches="tight")
                plt.close(fig)

        if self.str_scale == "log":
            lin_name, log_name = (filename if isinstance(filename, (tuple, list))
                                  else (filename, None))
            draw(False, lin_name)
            if log_name is not None or filename is None:
                draw(True, log_name)
        else:
            draw(False, filename)

    # -------------------------------------------- legacy API (deprecated)
    # The reference keeps its pre-rename pyBumpHunter surface alive via
    # warn-once FutureWarning shims (ref :724-727, :777-780, :914-917,
    # :1228-1231, :1506-1509, :1640-1643, :1862-1865, :1916-1919,
    # :2013-2016, :2130-2257); scripts written against old versions call
    # these, so the rebuild carries the identical alias set.

    @deprecated("Use `reset` instead.")
    def Reset(self, *args, **kwargs):
        return self.reset(*args, **kwargs)

    @deprecated("Use `save_state` instead.")
    def SaveState(self, *args, **kwargs):
        return self.save_state(*args, **kwargs)

    @deprecated("Use `load_state` instead.")
    def LoadState(self, *args, **kwargs):
        return self.load_state(*args, **kwargs)

    @deprecated("Use `bump_scan` instead.")
    def BumpScan(self, *args, **kwargs):
        return self.bump_scan(*args, **kwargs)

    @deprecated("Use `signal_inject` instead.")
    def SignalInject(self, *args, **kwargs):
        return self.signal_inject(*args, **kwargs)

    @deprecated("Use `plot_tomography` instead.")
    def GetTomography(self, *args, **kwargs):
        return self.plot_tomography(*args, **kwargs)

    @deprecated("Use `plot_bump` instead.")
    def PlotBump(self, *args, **kwargs):
        return self.plot_bump(*args, **kwargs)

    @deprecated("Use `plot_stat` instead.")
    def PlotBHstat(self, *args, **kwargs):
        return self.plot_stat(*args, **kwargs)

    @deprecated("Use `plot_inject` instead.")
    def PlotInject(self, *args, **kwargs):
        return self.plot_inject(*args, **kwargs)

    @deprecated("Use `bump_info` instead.")
    def print_bump_info(self):
        """Local bump info in bin coordinates (ref :2130-2167).  The
        reference's multi-channel branch prints per-channel p-values and
        their product; significances come from the log-p state so p
        underflow never saturates them (ref :2149 #DG uses -norm.ppf)."""
        print("BUMP WINDOW")
        print(f"   loc = {self.min_loc_ar[0]}")
        print(f"   width = {self.min_width_ar[0]}")
        min_p = self.min_Pval_ar[0]
        if np.ndim(min_p) == 0:
            print(f"   local p-value = {float(min_p):.5g}")
            print(f"   -ln(loc p-value) = {float(self.t_ar[0]):.5f}")
            sigma = float(sigma_from_log_pval(self.log_Pval_ar[0]))
        else:
            per_ch = "  ".join(f"{float(p):.5g}" for p in min_p)
            print(f"   local p-value (per channel) = [ {per_ch}  ]")
            print(f"   local p-value (combined) = {float(np.prod(min_p)):.5g}")
            print(f"   -ln(loc p-value) (combined) = {float(self.t_ar[0]):.5f}")
            sigma = float(sigma_from_log_pval(np.sum(self.log_Pval_ar[0])))
        print(f"   local significance = {sigma:.5f}")
        print("")

    @deprecated("Use `print_bump_info` instead.")
    def PrintBumpInfo(self, *args, **kwargs):
        return self.print_bump_info(*args, **kwargs)

    @deprecated("Use `bump_info` instead.")
    def print_bump_true(self, data, bkg, is_hist=False):
        """Global bump info in real (axis) scale (ref :2174-2251) —
        delegates to bump_info, which prints the same real-scale window
        plus the global p-value/significance lines."""
        return self.bump_info(data, is_hist=is_hist, verbose=True)

    @deprecated("Use `print_bump_true` instead.")
    def PrintBumpTrue(self, *args, **kwargs):
        return self.print_bump_true(*args, **kwargs)


class BumpHunterInterface(metaclass=abc.ABCMeta):
    """Abstract base for BumpHunter-style scanners (ref :2260-2353) —
    part of the module's importable surface; user code subclasses it to
    plug custom scanners into scripts typed against the reference."""

    @abc.abstractmethod
    def reset(self):
        """Reset all inner result state."""

    @abc.abstractmethod
    def save_state(self):
        """Return a dict snapshot of all parameters and results."""

    @abc.abstractmethod
    def load_state(self, state):
        """Restore parameters/results from a save_state dict."""

    @abc.abstractmethod
    def bump_scan(self, data, bkg, is_hist, do_pseudo):
        """Run the BumpHunter algorithm (arXiv:1101.0390)."""

    @abc.abstractmethod
    def signal_inject(self, sig, bkg, is_hist):
        """Signal-injection sensitivity scan."""


# BumpHunter1D satisfies the interface structurally; register it so
# isinstance checks written against the ABC accept it.
BumpHunterInterface.register(BumpHunter1D)


# --------------------------------------------------- batched cut scanning

@functools.partial(jax.jit, static_argnames=("widths", "scan_steps", "mode"))
def _batched_local_sigma_jit(data_hists, bkg_hists, widths, scan_steps, mode):
    nbins = data_hists.shape[1]

    def one(data_hist, bkg_hist):
        non0 = bkg_hist > 0
        idx = jnp.arange(nbins)
        hinf = jnp.min(jnp.where(non0, idx, nbins))
        hsup = jnp.max(jnp.where(non0, idx, -1)) + 1
        min_logp, min_loc, min_width, _, _ = scan_histograms(
            data_hist[None, :], bkg_hist, widths, scan_steps, hinf, hsup, mode)
        bin_sigma = _bin_significance(data_hist, bkg_hist)
        return (sigma_from_log_pval(min_logp[0]), min_loc[0], min_width[0],
                bin_sigma)

    return jax.vmap(one)(data_hists, bkg_hists)


def batched_local_sigma(data_hists, bkg_hists, widths, scan_steps, mode="excess"):
    """Local (data-only) BumpHunter significances for many paired
    (data, background) histograms in one vmapped program — no
    pseudo-experiments, since the local sigma depends only on the data
    scan (used by the reference's per-cut grids whose plotted values are
    loc/max sigma, ref OE-AAE/plots.py:283-285,330-332).

    Returns (loc_sigma, min_loc, min_width, bin_sigma) arrays.  Jitted
    at top level: an unjitted vmap re-traces and eagerly dispatches the
    whole batched program per call (~1 s of pure overhead through this
    environment vs ~50 ms compiled).
    """
    return _batched_local_sigma_jit(jnp.asarray(data_hists, jnp.float32),
                                    jnp.asarray(bkg_hists, jnp.float32),
                                    tuple(widths), tuple(scan_steps), mode)


@functools.partial(jax.jit, static_argnames=("widths", "scan_steps", "npe",
                                             "mode"))
def _batched_bump_sigma_jit(keys, data_hists, bkg_hists, widths, scan_steps,
                            npe, mode):
    nbins = data_hists.shape[1]

    def one(key, data_hist, bkg_hist):
        pseudo = jax.random.poisson(key, bkg_hist,
                                    shape=(npe, nbins)).astype(jnp.float32)
        hists = jnp.concatenate([data_hist[None, :], pseudo])
        non0 = bkg_hist > 0
        idx = jnp.arange(nbins)
        hinf = jnp.min(jnp.where(non0, idx, nbins))
        hsup = jnp.max(jnp.where(non0, idx, -1)) + 1
        min_logp, _, _, _, _ = scan_histograms(hists, bkg_hist, widths,
                                               scan_steps, hinf, hsup, mode)
        t = -min_logp
        s = jnp.sum(t[1:] >= t[0])
        global_logp = jnp.log(jnp.maximum(s, 1.0) / npe)
        return (sigma_from_log_pval(min_logp[0]),
                sigma_from_log_pval(global_logp), t[0])

    return jax.vmap(one)(keys, data_hists, bkg_hists)


@functools.partial(jax.jit, static_argnames=("widths", "scan_steps", "npe",
                                             "mode", "mesh", "axis"))
def _bump_sigma_sharded_jit(keys, data_hist, bkg_hist, widths, scan_steps,
                            npe, mode, mesh, axis):
    nbins = data_hist.shape[0]

    def scan_block(keys_block, data_hist, bkg_hist):
        """t-statistics for one block of pseudo-experiments + the data."""
        pseudo = jax.vmap(
            lambda k: jax.random.poisson(k, bkg_hist, shape=(nbins,))
        )(keys_block).astype(jnp.float32)
        hists = jnp.concatenate([data_hist[None, :], pseudo])
        non0 = bkg_hist > 0
        idx = jnp.arange(nbins)
        hinf = jnp.min(jnp.where(non0, idx, nbins))
        hsup = jnp.max(jnp.where(non0, idx, -1)) + 1
        min_logp, _, _, _, _ = scan_histograms(hists, bkg_hist, widths,
                                               scan_steps, hinf, hsup, mode)
        t = -min_logp
        return t[0], jnp.sum(t[1:] >= t[0]), min_logp[0]

    if mesh is None:
        t_data, s, data_logp = scan_block(keys, data_hist, bkg_hist)
    else:
        from jax.sharding import PartitionSpec as P
        from jax import shard_map

        def body(keys_local, data_hist, bkg_hist):
            t_data, s_local, data_logp = scan_block(keys_local, data_hist,
                                                    bkg_hist)
            return t_data, jax.lax.psum(s_local, axis), data_logp

        t_data, s, data_logp = shard_map(
            body, mesh=mesh, in_specs=(P(axis), P(), P()),
            out_specs=(P(), P(), P()), check_vma=False)(
                keys, data_hist, bkg_hist)
    global_logp = jnp.log(jnp.maximum(s, 1.0) / npe)
    return (sigma_from_log_pval(data_logp), sigma_from_log_pval(global_logp),
            t_data)


def bump_sigma_sharded(data_hist, bkg_hist, widths, scan_steps, npe=1000,
                       mode="excess", seed=0, mesh=None, axis="data"):
    """Global BumpHunter scan with the pseudo-experiment axis sharded
    over a device mesh.

    The reference parallelizes its npe=1000 pseudo-experiment scans with
    a ThreadPoolExecutor inside one process
    (ref OE-VAE/BumpHunter/bumphunter_1dim.py:1108-1149 ``nworker``);
    here the same workload scales across chips: each device scans its
    shard of the pseudo-experiments and the exceedance COUNT is the only
    collective (an integer psum over ICI), so the sharded result equals
    the single-device result exactly — pseudo-data are drawn from
    per-experiment fold keys, making each experiment's draw independent
    of which device computes it (asserted in tests and exercised by the
    driver's multichip dryrun).

    Returns (local_sigma, global_sigma, t_data) scalars.
    """
    npe = int(npe)
    if mesh is not None:
        n_shard = mesh.shape[axis]
        if npe % n_shard:
            raise ValueError(f"npe={npe} must be a multiple of the "
                             f"'{axis}' mesh axis size {n_shard}")
    keys = jax.random.split(_threefry_key(seed), npe)
    return _bump_sigma_sharded_jit(keys, jnp.asarray(data_hist, jnp.float32),
                                   jnp.asarray(bkg_hist, jnp.float32),
                                   tuple(widths), tuple(scan_steps), npe,
                                   mode, mesh, axis)


def batched_bump_sigma(data_hists, bkg_hists, widths, scan_steps, npe=1000,
                       mode="excess", seed=0):
    """Run independent BumpHunter scans for many (data, bkg) histogram
    pairs in one vmapped program — the reference fans this out as one OS
    process per threshold cut (ref OE-VAE/plots.py:289-290).

    Returns (local_sigma, global_sigma, t_data) arrays of shape
    (n_cuts,).  Jitted at top level (see batched_local_sigma).
    """
    data_hists = jnp.asarray(data_hists, jnp.float32)
    keys = jax.random.split(_threefry_key(seed), data_hists.shape[0])
    return _batched_bump_sigma_jit(keys, data_hists,
                                   jnp.asarray(bkg_hists, jnp.float32),
                                   tuple(widths), tuple(scan_steps),
                                   int(npe), mode)
