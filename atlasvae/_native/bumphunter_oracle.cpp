// Independent BumpHunter window-scan oracle in long double.
//
// Purpose: a compiled, numerically-independent implementation of the
// reference's _scan_hist loop (ref OE-VAE/BumpHunter/bumphunter_1dim.py:
// 326-475) used as a golden oracle for the vectorized JAX scan
// (atlasvae/stats/bumphunter.py) and as a fast host-side fallback.
// P-values are carried as log p in long double (64-bit mantissa), which
// covers sigma well beyond the reference's mpmath tables without
// arbitrary precision.
//
// Build: g++ -O2 -shared -fPIC -o libbh_oracle.so bumphunter_oracle.cpp
// ABI: plain C, loaded via ctypes (no pybind11 in this environment).

#include <cmath>
#include <cstdint>
#include <vector>

namespace {

// log of the lower regularized incomplete gamma P(a, x) by series
// (x < a+1) or 1 - Q via the Lentz continued fraction (x >= a+1).
long double log_gamma_p(long double a, long double x) {
    if (x <= 0.0L) return -1e30L;
    if (a <= 0.0L) return 0.0L;
    if (x < a + 1.0L) {
        // series: P = x^a e^-x / Gamma(a+1) * sum_k prod x/(a+j)
        long double term = 1.0L, total = 1.0L;
        for (int k = 1; k < 10000; ++k) {
            term *= x / (a + k);
            total += term;
            if (term < total * 1e-20L) break;
        }
        return a * logl(x) - x - lgammal(a + 1.0L) + logl(total);
    }
    // Q via modified Lentz, then P = 1 - Q (Q <= ~0.5 here)
    const long double tiny = 1e-300L;
    long double b = x + 1.0L - a, c = 1.0L / tiny, d = 1.0L / b, h = d;
    for (int i = 1; i < 10000; ++i) {
        long double an = -1.0L * i * (i - a);
        b += 2.0L;
        d = an * d + b;
        if (fabsl(d) < tiny) d = tiny;
        c = b + an / c;
        if (fabsl(c) < tiny) c = tiny;
        d = 1.0L / d;
        long double del = d * c;
        h *= del;
        if (fabsl(del - 1.0L) < 1e-20L) break;
    }
    long double log_q = a * logl(x) - x - lgammal(a) + logl(h);
    long double q = expl(log_q);
    if (q >= 1.0L) return -1e30L;
    return log1pl(-q);
}

long double log_gamma_q(long double a, long double x) {
    if (x <= 0.0L) return 0.0L;
    if (x >= a + 1.0L) {
        const long double tiny = 1e-300L;
        long double b = x + 1.0L - a, c = 1.0L / tiny, d = 1.0L / b, h = d;
        for (int i = 1; i < 10000; ++i) {
            long double an = -1.0L * i * (i - a);
            b += 2.0L;
            d = an * d + b;
            if (fabsl(d) < tiny) d = tiny;
            c = b + an / c;
            if (fabsl(c) < tiny) c = tiny;
            d = 1.0L / d;
            long double del = d * c;
            h *= del;
            if (fabsl(del - 1.0L) < 1e-20L) break;
        }
        return a * logl(x) - x - lgammal(a) + logl(h);
    }
    long double p = expl(log_gamma_p(a, x));
    if (p >= 1.0L) return -1e30L;
    return log1pl(-p);
}

}  // namespace

extern "C" {

// Exact reference scan loop over one histogram.
// mode: 0 = excess, 1 = deficit.  Returns min log p + window.
void bh_scan(const double* hist, const double* ref, int nbins,
             const int* widths, int n_widths, int scan_step, int mode,
             double* min_logp, int* min_loc, int* min_width) {
    // first/last non-empty reference bins (ref :365-367)
    int hinf = 0, hsup = nbins;
    for (int i = 0; i < nbins; ++i) {
        if (ref[i] > 0) { hinf = i; break; }
    }
    for (int i = nbins - 1; i >= 0; --i) {
        if (ref[i] > 0) { hsup = i + 1; break; }
    }
    long double best = 0.0L;  // log p = 0 -> p = 1
    int best_loc = 0, best_w = widths[0];
    std::vector<long double> cum_h(nbins + 1, 0.0L), cum_r(nbins + 1, 0.0L);
    for (int i = 0; i < nbins; ++i) {
        cum_h[i + 1] = cum_h[i] + (long double)hist[i];
        cum_r[i + 1] = cum_r[i] + (long double)ref[i];
    }
    for (int wi = 0; wi < n_widths; ++wi) {
        int w = widths[wi];
        for (int p = hinf; p + w <= hsup; p += scan_step) {
            long double nh = cum_h[p + w] - cum_h[p];
            long double nr = cum_r[p + w] - cum_r[p];
            long double logp = 0.0L;
            if (mode == 0) {  // excess (ref :423-427)
                if (nh > nr && nr > 0.0L) logp = log_gamma_p(nh, nr);
            } else {          // deficit (ref :428-431)
                if (nh < nr) logp = log_gamma_q(nh + 1.0L, nr);
            }
            if (logp < best) {
                best = logp;
                best_loc = p;
                best_w = w;
            }
        }
    }
    *min_logp = (double)best;
    *min_loc = best_loc;
    *min_width = best_w;
}

// Vectorized long-double log gamma tails, exported for adversarial
// sweep tests of the float32 JAX implementation (atlasvae/ops/gammainc.py).
void bh_log_gammainc(const double* a, const double* x, int n, int lower,
                     double* out) {
    for (int i = 0; i < n; ++i) {
        long double la = (long double)a[i], lx = (long double)x[i];
        out[i] = (double)(lower ? log_gamma_p(la, lx) : log_gamma_q(la, lx));
    }
}

// Batch variant over K histograms against one reference.
void bh_scan_many(const double* hists, const double* ref, int k, int nbins,
                  const int* widths, int n_widths, int scan_step, int mode,
                  double* min_logp, int* min_loc, int* min_width) {
    for (int i = 0; i < k; ++i) {
        bh_scan(hists + (int64_t)i * nbins, ref, nbins, widths, n_widths,
                scan_step, mode, min_logp + i, min_loc + i, min_width + i);
    }
}

}  // extern "C"
