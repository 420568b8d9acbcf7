"""Log-space regularized incomplete gamma functions and extreme-tail
normal quantiles, as jit/vmap-able JAX programs.

Why this exists: BumpHunter's per-window Poisson p-values underflow
float64 around sigma ~ 37.5, which the reference patches with
mpmath at dps=1000 on the host (ref
OE-AAE/BumpHunter/bumphunter_1dim.py:17-24 calibration table: dps 5000
tops out at sigma = 151.7).  Carrying **log p** instead of p removes the
ceiling entirely: log p down to -1e30 is representable, i.e. sigma is
unbounded for any physical input, with everything on-device.

Algorithms (all standard, derived from first principles / DLMF 8.11-8.12):

* ``a <= 400``: exact lower-series (x < a+1) / modified-Lentz continued
  fraction (x >= a+1) in log space, fixed 320 iterations;
* ``a > 400``: Temme's uniform asymptotic expansion
  Q(a,x) ~ 0.5 erfc(eta sqrt(a/2)) + exp(-a eta^2/2)/sqrt(2 pi a) * c0(eta),
  with 0.5 eta^2 = lam - 1 - ln lam, lam = x/a, evaluated via
  float32-stable series near lam = 1, and a log-space erfc for large
  arguments.  Relative log-p error < ~1e-4, smooth and monotone in its
  arguments (pseudo-experiment ordering preserved).
"""

import jax
import jax.numpy as jnp

_LOG_ZERO = -1e30
_HALF_LOG_2PI = 0.9189385332046727


# ---------------------------------------------------- stable log-prefactors

def _phi(eps):
    """phi(eps) = eps - log1p(eps), float32-stable via series for small eps."""
    series = jnp.zeros_like(eps)
    for k in range(11, -1, -1):  # phi/eps^2 = sum (-1)^k eps^k / (k+2)
        series = series * eps + (-1.0) ** k / (k + 2.0)
    series = series * eps ** 2
    direct = eps - jnp.log1p(jnp.maximum(eps, -0.999999))
    return jnp.where(jnp.abs(eps) < 0.5, series, direct)


def _log_poisson_prefactor(a, x, shift):
    """a ln x - x - lgamma(a + shift) without large intermediates.

    Direct evaluation loses ~1e-2 absolute in float32 at a ~ 400 (three
    ~2000-magnitude terms cancel; lax.lgamma itself is only ~1e-5
    relative).  Stirling + phi(eps) keeps every intermediate O(1)."""
    b = a + shift
    eps = (x - b) / b
    stable = (-b * _phi(eps) - shift * (jnp.log1p(eps) + jnp.log(b))
              + 0.5 * jnp.log(b)
              - _HALF_LOG_2PI - 1.0 / (12.0 * b) + 1.0 / (360.0 * b ** 3))
    direct = a * jnp.log(x) - x - jax.lax.lgamma(b)
    return jnp.where(b > 8.0, stable, direct)


# -------------------------------------------------------- exact small-a

# Series/CF iteration bound.  These branches only serve a <= _A_SWITCH
# (=400); worst-case convergence there needs ~sqrt(2*a*ln(1/eps)) ~ 115
# terms at x ~ a.  Measured against the long-double oracle over a dense
# (a <= 400) x (x/a in 0.01..100) grid: the f32 error floor is reached
# by n=96 (no change vs n=320) and degrades only below n=80
# (1.6e-4 at 80, 2.8e-3 at 64).  128 keeps full accuracy with margin
# while the scan kernels run 2.5x fewer serial loop steps (both
# branches execute unconditionally under jit).
_N_ITER = 128


def _log_lower_series(a, x):
    """log P(a,x) by the lower series, valid/convergent for x < a+1."""
    # P(a,x) = x^a e^-x / Gamma(a+1) * sum_k prod_{j<=k} x/(a+j)
    def body(k, carry):
        total, term = carry
        term = term * x / (a + k)
        return total + term, term

    total, _ = jax.lax.fori_loop(1, _N_ITER, body,
                                 (jnp.ones_like(x), jnp.ones_like(x)))
    return _log_poisson_prefactor(a, x, 1.0) + jnp.log(total)


def _log_upper_cf(a, x):
    """log Q(a,x) by the modified-Lentz continued fraction, x >= a+1."""
    tiny = 1e-30
    b0 = x + 1.0 - a
    c0 = jnp.full_like(x, 1.0 / tiny)
    d0 = 1.0 / jnp.maximum(b0, tiny)
    h0 = d0

    def body(i, carry):
        c, d, h = carry
        an = -i * (i - a)
        b = x + 2.0 * i + 1.0 - a
        d = b + an * d
        d = jnp.where(jnp.abs(d) < tiny, tiny, d)
        c = b + an / c
        c = jnp.where(jnp.abs(c) < tiny, tiny, c)
        d = 1.0 / d
        return c, d, h * d * c

    _, _, h = jax.lax.fori_loop(1, _N_ITER, body, (c0, d0, h0))
    return _log_poisson_prefactor(a, x, 0.0) + jnp.log(h)


# --------------------------------------------------------- log-space erfc

def log_erfc(z):
    """log(erfc(z)) for any real z; asymptotic expansion for large z."""
    direct = jnp.log(jnp.maximum(jax.lax.erfc(jnp.minimum(z, 5.0)), 1e-38))
    z2 = jnp.maximum(z, 5.0) ** 2
    # erfc(z) = exp(-z^2)/(z sqrt(pi)) (1 - 1/(2z^2) + 3/(4z^4) - 15/(8z^6))
    series = jnp.log1p(-0.5 / z2 + 0.75 / z2 ** 2 - 1.875 / z2 ** 3)
    asym = -z2 - 0.5 * jnp.log(jnp.pi) - jnp.log(jnp.maximum(z, 5.0)) + series
    return jnp.where(z < 5.0, direct, asym)


# ----------------------------------------------------------- Temme large-a

def _temme_terms(a, x):
    """(z, log|corr|, corr_sign) for Temme's expansion, float32-stable.

    eta^2/2 = lam - 1 - ln lam cancels catastrophically near lam = 1 in
    float32, so for |eps| < 0.5 it is evaluated by its power series
    eps^2 - (2/3) eps^3 + (1/2) eps^4 - ...; likewise c0 = 1/eps - 1/eta
    is computed through u = eta/eps = sqrt(eta^2/eps^2).
    """
    eps = (x - a) / a  # better-conditioned than x/a - 1
    # eta^2 = sum_{k>=0} 2 (-1)^k eps^(k+2) / (k+2)
    u2_series = jnp.zeros_like(eps)
    for k in range(11, -1, -1):  # eta^2/eps^2 = sum 2(-1)^k eps^k/(k+2)
        u2_series = u2_series * eps + 2.0 * (-1.0) ** k / (k + 2.0)
    eta2_direct = 2.0 * (eps - jnp.log1p(jnp.maximum(eps, -0.999999)))
    use_series = jnp.abs(eps) < 0.5
    safe_eps = jnp.where(jnp.abs(eps) < 1e-12, 1e-12, eps)
    u2 = jnp.where(use_series, u2_series, eta2_direct / safe_eps ** 2)
    u = jnp.sqrt(jnp.maximum(u2, 1e-12))
    eta2 = u2 * eps ** 2
    eta = eps * u
    z = eta * jnp.sqrt(a / 2.0)  # same sign as eps

    tiny = jnp.abs(eps) < 1e-3
    # c0 = 1/eps - 1/eta = (u - 1) / (eps u); Taylor -1/3 + eps/12 near 0
    c0 = jnp.where(tiny, -1.0 / 3.0 + eps / 12.0,
                   (u - 1.0) / (safe_eps * jnp.maximum(u, 1e-12)))
    s = c0  # one-term expansion: relative error O(1/a) on the correction
    log_corr = -0.5 * a * eta2 - 0.5 * jnp.log(2.0 * jnp.pi * a) + \
        jnp.log(jnp.maximum(jnp.abs(s), 1e-38))
    return z, log_corr, jnp.sign(s)


def _log_q_temme(a, x):
    z, log_corr, s_sign = _temme_terms(a, x)
    log_half_erfc = jnp.log(0.5) + log_erfc(z)
    # Q = 0.5 erfc(z) + sign * exp(log_corr)
    hi = jnp.maximum(log_half_erfc, log_corr)
    lo = jnp.minimum(log_half_erfc, log_corr)
    same = jnp.logaddexp(log_half_erfc, log_corr)
    # opposite signs: subtract smaller magnitude from larger
    mag = hi + jnp.log1p(-jnp.exp(jnp.minimum(lo - hi, -1e-7)))
    add = s_sign > 0
    return jnp.where(add, same, mag)


def _log_p_temme(a, x):
    z, log_corr, s_sign = _temme_terms(a, x)
    log_half_erfc = jnp.log(0.5) + log_erfc(-z)
    # P = 0.5 erfc(-z) - sign * exp(log_corr)
    hi = jnp.maximum(log_half_erfc, log_corr)
    lo = jnp.minimum(log_half_erfc, log_corr)
    same = jnp.logaddexp(log_half_erfc, log_corr)
    mag = hi + jnp.log1p(-jnp.exp(jnp.minimum(lo - hi, -1e-7)))
    sub = s_sign > 0
    return jnp.where(sub, mag, same)


# ---------------------------------------------------------------- public

_A_SWITCH = 400.0


def log_gammainc_lower(a, x):
    """log of the lower regularized incomplete gamma P(a, x).

    For integer a = n, P(n, lam) is the Poisson tail P(X >= n | lam) used
    as the BumpHunter excess p-value (ref bumphunter_1dim.py:424-427).
    """
    a = jnp.asarray(a, jnp.float32)
    x = jnp.asarray(x, jnp.float32)
    xs = jnp.maximum(x, 1e-30)
    series = _log_lower_series(a, jnp.minimum(xs, a + 1.0))
    # x >= a+1: P = 1 - Q with Q <= ~0.5, safe in linear space
    from_cf = jnp.log1p(-jnp.exp(jnp.minimum(_log_upper_cf(a, jnp.maximum(xs, a + 1.0)), -1e-7)))
    exact = jnp.where(xs < a + 1.0, series, from_cf)
    temme = jnp.where(xs < a, _log_p_temme(a, xs),
                      jnp.log1p(-jnp.exp(jnp.minimum(_log_q_temme(a, xs), -1e-7))))
    out = jnp.where(a <= _A_SWITCH, exact, temme)
    out = jnp.where(x <= 0.0, _LOG_ZERO, out)
    out = jnp.where(a <= 0.0, 0.0, out)  # P(0, x>0) = 1
    return jnp.minimum(out, 0.0)


def log_gammainc_upper(a, x):
    """log of the upper regularized incomplete gamma Q(a, x).

    Q(n+1, lam) is the Poisson tail P(X <= n | lam) used as the
    BumpHunter deficit p-value (ref bumphunter_1dim.py:428-431).
    """
    a = jnp.asarray(a, jnp.float32)
    x = jnp.asarray(x, jnp.float32)
    xs = jnp.maximum(x, 1e-30)
    cf = _log_upper_cf(a, jnp.maximum(xs, a + 1.0))
    from_series = jnp.log1p(-jnp.exp(jnp.minimum(_log_lower_series(a, jnp.minimum(xs, a + 1.0)), -1e-7)))
    exact = jnp.where(xs >= a + 1.0, cf, from_series)
    temme = jnp.where(xs >= a, _log_q_temme(a, xs),
                      jnp.log1p(-jnp.exp(jnp.minimum(_log_p_temme(a, xs), -1e-7))))
    out = jnp.where(a <= _A_SWITCH, exact, temme)
    out = jnp.where(x <= 0.0, 0.0, out)  # Q(a, 0) = 1
    return jnp.minimum(out, 0.0)


def sigma_from_log_pval(log_p):
    """Significance sigma = -Phi^-1(p) from log p, unbounded.

    For moderate p uses the erfc inverse through the normal CDF; for the
    deep tail solves log Q(sigma) = log p by Newton on the asymptotic
    normal-tail series.  Replaces the reference's
    ``-scipy.stats.norm.ppf(p)`` + mpmath precision ladder
    (ref bumphunter_1dim.py:1212-1217, OE-AAE copy :1818-1824).
    """
    log_p = jnp.asarray(log_p, jnp.float32)
    # moderate regime via erfcinv-equivalent (p > ~1e-30 in f32)
    p = jnp.exp(jnp.maximum(log_p, -60.0))
    moderate = -_ndtri(jnp.clip(p, 1e-30, 1.0 - 1e-7))

    # deep tail: solve -s^2/2 - ln s - 0.5 ln 2pi + ln(1 - 1/s^2 + 3/s^4) = log_p
    lp = jnp.minimum(log_p, -60.0)
    s0 = jnp.sqrt(jnp.maximum(-2.0 * lp - jnp.log(jnp.maximum(-2.0 * lp, 1.0))
                              - jnp.log(2.0 * jnp.pi), 1.0))

    def newton(_, s):
        s2 = s * s
        f = (-0.5 * s2 - jnp.log(s) - _HALF_LOG_2PI
             + jnp.log1p(-1.0 / s2 + 3.0 / s2 ** 2) - lp)
        df = -s - 1.0 / s + (2.0 / (s * s2) - 12.0 / (s * s2 * s2)) / \
            jnp.maximum(1.0 - 1.0 / s2 + 3.0 / s2 ** 2, 1e-6)
        return s - f / df

    deep = jax.lax.fori_loop(0, 6, newton, s0)
    sigma = jnp.where(log_p > -60.0, moderate, deep)
    # p >= 1 (log p >= 0, e.g. no qualifying scan window) reports zero
    # significance, matching the reference's p=1 branch
    # (ref bumphunter_1dim.py:1208-1211) — NOT the -5.17 artifact the
    # 1-1e-7 clip would produce
    return jnp.where(log_p >= 0.0, 0.0, sigma)


def _ndtri(p, p_lo=1e-30):
    """Acklam's inverse normal CDF + one Halley refinement (float32).

    Shared by the statistics kernels (default deep-tail clip) and the
    QuantileTransformer in data/scalers.py (p_lo=1e-7, the float32-safe
    sklearn BOUNDS_THRESHOLD saturation) — one implementation so
    precision fixes cannot diverge."""
    p = jnp.clip(p, p_lo, 1.0 - 1e-7)
    a = jnp.array([-3.969683028665376e+01, 2.209460984245205e+02,
                   -2.759285104469687e+02, 1.383577518672690e+02,
                   -3.066479806614716e+01, 2.506628277459239e+00])
    b = jnp.array([-5.447609879822406e+01, 1.615858368580409e+02,
                   -1.556989798598866e+02, 6.680131188771972e+01,
                   -1.328068155288572e+01])
    c = jnp.array([-7.784894002430293e-03, -3.223964580411365e-01,
                   -2.400758277161838e+00, -2.549732539343734e+00,
                   4.374664141464968e+00, 2.938163982698783e+00])
    d = jnp.array([7.784695709041462e-03, 3.224671290700398e-01,
                   2.445134137142996e+00, 3.754408661907416e+00])
    plow, phigh = 0.02425, 1 - 0.02425

    def tail(q):
        r = jnp.sqrt(-2 * jnp.log(q))
        return (((((c[0] * r + c[1]) * r + c[2]) * r + c[3]) * r + c[4]) * r + c[5]) / \
               ((((d[0] * r + d[1]) * r + d[2]) * r + d[3]) * r + 1)

    def middle(pm):
        q = pm - 0.5
        r = q * q
        return (((((a[0] * r + a[1]) * r + a[2]) * r + a[3]) * r + a[4]) * r + a[5]) * q / \
               (((((b[0] * r + b[1]) * r + b[2]) * r + b[3]) * r + b[4]) * r + 1)

    x = jnp.where(p < plow, tail(p), jnp.where(p > phigh, -tail(1 - p), middle(p)))
    e = 0.5 * jax.lax.erfc(-x / jnp.sqrt(2.0)) - p
    u = e * jnp.sqrt(2 * jnp.pi) * jnp.exp(jnp.minimum(x * x / 2, 60.0))
    return x - u / (1 + x * u / 2)
