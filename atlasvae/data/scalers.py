"""Feature scalers as jitted array programs.

The reference fits sklearn transformers and applies them via a
half-the-CPUs process fan-out (ref OE-VAE/utils.py:389-438).  Here each
scaler is a small parameter pytree (quantile tables / medians / scales)
whose transform is one vmapped XLA program, so "apply scaler" is a single
device launch instead of a process pool.  Supported types match the
reference: QuantileTransformer (normal output), PowerTransformer
(Yeo-Johnson), RobustScaler, MaxAbsScaler (ref OE-VAE/utils.py:393-400).

Scalers are plain dataclasses of numpy arrays -> picklable, like the
reference's pickled sklearn objects (ref OE-VAE/vae.py:103-108).
"""

import dataclasses
import pickle
import time

import jax
import jax.numpy as jnp
import numpy as np

_N_QUANTILES = 10_000  # ref OE-VAE/utils.py:394


@dataclasses.dataclass
class Scaler:
    kind: str
    # quantile: per-feature sorted reference values (n_quantiles, n_features)
    quantiles: np.ndarray | None = None
    # robust: medians/iqr; maxabs: scale; power: lambdas + mean/std
    center: np.ndarray | None = None
    scale: np.ndarray | None = None
    lambdas: np.ndarray | None = None

    def save(self, path):
        with open(path, "wb") as f:
            pickle.dump(self, f)

    @staticmethod
    def load(path):
        """Load a scaler pickle; a fitted sklearn transformer pickled by
        the reference (ref OE-VAE/utils.py:404 `pickle.dump(scaler, ...)`)
        is converted in place, so ``--HLV_scaler_in=HLV_RobustScaler.pkl``
        files from reference runs drop straight in."""
        with open(path, "rb") as f:
            obj = pickle.load(f)
        if isinstance(obj, Scaler):
            return obj
        return Scaler.from_sklearn(obj)

    @staticmethod
    def from_sklearn(obj):
        """Convert a fitted sklearn transformer into the equivalent
        parameter pytree (the four types the reference fits,
        ref OE-VAE/utils.py:393-400)."""
        name = type(obj).__name__
        if name == "QuantileTransformer":
            if getattr(obj, "output_distribution", None) != "normal":
                raise ValueError(
                    "only output_distribution='normal' QuantileTransformers "
                    "are supported (the reference always fits 'normal', "
                    f"got {obj.output_distribution!r})")
            return Scaler(kind="quantile-normal",
                          quantiles=np.asarray(obj.quantiles_, np.float32))
        if name == "RobustScaler":
            # sklearn leaves center_/scale_ as None when the respective
            # option is off; with both off, n_features_in_ still sizes
            # the (identity) parameter vectors
            n = (len(obj.scale_) if obj.with_scaling else
                 len(obj.center_) if obj.with_centering else
                 int(obj.n_features_in_))
            scale = (np.asarray(obj.scale_, np.float64)
                     if obj.with_scaling else np.ones(n))
            center = (np.asarray(obj.center_, np.float64)
                      if obj.with_centering else np.zeros_like(scale))
            return Scaler(kind="robust", center=center.astype(np.float32),
                          scale=scale.astype(np.float32))
        if name == "PowerTransformer":
            if getattr(obj, "method", "yeo-johnson") != "yeo-johnson":
                raise ValueError("only method='yeo-johnson' PowerTransformers"
                                 f" are supported, got {obj.method!r}")
            lams = np.asarray(obj.lambdas_, np.float64)
            if obj.standardize:
                center = np.asarray(obj._scaler.mean_, np.float64)
                scale = np.asarray(obj._scaler.scale_, np.float64)
            else:
                center, scale = np.zeros_like(lams), np.ones_like(lams)
            return Scaler(kind="power-yj", lambdas=lams.astype(np.float32),
                          center=center.astype(np.float32),
                          scale=scale.astype(np.float32))
        if name == "MaxAbsScaler":
            return Scaler(kind="maxabs",
                          scale=np.asarray(obj.scale_, np.float32))
        raise TypeError(f"cannot convert {name!r} to an atlasvae Scaler; "
                        "supported: QuantileTransformer(normal), "
                        "RobustScaler, PowerTransformer(yeo-johnson), "
                        "MaxAbsScaler")


# ---------------------------------------------------------------- fitting

def _yeo_johnson(x, lam):
    pos = x >= 0
    lam_nz = np.where(np.abs(lam) < 1e-8, 1.0, lam)
    lam2_nz = np.where(np.abs(lam - 2.0) < 1e-8, 1.0, 2.0 - lam)
    yp = np.where(np.abs(lam) < 1e-8, np.log1p(x), ((1 + x) ** lam_nz - 1) / lam_nz)
    yn = np.where(np.abs(lam - 2.0) < 1e-8, -np.log1p(-x),
                  -(((1 - x) ** lam2_nz) - 1) / lam2_nz)
    return np.where(pos, yp, yn)


def _yj_loglik(x, lam):
    n = len(x)
    y = _yeo_johnson(x, lam)
    var = np.var(y)
    if var <= 0 or not np.isfinite(var):
        return -np.inf
    return -0.5 * n * np.log(var) + (lam - 1) * np.sum(np.sign(x) * np.log1p(np.abs(x)))


def _fit_yj_lambda(x, lo=-4.0, hi=4.0, iters=60):
    """Golden-section MLE for the Yeo-Johnson exponent (scipy-free brent
    replacement; matches sklearn PowerTransformer's objective)."""
    gr = (np.sqrt(5.0) - 1) / 2
    a, b = lo, hi
    c, d = b - gr * (b - a), a + gr * (b - a)
    fc, fd = _yj_loglik(x, c), _yj_loglik(x, d)
    for _ in range(iters):
        if fc > fd:
            b, d, fd = d, c, fc
            c = b - gr * (b - a)
            fc = _yj_loglik(x, c)
        else:
            a, c, fc = c, d, fd
            d = a + gr * (b - a)
            fd = _yj_loglik(x, d)
    return (a + b) / 2


def fit_scaler(sample, n_dims=3, scaler_out=None, scaler_type="RobustScaler",
               reshape=False, verbose=True):
    """Fit a scaler on the training sample (ref OE-VAE/utils.py:389-405).

    ``reshape`` flattens (jets, 4*n_const) into per-component rows, as the
    reference optionally does for constituents.
    """
    if not scaler_type:
        return None
    start = time.time()
    if verbose:
        print(f"Fitting {scaler_type} to QCD sample", end="", flush=True)
    x = np.asarray(sample, dtype=np.float64)
    if reshape:
        x = x.reshape(-1, n_dims)
    if scaler_type == "QuantileTransformer":
        # sklearn subsamples to 1e5 rows before computing the quantile
        # table (QuantileTransformer(subsample=1e5) default); matching
        # that keeps multi-million-row fits cheap and statistics equal
        if len(x) > 100_000:
            idx = np.random.default_rng(0).choice(len(x), 100_000, replace=False)
            x_fit = x[idx]
        else:
            x_fit = x
        n_q = min(_N_QUANTILES, len(x_fit))
        refs = np.linspace(0, 1, n_q)
        quantiles = np.nanquantile(x_fit, refs, axis=0)
        scaler = Scaler(kind="quantile-normal", quantiles=quantiles.astype(np.float32))
    elif scaler_type == "PowerTransformer":
        lams = np.array([_fit_yj_lambda(x[:, j]) for j in range(x.shape[1])])
        y = np.stack([_yeo_johnson(x[:, j], lams[j]) for j in range(x.shape[1])], axis=1)
        scaler = Scaler(kind="power-yj", lambdas=lams.astype(np.float32),
                        center=np.mean(y, axis=0).astype(np.float32),
                        scale=np.maximum(np.std(y, axis=0), 1e-12).astype(np.float32))
    elif scaler_type == "RobustScaler":
        q25, q50, q75 = np.percentile(x, [25, 50, 75], axis=0)
        iqr = np.where(q75 - q25 == 0, 1.0, q75 - q25)
        scaler = Scaler(kind="robust", center=q50.astype(np.float32),
                        scale=iqr.astype(np.float32))
    elif scaler_type == "MaxAbsScaler":
        scale = np.max(np.abs(x), axis=0)
        scale = np.where(scale == 0, 1.0, scale)
        scaler = Scaler(kind="maxabs", scale=scale.astype(np.float32))
    else:
        raise ValueError(f"unknown scaler type {scaler_type!r}")
    if verbose:
        print(f" ({time.time() - start:2.1f} s)")
    if scaler_out:
        if verbose:
            print("Saving to " + str(scaler_out))
        scaler.save(scaler_out)
    return scaler


# ------------------------------------------------------------- transforms

def _ndtri(p):
    """Inverse standard-normal CDF, clipped to [1e-7, 1-1e-7]
    (float32-safe; sklearn's QuantileTransformer saturates at the same
    +-5.2 sigma via its BOUNDS_THRESHOLD).  Delegates to the shared
    Acklam+Halley kernel in ops/gammainc.py."""
    from ..ops.gammainc import _ndtri as _shared_ndtri
    return _shared_ndtri(p, p_lo=1e-7)


def _ndtr(x):
    return 0.5 * jax.lax.erfc(-x / jnp.sqrt(2.0))


@jax.jit
def _quantile_transform(x, quantiles):
    n_q = quantiles.shape[0]
    refs = jnp.linspace(0.0, 1.0, n_q)

    def per_feature(col, qcol):
        # two-sided interpolation, as sklearn does, for exact-tie symmetry
        fwd = jnp.interp(col, qcol, refs)
        rev = -jnp.interp(-col, -qcol[::-1], -refs[::-1])
        return 0.5 * (fwd + rev)

    p = jax.vmap(per_feature, in_axes=(1, 1), out_axes=1)(x, quantiles)
    return _ndtri(p)


@jax.jit
def _quantile_inverse(z, quantiles):
    n_q = quantiles.shape[0]
    refs = jnp.linspace(0.0, 1.0, n_q)
    p = _ndtr(z)
    return jax.vmap(lambda pc, qc: jnp.interp(pc, refs, qc), in_axes=(1, 1), out_axes=1)(p, quantiles)


@jax.jit
def _yj_transform(x, lam, center, scale):
    lam = lam[None, :]
    pos = x >= 0
    lam_nz = jnp.where(jnp.abs(lam) < 1e-8, 1.0, lam)
    lam2_nz = jnp.where(jnp.abs(lam - 2.0) < 1e-8, 1.0, 2.0 - lam)
    yp = jnp.where(jnp.abs(lam) < 1e-8, jnp.log1p(x),
                   ((1 + jnp.maximum(x, 0)) ** lam_nz - 1) / lam_nz)
    yn = jnp.where(jnp.abs(lam - 2.0) < 1e-8, -jnp.log1p(-x),
                   -(((1 - jnp.minimum(x, 0)) ** lam2_nz) - 1) / lam2_nz)
    y = jnp.where(pos, yp, yn)
    return (y - center[None, :]) / scale[None, :]


@jax.jit
def _yj_inverse(z, lam, center, scale):
    y = z * scale[None, :] + center[None, :]
    lam = lam[None, :]
    lam_nz = jnp.where(jnp.abs(lam) < 1e-8, 1.0, lam)
    lam2_nz = jnp.where(jnp.abs(lam - 2.0) < 1e-8, 1.0, 2.0 - lam)
    xp = jnp.where(jnp.abs(lam) < 1e-8, jnp.expm1(y),
                   (jnp.maximum(y * lam_nz + 1, 1e-12)) ** (1 / lam_nz) - 1)
    xn = jnp.where(jnp.abs(lam - 2.0) < 1e-8, -jnp.expm1(-y),
                   1 - (jnp.maximum(1 - lam2_nz * y, 1e-12)) ** (1 / lam2_nz))
    return jnp.where(y >= 0, xp, xn)


def _transform_chunk(scaler, x, inverse=False):
    if scaler.kind == "quantile-normal":
        fn = _quantile_inverse if inverse else _quantile_transform
        return fn(x, jnp.asarray(scaler.quantiles))
    if scaler.kind == "power-yj":
        fn = _yj_inverse if inverse else _yj_transform
        return fn(x, jnp.asarray(scaler.lambdas), jnp.asarray(scaler.center),
                  jnp.asarray(scaler.scale))
    if scaler.kind == "robust":
        c, s = jnp.asarray(scaler.center), jnp.asarray(scaler.scale)
        return x * s[None, :] + c[None, :] if inverse else (x - c[None, :]) / s[None, :]
    if scaler.kind == "maxabs":
        s = jnp.asarray(scaler.scale)
        return x * s[None, :] if inverse else x / s[None, :]
    raise ValueError(f"unknown scaler kind {scaler.kind!r}")


def _apply(scaler, sample, n_dims, reshape, inverse, chunk=2_000_000):
    x = np.asarray(sample, dtype=np.float32)
    shape = x.shape
    if reshape:
        x = x.reshape(-1, n_dims)
    out = np.concatenate([
        np.asarray(_transform_chunk(scaler, jnp.asarray(x[i:i + chunk]), inverse))
        for i in range(0, len(x), chunk)
    ]) if len(x) else x
    return out.reshape(shape).astype(np.float32)


def apply_scaler(sample, n_dims=3, scaler=None, tag="sample", reshape=False, verbose=True):
    """Apply a fitted scaler (ref OE-VAE/utils.py:417-430); identity when
    scaler is None, chunked device launches instead of a process pool."""
    if scaler is None:
        return np.asarray(sample)
    start = time.time()
    if verbose:
        print("Applying scaler/transformer to " + tag, end="", flush=True)
    out = _apply(scaler, sample, n_dims, reshape, inverse=False)
    if verbose:
        print(f" ({time.time() - start:2.1f} s)")
    return out


def inverse_scaler(sample, n_dims=3, scaler=None, reshape=False, verbose=True):
    """Invert a fitted scaler (ref OE-VAE/utils.py:431-438)."""
    if scaler is None:
        return np.asarray(sample)
    return _apply(scaler, sample, n_dims, reshape, inverse=True)
