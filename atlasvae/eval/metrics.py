"""Per-jet anomaly discriminants as one vmapped device program.

The reference forks one OS process per metric over host numpy
(ref OE-VAE/plots.py:22-29 fan-out; formulas in OE-VAE/utils.py:346-375
``loss_function`` and :378-386 ``latent_loss``).  Here each metric is a
jitted kernel over the full (jets, features) matrices; computing the
whole bank launches a handful of fused XLA programs instead of
processes.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..models.vae import encode
from ..losses import kld_loss

METRIC_NAMES = ("MSE", "MAE", "MARE", "KLD", "JSD", "X-S", "Inputs", "Latent",
                "EMD", "KSD")

_CHUNK = 1_000_000


def _kld_terms(p, q):
    """Elementwise p*log2(p/q) with the reference's nan_to_num guard
    (ref OE-VAE/utils.py:347-350): NaN terms (0*log(0/0)) drop to 0, but
    +/-inf terms (q == 0 with p != 0) saturate to the float max — a jet
    whose prediction zeroes a live feature must rank maximally
    anomalous, not lose the term."""
    ratio = p / q
    term = p * jnp.log2(ratio)
    return jnp.nan_to_num(term)


@functools.partial(jax.jit, static_argnames=("metric",))
def _metric_kernel(p, q, metric):
    if metric in ("Inputs", "Inputs_scaled"):
        return jnp.mean(p, axis=1)
    if metric == "MSE":
        return jnp.mean((p - q) ** 2, axis=1)
    if metric == "MAE":
        return jnp.mean(jnp.abs(p - q), axis=1)
    if metric == "MARE":
        return jnp.mean(jnp.abs(p - q) / p, axis=1)
    # sums are re-saturated: several float-max terms overflow f32 to inf
    # (as the reference's f64 sums overflow past ~1.8e308), which would
    # turn into NaN in loss_mapping's x/(|x|+1); a finite max keeps the
    # "maximally anomalous" ranking without poisoning downstream maps
    if metric == "KLD":
        return jnp.nan_to_num(jnp.sum(_kld_terms(p, q), axis=1))
    if metric == "JSD":
        m = (p + q) / 2
        return jnp.nan_to_num(
            jnp.sum((_kld_terms(p, m) + _kld_terms(q, m)) / 2, axis=1))
    if metric == "X-S":
        return jnp.nan_to_num(jnp.sum(_kld_terms(p, p * q), axis=1))
    raise ValueError(f"unknown metric {metric!r}")


def loss_function(p, q, n_dims=3, metric="MAE", x_losses=None, multiloss=True,
                  mesh=None):
    """One discriminant over (true, predicted) matrices
    (ref OE-VAE/utils.py:346-375; same signature contract).

    EMD/KSD treat rows as constituent clouds / samples and run the
    vmapped device programs in atlasvae.ops.emd (replacing the
    reference's energyflow/scipy process fan-outs, ref utils.py:311-343);
    ``mesh`` shards their jet axis over the device mesh (zero
    collectives).
    """
    p = np.asarray(p, np.float32)
    q = np.asarray(q, np.float32)
    if metric == "EMD":
        from ..data.jets import jets_3v
        from ..ops.emd import emd_pairs
        out = emd_pairs(jets_3v(p, n_dims), jets_3v(q, n_dims), mesh=mesh)
        if multiloss and x_losses is not None:
            x_losses[metric] = out
            return None
        return out
    if metric == "KSD":
        from ..ops.emd import ks_pairs
        out = ks_pairs(p, q, mesh=mesh)
        if multiloss and x_losses is not None:
            x_losses[metric] = out
            return None
        return out
    out = np.concatenate([
        np.asarray(_metric_kernel(jnp.asarray(p[i:i + _CHUNK]),
                                  jnp.asarray(q[i:i + _CHUNK]), metric))
        for i in range(0, len(p), _CHUNK)
    ])
    if multiloss and x_losses is not None:
        x_losses[metric] = out
        return None
    return out


@jax.jit
def _latent_kernel(params, x):
    z_mean, z_log_var = encode(params, x)
    kld = kld_loss(z_mean, z_log_var)
    return jnp.where(jnp.isfinite(kld), kld, 0.0)


def latent_loss(x_true, params, chunk=100_000):
    """Encoder KLD per jet, chunked like the reference's 1e5 batching
    (ref OE-VAE/utils.py:378-386)."""
    x_true = np.asarray(x_true, np.float32)
    return np.concatenate([
        np.asarray(_latent_kernel(params, jnp.asarray(x_true[i:i + chunk])))
        for i in range(0, len(x_true), chunk)
    ])


def loss_mapping(x):
    """Map any loss distribution into [0, 1]
    (ref OE-VAE/plots.py:15-20, exact branch structure)."""
    x = np.asarray(x)
    if np.all((x >= 0) & (x <= 1)):
        return x
    if np.all((x >= -1) & (x <= 0)):
        return x + 1
    if np.all(x >= 0):
        return x / (np.abs(x) + 1)
    if np.all(x <= 0):
        return x / (np.abs(x) + 1) + 1
    return (x / (np.abs(x) + 1) + 1) / 2


def compute_metric_bank(x_true, x_pred, params=None, metrics=("Latent", "MAE", "KLD", "JSD"),
                        n_dims=3, sample=None, normal_losses=True, mesh=None):
    """The reference's per-metric process fan-out as sequential device
    launches (ref OE-VAE/plots.py:21-35).  ``mesh`` shards the EMD/KSD
    jet axis over the device mesh (ops/emd.py)."""
    x_losses = {}
    for metric in metrics:
        if metric == "Latent":
            if params is not None:
                x_losses["Latent"] = latent_loss(x_true, params)
        elif metric == "Inputs":
            if sample is not None and "constituents" in sample:
                x_losses["Inputs"] = loss_function(sample["constituents"], x_pred,
                                                   n_dims, "Inputs", multiloss=False)
            x_losses["Inputs_scaled"] = loss_function(x_true, x_pred, n_dims,
                                                      "Inputs_scaled", multiloss=False)
        else:
            x_losses[metric] = loss_function(x_true, x_pred, n_dims, metric,
                                             multiloss=False, mesh=mesh)
    if normal_losses:
        x_losses = {k: loss_mapping(v) for k, v in x_losses.items()}
    return x_losses
