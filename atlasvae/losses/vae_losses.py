"""VAE training losses: reconstruction + beta*KLD + lambda*outlier-exposure.

One jitted loss graph replacing the reference's eager per-batch calls
(ref OE-VAE/models.py:72-132).  Loss bank:

* reconstruction: MSE (OE types MSE/MSE-margin) or MAE (MAE/MAE-margin/KLD),
  per-sample mean over features (ref models.py:72-78),
* KLD: -mean(1 + log_var - exp(log_var) - mean^2)/2, exp clipped to 1e6
  (ref models.py:81-85),
* OE: KLD-gap relu(KLD_bkg - KLD_OoD + margin), or reconstruction-gap
  sigmoid / relu-margin variants (ref models.py:88-105),
* total: w*recon + beta*w*KLD + lambda*w_OoD*OE, all *per-sample* vectors
  (the gradient is taken of their sum, matching tf.GradientTape on a
  vector loss, ref models.py:181-183).

TPU note: the reference runs the VAE forward on the background batch
twice for MSE/MAE OE types (once for the reconstruction term, once
inside get_OE_loss, ref models.py:98,122).  With the reference's
canonical seed handling the two calls draw identical noise
(tf.random.set_seed per call, ref models.py:13), so here the forward is
computed once and reused — same math, half the FLOPs.
"""

import jax
import jax.numpy as jnp

from ..models.vae import vae_apply, encode, clip_values


def reconstruction_loss(x, x_hat, oe_type):
    if oe_type in ("MSE", "MSE-margin"):
        return jnp.mean((x - x_hat) ** 2, axis=-1)
    # MAE / MAE-margin / KLD (ref models.py:75-78)
    return jnp.mean(jnp.abs(x - x_hat), axis=-1)


def kld_loss(z_mean, z_log_var):
    z_exp = clip_values(jnp.exp(z_log_var))
    return -jnp.mean(1 + z_log_var - z_exp - z_mean ** 2, axis=-1) / 2


def oe_loss(recon_bkg_loss, kld_bkg, params, x_ood, oe_type, margin, key,
            activation="relu", noise=None, impl="xla"):
    """Outlier-exposure term.  For 'KLD' the gap is between latent KLDs;
    otherwise between reconstruction losses (ref models.py:88-105)."""
    if oe_type == "KLD":
        z_mean_ood, z_log_var_ood = encode(params, x_ood, activation, impl)
        return jax.nn.relu(kld_bkg - kld_loss(z_mean_ood, z_log_var_ood) + margin)
    recon_ood, _, _ = vae_apply(params, x_ood, key, activation, noise=noise,
                                impl=impl)
    loss_ood = reconstruction_loss(x_ood, recon_ood, oe_type)
    gap = recon_bkg_loss - loss_ood
    if oe_type in ("MSE", "MAE"):
        return jax.nn.sigmoid(gap)
    return jax.nn.relu(gap + margin)  # MSE-margin / MAE-margin


def get_losses(params, bkg_x, ood_x, bkg_w, ood_w, key, oe_type="KLD",
               beta=0.0, lamb=0.0, margin=0.0, activation="relu", noise=None,
               impl="xla"):
    """Per-sample loss vectors (MSE, KLD, OE, total), ref models.py:108-132.

    ``noise``: optional (noise_bkg, noise_ood) explicit latent draws for
    deterministic data-parallel sharding (see train/step.py).
    """
    k_bkg, k_ood = jax.random.split(key)
    noise_bkg, noise_ood = noise if noise is not None else (None, None)
    recon, z_mean, z_log_var = vae_apply(params, bkg_x, k_bkg, activation,
                                         noise=noise_bkg, impl=impl)
    raw_recon = reconstruction_loss(bkg_x, recon, oe_type)
    raw_kld = kld_loss(z_mean, z_log_var)
    loss_mse = raw_recon * bkg_w
    loss_kld = raw_kld * bkg_w * beta
    loss_oe = oe_loss(raw_recon, raw_kld, params, ood_x, oe_type, margin,
                      k_ood, activation, noise_ood, impl)
    loss_oe = loss_oe * ood_w * lamb
    total = loss_mse + loss_kld + loss_oe
    return loss_mse, loss_kld, loss_oe, total
