"""atlasvae — a TPU-native (JAX/XLA/Pallas/pjit) anomaly-detection framework.

Re-implements the full capability surface of the ATLAS-VAE reference
(unsupervised LHC anomaly detection: outlier-exposure VAE/AAE training,
supervised jet-ID baseline, BumpHunter dijet statistics, ROOT->HDF5 ETL)
as a from-scratch TPU-first design:

* models compile to single jitted XLA graphs (no eager per-batch Python),
* data parallelism is ``shard_map`` + ``psum`` over a ``jax.sharding.Mesh``
  (replacing tf.distribute.MirroredStrategy, ref jet-ID/models.py:69-81),
* host multiprocessing fan-outs of the reference (pairing, scalers,
  metrics, BumpHunter pseudo-experiments) become vmapped device programs,
* extreme-significance p-values are carried in log-space (replacing the
  reference's mpmath dps=1000 hack, ref OE-VAE/BumpHunter/bumphunter_1dim.py:17).

Subpackage map (reference layer in brackets, see SURVEY.md S1):

* ``atlasvae.data``     — HDF5 registry, loaders, pairing, weights, scalers [L1]
* ``atlasvae.models``   — VAE / AAE / jet-ID parameter pytrees + apply fns  [L2]
* ``atlasvae.losses``   — reconstruction / KLD / outlier-exposure bank      [L2]
* ``atlasvae.train``    — train state, jitted steps, plateau LR, checkpoint [L3]
* ``atlasvae.parallel`` — mesh construction, DP/TP shardings, collectives   [L3]
* ``atlasvae.stats``    — vectorized BumpHunter1D, log-space gamma          [L4]
* ``atlasvae.eval``     — discriminant bank, ROC/AUC, decorrelation, scans  [L4]
* ``atlasvae.plotting`` — matplotlib artifact layer                         [L4]
* ``atlasvae.etl``      — ROOT->HDF5 conversion, Lorentz canonicalization   [L0]
* ``atlasvae.cli``      — vae / aae / jetid / etl entry points, sweeps      [L5]
"""

__version__ = "0.1.0"

import os as _os

if _os.environ.get("ATLASVAE_PLATFORM"):
    # The axon TPU plugin ignores JAX_PLATFORMS; the config update is the
    # only reliable backend override (e.g. ATLASVAE_PLATFORM=cpu for
    # host-only runs or when the TPU tunnel is held by another process).
    import jax as _jax

    _jax.config.update("jax_platforms", _os.environ["ATLASVAE_PLATFORM"])

if _os.environ.get("ATLASVAE_PRNG"):
    # PRNG implementation override.  'rbg' (XLA RngBitGenerator) cuts the
    # canonical train step from ~140 to ~115 us on TPU v5e (threefry key
    # hashing does not fuse as well at these tiny model sizes); streams
    # remain deterministic per (key, platform) but are not bit-stable
    # across backends, so the default stays 'threefry2x32'.
    import jax as _jax

    _jax.config.update("jax_default_prng_impl", _os.environ["ATLASVAE_PRNG"])
