"""Jitted VAE training steps: whole data loads as single device programs.

The reference trains eagerly — one Python-dispatched GradientTape step
per batch (ref OE-VAE/models.py:177-200).  Here a *load* (up to ~1e6
jets) is moved to the device once and ``lax.scan`` iterates its batches
inside one compiled program: zero per-batch host round-trips, and under
data parallelism the gradient ``psum`` is the only cross-chip traffic
per batch.

Semantics preserved from the reference:
* gradient of the **sum** of per-sample losses (tf.GradientTape on a
  vector loss sums components, ref models.py:183),
* gradient guard: non-finite -> 0, clip to +-1e6 (ref models.py:185),
* per-sample weighted losses accumulated into epoch means
  (tf.keras.metrics.Mean, ref models.py:149-153,187-190).
"""

import jax
import jax.numpy as jnp
import optax

from ..losses import get_losses
from ..models.vae import clip_values


def clip_gradients(grads, max_val=1e6):
    return jax.tree.map(lambda g: clip_values(g, max_val), grads)


def make_optimizer(lr=1.0):
    """Adam with the learning rate applied as a traced multiplier.

    Adam's update is -lr * m_hat/(sqrt(v_hat)+eps) with lr-independent
    moments, so adam(1.0) + scaling the update by a traced ``lr``
    argument is mathematically identical to adam(lr) — and avoids
    optax.inject_hyperparams' ~15%/step overhead while keeping the
    plateau schedule (ref OE-VAE/models.py:236-238) a plain host-side
    float."""
    del lr  # the rate is passed to the step functions at call time
    return optax.adam(1.0)


def make_vae_step_fns(optimizer, oe_type="KLD", beta=0.0, lamb=0.0, margin=0.0,
                      activation="relu", mesh=None, data_axis="data",
                      impl="xla", hyper_traced=False, jit=True,
                      external_noise=False):
    """Build (train_on_load, valid_losses) jitted functions.

    Inputs are shaped (n_batches, batch, features) with a (n_batches,
    batch) float ``valid`` mask for tail padding.  When ``mesh`` is
    given, both functions run under ``shard_map`` with the batch axis
    sharded over ``data_axis`` and gradients/metrics reduced with psum
    over ICI (replacing MirroredStrategy's NCCL all-reduce,
    ref jet-ID/models.py:72).

    ``hyper_traced=True`` returns functions taking (beta, lamb, margin)
    as a traced tuple argument after ``lr`` — the building block for
    vmapped ensemble/sweep training (train/ensemble.py), where G
    hyper-parameter configurations train as one device program.  With
    the default False, the constructor's beta/lamb/margin are baked in
    as constants (identical graphs to previous rounds).  ``jit=False``
    returns the raw traceable functions (for vmap composition).

    ``external_noise=True``: both functions take two trailing arguments
    ``noise_bkg, noise_ood`` shaped (n_batches, batch, latent) holding
    the standard-normal reparameterization draws for each batch, in
    place of the internal PRNG stream.  This is the deterministic
    noise-injection hook: feeding the same stream to the reference's
    ``tf.random.normal`` (ref OE-VAE/models.py:7-15) and to these
    functions removes the one stochastic divergence between the two
    frameworks, turning loss-curve parity from percent-level
    "attributed to RNG" into a directly measured numerical bound
    (tests/test_reference_parity.py).
    """

    def _global_noise(params, key, local_batch):
        """Latent noise drawn at *global* batch shape, sliced per shard:
        data-parallel runs reproduce the single-device program exactly."""
        latent = params["encoder"]["mean"]["b"].shape[0]
        n_shards = mesh.shape[data_axis] if mesh is not None else 1
        k_bkg, k_ood = jax.random.split(jax.random.fold_in(key, 17))
        shape = (n_shards * local_batch, latent)
        noise_bkg = jax.random.normal(k_bkg, shape)
        noise_ood = jax.random.normal(k_ood, shape)
        if mesh is not None:
            start = jax.lax.axis_index(data_axis) * local_batch
            noise_bkg = jax.lax.dynamic_slice_in_dim(noise_bkg, start, local_batch)
            noise_ood = jax.lax.dynamic_slice_in_dim(noise_ood, start, local_batch)
        return noise_bkg, noise_ood

    def batch_losses(params, hyper, key, noise, bkg_x, ood_x, bkg_w, ood_w,
                     valid):
        h_beta, h_lamb, h_margin = hyper
        mse, kld, oe, total = get_losses(params, bkg_x, ood_x, bkg_w, ood_w,
                                         key, oe_type, h_beta, h_lamb,
                                         h_margin, activation, noise, impl)
        total = total * valid
        metrics = jnp.stack([jnp.sum(mse * valid), jnp.sum(kld * valid),
                             jnp.sum(oe * valid), jnp.sum(total), jnp.sum(valid)])
        return jnp.sum(total), metrics

    grad_fn = jax.grad(batch_losses, has_aux=True)

    def _train_on_load_h(params, opt_state, lr, hyper, key, bkg_x, ood_x,
                         bkg_w, ood_w, valid, *ext_noise):
        in_dp = mesh is not None

        def step(carry, batch):
            params, opt_state, key = carry
            key, sub = jax.random.split(key)
            batch, noise = (batch[:5], batch[5:]) if external_noise else \
                (batch, _global_noise(params, sub, batch[0].shape[0]))
            grads, metrics = grad_fn(params, hyper, sub, noise, *batch)
            if in_dp:
                grads = jax.lax.psum(grads, data_axis)
                metrics = jax.lax.psum(metrics, data_axis)
            grads = clip_gradients(grads)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            updates = jax.tree.map(lambda u: u * lr, updates)
            params = optax.apply_updates(params, updates)
            return (params, opt_state, key), metrics

        (params, opt_state, _), metrics = jax.lax.scan(
            step, (params, opt_state, key),
            (bkg_x, ood_x, bkg_w, ood_w, valid) + ext_noise)
        return params, opt_state, metrics

    def _valid_losses_h(params, hyper, key, bkg_x, ood_x, bkg_w, ood_w, valid,
                        *ext_noise):
        in_dp = mesh is not None

        def step(key, batch):
            key, sub = jax.random.split(key)
            batch, noise = (batch[:5], batch[5:]) if external_noise else \
                (batch, _global_noise(params, sub, batch[0].shape[0]))
            _, m = batch_losses(params, hyper, sub, noise, *batch)
            # (sum total, sum valid) — keep historical metric layout
            m = jnp.stack([m[3], m[4]])
            if in_dp:
                m = jax.lax.psum(m, data_axis)
            return key, m

        _, metrics = jax.lax.scan(
            step, key, (bkg_x, ood_x, bkg_w, ood_w, valid) + ext_noise)
        return metrics

    if hyper_traced:
        _train_on_load, _valid_losses = _train_on_load_h, _valid_losses_h
    else:
        hyper_const = (beta, lamb, margin)

        def _train_on_load(params, opt_state, lr, key, *batches):
            return _train_on_load_h(params, opt_state, lr, hyper_const, key,
                                    *batches)

        def _valid_losses(params, key, *batches):
            return _valid_losses_h(params, hyper_const, key, *batches)

    if mesh is None:
        if not jit:
            return _train_on_load, _valid_losses
        return jax.jit(_train_on_load), jax.jit(_valid_losses)
    if hyper_traced:
        raise NotImplementedError(
            "hyper_traced + data-parallel mesh: shard the config axis "
            "instead (see train/ensemble.py), configs need no collectives")

    from jax.sharding import PartitionSpec as P
    from jax import shard_map
    rep = P()
    batch_sharded = P(None, data_axis)
    noise_specs = (batch_sharded, batch_sharded) if external_noise else ()
    train_sharded = shard_map(
        _train_on_load, mesh=mesh,
        in_specs=(rep, rep, rep, rep, batch_sharded, batch_sharded,
                  batch_sharded, batch_sharded, batch_sharded) + noise_specs,
        out_specs=(rep, rep, rep),
        check_vma=False)
    valid_sharded = shard_map(
        _valid_losses, mesh=mesh,
        in_specs=(rep, rep, batch_sharded, batch_sharded, batch_sharded,
                  batch_sharded, batch_sharded) + noise_specs,
        out_specs=rep,
        check_vma=False)
    return jax.jit(train_sharded), jax.jit(valid_sharded)


def batch_load(sample_x, ood_x, sample_w, ood_w, batch_size, n_devices=1):
    """Host-side packing: pad a load to whole (possibly device-divisible)
    batches and reshape to (n_batches, batch, ...) + validity mask."""
    import numpy as np
    n = len(sample_x)
    batch_size = int(batch_size)
    # batch divisible by device count for even sharding
    batch_size = max(n_devices, batch_size - batch_size % n_devices)
    n_batches = max(1, -(-n // batch_size))
    padded = n_batches * batch_size
    valid = np.zeros(padded, dtype=np.float32)
    valid[:n] = 1.0

    def pack(arr):
        arr = np.asarray(arr, dtype=np.float32)
        out = np.zeros((padded,) + arr.shape[1:], dtype=np.float32)
        out[:n] = arr
        return out.reshape((n_batches, batch_size) + arr.shape[1:])

    return (pack(sample_x), pack(ood_x), pack(sample_w), pack(ood_w),
            valid.reshape(n_batches, batch_size))


def _transfer_dtype():
    import os
    return os.environ.get("ATLASVAE_TRANSFER_DTYPE") or None


@jax.jit
def _widen_f32(tree):
    return jax.tree.map(
        lambda a: a.astype(jnp.float32)
        if jnp.issubdtype(a.dtype, jnp.floating) and a.dtype != jnp.float32
        else a, tree)


def device_put_load(batches, mesh=None, data_axis="data"):
    """Commit a packed load to device memory, sharded over ``data_axis``
    along the per-batch row axis when a mesh is given (matching the
    shard_map in_specs above), so subsequent step calls start from
    device-resident buffers.

    ``ATLASVAE_TRANSFER_DTYPE=float16`` sends float leaves over the wire
    at half width and widens back to float32 on device — the remote
    tunnel's host->device bandwidth (~60 MB/s here) dominates streaming
    epochs, and f16 quantization of the scaled inputs (rel. error ~5e-4)
    matches the reference's own f16 constituent storage
    (ref tools/root_utils.py:45).  Off by default for bit-exactness."""
    td = _transfer_dtype()
    if td:
        import numpy as np
        batches = jax.tree.map(
            lambda b: np.asarray(b).astype(td)
            if np.issubdtype(np.asarray(b).dtype, np.floating) else b, batches)
    if mesh is None:
        out = jax.tree.map(jax.device_put, batches)
    else:
        from jax.sharding import NamedSharding, PartitionSpec as P

        def put(b):
            # data_axis=None -> replicate (config-sharded ensemble mode:
            # every device sees the full load, train/ensemble.py)
            spec = P() if data_axis is None else \
                P(*((None, data_axis) + (None,) * (b.ndim - 2)))
            return jax.device_put(b, NamedSharding(mesh, spec))

        out = jax.tree.map(put, batches)
    return _widen_f32(out) if td else out


class LoadCache:
    """Device-resident cache of packed training loads.

    Keyed by the *identity* of the host sample dicts plus the batch
    geometry: when an epoch re-presents the same load objects (the cached
    single-load regime of data/generator.py, mirroring the reference's
    fixed-seed per-epoch re-prepare, ref OE-VAE/vae.py:116-140), the
    host-side packing and the host->device transfer are both skipped.
    Measured on the axon TPU tunnel this cuts an 800k-jet epoch from
    ~1.4 s to ~40 ms — the transfer, not the compute, dominates the
    epoch wall.

    Samples are treated as immutable once handed to the trainer
    (JAX-idiomatic); in-place mutation of a cached load's arrays is not
    detected.  Total cached bytes are bounded (ATLASVAE_DEVICE_CACHE_GB,
    default 4 GB); insertion beyond the budget evicts oldest-first, and
    loads larger than the whole budget are passed through uncached.
    """

    def __init__(self, budget_bytes=None):
        if budget_bytes is None:
            import os
            budget_bytes = int(
                float(os.environ.get("ATLASVAE_DEVICE_CACHE_GB", "4")) * 1e9)
        self.budget = budget_bytes
        self._entries = {}  # key -> (sample_refs, device_batches, nbytes)
        self._total = 0

    def get(self, samples, geometry, build, mesh=None, data_axis="data"):
        """Return device-resident batches for (samples, geometry).

        ``samples``: tuple of host sample dicts (identity-compared),
        ``geometry``: hashable extras (batch size, device count),
        ``build``: zero-arg callable producing the packed numpy batches.
        """
        key = tuple(id(s) for s in samples) + (geometry,)
        entry = self._entries.get(key)
        if entry is not None and all(a is b for a, b in zip(entry[0], samples)):
            return entry[1]
        batches = build()
        nbytes = sum(b.nbytes for b in jax.tree.leaves(batches))
        if nbytes > self.budget:
            # uncached streaming: still transfer explicitly so the
            # half-width wire format (ATLASVAE_TRANSFER_DTYPE) applies
            if _transfer_dtype():
                return device_put_load(batches, mesh, data_axis)
            return batches  # jit will stream it per call
        batches = device_put_load(batches, mesh, data_axis)
        while self._total + nbytes > self.budget and self._entries:
            old_key = next(iter(self._entries))
            self._total -= self._entries.pop(old_key)[2]
        self._entries[key] = (samples, batches, nbytes)
        self._total += nbytes
        return batches
