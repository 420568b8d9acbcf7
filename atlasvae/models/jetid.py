"""Supervised jet classifier: multi-branch CNN/FCN -> softmax.

Re-implements the reference's ``multi_CNN`` factory
(ref jet-ID/models.py:9-66): images grouped by shape into shared
multi-channel Conv towers (Conv + MaxPool + LeakyReLU(0) + Dropout,
ref :15-17 concatenates same-shape inputs on the channel axis), a
constituents FCN branch, a scalars FCN branch, concatenated into a
final FCN + softmax head.  Per-shape CNN hyper-parameters mirror the
shape-keyed CNN dict (ref jet-ID/classifier.py:74-77), and kernels
given as 3-tuples select the Conv3D tower over (h, w, channels)
volumes (ref jet-ID/models.py:23-34).  Hidden Dense/Conv kernels carry
the L2 penalty of ``kernel_regularizer=l2`` (ref :10; the softmax
output layer :66 is unregularized).

TPU-first notes: convolutions use ``lax.conv_general_dilated`` in
NHWC / NDHWC (channels-last maps onto the MXU as implicit GEMMs);
dropout is folded into the apply function with an explicit PRNG key;
LeakyReLU(alpha=0) is plain ReLU, kept under its reference name for
parity.  Multi-GPU MirroredStrategy (ref jet-ID/models.py:69-81) is
replaced by the mesh utilities in atlasvae.parallel.
"""

import dataclasses

import math

import jax
import jax.numpy as jnp

from .mlp import init_mlp, init_dense, dense_apply


@dataclasses.dataclass(frozen=True)
class JetIDConfig:
    n_classes: int = 2
    scalars: tuple = ()            # names of scalar branches (shape (d,))
    scalar_dims: tuple = ()
    images: tuple = ()             # names of image branches (shape (h, w))
    image_shapes: tuple = ()
    constituent_dim: int = 0       # flat constituents branch width (0 = off)
    nn_type: str = "FCN"           # 'CNN' or 'FCN' (ref classifier.py NN_type)
    fcn_neurons: tuple = (200, 200)
    branch_neurons: tuple = (200,)  # ref jet-ID/models.py:42,52
    cnn_maps: tuple = (100, 100)    # ref jet-ID/classifier.py:74-77 defaults
    cnn_kernels: tuple = ((3, 3), (3, 3))
    cnn_pools: tuple = ((2, 2), (2, 2))
    # per-shape overrides ((shape, maps, kernels, pools), ...) mirroring
    # the shape-keyed CNN dict (ref jet-ID/classifier.py:74-77); kernels
    # of length 3 select the Conv3D tower (ref jet-ID/models.py:23-34)
    cnn_by_shape: tuple = ()
    dropout: float = 0.1
    activation: str = "leaky_relu"
    # kernel L2 regularization strength (ref jet-ID/classifier.py:32
    # --l2 default 1e-7; applied via l2_penalty in the training loss)
    l2: float = 0.0
    # TPU analog of the reference's mixed_float16 policy
    # (ref jet-ID/models.py:74-75): compute in bfloat16 with float32
    # master weights; the softmax stays float32 (as Keras' mixed policy
    # keeps its softmax layer float32).  Default float32 for exactness.
    compute_dtype: str = "float32"


def _shape_groups(config):
    """Images grouped by shape, first-appearance order: one shared
    multi-channel tower per distinct shape (ref jet-ID/models.py:12-17)."""
    groups = {}
    for name, shape in zip(config.images, config.image_shapes):
        groups.setdefault(tuple(shape), []).append(name)
    return list(groups.items())


def _shape_cnn(config, shape):
    """(maps, kernels, pools) for a tower shape, honoring per-shape
    overrides (the shape-keyed CNN dict, ref jet-ID/classifier.py:74-77).

    Mirrors the reference's kernel-rank rule (ref jet-ID/models.py:23-27):
    3-D towers when every kernel has >=3 entries, else 2-D; kernels and
    pools are padded with 1s / truncated to that rank."""
    maps, kernels, pools = config.cnn_maps, config.cnn_kernels, config.cnn_pools
    for entry in config.cnn_by_shape:
        if tuple(entry[0]) == tuple(shape):
            maps, kernels, pools = entry[1], entry[2], entry[3]
            break
    rank = 3 if all(len(k) >= 3 for k in kernels) else 2
    kernels = tuple((tuple(k) + (1, 1))[:rank] for k in kernels)
    pools = tuple((tuple(p) + (1, 1))[:rank] for p in pools)
    return tuple(maps), kernels, pools, rank


def _tower_key(shape):
    return "x".join(str(s) for s in shape)


def _init_conv(key, kernel, c_in, c_out):
    """Conv kernel (spatial..., c_in, c_out), glorot-uniform (Keras
    Conv2D/Conv3D default)."""
    k_w, _ = jax.random.split(key)
    fan_in = math.prod(kernel) * c_in
    fan_out = math.prod(kernel) * c_out
    limit = jnp.sqrt(6.0 / (fan_in + fan_out))
    return {
        "w": jax.random.uniform(k_w, tuple(kernel) + (c_in, c_out),
                                minval=-limit, maxval=limit),
        "b": jnp.zeros((c_out,), jnp.float32),
    }


def init_jetid(key, config):
    params = {}
    keys = iter(jax.random.split(key, 64))
    concat_dim = 0
    if config.images and config.nn_type == "CNN":
        towers = {}
        for shape, names in _shape_groups(config):
            maps_list, kernels, pools, rank = _shape_cnn(config, shape)
            # 2-D: spatial (h, w), channels = n same-shape images;
            # 3-D: spatial (h, w, n_images), single input channel
            # (ref jet-ID/models.py:24 Reshape(...+(1,)))
            if rank == 2:
                spatial, c_in = [shape[0], shape[1]], len(names)
            else:
                spatial, c_in = [shape[0], shape[1], len(names)], 1
            convs = []
            for maps, kern, pool in zip(maps_list, kernels, pools):
                convs.append(_init_conv(next(keys), kern, c_in, maps))
                for d in range(rank):
                    spatial[d] = spatial[d] - kern[d] + 1           # VALID conv
                    if spatial[d] <= 0:
                        raise ValueError(
                            f"conv tower for shape {shape}: kernel {kern} "
                            f"does not fit the remaining volume (dim {d})")
                    spatial[d] = -(-spatial[d] // pool[d])          # SAME pool
                c_in = maps
            towers[_tower_key(shape)] = convs
            concat_dim += math.prod(spatial) * c_in
        params["towers"] = towers
    elif config.images:
        concat_dim += sum(s[0] * s[1] for s in config.image_shapes)
    if config.constituent_dim:
        params["constituents"] = init_mlp(
            next(keys), [config.constituent_dim] + list(config.branch_neurons),
            "glorot_uniform", "zeros")
        concat_dim += config.branch_neurons[-1]
    if config.scalar_dims:
        params["scalars"] = init_mlp(
            next(keys), [sum(config.scalar_dims)] + list(config.branch_neurons),
            "glorot_uniform", "zeros")
        concat_dim += config.branch_neurons[-1]
    params["head"] = init_mlp(next(keys), [concat_dim] + list(config.fcn_neurons),
                              "glorot_uniform", "zeros")
    params["out"] = init_dense(next(keys), config.fcn_neurons[-1], config.n_classes,
                               "glorot_uniform", "zeros")
    return params


def tower_flat_width(config, shape, n_names):
    """Flattened output width of one conv tower (the spatial math of
    ``init_jetid`` above: VALID convs, SAME ceil pools)."""
    maps_list, kernels, pools, rank = _shape_cnn(config, shape)
    if rank == 2:
        spatial, c_in = [shape[0], shape[1]], n_names
    else:
        spatial, c_in = [shape[0], shape[1], n_names], 1
    for maps, kern, pool in zip(maps_list, kernels, pools):
        for d in range(rank):
            spatial[d] = spatial[d] - kern[d] + 1
            if spatial[d] <= 0:
                raise ValueError(f"conv tower for shape {shape}: kernel "
                                 f"{kern} does not fit (dim {d})")
            spatial[d] = -(-spatial[d] // pool[d])
        c_in = maps
    return math.prod(spatial) * c_in


def concat_segments(config):
    """Ordered ``(label, width)`` segments of the trunk concat input in
    THIS implementation's layout (``jetid_apply`` below): shape-grouped
    towers in first-appearance order (or per-image flattens in FCN
    mode), then constituents, then scalars."""
    segs = []
    if config.images and config.nn_type == "CNN":
        for shape, names in _shape_groups(config):
            segs.append(("tower:" + _tower_key(shape),
                         tower_flat_width(config, shape, len(names))))
    elif config.images:
        for name, shape in zip(config.images, config.image_shapes):
            segs.append(("image:" + name, math.prod(shape)))
    if config.constituent_dim:
        segs.append(("constituents", config.branch_neurons[-1]))
    if config.scalar_dims:
        segs.append(("scalars", config.branch_neurons[-1]))
    return segs


def reference_concat_permutation(config):
    """Row permutation between this implementation's trunk-concat layout
    and the reference ``multi_CNN`` graph's (ref jet-ID/models.py:12-60).

    Two layout differences exist for multi-image models:

    * tower ORDER — the reference iterates ``set(shapes)``
      (ref :12), this implementation uses first-appearance order
      (``_shape_groups``); when they disagree, tower blocks land at
      different concat offsets;
    * FCN-with-images ELEMENT order — the reference stacks same-shape
      images channel-last and flattens the (h, w, n) block (pixel-major
      interleave, ref :16-17,38), this implementation concatenates each
      image's own (h*w) flatten (image-major blocks).

    Returns ``perm`` (numpy int array, length concat_dim) such that
    reference concat position ``r`` holds the feature this
    implementation puts at position ``perm[r]`` — i.e. a trunk kernel
    exports as ``w_ref = w_ours[perm]`` and imports as
    ``w_ours[perm] = w_ref``.  Returns None when the layouts already
    agree.  3-D image shapes in FCN mode are rejected (the reference's
    ``concatenate(axis=3)`` splices the middle of a 5-D block — not a
    layout any checkpoint should round-trip through).
    """
    import numpy as np
    segs = concat_segments(config)
    starts, pos = {}, 0
    for label, width in segs:
        starts[label] = pos
        pos += width
    perm = []
    if config.images:
        shapes = [tuple(s) for s in config.image_shapes]
        set_order = list(set(shapes))            # ref models.py:12 order
        groups = dict((tuple(s), n) for s, n in _shape_groups(config))
        for shape in set_order:
            names = groups[shape]
            if config.nn_type == "CNN":
                lo = starts["tower:" + _tower_key(shape)]
                perm.extend(range(lo, lo + tower_flat_width(
                    config, shape, len(names))))
            else:
                if len(shape) != 2 and len(names) > 1:
                    raise ValueError(
                        "FCN mode with multiple 3-D images has no "
                        "well-defined reference concat layout")
                lows = [starts["image:" + n] for n in names]
                for pixel in range(math.prod(shape)):
                    perm.extend(lo + pixel for lo in lows)
    for label in ("constituents", "scalars"):
        if label in starts:
            width = dict(segs)[label]
            perm.extend(range(starts[label], starts[label] + width))
    perm = np.asarray(perm, np.int64)
    return None if np.array_equal(perm, np.arange(pos)) else perm


_CONV_DIMS = {2: ("NHWC", "HWIO", "NHWC"), 3: ("NDHWC", "DHWIO", "NDHWC")}


def _use_fused_conv1(x, conv, pool, rank):
    """Opt-in (``ATLASVAE_CONV1=fused``) Pallas fusion of the input
    conv+bias+pool+relu block (ops/fused_conv.py).  Measured and
    REJECTED as a default on v5e: the in-kernel im2col's per-tap
    relayouts lose ~9x to XLA's conv at the tower shape, and Mosaic
    cannot compile the bf16 path (docs/PERF.md "Fused conv1 Pallas
    kernel").  Kept as a validated opt-in like ops/fused_vae.py; the
    measured default win on this block is the elementwise-backward pool
    below."""
    import os
    if os.environ.get("ATLASVAE_CONV1") != "fused" or rank != 2:
        return False
    from ..ops.fused_conv import supported
    return supported(x.shape, conv["w"].shape, pool)


def _use_fast_pool():
    """Opt-in (``ATLASVAE_POOL=fast``) elementwise-backward pool.
    Measured and REJECTED as a default on v5e: the reduce_window
    chain's own VJP is faster at the tower shapes (f32 fwd+bwd 8.3 vs
    15.0 ms, bf16 4.3 vs 9.8 ms same-run, benchmarks/anatomy_conv.py)
    — round 3's finding that the select_and_scatter folklore does not
    apply to window==stride pooling extends to its backward.  Kept as
    a bitwise-identical validated alternative (tests/test_pooling.py)."""
    import os
    return os.environ.get("ATLASVAE_POOL") == "fast"


def _conv_tower(convs, x, pools, rank, dropout, key, train, salt0=0):
    """``x`` arrives channels-last: (N, h, w, c) for 2-D towers,
    (N, h, w, d, 1) for 3-D towers.  ``salt0`` decorrelates dropout
    masks across towers (each Keras Dropout layer draws independently)."""
    for i, conv in enumerate(convs):
        if i == 0 and _use_fused_conv1(x, conv, tuple(pools[i]), rank):
            # first layer only: the fused VJP does not produce dx
            # (x is network input data here by construction)
            from ..ops.fused_conv import fused_conv1_pool_relu
            x = fused_conv1_pool_relu(x, conv["w"], conv["b"],
                                      tuple(pools[i]))
        else:
            x = jax.lax.conv_general_dilated(
                x, conv["w"], window_strides=(1,) * rank, padding="VALID",
                dimension_numbers=_CONV_DIMS[rank]) + conv["b"]
            if _use_fast_pool():
                from ..ops.pooling import maxpool_same
                x = maxpool_same(x, tuple(pools[i]))
            else:
                window = (1,) + tuple(pools[i]) + (1,)
                x = -jax.lax.reduce_window(-x, jnp.inf, jax.lax.min,
                                           window, window, "SAME")
            x = jax.nn.relu(x)  # LeakyReLU(alpha=0), ref jet-ID/models.py:36
        x = _dropout(x, dropout, key, salt0 + i, train)
    return x.reshape(x.shape[0], -1)


def _dropout(x, rate, key, salt, train):
    if not train or rate == 0.0:
        return x
    keep = jax.random.bernoulli(jax.random.fold_in(key, salt), 1.0 - rate, x.shape)
    return jnp.where(keep, x / (1.0 - rate), 0.0)


def _dense_stack(layers, x, dropout, key, salt0, train):
    """Dense > ReLU > Dropout per layer — the reference repeats the
    Dropout after EVERY branch/trunk dense (ref jet-ID/models.py:44-46,
    54-56,63-65), not once per stack."""
    for i, layer in enumerate(layers):
        x = jax.nn.relu(dense_apply(layer, x))
        x = _dropout(x, dropout, key, salt0 + i, train)
    return x


def l2_penalty(params):
    """Sum of squared kernels over every hidden Dense/Conv layer — the
    Keras ``kernel_regularizer=l2`` contribution (ref jet-ID/models.py:10;
    applied at :30-34,44,55,63).  Biases and the softmax output layer
    (ref :66, no regularizer) are excluded.  Multiply by config.l2."""
    total = jnp.float32(0.0)
    for name, sub in params.items():
        if name == "out":
            continue
        for path, leaf in jax.tree_util.tree_flatten_with_path(sub)[0]:
            if path and getattr(path[-1], "key", None) == "w":
                total = total + jnp.sum(jnp.square(leaf.astype(jnp.float32)))
    return total


def jetid_apply(params, config, inputs, key=None, train=False):
    """Forward pass -> class probabilities.  ``inputs`` is a dict keyed by
    branch name ('constituents', scalar names, image names); image
    branches sharing a shape are stacked on the channel axis into one
    tower (ref jet-ID/models.py:15-17)."""
    if key is None:
        key = jax.random.PRNGKey(0)
    dtype = jnp.dtype(config.compute_dtype)
    if dtype != jnp.float32:
        params = jax.tree.map(lambda a: a.astype(dtype), params)
        inputs = {k: jnp.asarray(v).astype(dtype) for k, v in inputs.items()}
    branches = []
    if config.images and config.nn_type == "CNN":
        for t, (shape, names) in enumerate(_shape_groups(config)):
            # (N, h, w, n_images): same-shape images stacked on the last
            # axis (ref jet-ID/models.py:15-17 concatenate axis=3)
            x = jnp.stack([inputs[n] for n in names], axis=-1)
            _, _, pools, rank = _shape_cnn(config, shape)
            if rank == 3:
                x = x[..., None]  # image stack becomes the depth axis
            branches.append(_conv_tower(params["towers"][_tower_key(shape)],
                                        x, pools, rank,
                                        config.dropout, key, train,
                                        salt0=1000 * (t + 1)))
    elif config.images:
        for name in config.images:
            branches.append(inputs[name].reshape(inputs[name].shape[0], -1))
    if config.constituent_dim:
        h = inputs["constituents"].reshape(inputs["constituents"].shape[0], -1)
        branches.append(_dense_stack(params["constituents"], h,
                                     config.dropout, key, 101, train))
    if config.scalar_dims:
        h = jnp.concatenate(
            [inputs[name].reshape(inputs[name].shape[0], -1) for name in config.scalars],
            axis=-1)
        branches.append(_dense_stack(params["scalars"], h,
                                     config.dropout, key, 202, train))
    h = jnp.concatenate(branches, axis=-1) if len(branches) > 1 else branches[0]
    h = _dense_stack(params["head"], h, config.dropout, key, 303, train)
    logits = dense_apply(params["out"], h).astype(jnp.float32)
    return jax.nn.softmax(logits, axis=-1)
