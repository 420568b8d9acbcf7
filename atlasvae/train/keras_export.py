"""Export atlasvae parameter pytrees as Keras legacy HDF5 weight files.

The reverse of :mod:`keras_import`, completing the two-way migration
story: a model trained here can be handed back to the reference's own
Keras code via ``model.load_weights('model.h5')`` (the file format the
reference reads at ref OE-VAE/vae.py:101, OE-AAE/train.py:99 and
jet-ID/classifier.py:167).

Files are written in the **Keras 2 legacy layout** (root ``layer_names``
attr, one HDF5 group per layer with a ``weight_names`` attr), which both
Keras 2 (the reference's TF 2.x stack) and the installed Keras 3 load
for ``.h5`` paths.  Legacy loading is *positional*: weight names are
cosmetic, but group order must match ``model.layers`` and within-group
order must match ``layer.weights``.  The orders used here are fixed by
the reference architectures:

* VAE (subclassed, ref OE-VAE/models.py:18-69): layers ``encoder`` then
  ``decoder``; encoder weights are the hidden denses in stack order then
  ``dense_mean`` / ``dense_log_var``; decoder is hidden denses then
  ``dense_output``.
* AAE (functional, ref OE-AAE/aae.py:73-116): weighted layers
  ``AUTOENCODER`` (ENCODER denses then DECODER denses, output dense last
  per component) then ``DISCRIMINATOR``.
* jet-ID (flat functional graph, ref jet-ID/models.py:9-66): one group
  per conv/dense layer, named with fresh-process Keras auto-names
  (``conv2d``/``conv2d_1``/…, ``dense``/``dense_1``/…) in *creation*
  order — conv towers first, then constituents branch, scalars branch,
  trunk, softmax head.  Keras orders a functional model's layers by
  graph depth, which equals creation order for FCN and single-tower CNN
  graphs (positional ``load_weights`` works).  Multi-tower graphs
  interleave towers by depth, so there load with
  ``model.load_weights(path, by_name=True)`` — names match a freshly
  built reference model, and Keras then ignores group order entirely.
"""

import numpy as np


def _to_np(x):
    return np.asarray(x, dtype=np.float32)


def _write_keras2(path, groups):
    """Write {layer_name: [(weight_path, array), ...]} in the legacy
    Keras 2 ``save_weights`` HDF5 layout (same spec the importer and
    tests/test_keras_import.py::_write_keras2_file consume)."""
    import h5py
    with h5py.File(path, "w") as f:
        f.attrs["layer_names"] = np.array(
            [name.encode() for name in groups])
        f.attrs["backend"] = b"tensorflow"
        f.attrs["keras_version"] = b"2.11.0"
        for layer, weights in groups.items():
            g = f.create_group(layer)
            g.attrs["weight_names"] = np.array(
                [n.encode() for n, _ in weights])
            for name, arr in weights:
                g.create_dataset(name, data=_to_np(arr))


def _wpair(prefix, layer):
    return [(f"{prefix}/kernel:0", layer["w"]),
            (f"{prefix}/bias:0", layer["b"])]


def _dense_name(i):
    """Keras auto-name for the i-th Dense created in a fresh process."""
    return "dense" if i == 0 else f"dense_{i}"


def maybe_export_keras(params, model_out, kind, config=None):
    """Reference-style ``--model_out model.h5`` runs must end with a
    Keras-loadable file (the reference reads its checkpoints back with
    ``model.load_weights``): when ``model_out`` names an .h5/.hdf5 path,
    replace the staged npz checkpoint with the Keras export and return
    True.  No-op (False) for native .npz outputs.  ``config`` (jet-ID
    only) enables the exact multi-image concat-layout rewrite."""
    if not model_out or not str(model_out).endswith((".h5", ".hdf5")):
        return False
    if kind == "jetid":
        export_keras_jetid(params, model_out, config)
    else:
        {"vae": export_keras_vae, "aae": export_keras_aae}[kind](params, model_out)
    return True


def export_keras_vae(params, path):
    """Write an ``init_vae`` pytree as the reference VAE's ``model.h5``.

    Loadable positionally by ``VariationalAutoEncoder.load_weights``
    (ref OE-VAE/models.py:55-69, vae.py:101) and round-trippable through
    :func:`keras_import.load_keras_vae`.
    """
    enc, dec = params["encoder"], params["decoder"]
    n = 0
    enc_w = []
    for layer in enc["hidden"]:
        enc_w += _wpair(f"autoencoder/encoder/{_dense_name(n)}", layer)
        n += 1
    enc_w += _wpair("autoencoder/encoder/dense_mean", enc["mean"])
    enc_w += _wpair("autoencoder/encoder/dense_log_var", enc["logvar"])
    dec_w = []
    for layer in dec["hidden"]:
        dec_w += _wpair(f"autoencoder/decoder/{_dense_name(n)}", layer)
        n += 1
    dec_w += _wpair("autoencoder/decoder/dense_output", dec["out"])
    _write_keras2(path, {"encoder": enc_w, "decoder": dec_w})


def export_keras_aae(params, path, include_discriminator=True):
    """Write an ``init_aae`` pytree as the reference's ``AAE.h5``
    (AUTOENCODER + DISCRIMINATOR groups) or, with
    ``include_discriminator=False``, as an AE-only file matching what
    ``AE.save_weights(AE_weights)`` produces (ref OE-AAE/aae.py:175) —
    the file the reference's ``--AE_weights`` resume path loads.
    """
    n = 0
    ae_w = []
    for comp, name in ((params["encoder"], "ENCODER"),
                       (params["decoder"], "DECODER")):
        for layer in list(comp["hidden"]) + [comp["out"]]:
            ae_w += _wpair(f"AUTOENCODER/{name}/{_dense_name(n)}", layer)
            n += 1
    groups = {"AUTOENCODER": ae_w}
    if include_discriminator:
        disc = params["discriminator"]
        disc_w = []
        for layer in list(disc["hidden"]) + [disc["out"]]:
            disc_w += _wpair(f"DISCRIMINATOR/{_dense_name(n)}", layer)
            n += 1
        groups["DISCRIMINATOR"] = disc_w
    _write_keras2(path, groups)


def export_keras_jetid(params, path, config=None):
    """Write an ``init_jetid`` pytree as the reference jet-ID
    ``model.h5``: one group per conv/dense layer, auto-named as a fresh
    Keras process building ``multi_CNN`` would (ref jet-ID/models.py:15-66
    creation order: towers, constituents branch, scalars branch, trunk,
    softmax head) and **listed in graph-depth order** so positional
    ``model.load_weights`` maps every layer correctly even for
    multi-tower graphs, where Keras interleaves parallel towers by
    depth.  ``by_name=True`` loading also works (names match the fresh
    process).  Round-trippable through
    :func:`keras_import.load_keras_jetid`, which re-sorts by name.

    Pass ``config`` (the ``JetIDConfig``) for multi-image models: the
    trunk's first kernel is rewritten from this implementation's concat
    layout into the reference graph's (tower set-order + FCN pixel
    interleave) so the loaded model computes identical outputs — without
    config the weights land on the right layers but multi-image concat
    offsets may be permuted.

    Depth bookkeeping (Keras depth = longest op path to the output;
    layers are listed deepest-first, ties in traversal order): every
    reference conv block is Conv > MaxPool > LeakyReLU > Dropout (4 ops),
    branch/trunk dense groups are Dense > LeakyReLU > Dropout (3 ops),
    then the concat and the float32 softmax head.  Tower traversal
    follows the iteration order of ``set(shapes)`` exactly as
    ref jet-ID/models.py:12 builds ``shape_set`` — deterministic for a
    given Python version; a target process whose set order differs
    surfaces as a clean shape error, not silent misassignment.
    """
    towers = params.get("towers", {})
    # tower keys are "HxW[xD]" shape strings (models/jetid.py _tower_key)
    shapes = {k: tuple(int(s) for s in k.split("x")) for k in towers}
    set_order = list(set(shapes.values()))       # ref models.py:12 order
    ordered = sorted(towers, key=lambda k: set_order.index(shapes[k]))

    if config is not None:
        # multi-image layouts: the trunk's first kernel rows follow OUR
        # concat order; rewrite them into the reference graph's order
        # (tower set-order + FCN pixel interleave — see
        # models/jetid.py::reference_concat_permutation)
        from ..models.jetid import reference_concat_permutation
        perm = reference_concat_permutation(config)
        if perm is not None:
            trunk = (params["head"][0] if params.get("head")
                     else params["out"])
            permuted = {"w": _to_np(trunk["w"])[perm], "b": trunk["b"]}
            if params.get("head"):
                params = {**params,
                          "head": [permuted] + list(params["head"][1:])}
            else:
                params = {**params, "out": permuted}

    n_trunk = len(params["head"])
    counters = {}
    entries = []                                 # (depth, created, name, layer)

    def add(kind, depth, layer):
        i = counters.get(kind, 0)
        counters[kind] = i + 1
        name = kind if i == 0 else f"{kind}_{i}"
        entries.append((depth, len(entries), name, layer))

    for k in ordered:
        n_blocks = len(towers[k])
        for j, conv in enumerate(towers[k]):
            kind = "conv3d" if np.ndim(conv["w"]) == 5 else "conv2d"
            add(kind, 4 * (n_blocks - j) + 3 * n_trunk + 2, conv)
    for comp in ("constituents", "scalars"):
        stack = params.get(comp, [])
        for m, layer in enumerate(stack):
            add("dense", 3 * (len(stack) - 1 - m) + 3 * n_trunk + 4, layer)
    for i, layer in enumerate(params["head"]):
        add("dense", 3 * (n_trunk - i), layer)
    add("dense", 0, params["out"])

    entries.sort(key=lambda e: (-e[0], e[1]))
    _write_keras2(path, {name: _wpair(name, layer)
                         for _, _, name, layer in entries})
