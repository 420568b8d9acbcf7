"""Import reference-trained Keras ``model.h5`` weights into pytrees.

Reference runs leave Keras weight checkpoints on disk
(``vae.save_weights(model_out)``, ref OE-VAE/models.py:227, default
``model.h5``; the AAE trainer saves the combined ``AAE.h5``,
ref OE-AAE/train.py:142).  A migrating user points ``--model_in`` at
one of those files; this module reads the HDF5 directly (no TensorFlow
needed) and maps the dense layers onto the matching atlasvae parameter
pytree.

Two on-disk layouts are handled:

* **Keras 2 legacy HDF5** (what the reference's TF 2.x actually wrote):
  root attrs ``layer_names``; one group per layer whose
  ``weight_names`` attr lists paths like ``encoder/dense/kernel:0``
  with the datasets stored at those paths inside the group.
* **Keras 3 ``.weights.h5``**: nested groups following the attribute
  path (``encoder/denses/dense_1``) with each variable under a
  ``vars`` group (``vars/0`` kernel, ``vars/1`` bias).

Both are normalized to ``path/kernel`` + ``path/bias`` entries, then
matched by layer-name conventions fixed by the reference architectures:
``dense_mean`` / ``dense_log_var`` / ``dense_output`` heads and
``dense[_N]`` hidden stacks under ``encoder`` / ``decoder``
(ref OE-VAE/models.py:18-52); ``ENCODER`` / ``DECODER`` /
``DISCRIMINATOR`` functional components whose last dense is the output
layer (ref OE-AAE/aae.py:20-58).  Keras kernels are (in, out), the same
orientation as ``mlp.init_dense``, so no transposes.
"""

import re

import numpy as np


def _normalize_keras2(f):
    """Legacy save_weights layout -> {name/kernel|bias: array}."""
    named = {}
    for layer_name in [n.decode() if isinstance(n, bytes) else n
                       for n in f.attrs["layer_names"]]:
        group = f[layer_name]
        for wname in [n.decode() if isinstance(n, bytes) else n
                      for n in group.attrs.get("weight_names", [])]:
            named[re.sub(r":\d+$", "", wname)] = np.asarray(group[wname])
    return named


def _normalize_keras3(f):
    """Keras 3 .weights.h5 layout -> {name/kernel|bias: array}."""
    import h5py
    named = {}

    def walk(group, prefix):
        for key, item in group.items():
            if isinstance(item, h5py.Group):
                if key == "vars":
                    for _, var in sorted(item.items(), key=lambda kv: kv[0]):
                        arr = np.asarray(var)
                        kind = "kernel" if arr.ndim >= 2 else "bias"
                        named[f"{prefix}/{kind}"] = arr
                else:
                    walk(item, f"{prefix}/{key}" if prefix else key)

    walk(f, "")
    return named


def read_keras_weights(path):
    """Read a Keras weight HDF5 (either format) into a flat
    {normalized_name: array} dict."""
    import h5py
    with h5py.File(path, "r") as f:
        if "layer_names" in f.attrs:
            return _normalize_keras2(f)
        return _normalize_keras3(f)


def sniff_weights_format(path):
    """'keras' (HDF5 magic) vs 'npz' (zip magic) by file signature —
    extension-independent, so a reference-style ``--model_out model.h5``
    run can stage npz checkpoints under the .h5 name until the final
    Keras export replaces them."""
    with open(path, "rb") as f:
        magic = f.read(8)
    if magic.startswith(b"\x89HDF"):
        return "keras"
    if magic.startswith(b"PK"):
        return "npz"
    raise ValueError(f"{path}: neither a Keras HDF5 weight file nor an "
                     "npz pytree checkpoint (unrecognized file signature)")


def load_params_auto(path, template, kind, config=None):
    """Load weights from either format: Keras HDF5 (reference-trained or
    exported by :mod:`keras_export`) or native npz pytree.  ``kind``
    selects the Keras layer-mapping convention: 'vae' | 'aae' | 'jetid'.
    ``config`` (jet-ID only) enables the exact multi-image concat-layout
    rewrite of the trunk kernel (see :func:`load_keras_jetid`)."""
    if sniff_weights_format(path) == "keras":
        if kind == "jetid":
            return load_keras_jetid(path, template, config)
        return {"vae": load_keras_vae, "aae": load_keras_aae}[kind](path, template)
    from .checkpoint import load_pytree
    return load_pytree(path, template)


def _dense_pairs(named):
    """Pair each */kernel with its */bias -> {path: (kernel, bias)}."""
    pairs = {}
    for name, arr in named.items():
        if name.endswith("/kernel"):
            path = name[: -len("/kernel")]
            bias = named.get(path + "/bias")
            if bias is None:
                raise ValueError(f"kernel without bias at {path!r}")
            pairs[path] = (arr, bias)
    return pairs


def _suffix_index(path):
    """Creation index of an auto-named Keras layer: dense -> 0,
    dense_7 -> 7 (last path segment)."""
    m = re.search(r"_(\d+)$", path.rsplit("/", 1)[-1])
    return int(m.group(1)) if m else 0


def _assign(layer, kernel, bias, path):
    want_w, want_b = layer["w"].shape, layer["b"].shape
    if tuple(kernel.shape) != tuple(want_w) or tuple(bias.shape) != tuple(want_b):
        raise ValueError(
            f"shape mismatch at {path!r}: file has kernel{tuple(kernel.shape)}"
            f"/bias{tuple(bias.shape)}, model expects {tuple(want_w)}/{tuple(want_b)}"
            " — check --FC_layers / input dims match the training run")
    return {"w": np.asarray(kernel, np.float32), "b": np.asarray(bias, np.float32)}


def _in_component(path, component):
    segs = [s.lower() for s in path.split("/")]
    return component.lower() in segs


def load_keras_vae(path, template):
    """Map an OE-VAE ``model.h5`` onto an ``init_vae`` pytree
    (ref OE-VAE/models.py:18-52 layer naming)."""
    pairs = _dense_pairs(read_keras_weights(path))
    out = {"encoder": {"hidden": list(template["encoder"]["hidden"])},
           "decoder": {"hidden": list(template["decoder"]["hidden"])}}
    enc_hidden, dec_hidden = [], []
    for p, (k, b) in pairs.items():
        leaf = p.rsplit("/", 1)[-1]
        if leaf == "dense_mean":
            out["encoder"]["mean"] = _assign(template["encoder"]["mean"], k, b, p)
        elif leaf == "dense_log_var":
            out["encoder"]["logvar"] = _assign(template["encoder"]["logvar"], k, b, p)
        elif leaf == "dense_output":
            out["decoder"]["out"] = _assign(template["decoder"]["out"], k, b, p)
        elif _in_component(p, "encoder"):
            enc_hidden.append((p, k, b))
        elif _in_component(p, "decoder"):
            dec_hidden.append((p, k, b))
        else:
            raise ValueError(f"unrecognized layer {p!r} in {path}")
    for dst, src, comp in ((out["encoder"]["hidden"], enc_hidden, "encoder"),
                           (out["decoder"]["hidden"], dec_hidden, "decoder")):
        src.sort(key=lambda t: _suffix_index(t[0]))
        if len(src) != len(dst):
            raise ValueError(f"{path}: {len(src)} hidden dense layers under "
                             f"{comp}, model expects {len(dst)}")
        for i, (p, k, b) in enumerate(src):
            dst[i] = _assign(dst[i], k, b, p)
    for head in ("mean", "logvar"):
        if head not in out["encoder"]:
            raise ValueError(f"{path}: no dense_{'log_var' if head == 'logvar' else head} layer found")
    if "out" not in out["decoder"]:
        raise ValueError(f"{path}: no dense_output layer found")
    return out


def _load_component(pairs, component, template, path):
    """Functional AAE component: denses in creation order, last one is
    the output layer (ref OE-AAE/aae.py:20-58)."""
    found = sorted(((p, k, b) for p, (k, b) in pairs.items()
                    if _in_component(p, component)),
                   key=lambda t: _suffix_index(t[0]))
    want = len(template["hidden"]) + 1
    if len(found) != want:
        raise ValueError(f"{path}: {len(found)} dense layers under "
                         f"{component}, model expects {want}")
    hidden = [_assign(template["hidden"][i], k, b, p)
              for i, (p, k, b) in enumerate(found[:-1])]
    p, k, b = found[-1]
    return {"hidden": hidden, "out": _assign(template["out"], k, b, p)}


def load_keras_jetid(path, template, config=None):
    """Map a jet-ID ``model.h5`` (the flat functional graph of
    ref jet-ID/models.py:9-66) onto an ``init_jetid`` pytree.

    Dense layers are created in a fixed order — constituents branch,
    scalars branch, trunk FCN, softmax head (ref :40-66) — so they are
    assigned by Keras auto-name suffix order with shape validation.
    Conv towers are matched by their *kernel-shape signature* (the
    per-shape tower loop iterates a Python ``set``, ref :15, so tower
    order in the file is not reproducible); two towers with identical
    signatures cannot be told apart and raise.

    Pass ``config`` (the ``JetIDConfig``) for multi-image models: the
    trunk's first kernel rows are rewritten from the reference graph's
    concat layout (tower ``set``-order, FCN pixel interleave) into this
    implementation's (first-appearance towers, image-major FCN blocks)
    so the imported model computes identical outputs — see
    :func:`atlasvae.models.jetid.reference_concat_permutation`.  Without
    config, single-image / single-tower files (where the layouts agree)
    still import exactly."""
    pairs = _dense_pairs(read_keras_weights(path))
    dense = sorted(((p, k, b) for p, (k, b) in pairs.items() if k.ndim == 2),
                   key=lambda t: _suffix_index(t[0]))
    convs = sorted(((p, k, b) for p, (k, b) in pairs.items() if k.ndim > 2),
                   key=lambda t: _suffix_index(t[0]))
    out = {}

    if "towers" in template:
        remaining = list(convs)
        out["towers"] = {}
        for tower_name, t_convs in template["towers"].items():
            want = [tuple(c["w"].shape) for c in t_convs]
            starts = [i for i in range(len(remaining) - len(want) + 1)
                      if [tuple(k.shape)
                          for _, k, _ in remaining[i:i + len(want)]] == want]
            if not starts:
                raise ValueError(
                    f"{path}: no conv run matches tower {tower_name!r} "
                    f"(expected kernel shapes {want})")
            if len(starts) > 1:
                raise ValueError(
                    f"{path}: conv towers with identical kernel signatures "
                    f"({tower_name!r}) cannot be matched by weights alone — "
                    "use the .npz pytree checkpoint format instead")
            i = starts[0]
            run, remaining = (remaining[i:i + len(want)],
                              remaining[:i] + remaining[i + len(want):])
            out["towers"][tower_name] = [
                _assign(t_convs[j], k, b, p) for j, (p, k, b) in enumerate(run)]
        if remaining:
            raise ValueError(f"{path}: {len(remaining)} conv layers in file "
                             "not matched by any tower in the model config")
    elif convs:
        raise ValueError(f"{path}: file contains conv layers but the model "
                         "config has no CNN towers (check --NN_type)")

    stacks = []
    for comp in ("constituents", "scalars", "head"):
        if comp in template:
            stacks.append((comp, list(template[comp])))
    stacks.append(("out", [template["out"]]))
    want = sum(len(s) for _, s in stacks)
    if len(dense) != want:
        raise ValueError(f"{path}: {len(dense)} dense layers in file, model "
                         f"expects {want} — check branch/FCN_neurons config")
    i = 0
    for comp, layers in stacks:
        mapped = []
        for layer in layers:
            p, k, b = dense[i]
            mapped.append(_assign(layer, k, b, p))
            i += 1
        out[comp] = mapped if comp != "out" else mapped[0]

    if config is not None:
        # reference concat row r feeds OUR concat position perm[r]:
        # scatter the file's trunk kernel rows into our layout
        from ..models.jetid import reference_concat_permutation
        perm = reference_concat_permutation(config)
        if perm is not None:
            trunk = out["head"][0]
            w = np.empty_like(trunk["w"])
            w[perm] = trunk["w"]
            out["head"][0] = {"w": w, "b": trunk["b"]}
    return out


def load_keras_aae(path, template):
    """Map an OE-AAE ``model.h5`` / ``AAE.h5`` onto an ``init_aae``
    pytree.  Accepts the combined AAE file (ENCODER + DECODER +
    DISCRIMINATOR) or an AE-only file (discriminator left at template
    values, as when resuming from --AE_weights, ref OE-AAE/train.py:99)."""
    pairs = _dense_pairs(read_keras_weights(path))
    out = {
        "encoder": _load_component(pairs, "ENCODER", template["encoder"], path),
        "decoder": _load_component(pairs, "DECODER", template["decoder"], path),
    }
    if any(_in_component(p, "DISCRIMINATOR") for p in pairs):
        out["discriminator"] = _load_component(
            pairs, "DISCRIMINATOR", template["discriminator"], path)
    else:
        out["discriminator"] = template["discriminator"]
    return out
