"""Checkpointing: weights-only (reference parity) and full train state.

The reference checkpoints weights-only HDF5 + pickled history appended
across restarts (ref OE-VAE/models.py:227,160-161; SURVEY.md S5 notes
optimizer state is never saved — resume restarts Adam moments).  Here:

* ``save_weights``/``load_weights``: parameter pytree only, keyed npz —
  same drop-in semantics as Keras save_weights/load_weights,
* ``save_pytree``/``load_pytree``: arbitrary pytrees (params + optimizer
  state + step), fixing the reference's lossy resume while keeping the
  weights-only path for parity.
"""

import os
import pickle

import jax
import numpy as np


def _flatten(tree):
    flat, treedef = jax.tree_util.tree_flatten(tree)
    return flat, treedef


def save_pytree(path, tree):
    flat, _ = _flatten(tree)
    # write-then-rename: these files are rewritten every epoch and are
    # what crash-resume reads back, so a kill mid-write must never leave
    # a truncated state file at the final path.  (Also written through a
    # file handle: np.savez(path) silently appends '.npz' to bare paths,
    # which would break isfile/load round trips.)
    tmp = f"{path}.tmp"
    with open(tmp, "wb") as f:
        np.savez(f, **{f"leaf_{i}": np.asarray(leaf) for i, leaf in enumerate(flat)})
    os.replace(tmp, path)


def load_pytree(path, template):
    flat, treedef = _flatten(template)
    with np.load(path) as data:
        leaves = [data[f"leaf_{i}"] for i in range(len(flat))]
    return jax.tree_util.tree_unflatten(treedef, leaves)


def save_weights(params, path):
    save_pytree(path, params)


def load_weights(path, template):
    return load_pytree(path, template)


def save_history(history, path):
    tmp = f"{path}.tmp"
    with open(tmp, "wb") as f:
        pickle.dump(history, f)
    os.replace(tmp, path)  # rewritten every epoch; resume reads it back


def load_history(path):
    with open(path, "rb") as f:
        return pickle.load(f)


# ------------------------------------------------------- orbax backend

def save_orbax(path, tree):
    """Full-state checkpoint via orbax (atomic, sharding-aware) — the
    production alternative to the npz path for multi-host runs."""
    import os
    import orbax.checkpoint as ocp
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(str(path)), tree, force=True)
    ckptr.wait_until_finished()


def load_orbax(path, template):
    import os
    import orbax.checkpoint as ocp
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(str(path)),
                         jax.tree.map(np.asarray, template))
