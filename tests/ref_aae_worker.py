"""Subprocess worker: execute the REFERENCE's create_model + train_AAE.

Runs ``/root/reference/OE-AAE/aae.py`` (read-only, never copied) in the
training regime it was written for — TF 2.1's
``experimental_run_tf_function=False``, i.e. the Keras V1 training
engine — which modern ``tf_keras`` still ships behind
``tf.compat.v1.disable_eager_execution()``.  The v1 engine is the only
one that accepts the reference's symbolic-closure OE loss
(ref OE-AAE/aae.py:60-64,88: ``OoD_loss`` captures the graph's MAE
tensors), so this is the faithful execution, not a workaround.

Environment bridging, all OUTSIDE the reference code:

* ``optimizers.Adam -> optimizers.legacy.Adam`` — the TF-2.1-era
  optimizer the reference targets: per-variable slots, ONE shared
  ``iterations`` counter across the three compiled models
  (ref aae.py:75,88,95,112), and it accepts the ``lr=`` kwarg.
* Eager-idiom proxies: ``train_AAE`` calls ``AE(...)``/``Disc(...)``
  on numpy batches and ``.numpy()`` on a Keras loss
  (ref aae.py:194,255-268) — TF-2.1 hybrid eager behavior.  The model
  tuple passed in wraps each model in a proxy whose ``__call__`` routes
  through ``predict`` (graph-mode evaluation of the same network), and
  the module's ``losses.SparseCategoricalCrossentropy`` is evaluated
  through a placeholder graph run in the same session — real TF
  kernels, same formula, session plumbing only.
* ``tf.convert_to_tensor`` is made the identity (ref aae.py:261) so the
  subsequent ``np.argmax`` (ref :15) sees numpy, as it did eagerly.
* The nondeterministic batch-order shuffle
  (``utils.shuffle(..., random_state=None)``, ref aae.py:149,187,230)
  pops permutations from ``np.random.default_rng(seed)`` — the exact
  stream our ``train_aae`` consumes — so both frameworks visit batches
  in the same order.  The deterministic within-batch shuffles
  (``random_state=0``) run unmodified.

Usage: python ref_aae_worker.py <in.npz> <out_dir>
<in.npz>: bkg_x, ood_x, bkg_w, ood_w, dense weights k{i}_w / k{i}_b in
[encoder hiddens.., encoder out, decoder hiddens.., decoder out,
disc hiddens.., disc out] order, and scalars dim, ae_layers, lamb,
beta, seed, batch_size, n_cycles.  Writes <out_dir>/hist.pkl.
"""

import os
import sys
import types

os.environ["TF_USE_LEGACY_KERAS"] = "1"
os.environ["TF_CPP_MIN_LOG_LEVEL"] = "3"
os.environ["CUDA_VISIBLE_DEVICES"] = ""

import numpy as np


def main(in_npz, out_dir):
    import tensorflow as tf

    tf.compat.v1.disable_eager_execution()
    tf.keras.optimizers.Adam = tf.keras.optimizers.legacy.Adam
    real_losses = tf.keras.losses

    data = np.load(in_npz)
    dim = int(data["dim"])
    ae_layers = [int(v) for v in data["ae_layers"]]
    lamb, beta = float(data["lamb"]), float(data["beta"])
    seed, batch_size = int(data["seed"]), int(data["batch_size"])
    n_cycles = int(data["n_cycles"])
    n_batches = int(np.ceil(len(data["bkg_x"]) / batch_size))

    sys.path.insert(0, "/root/reference/OE-AAE")
    import aae as ref_aae

    # -- identity convert_to_tensor (proxies already return numpy)
    class TFProxy:
        @staticmethod
        def convert_to_tensor(x):
            return x

        def __getattr__(self, name):
            return getattr(tf, name)

    ref_aae.tf = TFProxy()

    # -- shared batch-order permutation stream (see module docstring)
    perm_rng = np.random.default_rng(seed)
    orig_shuffle = ref_aae.utils.shuffle

    def shuffle(*arrays, random_state=None, **kw):
        if random_state is None:
            assert len(arrays) == 1 and arrays[0].shape == (n_batches,)
            return perm_rng.permutation(n_batches)
        return orig_shuffle(*arrays, random_state=random_state, **kw)

    ref_aae.utils = types.SimpleNamespace(shuffle=shuffle)

    # -- session-run evaluation of the real Keras sparse CE (ref :268)
    class CEShim:
        def __init__(self):
            self.ph = None

        def __call__(self, y_true, y_pred, w):
            if self.ph is None:
                v1 = tf.compat.v1
                self.ph = (v1.placeholder(tf.float32, [None]),
                           v1.placeholder(tf.float32, [None, None]),
                           v1.placeholder(tf.float32, [None]))
                self.ce = real_losses.SparseCategoricalCrossentropy()(
                    *self.ph)
            sess = tf.compat.v1.keras.backend.get_session()
            val = sess.run(self.ce, dict(zip(
                self.ph, (np.asarray(y_true, np.float32),
                          np.asarray(y_pred, np.float32),
                          np.asarray(w, np.float32)))))
            return types.SimpleNamespace(numpy=lambda: float(val))

    ce_shim = CEShim()
    ref_aae.losses = types.SimpleNamespace(
        SparseCategoricalCrossentropy=lambda: ce_shim)

    model = ref_aae.create_model(dim, ae_layers, beta, lamb)
    AE, Disc, AAE = model

    # -- copy OUR initial parameters into the reference networks
    auto = [l for l in AE.layers if l.name == "AUTOENCODER"][0]
    enc = auto.get_layer("ENCODER")
    dec = auto.get_layer("DECODER")
    Dense = tf.keras.layers.Dense
    dense = [l for m in (enc, dec, Disc) for l in m.layers
             if isinstance(l, Dense)]
    for i, layer in enumerate(dense):
        layer.set_weights([data[f"k{i}_w"], data[f"k{i}_b"]])

    class Proxy:
        def __init__(self, m):
            object.__setattr__(self, "_m", m)

        def __call__(self, inputs):
            arrs = inputs if isinstance(inputs, (list, tuple)) else [inputs]
            return self._m.predict(inputs, batch_size=len(arrs[0]))

        def __getattr__(self, name):
            return getattr(self._m, name)

        def __setattr__(self, name, value):
            setattr(self._m, name, value)

    sample = {"bkg": {"HLVs": data["bkg_x"], "weights": data["bkg_w"]},
              "OoD": {"HLVs": data["ood_x"], "weights": data["ood_w"]}}
    os.makedirs(out_dir, exist_ok=True)
    ref_aae.train_AAE((Proxy(AE), Proxy(Disc), Proxy(AAE)), [sample],
                      n_cycles, batch_size, out_dir, "AAE.h5",
                      os.path.join(out_dir, "hist.pkl"), "", lamb)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
