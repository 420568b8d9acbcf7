"""Batch anomaly-scoring entry point (serving path).

Streams an HDF5 sample through a trained OE-VAE (or AAE), computes the
requested per-jet discriminants with the fused inference kernels, and
writes scores + kinematics to an output HDF5 — the production scoring
flow implied by the reference's prediction block (ref
OE-VAE/vae.py:145-167) as a standalone tool.
"""

import sys
from argparse import ArgumentParser

import numpy as np


def build_parser():
    parser = ArgumentParser()
    parser.add_argument("--data", required=True,
                        help="logical sample name or HDF5 path")
    parser.add_argument("--model_in", required=True)
    parser.add_argument("--model_type", default="vae", choices=["vae", "aae"])
    parser.add_argument("--FC_layers", default=[80, 40, 20, 10], type=int, nargs="+")
    parser.add_argument("--layers_sizes", default=[100, 100, 100], type=int, nargs="+")
    parser.add_argument("--n_jets", default=1e9, type=float)
    parser.add_argument("--n_const", default=20, type=int)
    parser.add_argument("--n_dims", default=3, type=int)
    parser.add_argument("--constituents", default="OFF")
    parser.add_argument("--HLVs", default="ON")
    parser.add_argument("--HLV_scaler_in", default="")
    parser.add_argument("--const_scaler_in", default="")
    parser.add_argument("--metrics", default=["MAE", "Latent"], nargs="+")
    parser.add_argument("--n_iter", default=1, type=int)
    parser.add_argument("--chunk", default=1_000_000, type=float)
    parser.add_argument("--output", default="scores.h5")
    parser.add_argument("--n_devices", default=0, type=int,
                        help="shard the EMD/KSD metric jet axes over a "
                             "data mesh (0 = all local devices; zero "
                             "collectives, ops/emd.py)")
    return parser


def main(argv=None):
    import h5py
    import jax
    import jax.numpy as jnp
    from ..data import load_data, apply_scaler, HLV_LIST
    from ..data.scalers import Scaler
    from ..models import VAEConfig, init_vae, vae_apply, AAEConfig, init_aae
    from ..train.checkpoint import load_pytree
    from ..train.loop import features
    from ..eval import compute_metric_bank

    args = build_parser().parse_args(argv)
    on = lambda v: v.upper() == "ON" if isinstance(v, str) else bool(v)
    hlv_list = list(HLV_LIST)
    input_dim = (args.n_dims * args.n_const) * on(args.constituents) + \
        len(hlv_list) * on(args.HLVs)

    if args.model_type == "vae":
        params = init_vae(jax.random.PRNGKey(0),
                          VAEConfig(fc_layers=tuple(args.FC_layers),
                                    input_dim=input_dim))
    else:
        params = init_aae(jax.random.PRNGKey(0),
                          AAEConfig(input_dim=input_dim,
                                    ae_layers=tuple(args.layers_sizes)))
    params = load_pytree(args.model_in, params)
    hlv_scaler = Scaler.load(args.HLV_scaler_in) if args.HLV_scaler_in else None
    const_scaler = Scaler.load(args.const_scaler_in) if args.const_scaler_in else None

    import time
    start = time.time()
    total = 0
    chunk = int(args.chunk)
    n_jets = int(args.n_jets)
    n_devices = args.n_devices or len(jax.devices())
    mesh = None
    if n_devices > 1:
        from ..parallel.mesh import data_parallel_mesh
        mesh = data_parallel_mesh(n_devices)
    if args.model_type == "vae":
        predict = jax.jit(lambda p, x, k: vae_apply(p, x, k)[0])
    with h5py.File(args.output, "w") as out:
        dsets = {}
        offset = 0
        while offset < n_jets:
            hi = min(offset + chunk, n_jets)
            sample = load_data(args.data, (offset, hi), (),
                               args.n_const, args.n_dims, args.constituents,
                               args.HLVs, hlv_list, verbose=False)
            n = len(sample["m"])
            if n == 0:
                break
            if "HLVs" in sample and hlv_scaler is not None:
                sample["HLVs"] = apply_scaler(sample["HLVs"], args.n_dims,
                                              hlv_scaler, verbose=False)
            if "constituents" in sample and const_scaler is not None:
                sample["constituents"] = apply_scaler(
                    sample["constituents"], args.n_dims, const_scaler,
                    verbose=False)
            x_true = features(sample)
            if args.model_type == "vae":
                preds = np.stack(
                    [np.asarray(predict(params, jnp.asarray(x_true),
                                        jax.random.PRNGKey(i)))
                     for i in range(args.n_iter)], axis=-1)
                x_pred = preds.mean(axis=-1)
                scores = compute_metric_bank(x_true, x_pred, params,
                                             tuple(args.metrics),
                                             normal_losses=False, mesh=mesh)
            else:
                from ..eval.aae_eval import get_data
                scores = get_data(params, sample, np.ones(n, int), x_true,
                                  normal_loss="OFF", deco="OFF")
            record = {**{f"score_{k}": v for k, v in scores.items()},
                      "m": sample["m"], "pt": sample["pt"],
                      "weights": sample["weights"]}
            for key, val in record.items():
                val = np.asarray(val, np.float32)
                if key not in dsets:
                    dsets[key] = out.create_dataset(
                        key, shape=(0,), maxshape=(None,), dtype=np.float32,
                        chunks=(min(chunk, 1 << 16),))
                ds = dsets[key]
                ds.resize((total + n,))
                ds[total:total + n] = val
            total += n
            offset += chunk
            if n < chunk:
                break
    rate = total / max(time.time() - start, 1e-9)
    print(f"Scored {total} jets -> {args.output} ({rate:,.0f} jets/s)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
