"""OE-VAE entry point: train + evaluate + bump-hunt.

Mirrors the reference CLI surface (ref OE-VAE/vae.py:15-49: same flag
names, same 'ON'/'OFF' string booleans, same path wiring at :58-66) on
top of the TPU-native stack.  Additions: ``--synthetic N`` generates
registry datasets when the production HDF5 files are absent, and
``--n_devices`` selects the data-parallel mesh size (the reference is
single-GPU here, ref SURVEY.md S2.6).
"""

import os
import sys
from argparse import ArgumentParser
from pathlib import Path

import numpy as np


def build_parser():
    parser = ArgumentParser()
    parser.add_argument("--n_train", default=1e6, type=float)
    parser.add_argument("--n_valid", default=1e6, type=float)
    parser.add_argument("--n_OoD", default=10e6, type=float)
    parser.add_argument("--n_sig", default=1e6, type=float)
    parser.add_argument("--n_const", default=20, type=int)
    parser.add_argument("--n_dims", default=3, type=int)
    parser.add_argument("--memGB", default=30, type=float,
                        help="host-memory chunk budget per load "
                             "(ref OE-VAE/vae.py:116 hardcodes 30)")
    parser.add_argument("--batch_size", default=1e4, type=float)
    parser.add_argument("--n_epochs", default=100, type=int)
    parser.add_argument("--FC_layers", default=[80, 40, 20, 10], type=int, nargs="+")
    parser.add_argument("--lr", default=1e-3, type=float)
    parser.add_argument("--beta", default=0, type=float)
    parser.add_argument("--lamb", default=0, type=float)
    parser.add_argument("--margin", default=1, type=float)
    parser.add_argument("--n_iter", default=1, type=int)
    parser.add_argument("--OE_type", default="KLD")
    parser.add_argument("--weight_type", default="X-S")
    parser.add_argument("--model_in", default="")
    parser.add_argument("--model_out", default="model.npz")
    parser.add_argument("--const_scaler_type", default="")
    parser.add_argument("--const_scaler_in", default="")
    parser.add_argument("--const_scaler_out", default="")
    parser.add_argument("--HLV_scaler_type", default="")
    parser.add_argument("--HLV_scaler_in", default="")
    parser.add_argument("--HLV_scaler_out", default="")
    parser.add_argument("--hist_file", default="history.pkl")
    parser.add_argument("--state_file", default="",
                        help="full-train-state checkpoint (params + Adam "
                             "moments + lr schedule + RNG key): resumes "
                             "bit-exactly, unlike weights-only --model_in")
    parser.add_argument("--output_dir", default="outputs")
    parser.add_argument("--plotting", default="ON")
    parser.add_argument("--apply_cuts", default="OFF")
    parser.add_argument("--normal_losses", default="ON")
    parser.add_argument("--decorrelation", default="OFF")
    parser.add_argument("--slurm_id", default=0, type=int)
    parser.add_argument("--constituents", default="OFF")
    parser.add_argument("--HLVs", default="ON")
    # TPU-native additions
    parser.add_argument("--n_devices", default=0, type=int,
                        help="data-parallel mesh size (0 = all devices)")
    parser.add_argument("--synthetic", default=0, type=float,
                        help="generate synthetic datasets with N events each")
    parser.add_argument("--bkg_data", default="QCD-Geneva")
    parser.add_argument("--OoD_data", default="OoD-H")
    parser.add_argument("--sig_data", default="2HDM-Geneva")
    parser.add_argument("--npe", default=1000, type=int)
    return parser


def main(argv=None):
    import jax
    import h5py
    from ..utils.logging import args_banner
    from ..data import (get_file, load_data, make_sample, BatchGenerator,
                        fit_scaler, apply_scaler, ensure_synthetic_registry,
                        HLV_LIST)
    from ..data.loader import filtering
    from ..data.scalers import Scaler
    from ..models import VAEConfig, init_vae, vae_apply
    from ..train import train_model, load_weights
    from ..train.loop import features
    from ..parallel import data_parallel_mesh
    from ..eval import plot_results
    from ..plotting.history import plot_history

    args = build_parser().parse_args(argv)
    for key in ["n_train", "n_valid", "n_OoD", "n_sig", "batch_size"]:
        setattr(args, key, int(getattr(args, key)))
    if args.const_scaler_out == "":
        args.const_scaler_out = "const_" + args.const_scaler_type + ".pkl"
    if args.HLV_scaler_out == "":
        args.HLV_scaler_out = "HLV_" + args.HLV_scaler_type + ".pkl"
    out_root = args.output_dir
    for key in ["model_in", "model_out", "const_scaler_in", "const_scaler_out",
                "HLV_scaler_in", "HLV_scaler_out", "hist_file"]:
        setattr(args, key, out_root + "/" + getattr(args, key))
    args.output_dir = out_root + "/plots"
    Path(args.output_dir).mkdir(parents=True, exist_ok=True)

    if args.synthetic:
        ensure_synthetic_registry(n_events=int(args.synthetic),
                                  n_const_max=max(args.n_const, 20))

    # Sample selection (ref OE-VAE/vae.py:70-84)
    bkg_data, ood_data, sig_data = args.bkg_data, args.OoD_data, args.sig_data
    hlv_list = list(HLV_LIST)
    on = lambda v: v.upper() == "ON" if isinstance(v, str) else bool(v)
    input_dim = (args.n_dims * args.n_const) * on(args.constituents) + \
        len(hlv_list) * on(args.HLVs)
    with h5py.File(get_file(bkg_data), "r") as f:
        sample_size = len(next(iter(f.values())))
    args.n_train = [0, min(args.n_train, max(sample_size - int(1e6), sample_size // 2))]
    args.n_valid = [max(args.n_train[-1], sample_size - args.n_valid), sample_size]
    gen_cuts = ['(sample["m"] >= 30)']
    train_cuts = gen_cuts + ['(sample["pt"] <= 5000)']
    valid_cuts = gen_cuts + ['(sample["pt"] <= 5000)']
    print("\nPROGRAM ARGUMENTS:\n" + args_banner(args))

    n_devices = args.n_devices or len(jax.devices())
    mesh = data_parallel_mesh(n_devices) if n_devices > 1 else None
    config = VAEConfig(fc_layers=tuple(args.FC_layers), input_dim=input_dim)
    params = init_vae(jax.random.PRNGKey(0), config)
    const_scaler = hlv_scaler = None
    if args.model_in != out_root + "/" and os.path.isfile(args.model_in):
        print("\nLoading pre-trained weights from: " + args.model_in)
        params = load_weights(args.model_in, params)
    if args.const_scaler_type and os.path.isfile(args.const_scaler_in):
        const_scaler = Scaler.load(args.const_scaler_in)
    if args.HLV_scaler_type and os.path.isfile(args.HLV_scaler_in):
        hlv_scaler = Scaler.load(args.HLV_scaler_in)

    if args.n_epochs > 0:
        if (args.const_scaler_type and const_scaler is None) or \
           (args.HLV_scaler_type and hlv_scaler is None):
            print("\nLOADING QCD TRAINING SAMPLE (scaler fit)")
            # honor --memGB for the one-off scaler-fit load too (the
            # reference hardcodes its 30 GB budget here,
            # ref OE-AAE/train.py:113)
            n_jets = min(args.n_train[1],
                         int(1e9 * args.memGB / args.n_const / args.n_dims / 4))
            train_sample = load_data(bkg_data, n_jets, train_cuts, args.n_const,
                                     args.n_dims, args.constituents, args.HLVs,
                                     hlv_list)
            if on(args.constituents) and const_scaler is None and args.const_scaler_type:
                const_scaler = fit_scaler(train_sample["constituents"], args.n_dims,
                                          args.const_scaler_out, args.const_scaler_type)
            if on(args.HLVs) and hlv_scaler is None and args.HLV_scaler_type:
                hlv_scaler = fit_scaler(train_sample["HLVs"], args.n_dims,
                                        args.HLV_scaler_out, args.HLV_scaler_type)
        print("\nLOADING OUTLIER SAMPLE")
        ood_sample = load_data(ood_data, args.n_OoD, train_cuts, args.n_const,
                               args.n_dims, args.constituents, args.HLVs, hlv_list)
        if "constituents" in ood_sample:
            ood_sample["constituents"] = apply_scaler(
                ood_sample["constituents"], args.n_dims, const_scaler, "OoD")
        if "HLVs" in ood_sample:
            ood_sample["HLVs"] = apply_scaler(ood_sample["HLVs"], args.n_dims,
                                              hlv_scaler, "OoD")
        bin_sizes = {"m": 20, "pt": 40} \
            if args.weight_type.split("_")[0] in ("flat", "OoD") else {"m": 10, "pt": 20}
        train_gen = BatchGenerator(bkg_data, ood_data, args.n_const, args.n_dims,
                                   args.n_train, ood_sample, args.weight_type,
                                   train_cuts, args.constituents, args.HLVs,
                                   hlv_list, bin_sizes, hlv_scaler, const_scaler,
                                   is_train=True, mem_gb=args.memGB,
                                   output_dir=args.output_dir)
        valid_gen = BatchGenerator(bkg_data, ood_data, args.n_const, args.n_dims,
                                   args.n_valid, ood_sample, args.weight_type,
                                   train_cuts, args.constituents, args.HLVs,
                                   hlv_list, bin_sizes, hlv_scaler, const_scaler,
                                   mem_gb=args.memGB)
        state_file = out_root + "/" + args.state_file if args.state_file else None
        params, _ = train_model(params, train_gen, valid_gen, args.OE_type,
                                args.n_epochs, args.batch_size, args.beta,
                                args.lamb, args.margin, args.lr, args.hist_file,
                                args.model_in, args.model_out, mesh=mesh,
                                state_file=state_file)
        if os.path.isfile(args.model_out):
            params = load_weights(args.model_out, params)
    if not on(args.plotting) and not on(args.apply_cuts):
        return 0

    # Validation predictions (ref OE-VAE/vae.py:145-167)
    print("\n+" + 36 * "-" + "+\n+--- VALIDATION SAMPLE EVALUATION ---+\n+"
          + 36 * "-" + "+\n")
    valid_sample = make_sample(bkg_data, sig_data, args.n_valid, args.n_sig,
                               valid_cuts, args.n_const, args.n_dims,
                               args.constituents, args.HLVs, hlv_list)
    y_true = np.where(valid_sample["JZW"] == -1, 0, 1)
    if "Geneva" in sig_data:  # Delphes weight adjustment (ref vae.py:151)
        valid_sample["weights"][y_true == 0] /= 1e3
    if "constituents" in valid_sample:
        valid_sample["constituents"] = apply_scaler(
            valid_sample["constituents"], args.n_dims, const_scaler)
    if "HLVs" in valid_sample:
        valid_sample["HLVs"] = apply_scaler(valid_sample["HLVs"], args.n_dims,
                                            hlv_scaler)
    x_true = features(valid_sample)

    import jax.numpy as jnp
    predict = jax.jit(lambda p, x, k: vae_apply(p, x, k)[0])
    if args.n_iter > 1:
        print("\nEvaluating with", args.n_iter, "iterations:")
    preds = []
    for n in range(args.n_iter):
        key = jax.random.PRNGKey(n if args.n_iter > 1 else 0)
        chunks = [np.asarray(predict(params, jnp.asarray(x_true[i:i + 10000]),
                                     jax.random.fold_in(key, i)))
                  for i in range(0, len(x_true), 10000)]
        preds.append(np.concatenate(chunks))
    x_pred = np.mean(np.stack(preds, axis=-1), axis=-1)
    y_true, x_true, x_pred, valid_sample = filtering(y_true, x_true, x_pred,
                                                     valid_sample)

    if on(args.plotting):
        metric_list = ["Latent", "MAE", "KLD", "JSD"]
        loss_metric = "MAE"
        if os.path.isfile(args.hist_file):
            plot_history(args.hist_file, args.output_dir)
        plot_results(y_true, x_true, x_pred, valid_sample, args.n_dims, params,
                     metric_list, loss_metric, sig_data, args.output_dir,
                     args.apply_cuts, args.normal_losses, args.decorrelation,
                     npe=args.npe)
    return 0


if __name__ == "__main__":
    sys.exit(main())
