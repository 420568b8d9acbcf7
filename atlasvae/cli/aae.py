"""OE-AAE entry point: adversarial training + per-signal evaluation.

Mirrors the reference CLI (ref OE-AAE/train.py:14-46 flags, :85-160
flow: scaler fit, OoD load/pairing, GAN cycle training, per-signal
evaluation loop with discriminant scans).
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
    parser.add_argument("--memGB", default=30, type=float,
                        help="host-memory budget for sample loads "
                             "(ref OE-AAE/utils.py:48)")
    parser.add_argument("--n_dims", default=3, type=int)
    parser.add_argument("--batch_size", default=5e3, type=float)
    parser.add_argument("--n_epochs", default=100, type=int)  # = n_cycles
    parser.add_argument("--layers_sizes", default=[100, 100, 100], type=int, nargs="+")
    parser.add_argument("--lr", default=1e-6, type=float)
    parser.add_argument("--beta", default=0, type=float)
    parser.add_argument("--lamb", default=0, type=float)
    parser.add_argument("--slurm_id", default=0, type=int)
    parser.add_argument("--weight_type", default="X-S")
    parser.add_argument("--model_in", default="")
    parser.add_argument("--model_out", default="AAE.npz")
    parser.add_argument("--AE_weights", default="")
    parser.add_argument("--HLV_scaler_type", default="")
    parser.add_argument("--HLV_scaler_in", default="")
    parser.add_argument("--HLV_scaler_out", default="")
    parser.add_argument("--const_scaler_type", default="")
    parser.add_argument("--const_scaler_in", default="")
    parser.add_argument("--const_scaler_out", default="")
    parser.add_argument("--hist_file", default="history.pkl")
    parser.add_argument("--output_dir", default="outputs")
    parser.add_argument("--plotting", default="ON")
    parser.add_argument("--apply_cuts", default="OFF")
    parser.add_argument("--normal_loss", default="ON")
    parser.add_argument("--decorrelation", default="OFF")
    parser.add_argument("--constituents", default="OFF")
    parser.add_argument("--HLVs", default="ON")
    # TPU-native additions
    parser.add_argument("--synthetic", default=0, type=float)
    parser.add_argument("--bkg_data", default="QCD-Geneva")
    parser.add_argument("--OoD_data", default="OoD-H")
    parser.add_argument("--sig_list", default=["top-Geneva"], nargs="+")
    parser.add_argument("--scan_2d", default="OFF",
                        help="run the AE x Disc 2-D grid scan")
    parser.add_argument("--n_devices", default=0, type=int,
                        help="data-parallel mesh size for the GAN cycle "
                             "(0 = all local devices; the reference's "
                             "OE-AAE trainer is single-GPU, SURVEY.md S2.6 "
                             "— DP over the ICI mesh is the TPU scale-out)")
    return parser


def main(argv=None):
    import jax
    from ..utils.logging import args_banner
    from ..data import (load_data, make_sample, BatchGenerator, fit_scaler,
                        apply_scaler, ensure_synthetic_registry, HLV_LIST)
    from ..data.scalers import Scaler
    from ..models import AAEConfig, init_aae
    from ..train.aae_loop import train_aae
    from ..train.checkpoint import load_pytree
    from ..train.loop import features
    from ..eval.aae_eval import (get_data, adjust_weights, aae_bump_scan,
                                 aae_bump_scan_2d)
    from ..plotting.performance import roc_curves

    args = build_parser().parse_args(argv)
    for key in ["n_train", "n_valid", "n_OoD", "n_sig", "batch_size"]:
        setattr(args, key, int(getattr(args, key)))
    if args.HLV_scaler_out == "":
        args.HLV_scaler_out = "HLV_" + args.HLV_scaler_type + ".pkl"
    if args.const_scaler_out == "":
        args.const_scaler_out = "const_" + args.const_scaler_type + ".pkl"
    out_root = args.output_dir
    Path(out_root).mkdir(parents=True, exist_ok=True)
    for key in ["model_in", "model_out", "HLV_scaler_in", "HLV_scaler_out",
                "const_scaler_in", "const_scaler_out"]:
        setattr(args, key, out_root + "/" + getattr(args, key))
    if args.synthetic:
        ensure_synthetic_registry(n_events=int(args.synthetic),
                                  n_const_max=max(args.n_const, 20))

    hlv_list = list(HLV_LIST)
    on = lambda v: v.upper() == "ON" if isinstance(v, str) else bool(v)
    input_dim = (args.n_dims * args.n_const) * on(args.constituents) + \
        len(hlv_list) * on(args.HLVs)
    gen_cuts = ['(sample["m"] >= 30)']
    train_cuts = gen_cuts + ['(sample["pt"] <= 5000)']
    valid_cuts = gen_cuts + ['(sample["pt"] <= 5000)']
    print("\nPROGRAM ARGUMENTS:\n" + args_banner(args))

    config = AAEConfig(input_dim=input_dim, ae_layers=tuple(args.layers_sizes))
    params = init_aae(jax.random.PRNGKey(0), config)
    hlv_scaler = const_scaler = None
    if args.model_in != out_root + "/" and os.path.isfile(args.model_in):
        print("\nLoading pre-trained weights from: " + args.model_in)
        # format sniffed by magic bytes: reference-trained / exported
        # Keras HDF5 or native npz pytree, regardless of extension
        from ..train.keras_import import load_params_auto
        params = load_params_auto(args.model_in, params, "aae")
    if args.HLV_scaler_type and os.path.isfile(args.HLV_scaler_in):
        hlv_scaler = Scaler.load(args.HLV_scaler_in)
    if args.const_scaler_type and os.path.isfile(args.const_scaler_in):
        const_scaler = Scaler.load(args.const_scaler_in)

    if args.n_epochs > 0:
        need_hlv = on(args.HLVs) and args.HLV_scaler_type and hlv_scaler is None
        need_const = (on(args.constituents) and args.const_scaler_type
                      and const_scaler is None)
        if need_hlv or need_const:
            print("\nLOADING QCD TRAINING SAMPLE (scaler fit)")
            n_jets = min(args.n_train,
                         int(1e9 * args.memGB / args.n_const / args.n_dims / 4))
            train_sample = load_data(args.bkg_data, n_jets, train_cuts,
                                     args.n_const, args.n_dims, args.constituents,
                                     args.HLVs, hlv_list)
            if need_hlv:
                hlv_scaler = fit_scaler(train_sample["HLVs"], args.n_dims,
                                        args.HLV_scaler_out, args.HLV_scaler_type)
            if need_const:
                const_scaler = fit_scaler(train_sample["constituents"], args.n_dims,
                                          args.const_scaler_out,
                                          args.const_scaler_type)
        print("\nLOADING OUTLIER SAMPLE")
        ood_sample = load_data(args.OoD_data, args.n_OoD, train_cuts, args.n_const,
                               args.n_dims, args.constituents, args.HLVs, hlv_list)
        if "HLVs" in ood_sample:
            ood_sample["HLVs"] = apply_scaler(ood_sample["HLVs"], args.n_dims,
                                              hlv_scaler, "OoD")
        if "constituents" in ood_sample and const_scaler is not None:
            ood_sample["constituents"] = apply_scaler(
                ood_sample["constituents"], args.n_dims, const_scaler, "OoD")
        bin_sizes = {"m": 20, "pt": 40} \
            if args.weight_type.split("_")[0] in ("flat", "OoD") else {"m": 10, "pt": 20}
        train_gen = BatchGenerator(args.bkg_data, args.OoD_data, args.n_const,
                                   args.n_dims, [0, args.n_train], ood_sample,
                                   args.weight_type, train_cuts, args.constituents,
                                   args.HLVs, hlv_list, bin_sizes, hlv_scaler,
                                   const_scaler, is_train=True,
                                   mem_gb=args.memGB)
        # 0 = all local devices, as in cli/vae.py (DP is parity-asserted
        # against single-device, so defaulting onto the mesh is safe)
        n_devices = args.n_devices or len(jax.devices())
        mesh = None
        if n_devices > 1:
            from ..parallel.mesh import data_parallel_mesh
            if len(jax.devices()) < n_devices:
                raise SystemExit(f"--n_devices {n_devices}: only "
                                 f"{len(jax.devices())} devices visible")
            mesh = data_parallel_mesh(n_devices)
            print(f"Data-parallel GAN cycle over {n_devices} devices")
        params, _ = train_aae(params, train_gen, args.n_epochs, args.batch_size,
                              out_root, os.path.basename(args.model_out),
                              args.hist_file,
                              os.path.basename(args.AE_weights) if args.AE_weights else "",
                              args.lamb, args.beta, args.lr, mesh=mesh)
        from ..train.keras_export import maybe_export_keras
        if maybe_export_keras(params, args.model_out, "aae"):
            print("Keras-compatible weights exported to " + args.model_out)
    if not on(args.plotting) and not on(args.apply_cuts):
        return 0

    print("\n+" + 36 * "-" + "+\n+--- VALIDATION SAMPLE EVALUATION ---+\n+"
          + 36 * "-" + "+\n")
    hist_path = os.path.join(out_root, args.hist_file)
    if os.path.isfile(hist_path):
        from ..plotting.history import plot_history
        plot_history(hist_path, out_root)
    if os.path.isfile(args.model_out):
        from ..train.keras_import import load_params_auto
        params = load_params_auto(args.model_out, params, "aae")
    for sig_data in args.sig_list:
        output_dir = out_root + "/" + sig_data
        Path(output_dir).mkdir(parents=True, exist_ok=True)
        sample = make_sample(args.bkg_data, sig_data, args.n_valid, args.n_sig,
                             valid_cuts, args.n_const, args.n_dims,
                             args.constituents, args.HLVs, hlv_list)
        y_true = np.where(sample["JZW"] == -1, 0, 1)
        # signal-peak weight normalization (ref OE-AAE/utils.py:51-52)
        sample["weights"][y_true == 0] /= adjust_weights(sample, y_true, factor=20)
        if "HLVs" in sample:
            sample["HLVs"] = apply_scaler(sample["HLVs"], args.n_dims, hlv_scaler)
        if "constituents" in sample and const_scaler is not None:
            sample["constituents"] = apply_scaler(sample["constituents"],
                                                  args.n_dims, const_scaler)
        x_true = features(sample)
        # --decorrelation accepts m/pt/2d; bare 'ON' means the canonical
        # 2-D flattening (ref OE-AAE/train.sh:11 decorrelation=2d)
        deco = args.decorrelation if args.decorrelation in ("m", "pt", "2d") \
            else ("2d" if on(args.decorrelation) else "OFF")
        x_loss = get_data(params, sample, y_true, x_true, args.normal_loss, deco)
        sig_label = sig_data.split("-")[0].split("_")[0]
        print((sig_data + ": plotting performance results").upper())
        if on(args.scan_2d):
            best = aae_bump_scan_2d(y_true, x_loss, sample, sig_label, output_dir)
        else:
            best = aae_bump_scan(y_true, x_loss["Autoencoder"], "Autoencoder",
                                 sample, sig_label, output_dir)
        roc_curves(y_true, x_loss, sample["weights"], list(x_loss), output_dir)
        from ..plotting.aae_plots import plot_discriminant, plot_correlations
        for disc_name in x_loss:
            plot_discriminant(y_true, x_loss[disc_name], sample["weights"],
                              output_dir, sig_label,
                              best.get("cuts") if best else None, disc_name)
        plot_correlations(y_true, x_loss, sample, output_dir)
        print("best cut:", best)
    return 0


if __name__ == "__main__":
    sys.exit(main())
