"""OE-VAE entry point: train + evaluate + bump-hunt.

Mirrors the reference CLI surface (ref OE-VAE/vae.py:15-49: same flag
names, same 'ON'/'OFF' string booleans, same path wiring at :58-66) on
top of the TPU-native stack.  Additions: ``--synthetic N`` generates
registry datasets when the production HDF5 files are absent,
``--n_devices`` selects the data-parallel mesh size (the reference is
single-GPU here, ref SURVEY.md S2.6), and :func:`run_ensemble` trains a
whole same-shape hyper-parameter grid as ONE vmapped device program
(driven by cli/sweep.py --vmap, replacing the reference's Slurm array
fan-out, ref OE-VAE/utils.py:597-600).
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
    parser.add_argument("--seed", default=0, type=int)
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


def _on(v):
    return v.upper() == "ON" if isinstance(v, str) else bool(v)


def _wire_paths(args):
    """Path wiring + int coercion (ref OE-VAE/vae.py:58-66)."""
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
    return out_root


def _maybe_export_keras(params, model_out, kind):
    from ..train.keras_export import maybe_export_keras
    if maybe_export_keras(params, model_out, kind):
        print("Keras-compatible weights exported to " + model_out)


def _load_model_in(args, params, out_root):
    """Load pre-trained weights named by --model_in into ``params``
    (native .npz or reference-trained Keras .h5); no-op when the flag
    was empty (ref OE-VAE/vae.py:99-101)."""
    if args.model_in != out_root + "/" and os.path.isfile(args.model_in):
        print("\nLoading pre-trained weights from: " + args.model_in)
        # format sniffed by magic bytes: reference-trained / exported
        # Keras HDF5 or native npz pytree, regardless of extension
        from ..train.keras_import import load_params_auto
        return load_params_auto(args.model_in, params, "vae")
    return params


def _select_samples(args):
    """Sample selection + cuts (ref OE-VAE/vae.py:70-84)."""
    import h5py
    from ..data import get_file, ensure_synthetic_registry, HLV_LIST

    if args.synthetic:
        ensure_synthetic_registry(n_events=int(args.synthetic),
                                  n_const_max=max(args.n_const, 20))
    hlv_list = list(HLV_LIST)
    input_dim = (args.n_dims * args.n_const) * _on(args.constituents) + \
        len(hlv_list) * _on(args.HLVs)
    with h5py.File(get_file(args.bkg_data), "r") as f:
        sample_size = len(next(iter(f.values())))
    args.n_train = [0, min(args.n_train,
                           max(sample_size - int(1e6), sample_size // 2))]
    args.n_valid = [max(args.n_train[-1], sample_size - args.n_valid),
                    sample_size]
    gen_cuts = ['(sample["m"] >= 30)']
    train_cuts = gen_cuts + ['(sample["pt"] <= 5000)']
    valid_cuts = gen_cuts + ['(sample["pt"] <= 5000)']
    return hlv_list, input_dim, train_cuts, valid_cuts


def _make_generators(args, hlv_list, train_cuts, const_scaler, hlv_scaler):
    """Scaler fit + OoD load + train/valid BatchGenerators
    (ref OE-VAE/vae.py:112-138)."""
    from ..data import (load_data, BatchGenerator, fit_scaler, apply_scaler)

    if (args.const_scaler_type and const_scaler is None) or \
       (args.HLV_scaler_type and hlv_scaler is None):
        print("\nLOADING QCD TRAINING SAMPLE (scaler fit)")
        # honor --memGB for the one-off scaler-fit load too (the
        # reference hardcodes its 30 GB budget here,
        # ref OE-AAE/train.py:113)
        n_jets = min(args.n_train[1],
                     int(1e9 * args.memGB / args.n_const / args.n_dims / 4))
        train_sample = load_data(args.bkg_data, n_jets, train_cuts,
                                 args.n_const, args.n_dims, args.constituents,
                                 args.HLVs, hlv_list)
        if _on(args.constituents) and const_scaler is None and args.const_scaler_type:
            const_scaler = fit_scaler(train_sample["constituents"], args.n_dims,
                                      args.const_scaler_out,
                                      args.const_scaler_type)
        if _on(args.HLVs) and hlv_scaler is None and args.HLV_scaler_type:
            hlv_scaler = fit_scaler(train_sample["HLVs"], args.n_dims,
                                    args.HLV_scaler_out, args.HLV_scaler_type)
    print("\nLOADING OUTLIER SAMPLE")
    ood_sample = load_data(args.OoD_data, args.n_OoD, train_cuts, args.n_const,
                           args.n_dims, args.constituents, args.HLVs, hlv_list)
    if "constituents" in ood_sample:
        ood_sample["constituents"] = apply_scaler(
            ood_sample["constituents"], args.n_dims, const_scaler, "OoD")
    if "HLVs" in ood_sample:
        ood_sample["HLVs"] = apply_scaler(ood_sample["HLVs"], args.n_dims,
                                          hlv_scaler, "OoD")
    bin_sizes = {"m": 20, "pt": 40} \
        if args.weight_type.split("_")[0] in ("flat", "OoD") else {"m": 10, "pt": 20}
    train_gen = BatchGenerator(args.bkg_data, args.OoD_data, args.n_const,
                               args.n_dims, args.n_train, ood_sample,
                               args.weight_type, train_cuts, args.constituents,
                               args.HLVs, hlv_list, bin_sizes, hlv_scaler,
                               const_scaler, is_train=True, mem_gb=args.memGB,
                               output_dir=args.output_dir)
    valid_gen = BatchGenerator(args.bkg_data, args.OoD_data, args.n_const,
                               args.n_dims, args.n_valid, ood_sample,
                               args.weight_type, train_cuts, args.constituents,
                               args.HLVs, hlv_list, bin_sizes, hlv_scaler,
                               const_scaler, mem_gb=args.memGB)
    return train_gen, valid_gen, const_scaler, hlv_scaler


def _evaluate(args, params, const_scaler, hlv_scaler, hlv_list, valid_cuts,
              mesh=None):
    """Validation predictions + plotting suite (ref OE-VAE/vae.py:145-176).
    ``mesh`` shards the EMD/KSD metric jet axes over the device mesh."""
    import jax
    import jax.numpy as jnp
    from ..data import make_sample, apply_scaler
    from ..data.loader import filtering
    from ..models import vae_apply
    from ..train.loop import features
    from ..eval import plot_results
    from ..plotting.history import plot_history

    print("\n+" + 36 * "-" + "+\n+--- VALIDATION SAMPLE EVALUATION ---+\n+"
          + 36 * "-" + "+\n")
    valid_sample = make_sample(args.bkg_data, args.sig_data, args.n_valid,
                               args.n_sig, valid_cuts, args.n_const,
                               args.n_dims, args.constituents, args.HLVs,
                               hlv_list)
    y_true = np.where(valid_sample["JZW"] == -1, 0, 1)
    if "Geneva" in args.sig_data:  # Delphes weight adjustment (ref vae.py:151)
        valid_sample["weights"][y_true == 0] /= 1e3
    if "constituents" in valid_sample:
        valid_sample["constituents"] = apply_scaler(
            valid_sample["constituents"], args.n_dims, const_scaler)
    if "HLVs" in valid_sample:
        valid_sample["HLVs"] = apply_scaler(valid_sample["HLVs"], args.n_dims,
                                            hlv_scaler)
    x_true = features(valid_sample)

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

    if _on(args.plotting):
        metric_list = ["Latent", "MAE", "KLD", "JSD"]
        loss_metric = "MAE"
        if os.path.isfile(args.hist_file):
            plot_history(args.hist_file, args.output_dir)
        plot_results(y_true, x_true, x_pred, valid_sample, args.n_dims, params,
                     metric_list, loss_metric, args.sig_data, args.output_dir,
                     args.apply_cuts, args.normal_losses, args.decorrelation,
                     npe=args.npe, mesh=mesh)


def main(argv=None):
    import jax
    from ..utils.logging import args_banner
    from ..data.scalers import Scaler
    from ..models import VAEConfig, init_vae
    from ..train import train_model
    from ..parallel import data_parallel_mesh

    args = build_parser().parse_args(argv)
    out_root = _wire_paths(args)
    hlv_list, input_dim, train_cuts, valid_cuts = _select_samples(args)
    print("\nPROGRAM ARGUMENTS:\n" + args_banner(args))

    n_devices = args.n_devices or len(jax.devices())
    mesh = data_parallel_mesh(n_devices) if n_devices > 1 else None
    config = VAEConfig(fc_layers=tuple(args.FC_layers), input_dim=input_dim)
    # --seed drives both the weight init and the reparam noise stream, so
    # a sequential `--seed` sweep and an ensemble seed lane are identical
    params = _load_model_in(
        args, init_vae(jax.random.PRNGKey(args.seed), config), out_root)
    const_scaler = hlv_scaler = None
    if args.const_scaler_type and os.path.isfile(args.const_scaler_in):
        const_scaler = Scaler.load(args.const_scaler_in)
    if args.HLV_scaler_type and os.path.isfile(args.HLV_scaler_in):
        hlv_scaler = Scaler.load(args.HLV_scaler_in)

    if args.n_epochs > 0:
        train_gen, valid_gen, const_scaler, hlv_scaler = _make_generators(
            args, hlv_list, train_cuts, const_scaler, hlv_scaler)
        state_file = out_root + "/" + args.state_file if args.state_file else None
        params, _ = train_model(params, train_gen, valid_gen, args.OE_type,
                                args.n_epochs, args.batch_size, args.beta,
                                args.lamb, args.margin, args.lr, args.hist_file,
                                args.model_in, args.model_out, mesh=mesh,
                                seed=args.seed, state_file=state_file)
        if os.path.isfile(args.model_out):
            from ..train.keras_import import load_params_auto
            params = load_params_auto(args.model_out, params, "vae")
            _maybe_export_keras(params, args.model_out, "vae")
    if not _on(args.plotting) and not _on(args.apply_cuts):
        return 0
    _evaluate(args, params, const_scaler, hlv_scaler, hlv_list, valid_cuts,
              mesh=mesh)
    return 0


# grid axes that share one compiled program (traced scalars / RNG keys;
# anything shape- or graph-changing must stay a sequential group)
VMAPPABLE = ("beta", "lamb", "margin", "lr", "seed")
_VM_COERCE = {"beta": float, "lamb": float, "margin": float, "lr": float,
              "seed": int}


def _grid_configs(passthrough, names, value_rows, output_dirs):
    """Parse the shared argv into per-config args with wired paths.

    Sample selection runs once on the lead config; its resolved
    ``[start, stop]`` train/valid windows are copied to every other
    config AFTER that resolution — copying the raw scalars would make
    the non-lead configs re-resolve ``n_valid`` as ``(0, n)`` during
    evaluation, i.e. evaluate on the training region (a real bug once).
    Returns (configs, out_roots, selection) with
    ``selection = (hlv_list, input_dim, train_cuts, valid_cuts)``.
    """
    assert set(names) <= set(VMAPPABLE), names
    parser = build_parser()
    configs = []
    for row, out_dir in zip(value_rows, output_dirs):
        args = parser.parse_args(list(passthrough))
        for name, value in zip(names, row):
            setattr(args, name, _VM_COERCE[name](value))
        args.output_dir = out_dir
        configs.append(args)
    lead = configs[0]
    out_roots = [_wire_paths(a) for a in configs]
    selection = _select_samples(lead)
    for args in configs[1:]:
        args.n_train, args.n_valid = lead.n_train, lead.n_valid
    return configs, out_roots, selection


def run_ensemble(passthrough, names, value_rows, output_dirs):
    """Train a same-shape hyper-parameter grid as one vmapped program.

    ``passthrough``: the shared CLI argv; ``names``: grid axis names
    (subset of VMAPPABLE); ``value_rows``: one tuple per config;
    ``output_dirs``: per-config output roots (weights + history +
    plots land there exactly as a sequential sweep's would).
    Data preparation (scaler fit, OoD load, pairing, reweighting) runs
    ONCE and is shared across configs.
    """
    import jax
    from ..utils.logging import args_banner
    from ..models import VAEConfig, init_vae
    from ..train.ensemble import train_ensemble, stack_trees
    from ..data.scalers import Scaler

    configs, out_roots, (hlv_list, input_dim, train_cuts, valid_cuts) = \
        _grid_configs(passthrough, names, value_rows, output_dirs)
    # shared data prep uses config 0's args (identical across configs
    # for everything non-vmappable by construction)
    lead = configs[0]
    out_root = out_roots[0]
    mesh = None
    if lead.n_devices not in (0, 1):
        from ..parallel.mesh import config_mesh
        if len(configs) % lead.n_devices == 0:
            mesh = config_mesh(lead.n_devices)
            print(f"Sharding the {len(configs)}-config axis over "
                  f"{lead.n_devices} devices (zero-collective sweep)")
        else:
            print(f"NOTE: {len(configs)} configs not divisible by "
                  f"--n_devices {lead.n_devices}; training on one device")
    print("\nPROGRAM ARGUMENTS (ensemble lead):\n" + args_banner(lead))
    const_scaler = hlv_scaler = None
    if lead.const_scaler_type and os.path.isfile(lead.const_scaler_in):
        const_scaler = Scaler.load(lead.const_scaler_in)
    if lead.HLV_scaler_type and os.path.isfile(lead.HLV_scaler_in):
        hlv_scaler = Scaler.load(lead.HLV_scaler_in)

    config = VAEConfig(fc_layers=tuple(lead.FC_layers), input_dim=input_dim)
    stacked = stack_trees([
        _load_model_in(a, init_vae(jax.random.PRNGKey(a.seed), config), root)
        for a, root in zip(configs, out_roots)])

    if lead.n_epochs > 0:
        train_gen, valid_gen, const_scaler, hlv_scaler = _make_generators(
            lead, hlv_list, train_cuts, const_scaler, hlv_scaler)
        hyper = tuple(np.array([getattr(a, k) for a in configs], np.float32)
                      for k in ("beta", "lamb", "margin"))
        stacked, _ = train_ensemble(
            stacked, hyper, train_gen, valid_gen, lead.OE_type,
            lead.n_epochs, lead.batch_size,
            lr=np.array([a.lr for a in configs], np.float32),
            hist_files=[a.hist_file for a in configs],
            model_outs=[a.model_out for a in configs],
            seeds=[a.seed for a in configs], mesh=mesh,
            state_file=(out_root + "/" + lead.state_file
                        if lead.state_file else None))

    from ..train.ensemble import tree_slice
    for g, args in enumerate(configs):
        params = tree_slice(stacked, g)
        if os.path.isfile(args.model_out):
            from ..train.keras_import import load_params_auto
            params = load_params_auto(args.model_out, params, "vae")
            _maybe_export_keras(params, args.model_out, "vae")
        if _on(args.plotting) or _on(args.apply_cuts):
            print(f"\n===== ENSEMBLE EVAL {g}: {args.output_dir} =====")
            _evaluate(args, params, const_scaler, hlv_scaler, hlv_list,
                      valid_cuts)
    return 0


if __name__ == "__main__":
    sys.exit(main())
