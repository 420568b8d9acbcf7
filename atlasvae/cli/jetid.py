"""jet-ID entry point: supervised CNN/FCN classifier training + results.

Mirrors the reference's classifier CLI surface (ref
jet-ID/classifier.py:16-61 flags; sample selection :80-118; training
:257-271; results :287) on the TPU-native stack.  The multi-GPU
MirroredStrategy path (ref jet-ID/models.py:69-81) is replaced by the
mesh utilities; the per-replica batch scaling (batch = n_gpus * 5e3,
ref classifier.py:136-138) carries over as batch = n_devices * 5e3.
"""

import os
import sys
from argparse import ArgumentParser, SUPPRESS
from pathlib import Path

import numpy as np


def build_parser():
    parser = ArgumentParser()
    parser.add_argument("--n_train", default=1e5, type=float)
    parser.add_argument("--n_valid", default=1e5, type=float)
    parser.add_argument("--batch_size", default=5e3, type=float)
    parser.add_argument("--n_epochs", default=100, type=int)
    parser.add_argument("--n_classes", default=2, type=int)
    parser.add_argument("--n_folds", default=1, type=int)
    parser.add_argument("--vmap_folds", default="OFF",
                        help="ON: train all k folds as ONE vmapped device "
                             "program instead of sequentially (the "
                             "reference runs one fold per Slurm task); "
                             "pays XLA compile and per-call dispatch once "
                             "instead of k times — MXU FLOPs still scale "
                             "with k (see train/ensemble.py docstring)")
    parser.add_argument("--n_devices", default=0, type=int)   # was n_gpus
    parser.add_argument("--n_gpus", dest="n_devices", type=int,
                        help="reference alias of --n_devices "
                             "(ref jet-ID/classifier.py:26): the "
                             "MirroredStrategy GPU count maps onto the "
                             "data-parallel mesh size")
    # cluster-path plumbing accepted for verbatim command-line parity;
    # the dataset registry + --output_dir replace them (PARITY.md S2.4)
    parser.add_argument("--host_name", default="lps", help="no-op "
                        "(ref classifier.py:31; host-keyed data paths are "
                        "the registry's job here)")
    parser.add_argument("--node_dir", default="", help="no-op "
                        "(ref classifier.py:30 local scratch staging)")
    parser.add_argument("--sbatch_var", default=0, type=int, help="no-op "
                        "(ref classifier.py:29 Slurm array plumbing; use "
                        "cli.sweep --task_id)")
    parser.add_argument("--NN_type", default="FCN")
    parser.add_argument("--FCN_neurons", default=[200, 200], type=int, nargs="+")
    parser.add_argument("--weight_type", default="none")
    parser.add_argument("--bkg_ratio", default=0, type=float)
    parser.add_argument("--lr", default=1e-3, type=float)
    parser.add_argument("--patience", default=10, type=int)
    parser.add_argument("--n_const", default=20, type=int)
    # reference name for the constituent count (ref classifier.py:23)
    parser.add_argument("--n_tracks", dest="n_const", type=int,
                        default=SUPPRESS)
    parser.add_argument("--n_dims", default=3, type=int)
    parser.add_argument("--constituents", default="ON")
    parser.add_argument("--HLVs", default="ON")
    # master branch gates (ref classifier.py:39-40,96-97: OFF empties
    # the images / scalars variable lists)
    parser.add_argument("--images", default="ON")
    parser.add_argument("--scalars", default="ON")
    # master scaling gate (ref classifier.py:41,145: scaling only when
    # ON and scalar branches exist)
    parser.add_argument("--scaling", default="ON")
    # monitored series for checkpoint/plateau/early-stop callbacks
    # (ref classifier.py:47 default 'loss', models.py:94-99)
    parser.add_argument("--metrics", default="loss",
                        choices=["loss", "val_loss", "accuracy",
                                 "val_accuracy"])
    parser.add_argument("--verbose", default=1, type=int)
    parser.add_argument("--scaler_type", default="RobustScaler")
    parser.add_argument("--scaler_in", default="",
                        help="load a pickled HLV scaler instead of fitting")
    parser.add_argument("--scaler_out", default="",
                        help="scaler save path (default scaler_<type>.pkl)")
    parser.add_argument("--t_scaling", default="ON",
                        help="RobustScaler on constituent components for the "
                             "flat tracks branch (ref jet-ID/classifier.py:42 "
                             "--t_scaling; utils.py:366-389 fit/apply_t_scaler)")
    parser.add_argument("--t_scaler_in", default="",
                        help="load a pickled track scaler instead of fitting")
    parser.add_argument("--t_scaler_out", default="t_scaler.pkl")
    parser.add_argument("--dropout", default=0.1, type=float)
    parser.add_argument("--l2", default=1e-7, type=float,
                        help="kernel L2 regularization on hidden Dense/Conv "
                             "layers (ref jet-ID/classifier.py:32)")
    parser.add_argument("--image_size", default=16, type=int,
                        help="constituent-image pixels per side (CNN mode)")
    parser.add_argument("--train_cuts", default="",
                        help="extra cut expression on the training slice")
    parser.add_argument("--generator", default="OFF",
                        help="stream training chunks per epoch instead of "
                             "materializing the full sample "
                             "(ref classifier.py:257-266 generator path)")
    parser.add_argument("--memGB", default=30, type=float,
                        help="host-memory chunk budget in generator mode")
    parser.add_argument("--model_in", default="")
    parser.add_argument("--model_out", default="model.npz")
    parser.add_argument("--results_out", default="valid_results.pkl")
    parser.add_argument("--results_in", default="",
                        help="re-evaluate saved validation results without "
                             "retraining (ref classifier.py:122-132 + "
                             "utils.py:454-483 validation)")
    parser.add_argument("--state_file", default="",
                        help="full-train-state checkpoint (params + Adam "
                             "moments + callback counters + RNG key): "
                             "resumes bit-exactly")
    parser.add_argument("--output_dir", default="outputs")
    parser.add_argument("--plotting", default="ON")
    parser.add_argument("--n_eval", default=0, type=float,
                        help="generator mode: per-epoch validation slice "
                             "size (0 = the whole validation range), "
                             "ref jet-ID/classifier.py:18,113-114,261")
    parser.add_argument("--eta_region", default="0.0-2.5",
                        help="named |eta| window composed into valid_cuts "
                             "on results re-evaluation "
                             "(ref jet-ID/classifier.py:48,121-126)")
    parser.add_argument("--sep_bkg", default="OFF",
                        help="ON: report class-0-vs-each-background results "
                             "separately in addition to the merged "
                             "background (ref jet-ID/utils.py:628-638)")
    parser.add_argument("--runDiffPlots", default=0, type=int,
                        help="accepted for command-line parity; a dead flag "
                             "in the reference too (threaded into "
                             "valid_results but never consumed, ref "
                             "jet-ID/classifier.py:58, utils.py:628-638)")
    parser.add_argument("--correlations", default="OFF",
                        help="accepted for command-line parity; defined but "
                             "never read by the reference "
                             "(ref jet-ID/classifier.py:60)")
    parser.add_argument("--feature_removal", default="OFF")
    parser.add_argument("--mixed_precision", default="AUTO",
                        help="bfloat16 compute / float32 master weights. "
                             "AUTO (default) resolves per NN_type: ON for "
                             "CNN (measured 1.7x step speedup at AUC "
                             "parity, docs/PERF.md — the reference applies "
                             "mixed_float16 unconditionally, ref "
                             "jet-ID/models.py:74-75), OFF for FCN (measured "
                             "no gain: the small-MLP step is padded-tile "
                             "bound, not FLOP bound; deliberate deviation, "
                             "PARITY.md S2.4).  Explicit ON/OFF overrides.")
    parser.add_argument("--valid_cuts", default="")
    # data
    parser.add_argument("--bkg_data", default="QCD-Geneva")
    parser.add_argument("--sig_data", default="top-Geneva")
    parser.add_argument("--synthetic", default=0, type=float)
    return parser


def resolve_compute_dtype(mixed_precision, nn_type):
    """--mixed_precision AUTO/ON/OFF -> compute dtype.

    The reference sets the mixed_float16 policy unconditionally inside
    create_model (ref jet-ID/models.py:74-75).  Here AUTO follows the
    measurement (docs/PERF.md "jet-ID"): bfloat16 for the CNN towers
    (1.7x step at AUC parity), float32 for the FCN (no gain — the
    small-MLP step is MXU padded-tile bound).  The FCN-f32 default is a
    deliberate deviation recorded in PARITY.md S2.4."""
    value = str(mixed_precision).upper()
    if value == "AUTO":
        return "bfloat16" if nn_type == "CNN" else "float32"
    return "bfloat16" if value == "ON" else "float32"


ETA_REGIONS = ("0.0-1.3", "1.3-1.6", "1.6-2.5")


def _eta_cuts(args, sample):
    """Compose the named |eta| window into valid_cuts on results
    re-evaluation, exactly as ref jet-ID/classifier.py:121-126."""
    if args.eta_region not in ETA_REGIONS:
        return args.valid_cuts
    eta_1, eta_2 = args.eta_region.split("-")
    key = "eta" if "eta" in sample else "rljet_eta"
    cuts = (f'(abs(sample["{key}"]) >= {eta_1}) & '
            f'(abs(sample["{key}"]) <= {eta_2})')
    return cuts if not args.valid_cuts else f"{cuts} & ({args.valid_cuts})"


def _report_results(v_view, v_labels, probs, train_labels, args, out_root, on):
    """Accuracy / AUC / background-rejection / plots, for the merged
    background and (``--sep_bkg ON``) each background class separately
    (ref jet-ID/utils.py:628-638 valid_results bkg_list fan-out; the
    reference forks one print_results process per background)."""
    from ..eval.jetid_eval import compo_matrix, discriminant
    from ..eval.roc import auc_score
    from ..plotting.performance import background_rejection

    probs = np.asarray(probs)
    _, accuracy = compo_matrix(v_labels, train_labels, probs)
    print(f"\nVALIDATION SAMPLE ACCURACY: {accuracy:.2f} %")
    bkg_list = ["bkg"]
    if on(args.sep_bkg) and probs.shape[1] > 2:
        bkg_list += sorted(set(range(probs.shape[1])) - {0})
    rejections = {}
    for bkg in bkg_list:
        view, disc_labels, disc = discriminant(v_view, v_labels, probs,
                                               (0,), bkg)
        auc = auc_score(disc_labels, disc, view["weights"])
        tag = "signal vs background" if bkg == "bkg" else f"class 0 vs {bkg}"
        print(f"VALIDATION AUC ({tag}): {auc:.4f}")
        rejections[bkg] = background_rejection(disc_labels, disc,
                                               view["weights"])
        if on(args.plotting):
            from ..plotting.performance import roc_curves, class_distributions
            folder = out_root if bkg == "bkg" \
                else out_root + f"/class_0_vs_{bkg}"
            Path(folder).mkdir(parents=True, exist_ok=True)
            roc_curves(disc_labels, {"jet-ID": disc}, view["weights"],
                       ["jet-ID"], folder)
            if bkg == "bkg":
                class_distributions(v_labels, probs, v_view["weights"],
                                    folder)
    return rejections


def main(argv=None):
    import jax
    import pickle
    from ..utils.logging import args_banner
    from ..data import (make_sample, fit_scaler, apply_scaler,
                        ensure_synthetic_registry, HLV_LIST)
    from ..models import JetIDConfig, init_jetid
    from ..train.jetid_loop import train_classifier, predict_classifier
    from ..train.checkpoint import load_pytree
    from ..eval.jetid_eval import (make_labels, get_class_weight,
                                   get_sample_weights, compo_matrix)

    args = build_parser().parse_args(argv)
    for key in ["n_train", "n_valid", "n_eval", "batch_size"]:
        setattr(args, key, int(getattr(args, key)))
    out_root = args.output_dir
    Path(out_root).mkdir(parents=True, exist_ok=True)
    if args.synthetic:
        ensure_synthetic_registry(n_events=int(args.synthetic),
                                  n_const_max=max(args.n_const, 20))
    print("\nPROGRAM ARGUMENTS:\n" + args_banner(args))

    on = lambda v: v.upper() == "ON" if isinstance(v, str) else bool(v)
    if args.results_in:
        # saved-results re-evaluation: no data loading, no training
        # (ref classifier.py:122-132 -> utils.py:454-483 validation)
        path = out_root + "/" + args.results_in
        print("\nLOADING VALIDATION RESULTS FROM", path)
        with open(path, "rb") as f:
            v_view, v_labels, probs = pickle.load(f)
        args.valid_cuts = _eta_cuts(args, v_view)  # ref classifier.py:121-126
        if args.valid_cuts:
            from ..utils.expr import evaluate_cut
            keep = evaluate_cut(args.valid_cuts, v_view)
            v_view = {k: np.asarray(v)[keep] for k, v in v_view.items()}
            v_labels, probs = v_labels[keep], probs[keep]
            print(f"valid_cuts kept {len(v_labels)} jets")
        _report_results(v_view, v_labels, probs, (), args, out_root, on)
        return 0
    n_devices = args.n_devices or 1
    batch_size = n_devices * args.batch_size  # ref classifier.py:137-138
    mesh = None
    if n_devices > 1:
        # synchronous DP over the device mesh — the MirroredStrategy
        # replacement (ref jet-ID/models.py:69-81); psum over ICI
        from ..parallel.mesh import make_mesh
        devices = jax.devices()[:n_devices]
        if len(devices) < n_devices:
            raise SystemExit(f"--n_devices {n_devices}: only "
                             f"{len(devices)} devices visible")
        mesh = make_mesh((("data", n_devices),), devices)
    hlv_list = list(HLV_LIST)
    cuts = ['(sample["m"] >= 30)', '(sample["pt"] <= 5000)']
    n_total = args.n_train + args.n_valid
    streaming = on(args.generator)
    first_chunk = None
    if streaming:
        # generator path (ref classifier.py:257-266): only the validation
        # slice is materialized; training chunks stream per epoch
        if args.n_folds > 1 or on(args.feature_removal) or args.NN_type == "CNN":
            raise SystemExit("--generator ON supports the plain training path "
                             "(no k-fold CV / feature removal / CNN images)")
        chunk = int(1e9 * args.memGB / max(args.n_const * args.n_dims * 4, 1))
        chunk = max(batch_size, min(chunk, args.n_train))
        sample = make_sample(args.bkg_data, args.sig_data,
                             [args.n_train, n_total], [args.n_train, n_total],
                             cuts, args.n_const, args.n_dims, args.constituents,
                             args.HLVs, hlv_list, shuffling=True)
        first_chunk = make_sample(args.bkg_data, args.sig_data, [0, chunk],
                                  [0, chunk], cuts, args.n_const, args.n_dims,
                                  args.constituents, args.HLVs, hlv_list,
                                  shuffling=True)
    else:
        sample = make_sample(args.bkg_data, args.sig_data, n_total, n_total, cuts,
                             args.n_const, args.n_dims, args.constituents,
                             args.HLVs, hlv_list, shuffling=True)
    labels = make_labels(sample, args.n_classes)
    n = len(labels)
    n_train = 0 if streaming else min(args.n_train, n // 2)
    train_idx, valid_idx = np.arange(n_train), np.arange(n_train, n)
    # extra slice-level cut expressions (ref classifier.py train/valid_cuts)
    if args.train_cuts or args.valid_cuts:
        from ..utils.expr import evaluate_cut
        arrays = {k: np.asarray(v) for k, v in sample.items() if np.ndim(v) >= 1}
        if args.train_cuts:
            train_idx = train_idx[evaluate_cut(args.train_cuts, arrays)[train_idx]]
        if args.valid_cuts:
            valid_idx = valid_idx[evaluate_cut(args.valid_cuts, arrays)[valid_idx]]

    scalars, scalar_dims = [], []
    # --scalars OFF empties the scalar branch list wholesale
    # (ref classifier.py:96)
    if on(args.HLVs) and on(args.scalars):
        scalars, scalar_dims = ["HLVs"], [sample["HLVs"].shape[1]]
    const_dim = sample["constituents"].shape[1] if on(args.constituents) else 0
    images, image_shapes = (), ()
    if args.NN_type == "CNN" and on(args.images):
        # CNN mode trains a conv tower on pt-weighted constituent images
        # (ref jet-ID/classifier.py images branches + multi_CNN towers;
        # --images OFF empties the image list, ref :97, leaving a
        # branch-only model)
        if not on(args.constituents):
            raise SystemExit("--NN_type CNN requires --constituents ON")
        from ..data import constituent_images
        px = args.image_size
        imgs = np.asarray(
            constituent_images(sample["constituents"], px, n_dims=args.n_dims),
            np.float32)
        # the normalization scale is fit on the TRAINING rows only and
        # persisted next to the model, so a --model_in re-evaluation on
        # a different slice sees the same feature scale it trained with
        scale_file = out_root + "/image_scale.pkl"
        if args.model_in and os.path.isfile(scale_file):
            with open(scale_file, "rb") as f:
                img_scale = pickle.load(f)
            print(f"Loaded image scale {img_scale:g} from: {scale_file}")
        else:
            fit_rows = imgs[train_idx] if len(train_idx) else imgs
            img_scale = max(float(fit_rows.max()), 1e-6)
            with open(scale_file, "wb") as f:
                pickle.dump(img_scale, f)
        sample["images"] = imgs / img_scale
        images, image_shapes = ("images",), ((px, px),)
        const_dim = 0  # the flat branch is replaced by the image tower
    if not (images or const_dim or scalar_dims):
        raise SystemExit("no input branches left: at least one of "
                         "--images/--scalars/--constituents/--HLVs must "
                         "be ON")
    config = JetIDConfig(n_classes=args.n_classes, scalars=tuple(scalars),
                         scalar_dims=tuple(scalar_dims),
                         constituent_dim=const_dim, nn_type=args.NN_type,
                         images=images, image_shapes=image_shapes,
                         fcn_neurons=tuple(args.FCN_neurons),
                         dropout=args.dropout, l2=args.l2,
                         compute_dtype=resolve_compute_dtype(
                             args.mixed_precision, args.NN_type))
    params = init_jetid(jax.random.PRNGKey(0), config)

    def _resolve_in(path):
        """Resolve a --*_in file against cwd then output_dir (the vae/aae
        CLIs prefix output_dir, ref OE-AAE/train.py:58-60); a named but
        missing file warns instead of silently refitting."""
        if not path:
            return None
        for cand in (path, out_root + "/" + path):
            if os.path.isfile(cand):
                return cand
        print(f"WARNING: --scaler file '{path}' not found (also tried "
              f"{out_root}/) -> refitting")
        return None

    scaler = None
    # scaling only when ON and scalar branches exist (ref classifier
    # :145 `args.scaling = args.scaling == 'ON' and ...`)
    scaling = bool(scalars) and on(args.scaling)
    scaler_in = _resolve_in(args.scaler_in) if scaling else None
    if scaler_in:
        from ..data.scalers import Scaler
        scaler = Scaler.load(scaler_in)
        print("Loaded HLV scaler from:", scaler_in)
        sample["HLVs"] = apply_scaler(sample["HLVs"], scaler=scaler)
    elif args.scaler_type and scaling:
        scaler_out = args.scaler_out or f"scaler_{args.scaler_type}.pkl"
        fit_rows = first_chunk["HLVs"] if streaming \
            else sample["HLVs"][train_idx]
        scaler = fit_scaler(fit_rows, scaler_out=out_root + "/" + scaler_out,
                            scaler_type=args.scaler_type)
        sample["HLVs"] = apply_scaler(sample["HLVs"], scaler=scaler)

    # track scaler: RobustScaler per 4-vector component on the flat
    # constituents branch (ref jet-ID/utils.py:366-389 fit_t_scaler/
    # apply_t_scaler; classifier.py:42 --t_scaling, default ON)
    t_scaler = None
    if const_dim and on(args.t_scaling):
        t_scaler_in = _resolve_in(args.t_scaler_in)
        if t_scaler_in:
            from ..data.scalers import Scaler
            t_scaler = Scaler.load(t_scaler_in)
            print("Loaded track scaler from:", t_scaler_in)
        else:
            fit_rows = first_chunk["constituents"] if streaming \
                else sample["constituents"][train_idx if len(train_idx)
                                            else slice(None)]
            print("Fitting track scaler", end="")
            t_scaler = fit_scaler(fit_rows, n_dims=args.n_dims,
                                  scaler_out=out_root + "/" + args.t_scaler_out,
                                  scaler_type="RobustScaler", reshape=True,
                                  verbose=False)
            print(" -> " + out_root + "/" + args.t_scaler_out)
        sample["constituents"] = apply_scaler(
            sample["constituents"], args.n_dims, t_scaler, tag="tracks",
            reshape=True, verbose=False)

    def inputs_for(idx):
        out = {}
        if scalars:
            out["HLVs"] = sample["HLVs"][idx]
        if const_dim:
            out["constituents"] = sample["constituents"][idx]
        for name in images:
            out[name] = sample[name][idx]
        return out

    class_source = make_labels(first_chunk, args.n_classes) if streaming \
        else labels[train_idx]
    class_weight = get_class_weight(class_source, args.bkg_ratio)
    sample_weight = None
    if not streaming and args.weight_type in ("bkg_ratio", "flattening",
                                              "match2class", "match2max"):
        train_view = {k: np.asarray(v)[train_idx] for k, v in sample.items()
                      if np.ndim(v) >= 1}
        sample_weight, _ = get_sample_weights(train_view, labels[train_idx],
                                              args.weight_type, args.bkg_ratio)
        # sparse (pt, eta) bins yield inf ratios (the reference's math
        # does too, ref jet-ID/utils.py flattening); zero those rows so
        # TerminateOnNaN doesn't abort training, uniform if all die
        sample_weight = np.where(np.isfinite(sample_weight), sample_weight,
                                 0.0).astype(np.float32)
        if sample_weight.sum() <= 0:
            print("weight scheme degenerate -> uniform")
            sample_weight = None

    model_out = out_root + "/" + args.model_out
    if args.n_folds > 1:
        # k-fold CV keyed on the event index: train each fold on the
        # complement, save model_<fold>.npz, then merge fold predictions
        # (ref jet-ID/utils.py:532-566 cross_valid; the reference runs
        # one fold per Slurm task, here folds run sequentially)
        from ..eval.jetid_eval import cross_valid
        from ..train.checkpoint import save_pytree
        event_number = np.arange(n)
        fold_splits = [(np.where(event_number % args.n_folds != fold - 1)[0],
                        np.where(event_number % args.n_folds == fold - 1)[0])
                       for fold in range(1, args.n_folds + 1)]

        def _fold_weights(idx):
            if class_weight is None:
                return np.ones(len(idx), np.float32)
            return np.asarray([class_weight[int(l)] for l in labels[idx]],
                              np.float32)

        if on(args.vmap_folds):
            if mesh is not None:
                raise SystemExit(
                    "--vmap_folds ON shards the fold axis, not the data "
                    "axis — drop --n_devices or use sequential folds")
            # all folds in one vmapped program (train/jetid_loop.py)
            from ..train.jetid_loop import train_kfold_vmapped
            fold_loads = [(inputs_for(t), labels[t], _fold_weights(t))
                          for t, _ in fold_splits]
            fold_valids = [(inputs_for(v), labels[v],
                            np.ones(len(v), np.float32))
                           for _, v in fold_splits]
            fold_params = [init_jetid(jax.random.PRNGKey(fold), config)
                           for fold in range(1, args.n_folds + 1)]
            model_outs = [out_root + f"/model_{fold}.npz"
                          for fold in range(1, args.n_folds + 1)]
            best, _ = train_kfold_vmapped(
                fold_params, config, fold_loads, fold_valids, args.n_epochs,
                batch_size, args.lr, args.patience, model_outs,
                monitor=args.metrics, verbose=bool(args.verbose))
            for fold, p in enumerate(best, start=1):
                if not os.path.isfile(out_root + f"/model_{fold}.npz"):
                    save_pytree(out_root + f"/model_{fold}.npz", p)
            print(f"{args.n_folds} folds trained in one vmapped program")
        else:
            for fold, (t_idx, v_idx) in enumerate(fold_splits, start=1):
                fold_params = init_jetid(jax.random.PRNGKey(fold), config)
                fold_params, _ = train_classifier(
                    fold_params, config, inputs_for(t_idx), labels[t_idx],
                    inputs_for(v_idx), labels[v_idx], args.n_epochs,
                    batch_size, args.lr, args.patience, class_weight, None,
                    out_root + f"/model_{fold}.npz", verbose=False,
                    monitor=args.metrics, mesh=mesh)
                # ensure the fold checkpoint exists even when no epoch
                # improved (or --n_epochs 0): cross_valid loads these files
                if not os.path.isfile(out_root + f"/model_{fold}.npz"):
                    save_pytree(out_root + f"/model_{fold}.npz", fold_params)
                print(f"fold {fold}/{args.n_folds} trained")
        cv_sample = {"eventNumber": event_number}
        for key in ("HLVs", "constituents"):
            if key in sample and (scalars if key == "HLVs" else const_dim):
                cv_sample[key] = sample[key]
        for name in images:
            cv_sample[name] = sample[name]
        cv_probs = cross_valid(cv_sample, labels, config, out_root,
                               args.n_folds, params)
        _, cv_acc = compo_matrix(labels, (), cv_probs)
        print(f"\n{args.n_folds}-FOLD CV ACCURACY: {cv_acc:.2f} %")
        # in k-fold mode the cross-validated predictions ARE the
        # validation result (every event scored by the fold that held it
        # out, ref jet-ID/utils.py:532-566); no additional single model
        # is trained
        valid_idx = np.arange(n)
        kfold_probs = cv_probs
    elif args.n_epochs > 0 and streaming:
        from ..train.jetid_loop import train_classifier_streaming
        from ..utils.chunks import index_ranges

        # generator mode churns chunk-sized host buffers every epoch —
        # same allocator tuning as the streaming BatchGenerator
        # (utils/hostmem.py; opt out with ATLASVAE_HEAP_REUSE=0)
        from ..utils.hostmem import enable_heap_reuse
        enable_heap_reuse(2 * int(chunk) * args.n_const * args.n_dims * 4)

        def load_iter():
            for lo, hi in index_ranges(args.n_train, bin_size=chunk):
                ch = make_sample(args.bkg_data, args.sig_data, [lo, hi],
                                 [lo, hi], cuts, args.n_const, args.n_dims,
                                 args.constituents, args.HLVs, hlv_list,
                                 shuffling=True, verbose=False)
                if args.train_cuts:  # applied per chunk in generator mode
                    from ..utils.expr import evaluate_cut
                    keep = evaluate_cut(args.train_cuts,
                                        {k: np.asarray(v) for k, v in ch.items()
                                         if np.ndim(v) >= 1})
                    ch = {k: np.asarray(v)[keep] if np.ndim(v) >= 1 else v
                          for k, v in ch.items()}
                ch_labels = make_labels(ch, args.n_classes)
                if scalars and scaler is not None:
                    ch["HLVs"] = apply_scaler(ch["HLVs"], scaler=scaler,
                                              verbose=False)
                if const_dim and t_scaler is not None:
                    ch["constituents"] = apply_scaler(
                        ch["constituents"], args.n_dims, t_scaler,
                        tag="tracks", reshape=True, verbose=False)
                w = np.ones(len(ch_labels), np.float32) if class_weight is None \
                    else np.asarray([class_weight[int(l)] for l in ch_labels],
                                    np.float32)
                if args.weight_type in ("bkg_ratio", "flattening",
                                        "match2class", "match2max"):
                    sw, _ = get_sample_weights(
                        {k: np.asarray(v) for k, v in ch.items()
                         if np.ndim(v) >= 1}, ch_labels, args.weight_type,
                        args.bkg_ratio)
                    sw = np.asarray(sw, np.float32)
                    # binned weight schemes are computed per chunk in
                    # generator mode; sparse (pt, eta) bins on a small
                    # chunk can produce inf/NaN ratios — zero those rows,
                    # and fall back to class weights alone if the whole
                    # chunk degenerates
                    sw = np.where(np.isfinite(sw), sw, 0.0)
                    if sw.sum() > 0:
                        w = w * sw
                    else:
                        print("chunk weight scheme degenerate -> uniform")
                inputs = {}
                if scalars:
                    inputs["HLVs"] = ch["HLVs"]
                if const_dim:
                    inputs["constituents"] = ch["constituents"]
                yield inputs, ch_labels, w

        state_file = out_root + "/" + args.state_file if args.state_file else None
        # --n_eval: per-epoch validation on the first n_eval rows of the
        # valid range only (the reference's eval_gen slice,
        # ref classifier.py:113-114,261); final results still use the
        # full validation sample
        eval_idx = valid_idx[:args.n_eval] if args.n_eval else valid_idx
        if args.n_eval:
            print(f"Per-epoch validation on {len(eval_idx)} of "
                  f"{len(valid_idx)} validation jets (--n_eval)")
        params, history = train_classifier_streaming(
            params, config, load_iter, inputs_for(eval_idx),
            labels[eval_idx], args.n_epochs, batch_size, args.lr,
            args.patience, model_out, state_file=state_file, mesh=mesh,
            verbose=bool(args.verbose), monitor=args.metrics)
    elif args.n_epochs > 0:
        state_file = out_root + "/" + args.state_file if args.state_file else None
        params, history = train_classifier(
            params, config, inputs_for(train_idx), labels[train_idx],
            inputs_for(valid_idx), labels[valid_idx], args.n_epochs,
            batch_size, args.lr, args.patience, class_weight, sample_weight,
            model_out, state_file=state_file, mesh=mesh,
            verbose=bool(args.verbose), monitor=args.metrics)
    elif args.model_in and os.path.isfile(out_root + "/" + args.model_in):
        # format sniffed by magic bytes: reference-trained / exported
        # Keras HDF5 or native npz pytree, regardless of extension
        from ..train.keras_import import load_params_auto
        params = load_params_auto(out_root + "/" + args.model_in, params,
                                  "jetid", config)
    if args.n_epochs > 0 and args.n_folds <= 1:
        # reference-style --model_out model.h5: leave a Keras-loadable
        # file (k-fold mode writes per-fold model_<fold>.npz instead)
        from ..train.keras_export import maybe_export_keras
        if maybe_export_keras(params, model_out, "jetid", config):
            print("Keras-compatible weights exported to " + model_out)

    if on(args.feature_removal) and scalars:
        # feature-ablation ranking over the HLV columns
        # (ref jet-ID/utils.py:644-674); the ablation lanes vmap over
        # configs, so the DP mesh does not apply — train the short
        # ablation runs at the per-device batch instead of silently
        # inflating it by n_devices
        from ..eval.jetid_eval import feature_removal
        names = hlv_list[:sample["HLVs"].shape[1]]
        drops = feature_removal(
            config, inputs_for(train_idx), labels[train_idx],
            inputs_for(valid_idx), labels[valid_idx], names,
            init_fn=lambda i: init_jetid(jax.random.PRNGKey(i), config),
            epochs=max(2, args.n_epochs // 4), batch_size=args.batch_size,
            lr=args.lr, vmapped=on(args.vmap_folds))
        print("\nFEATURE-ABLATION RANKING (accuracy drop when removed):")
        for name, drop in sorted(drops.items(), key=lambda kv: -kv[1]):
            print(f"  {name:20s} {100 * drop:+.2f} %")

    # validation results (ref classifier.py:287 valid_results)
    if args.n_folds > 1:
        probs = kfold_probs
    else:
        probs = predict_classifier(params, config, inputs_for(valid_idx))
    v_labels = labels[valid_idx]
    v_view = {k: np.asarray(v)[valid_idx] for k, v in sample.items()
              if np.ndim(v) >= 1}
    _report_results(v_view, v_labels, probs, labels[train_idx], args,
                    out_root, on)
    with open(out_root + "/" + args.results_out, "wb") as f:
        pickle.dump((v_view, v_labels, probs), f)
    return 0


if __name__ == "__main__":
    sys.exit(main())
