"""CLI surface smoke tests: each entry point trains/evaluates a tiny
synthetic configuration end-to-end (the reference's flag surface,
ref OE-VAE/vae.py:15-49, OE-AAE/train.py:14-46, jet-ID/classifier.py:16-61).
Plot generation is exercised by test_plotting.py; here plotting is OFF
to keep the smoke fast."""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.filterwarnings("ignore")


@pytest.fixture(scope="module")
def out_dir(tmp_path_factory):
    return tmp_path_factory.mktemp("cli")


TINY = ["--synthetic", "3000", "--n_train", "800", "--n_valid", "400",
        "--batch_size", "200", "--n_epochs", "1", "--plotting", "OFF"]


def test_vae_cli(out_dir):
    from atlasvae.cli.vae import main
    out = str(out_dir / "vae")
    # n_epochs=2: checkpointing starts at epoch 2 (ref models.py:219
    # 'if epoch > 0'), so a 1-epoch run writes history but no weights
    main(TINY + ["--n_OoD", "800", "--OE_type", "MAE", "--beta", "2",
                 "--lamb", "5", "--n_epochs", "2", "--output_dir", out])
    assert os.path.isfile(os.path.join(out, "model.npz"))
    assert os.path.isfile(os.path.join(out, "history.pkl"))


def test_aae_cli(out_dir):
    from atlasvae.cli.aae import main
    out = str(out_dir / "aae")
    main(TINY + ["--n_OoD", "800", "--output_dir", out])
    assert os.path.isfile(os.path.join(out, "AAE.npz"))


def test_jetid_cli_mixed_precision(out_dir):
    from atlasvae.cli.jetid import main
    out = str(out_dir / "jetid")
    main(TINY + ["--mixed_precision", "ON", "--output_dir", out])
    assert os.path.isfile(os.path.join(out, "model.npz"))


def test_jetid_mixed_precision_auto_default():
    """--mixed_precision AUTO (the default): bf16 for CNN towers
    (matching the reference's unconditional mixed_float16 policy where
    it pays, ref jet-ID/models.py:74-75), f32 for FCN (measured
    no-gain, PARITY.md S2.4 deliberate deviation); explicit ON/OFF
    overrides both."""
    from atlasvae.cli.jetid import build_parser, resolve_compute_dtype
    assert build_parser().get_default("mixed_precision") == "AUTO"
    assert resolve_compute_dtype("AUTO", "CNN") == "bfloat16"
    assert resolve_compute_dtype("AUTO", "FCN") == "float32"
    assert resolve_compute_dtype("ON", "FCN") == "bfloat16"
    assert resolve_compute_dtype("OFF", "CNN") == "float32"


def test_sweep_cli_selects_grid_point(out_dir, capsys):
    from atlasvae.cli.sweep import main
    out = str(out_dir / "sweep")
    main(["--entry", "vae", "--grid", "lr=1e-3,1e-4", "beta=1,2",
          "--task_id", "3", "--output_dir", out, "--"]
         + TINY + ["--n_OoD", "800"])
    text = capsys.readouterr().out
    # task 3 of the 2x2 grid -> lr=1e-4, beta=2 (row-major, ref utils.py:597-600)
    assert "0.0001" in text and os.path.isdir(out)


def test_jetid_cli_track_scaler_roundtrip(out_dir):
    """--t_scaling ON (default) fits a per-component RobustScaler on the
    constituents branch and writes t_scaler.pkl; --t_scaler_in reloads it
    (ref jet-ID/classifier.py:42,54-55; utils.py:366-389)."""
    from atlasvae.cli.jetid import main
    out = str(out_dir / "jetid_ts")
    main(TINY + ["--output_dir", out])
    t_path = os.path.join(out, "t_scaler.pkl")
    assert os.path.isfile(t_path)
    out2 = str(out_dir / "jetid_ts2")
    main(TINY + ["--output_dir", out2, "--t_scaler_in", t_path])
    assert os.path.isfile(os.path.join(out2, "model.npz"))
    assert not os.path.isfile(os.path.join(out2, "t_scaler.pkl"))  # loaded, not refit
    out3 = str(out_dir / "jetid_ts3")
    main(TINY + ["--output_dir", out3, "--t_scaling", "OFF"])
    assert not os.path.isfile(os.path.join(out3, "t_scaler.pkl"))


def test_jetid_cli_generator_mode(out_dir):
    """--generator ON streams training chunks per epoch (ref
    classifier.py:257-266); the full training sample is never
    materialized and quality matches the in-memory path class."""
    from atlasvae.cli.jetid import main
    out = str(out_dir / "jetid_gen")
    main(["--synthetic", "3000", "--n_train", "1500", "--n_valid", "600",
          "--batch_size", "200", "--n_epochs", "2", "--plotting", "OFF",
          "--generator", "ON", "--memGB", "0.0002", "--output_dir", out])
    assert os.path.isfile(os.path.join(out, "model.npz"))


def test_etl_cli_convert_and_merge(tmp_path, rng):
    """ETL CLI end-to-end on built-in rootio fixtures: convert one dijet
    DSID with extra branches, then shuffle-merge the output directory
    (ref tools/root2h5.py:10-16 flag surface)."""
    from atlasvae.cli.etl import main
    from atlasvae.etl import rootio
    from atlasvae.etl.root2h5 import SCALARS, MEV_SCALARS
    import h5py

    d = tmp_path / "in" / "user.sim.361024.ntuples"
    d.mkdir(parents=True)
    n = 150
    data = {}
    for key in SCALARS:
        scale = 1000.0 if key in MEV_SCALARS else 1.0
        data[key] = (rng.uniform(0.5, 3.0, n) * scale).astype(np.float32)
    data["weight_mc"] = rng.uniform(0.5, 2.0, n).astype(np.float32)
    data["weight_pileup"] = np.ones(n, np.float32)
    data["rljet_topTag_DNN19_qqb_score"] = rng.uniform(0, 1, n).astype(np.float32)
    counts = rng.integers(1, 8, n)
    data["rljet_n_constituents"] = counts.astype(np.int32)
    for key, gen in (("rljet_assoc_cluster_pt", lambda c: rng.uniform(1e3, 1e5, c)),
                     ("rljet_assoc_cluster_eta", lambda c: rng.normal(0, 1, c)),
                     ("rljet_assoc_cluster_phi", lambda c: rng.uniform(-3, 3, c))):
        data[key] = [gen(c).astype(np.float32) for c in counts]
    data["NPV"] = rng.integers(1, 50, n).astype(np.int32)
    rootio.write_tree(str(d / "part._000001.root"), "nominal", data)

    out = str(tmp_path / "out")
    # --tag is list-valued (only tag[0] selects the DSID, ref :100) and
    # --library is accepted as in root2h5.sh:12-13
    assert main(["--sample_type", "topo-dijet", "--tag", "1", "5",
                 "--library", "ak",
                 "--input_path", str(tmp_path / "in"), "--output_path", out,
                 "--extra_branches", "NPV"]) == 0
    with h5py.File(f"{out}/topo-dijet_361024.h5") as f:
        assert "NPV" in f and len(f["weights"]) == n
    assert main(["--merging", "ON", "--n_constituents", "7",
                 "--input_path", out, "--output_path", out]) == 0
    assert os.path.isfile(f"{out}/merging/merging.h5")


def test_jetid_cli_sep_bkg_and_eta_region(out_dir, capsys):
    """--sep_bkg per-background results + --eta_region composed valid
    cuts on results re-evaluation (ref jet-ID/classifier.py:121-126,
    utils.py:628-638); --runDiffPlots/--correlations accepted (dead
    flags in the reference too)."""
    from atlasvae.cli.jetid import main
    out = str(out_dir / "jetid_sep")
    # 3 classes so sep_bkg has individual backgrounds to split out
    main(TINY + ["--n_classes", "3", "--n_epochs", "2", "--sep_bkg", "ON",
                 "--runDiffPlots", "1", "--correlations", "ON",
                 "--output_dir", out])
    text = capsys.readouterr().out
    assert "class 0 vs 1" in text and "class 0 vs 2" in text
    assert "signal vs background" in text

    # re-evaluation from saved results with a named eta window
    main(["--results_in", "valid_results.pkl", "--eta_region", "0.0-1.3",
          "--n_classes", "3", "--sep_bkg", "ON", "--plotting", "OFF",
          "--output_dir", out])
    text = capsys.readouterr().out
    assert "valid_cuts kept" in text
    assert "class 0 vs 2" in text


def test_jetid_cli_n_eval_generator(out_dir, capsys):
    """--n_eval restricts the per-epoch validation slice in generator
    mode (ref jet-ID/classifier.py:113-114,261)."""
    from atlasvae.cli.jetid import main
    out = str(out_dir / "jetid_neval")
    main(TINY + ["--generator", "ON", "--n_eval", "150", "--n_epochs", "2",
                 "--output_dir", out])
    text = capsys.readouterr().out
    assert "Per-epoch validation on 150 of" in text


# ---- canonical-command acceptance (docs/MIGRATION.md contract) ----------
# The reference's own canonical invocations must port verbatim: flags and
# values copied literally from the checked-in job scripts, with ONLY the
# sample sizes / epoch counts reduced and --synthetic added (no real LHC
# HDF5 inputs exist here).

def test_canonical_vae_sh_command(out_dir):
    """The literal OE-VAE/vae.sh:3-11 command line (incl. its
    '--apply_cut' prefix spelling, which argparse resolves against
    --apply_cuts exactly as the reference's parser does)."""
    from atlasvae.cli.vae import main
    out = str(out_dir / "canon_vae")
    assert main([
        "--n_train=2000", "--n_valid=800", "--n_sig=800",
        "--batch_size=200", "--n_epochs=2", "--lr=1e-3",
        "--beta=2", "--lamb=5", "--n_const=100",
        "--OE_type=MAE", "--weight_type=X-S",
        "--plotting=ON", "--apply_cut=OFF",
        "--decorrelation=ON",
        "--constituents=OFF", "--const_scaler_type=QuantileTransformer",
        "--HLVs=ON", "--HLV_scaler_type=RobustScaler",
        f"--output_dir={out}", "--slurm_id=0",
        # environment bindings (sizes only):
        "--synthetic=4000", "--n_OoD=2000", "--npe=20",
    ]) in (0, None)
    assert os.path.isfile(os.path.join(out, "model.npz"))
    assert os.path.isfile(os.path.join(out, "HLV_RobustScaler.pkl"))


def test_canonical_aae_train_sh_command(out_dir):
    """The literal OE-AAE/train.sh:3-12 command line — including its
    duplicated --HLV_scaler_in (last wins, as in argparse) and
    --model_in='' empty-string forms; n_epochs raised 0 -> 1 so the
    cycle trains (the reference's 0 is its eval-only rerun mode)."""
    from atlasvae.cli.aae import main
    out = str(out_dir / "canon_aae")
    assert main([
        "--n_train=2000", "--n_valid=800", "--n_sig=800",
        "--batch_size=200", "--n_epochs=1", "--lr=1e-3",
        "--beta=1", "--lamb=1", "--n_const=100",
        "--weight_type=None", "--decorrelation=2d",
        "--plotting=ON", "--apply_cut=OFF",
        "--constituents=OFF", "--const_scaler_type=QuantileTransformer",
        "--HLVs=ON", "--HLV_scaler_type=RobustScaler",
        f"--output_dir={out}", "--slurm_id=0",
        "--model_in=", "--HLV_scaler_in=",
        "--HLV_scaler_in=HLV_RobustScaler.pkl",
        # environment bindings (sizes only):
        "--synthetic=4000", "--n_OoD=2000",
    ]) in (0, None)
    assert os.path.isfile(os.path.join(out, "AAE.npz"))
    assert os.path.isfile(os.path.join(out, "history.pkl"))


def test_canonical_classifier_command(out_dir):
    """A verbatim jet-ID classifier.py flag set (the reference ships no
    .sh for it; these are its documented flags at their canonical
    values, ref jet-ID/classifier.py:16-61), incl. --n_gpus and the
    cluster-plumbing flags (--host_name/--node_dir/--sbatch_var,
    accepted no-ops per PARITY.md S2.4)."""
    from atlasvae.cli.jetid import main
    out = str(out_dir / "canon_jetid")
    assert main([
        "--n_train=2000", "--n_valid=800", "--batch_size=200",
        "--n_epochs=2", "--n_classes=2", "--n_tracks=5",
        "--bkg_ratio=2", "--n_folds=1", "--n_gpus=1", "--verbose=1",
        "--patience=15", "--sbatch_var=0", "--node_dir=", "--host_name=lps",
        "--l2=1e-7", "--dropout=0.1", "--FCN_neurons", "500", "500",
        "--weight_type=none", "--train_cuts=", "--valid_cuts=",
        "--NN_type=CNN", "--images=ON", "--scalars=ON", "--scaling=ON",
        "--t_scaling=ON", "--plotting=ON", "--generator=OFF",
        "--sep_bkg=OFF", "--metrics=loss", "--eta_region=0.0-2.5",
        f"--output_dir={out}", "--model_in=", "--scaler_in=",
        "--t_scaler_in=", "--results_in=",
        "--runDiffPlots=0", "--feature_removal=OFF", "--correlations=OFF",
        # environment binding (size only):
        "--synthetic=4000",
    ]) in (0, None)
    assert os.path.isfile(os.path.join(out, "model.npz"))
