"""Hyper-parameter sweep runner.

Replaces the reference's Slurm-array grid mapping (ref
OE-VAE/utils.py:597-600 ``grid_search`` + OE-VAE/sbatch.sh array jobs,
SURVEY.md S2.6 "job-level parallelism"): the grid is the same
itertools.product over named value lists; execution is a local
sequential loop (one accelerator) or an index lookup compatible with
any array scheduler via ``--task_id``.

Usage:
  python -m atlasvae.cli.sweep --entry vae --grid beta=0,1,10 lamb=1,10 \
      -- --n_epochs 5 --synthetic 20000 ...
  python -m atlasvae.cli.sweep --entry vae --grid beta=0,1 --task_id 3 -- ...
"""

import itertools
import sys
from argparse import ArgumentParser


def grid_search(**kwargs):
    """index -> value(s) mapping, exactly the reference helper
    (ref OE-VAE/utils.py:597-600)."""
    if len(kwargs) <= 1:
        array_tuple = list(kwargs.values())[0]
    else:
        array_tuple = list(itertools.product(*kwargs.values()))
    return dict(zip(range(len(array_tuple)), array_tuple))


def _parse_grid(tokens):
    grid = {}
    for token in tokens:
        name, values = token.split("=", 1)
        grid[name] = [v for v in values.split(",")]
    return grid


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    if "--" in argv:
        split = argv.index("--")
        argv, passthrough = argv[:split], argv[split + 1:]
    else:
        passthrough = []
    parser = ArgumentParser()
    parser.add_argument("--entry", default="vae", choices=["vae", "aae", "jetid"])
    parser.add_argument("--grid", nargs="+", required=True,
                        help="name=v1,v2,... tokens")
    parser.add_argument("--task_id", default=-1, type=int,
                        help=">=0: run only this grid index (array-job mode)")
    parser.add_argument("--output_dir", default="outputs/sweep")
    args = parser.parse_args(argv)

    from . import vae, aae, jetid
    entry = {"vae": vae.main, "aae": aae.main, "jetid": jetid.main}[args.entry]
    grid = _parse_grid(args.grid)
    names = list(grid)
    mapping = grid_search(**grid)
    indices = [args.task_id] if args.task_id >= 0 else sorted(mapping)
    for idx in indices:
        values = mapping[idx]
        if len(names) == 1:
            values = (values,)
        tag = "_".join(f"{n}{v}" for n, v in zip(names, values))
        run_args = list(passthrough)
        for name, value in zip(names, values):
            run_args += [f"--{name}", str(value)]
        run_args += ["--output_dir", f"{args.output_dir}/{tag}"]
        print(f"\n===== SWEEP {idx}: {tag} =====")
        entry(run_args)
    return 0


if __name__ == "__main__":
    sys.exit(main())
