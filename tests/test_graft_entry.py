"""Driver entry-point tests.

The multi-chip dryrun must pass in a fresh process with NO special
environment (VERDICT r1 missing #1): __graft_entry__.dryrun_multichip
re-execs itself with the CPU platform pinned and the virtual device
count set before the first JAX dispatch, so it can never touch a real
TPU backend regardless of caller state.
"""

import os
import pathlib
import subprocess
import sys

REPO = str(pathlib.Path(__file__).resolve().parents[1])


def test_dryrun_multichip_fresh_process_no_env():
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS", "ATLASVAE_PLATFORM",
                        "ATLASVAE_PRNG")}
    code = "import __graft_entry__ as g; g.dryrun_multichip(4)"
    proc = subprocess.run([sys.executable, "-c", code], cwd=REPO, env=env,
                          capture_output=True, text=True, timeout=900)
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "dryrun_multichip OK on 4 devices" in proc.stdout
    assert "DPxTP GSPMD step" in proc.stdout  # even device count: TP ran
