"""LIVE multi-host validation: two real JAX processes, one global mesh.

Upgrades atlasvae/parallel/multihost.py from "scaffold exercised on a
single-process virtual mesh" to genuinely validated multi-controller
code: two OS processes (4 virtual CPU devices each) join one
``jax.distributed`` runtime and run the data-parallel VAE training step
over the 8-device global mesh, with each process committing only its
``host_shard_range`` slice of the batch rows.  Both independently
assert parity with the single-device step (global-batch noise slicing
makes DP deterministic, train/step.py:56-69).

This is the cross-host capability the reference never had — its only
multi-node story is communication-free Slurm arrays (SURVEY.md S2.6);
the closest single-host analogue it does have is MirroredStrategy
(ref jet-ID/models.py:69-81).
"""

import os
import socket
import subprocess
import sys

WORKER = os.path.join(os.path.dirname(__file__), "mh_live_worker.py")


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_dp_step_matches_single_device():
    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # workers set their own 4-device topology
    env["ATLASVAE_PLATFORM"] = "cpu"
    procs = [subprocess.Popen([sys.executable, WORKER, str(pid), str(port)],
                              stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                              text=True, env=env)
             for pid in (0, 1)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=240)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
                p.wait()
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out}"
        assert f"PARITY-OK proc={pid}" in out, out
    assert "shard=[0,32)" in outs[0] and "shard=[32,64)" in outs[1]
