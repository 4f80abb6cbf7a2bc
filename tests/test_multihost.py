"""Multi-process (multi-controller) launch substrate: a REAL 2-process
run on CPU — `jax.distributed.initialize` cluster formation, a global
mesh spanning both processes' devices, and the z-decomposed 3D halo solve
whose ppermute/psum/all_gather collectives cross the process boundary.

This is the analogue of the reference's `mpirun` substrate
(Multigrid_prototype.py:66): ranks are spawned externally (here: this
test), every rank runs the same program, and the runtime stitches them
into one device mesh.  See parallel/multihost.py for the launch recipe.
"""
import json
import os
import socket
import subprocess
import sys
from pathlib import Path

import pytest


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.isolate
def test_two_process_halo3d_solve():
    port = _free_port()
    child = Path(__file__).parent / "multihost_child.py"
    procs = []
    for pid in range(2):
        env = dict(
            os.environ,
            MG_COORDINATOR=f"127.0.0.1:{port}",
            MG_NUM_PROCESSES="2",
            MG_PROCESS_ID=str(pid),
            MG_LOCAL_DEVICES="2",
        )
        # the parent test env forces 8 virtual devices; the children manage
        # their own device count via MG_LOCAL_DEVICES
        env["XLA_FLAGS"] = env.get("XLA_FLAGS", "").replace(
            "--xla_force_host_platform_device_count=8", ""
        )
        procs.append(subprocess.Popen(
            [sys.executable, str(child)],
            cwd=str(Path(__file__).parent.parent),
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True,
        ))
    results = []
    logs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multihost child timed out")
        logs.append((p.returncode, out[-2000:], err[-2000:]))
        for line in out.splitlines():
            if line.startswith("MHRESULT "):
                results.append(json.loads(line[len("MHRESULT "):]))
    assert all(rc == 0 for rc, _, _ in logs), logs
    assert len(results) == 2, logs
    # SPMD: both processes observe the same global solve
    assert results[0]["cycles"] == results[1]["cycles"]
    assert results[0]["done"] and results[1]["done"]
    for r in results:
        # manufactured solution u* = 1 + x^2 + 2y^2 + 3z^2 at the center
        assert abs(r["center"] - 2.5) < 5e-3, r
