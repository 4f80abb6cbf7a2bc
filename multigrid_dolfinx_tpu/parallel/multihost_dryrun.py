"""Self-contained 2-process (multi-controller) dry run of the distributed
3D solve — the validation leg for the multi-host launch substrate
(parallel/multihost.py; the reference's `mpirun` analogue,
Multigrid_prototype.py:66).

Two entry points:

* ``python -m multigrid_dolfinx_tpu.parallel.multihost_dryrun`` — the
  CHILD program: joins the cluster from MG_* env vars, builds a global
  mesh over all processes' devices, runs the z-decomposed 3D halo solve,
  and prints one ``MHRESULT {json}`` line.
* ``spawn(num_processes, local_devices)`` — the PARENT: spawns that many
  children on localhost CPU devices, collects and cross-checks their
  MHRESULT lines (same cycle count, converged, correct center value),
  and returns them.  Used by tests/test_multihost.py and, opt-in via
  ``MG_DRYRUN_MULTIHOST=1``, by ``__graft_entry__.dryrun_multichip``.
"""
from __future__ import annotations

import json
import os
import socket
import subprocess
import sys
from pathlib import Path
from typing import Dict, List


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def spawn(num_processes: int = 2, local_devices: int = 2,
          timeout: float = 900.0) -> List[Dict]:
    """Spawn `num_processes` child dry runs on localhost (CPU backend,
    `local_devices` virtual devices each), wait, and validate: every
    child exits 0, all report the same cycle count, all converged, and
    the solution center matches the manufactured u* = 1 + x^2 + 2y^2 +
    3z^2.  Returns the per-process MHRESULT dicts."""
    port = _free_port()
    repo_root = Path(__file__).resolve().parents[2]
    procs = []
    for pid in range(num_processes):
        env = dict(
            os.environ,
            MG_COORDINATOR=f"127.0.0.1:{port}",
            MG_NUM_PROCESSES=str(num_processes),
            MG_PROCESS_ID=str(pid),
            MG_LOCAL_DEVICES=str(local_devices),
        )
        # a parent test env may force its own virtual-device count; the
        # children manage theirs via MG_LOCAL_DEVICES
        env["XLA_FLAGS"] = env.get("XLA_FLAGS", "").replace(
            "--xla_force_host_platform_device_count=8", ""
        )
        procs.append(subprocess.Popen(
            [sys.executable, "-m",
             "multigrid_dolfinx_tpu.parallel.multihost_dryrun"],
            cwd=str(repo_root), env=env,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        ))
    results: List[Dict] = []
    logs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise RuntimeError("multihost dry-run child timed out")
        logs.append((p.returncode, out[-2000:], err[-2000:]))
        for line in out.splitlines():
            if line.startswith("MHRESULT "):
                results.append(json.loads(line[len("MHRESULT "):]))
    assert all(rc == 0 for rc, _, _ in logs), logs
    assert len(results) == num_processes, logs
    # SPMD: every process observes the same global solve
    assert len({r["cycles"] for r in results}) == 1, results
    assert all(r["done"] for r in results), results
    for r in results:
        assert abs(r["center"] - 2.5) < 5e-3, r
    return results


def _child_main() -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    from multigrid_dolfinx_tpu.parallel import multihost

    assert multihost.initialize_from_env(verbose=True)

    from multigrid_dolfinx_tpu import models
    from multigrid_dolfinx_tpu.config import CycleSpec
    from multigrid_dolfinx_tpu.parallel.halo3d import build_halo_solver3d

    mesh = multihost.make_global_mesh()
    cyc = CycleSpec(nu1=2, nu2=2, smoother="rbgs", restriction="pt",
                    tol=0.0, rtol=1e-6, max_cycles=30)
    cfg = models.poisson3d(finest_level=2, coarsest_level=1,
                           coarsest_elements=4, dtype="float64", cycle=cyc)
    hier, solve_fn = build_halo_solver3d(cfg, mesh)
    u, k, done, _ = solve_fn(hier)

    m = cfg.hierarchy.elements_at(cfg.hierarchy.finest_level) + 1
    center = jax.jit(lambda x: x[m // 2, m // 2, m // 2])(u)
    out = {
        "process": jax.process_index(),
        "processes": jax.process_count(),
        "devices": jax.device_count(),
        "cycles": int(k),
        "done": bool(done),
        "center": float(center),
    }
    print("MHRESULT " + json.dumps(out), flush=True)


if __name__ == "__main__":
    _child_main()
