"""Explicit shard_map + ppermute halo-exchange solver vs the single-device
lean solver: identical cycle counts and solutions (8-device CPU mesh)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from multigrid_dolfinx_tpu import models, solve
from multigrid_dolfinx_tpu.config import CycleSpec
from multigrid_dolfinx_tpu.parallel.halo import (
    build_halo_solver,
    pick_shard_pad_plan,
)
from multigrid_dolfinx_tpu.parallel.sharding import make_device_mesh
from multigrid_dolfinx_tpu.solver.hierarchy import build_lean_hierarchy


requires_8_devices = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


@requires_8_devices
@pytest.mark.parametrize("smoother", ["rbgs", "jacobi"])
def test_halo_solver_matches_single_device(smoother):
    cyc = CycleSpec(nu1=2, nu2=2, smoother=smoother, restriction="pt",
                    tol=0.0, rtol=1e-9, max_cycles=40)
    cfg = models.poisson2d(finest_level=4, coarsest_level=1,
                           dtype="float64", cycle=cyc)
    mesh = make_device_mesh(8)
    hier, solve_fn = build_halo_solver(cfg, mesh)
    u, k, done, hist = solve_fn(hier)
    assert bool(done), "halo solver did not converge"

    plan = pick_shard_pad_plan(cfg, mesh)
    h1 = build_lean_hierarchy(cfg, pad_points=plan)
    r1 = solve(h1, cyc, mode="tol")
    assert bool(r1.converged)
    assert int(k) == int(r1.num_cycles)
    lm = cfg.hierarchy.elements_at(4) + 1
    np.testing.assert_allclose(
        np.asarray(u)[:lm, :lm], np.asarray(r1.u)[:lm, :lm],
        rtol=1e-12, atol=1e-13,
    )


@requires_8_devices
def test_halo_solver_absolute_tol_matches_single_device():
    """ABSOLUTE-tol configs stop on the FEM-L2 (mass-weighted) residual
    norm, so the distributed cycle count equals the single-device solve's.
    (Guards the round-2 defect where the 2D halo path checked the vector
    2-norm: rtol configs masked it because both norms scale together, but
    absolute tolerances stopped at different cycle counts.)"""
    cyc = CycleSpec(nu1=2, nu2=2, smoother="rbgs", restriction="pt",
                    tol=2e-7, rtol=0.0, max_cycles=40)
    cfg = models.poisson2d(finest_level=4, coarsest_level=1,
                           dtype="float64", cycle=cyc)
    mesh = make_device_mesh(8)
    hier, solve_fn = build_halo_solver(cfg, mesh)
    u, k, done, hist = solve_fn(hier)
    assert bool(done)

    plan = pick_shard_pad_plan(cfg, mesh)
    h1 = build_lean_hierarchy(cfg, pad_points=plan)
    r1 = solve(h1, cyc, mode="tol")
    assert bool(r1.converged)
    assert int(k) == int(r1.num_cycles)


@requires_8_devices
def test_halo_solution_hits_exact_values():
    """u* = 1 + x^2 + 2y^2 at the center: 1.75."""
    cyc = CycleSpec(nu1=2, nu2=2, smoother="rbgs", restriction="pt",
                    tol=0.0, rtol=1e-9, max_cycles=40)
    cfg = models.poisson2d(finest_level=3, coarsest_level=1,
                           dtype="float64", cycle=cyc)
    mesh = make_device_mesh(mesh_shape=(2, 2))
    hier, solve_fn = build_halo_solver(cfg, mesh)
    u, k, done, hist = solve_fn(hier)
    n = cfg.hierarchy.elements_at(3)
    assert float(np.asarray(u)[n // 2, n // 2]) == pytest.approx(1.75,
                                                                 abs=1e-3)


@requires_8_devices
@pytest.mark.parametrize("smoother", ["rbgs", "jacobi"])
def test_halo_kernel_path_matches_single_device(smoother):
    """The kernel-speed 2D dist path (stencil2d_dist, use_pallas f32 on a
    row-decomposed ('gx', 1) mesh): identical cycle counts and matching
    solutions vs the single-device lean solve on the same padded levels.
    The level ladder (widths 8..256) deliberately mixes kernel-eligible
    fine levels with non-aligned coarse levels that fall back to the jnp
    local ops, so the dispatch seam itself is exercised."""
    cyc = CycleSpec(nu1=2, nu2=2, smoother=smoother, restriction="pt",
                    tol=0.0, rtol=1e-6, max_cycles=40, use_pallas=True)
    cfg = models.poisson2d(finest_level=5, coarsest_level=0,
                           coarsest_elements=4, dtype="float32", cycle=cyc)
    mesh = make_device_mesh(mesh_shape=(8, 1))
    hier, solve_fn = build_halo_solver(cfg, mesh)
    u, k, done, hist = solve_fn(hier)
    assert bool(done), "kernel-path halo solver did not converge"

    plan = pick_shard_pad_plan(cfg, mesh)
    h1 = build_lean_hierarchy(cfg, pad_points=plan)
    import dataclasses
    cyc_ref = dataclasses.replace(cyc, use_pallas=False)
    r1 = solve(h1, cyc_ref, mode="tol")
    assert bool(r1.converged)
    assert int(k) == int(r1.num_cycles)
    lm = cfg.hierarchy.elements_at(5) + 1
    np.testing.assert_allclose(
        np.asarray(u)[:lm, :lm], np.asarray(r1.u)[:lm, :lm],
        rtol=2e-5, atol=2e-6,
    )
    # the solve actually hit the manufactured solution
    assert float(np.asarray(u)[lm // 2, lm // 2]) == pytest.approx(
        1.75, abs=1e-3)


@requires_8_devices
@pytest.mark.parametrize("cycle", ["W", "F"])
def test_halo_wf_cycles_match_single_device(cycle):
    """W- and F-cycle shapes through the 2D halo solver (the 3D halo path
    already had them): cycle counts equal the single-device solve's."""
    cyc = CycleSpec(nu1=1, nu2=1, smoother="rbgs", restriction="pt",
                    cycle=cycle, tol=0.0, rtol=1e-9, max_cycles=40)
    cfg = models.poisson2d(finest_level=4, coarsest_level=1,
                           dtype="float64", cycle=cyc)
    mesh = make_device_mesh(8)
    hier, solve_fn = build_halo_solver(cfg, mesh)
    u, k, done, hist = solve_fn(hier)
    assert bool(done)

    plan = pick_shard_pad_plan(cfg, mesh)
    h1 = build_lean_hierarchy(cfg, pad_points=plan)
    r1 = solve(h1, cyc, mode="tol")
    assert bool(r1.converged)
    assert int(k) == int(r1.num_cycles)
    lm = cfg.hierarchy.elements_at(4) + 1
    np.testing.assert_allclose(
        np.asarray(u)[:lm, :lm], np.asarray(r1.u)[:lm, :lm],
        rtol=1e-12, atol=1e-13,
    )


@requires_8_devices
def test_halo_chebyshev_matches_single_device():
    """Chebyshev smoothing through the 2D halo solver (the recurrence from
    ops.smoothers.chebyshev_smooth, distributed residuals): identical
    cycle counts vs the single-device solve on the same padded levels."""
    cyc = CycleSpec(nu1=1, nu2=1, smoother="chebyshev", restriction="pt",
                    tol=0.0, rtol=1e-9, max_cycles=40)
    cfg = models.poisson2d(finest_level=4, coarsest_level=1,
                           dtype="float64", cycle=cyc)
    mesh = make_device_mesh(8)
    hier, solve_fn = build_halo_solver(cfg, mesh)
    u, k, done, hist = solve_fn(hier)
    assert bool(done)

    plan = pick_shard_pad_plan(cfg, mesh)
    h1 = build_lean_hierarchy(cfg, pad_points=plan)
    r1 = solve(h1, cyc, mode="tol")
    assert bool(r1.converged)
    assert int(k) == int(r1.num_cycles)
    lm = cfg.hierarchy.elements_at(4) + 1
    np.testing.assert_allclose(
        np.asarray(u)[:lm, :lm], np.asarray(r1.u)[:lm, :lm],
        rtol=1e-11, atol=1e-12,
    )


@requires_8_devices
def test_halo_reference_parity_config():
    """THE reference configuration (Multigrid_prototype.py:35-46: 3
    levels, 64^2 finest, FMG mu0=2 + V(50,50) jacobi omega=2/3, injection
    restriction, tol 1e-11 on the FEM-L2 residual), solved DISTRIBUTED
    over 8 devices: same 63-cycle count and solution as the single-device
    solve — i.e. the reference's exact semantics survive domain
    decomposition (injection/full-weighting restriction now distributed
    too, carrying the bc residual through like the reference)."""
    from multigrid_dolfinx_tpu.config import reference_parity_config

    cfg = reference_parity_config()
    mesh = make_device_mesh(8)
    hier, solve_fn = build_halo_solver(cfg, mesh)
    u, k, done, hist = solve_fn(hier)
    assert bool(done)

    plan = pick_shard_pad_plan(cfg, mesh)
    h1 = build_lean_hierarchy(cfg, pad_points=plan)
    r1 = solve(h1, cfg.cycle, mode="tol")
    assert bool(r1.converged)
    assert int(k) == int(r1.num_cycles) == 63
    lm = cfg.hierarchy.elements_at(cfg.hierarchy.finest_level) + 1
    np.testing.assert_allclose(
        np.asarray(u)[:lm, :lm], np.asarray(r1.u)[:lm, :lm],
        rtol=1e-12, atol=1e-13,
    )
    # the distributed per-cycle FEM-L2 residual history (reference
    # telemetry, multigrid.py:292-295) matches the single-device one
    np.testing.assert_allclose(
        np.asarray(hist)[:63], np.asarray(r1.res_hist)[:63],
        rtol=1e-9, atol=1e-13,
    )


@requires_8_devices
def test_halo_full_weighting_matches_single_device():
    """Full-weighting restriction distributed == single-device after a
    fixed cycle count.  (FW + bilinear is the reference's non-variational
    dead-code pair — its 4x under-scaled coarse correction converges too
    slowly for a tolerance test, single-device included; equivalence is
    the meaningful property.)"""
    cyc = CycleSpec(nu1=2, nu2=2, smoother="rbgs",
                    restriction="full_weighting",
                    tol=0.0, rtol=0.0, max_cycles=5)
    cfg = models.poisson2d(finest_level=4, coarsest_level=1,
                           dtype="float64", cycle=cyc)
    mesh = make_device_mesh(8)
    hier, solve_fn = build_halo_solver(cfg, mesh)
    u, k, done, hist = solve_fn(hier)
    plan = pick_shard_pad_plan(cfg, mesh)
    h1 = build_lean_hierarchy(cfg, pad_points=plan)
    r1 = solve(h1, cyc, mode="tol")
    assert int(k) == int(r1.num_cycles) == 5
    lm = cfg.hierarchy.elements_at(4) + 1
    np.testing.assert_allclose(
        np.asarray(u)[:lm, :lm], np.asarray(r1.u)[:lm, :lm],
        rtol=1e-12, atol=1e-13,
    )
