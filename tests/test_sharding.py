"""Multi-device sharding tests on the 8-device virtual CPU mesh:
sharded solve == single-device solve (the 'multi-device == single-device
equivalence' requirement, SURVEY.md §4/§7 S4)."""
import numpy as np
import pytest
import jax

from multigrid_dolfinx_tpu import build_hierarchy, models, solve
from multigrid_dolfinx_tpu.config import CycleSpec, ShardingSpec
from multigrid_dolfinx_tpu.parallel.sharding import (
    build_sharded_hierarchy,
    make_device_mesh,
)


requires_8_devices = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


@requires_8_devices
def test_mesh_factorization():
    mesh = make_device_mesh(8)
    assert mesh.devices.shape in ((2, 4), (4, 2))
    mesh2 = make_device_mesh(mesh_shape=(4, 2))
    assert mesh2.devices.shape == (4, 2)


@requires_8_devices
@pytest.mark.parametrize("smoother", ["jacobi", "rbgs"])
def test_sharded_solve_matches_single_device(smoother):
    cyc = CycleSpec(nu1=2, nu2=2, smoother=smoother, restriction="pt",
                    tol=1e-9, max_cycles=40)
    cfg = models.poisson2d(finest_level=4, cycle=cyc)   # 129x129 finest
    hier = build_hierarchy(cfg)
    ref = solve(hier, cfg.cycle, mode="tol")

    mesh = make_device_mesh(8)
    sspec = ShardingSpec(min_points_per_device=2)  # shard even small levels
    hier_sh = build_sharded_hierarchy(cfg, mesh, sspec)
    got = solve(hier_sh, cfg.cycle, mode="tol")

    assert int(got.num_cycles) == int(ref.num_cycles)
    k = int(ref.num_cycles)
    mf = cfg.hierarchy.elements_at(cfg.hierarchy.finest_level) + 1
    np.testing.assert_allclose(
        np.asarray(got.u)[:mf, :mf], np.asarray(ref.u), rtol=1e-12, atol=1e-13
    )
    np.testing.assert_allclose(
        np.asarray(got.res_hist)[:k], np.asarray(ref.res_hist)[:k],
        rtol=1e-9, atol=1e-14,
    )


@requires_8_devices
def test_sharded_solve_replicated_coarse_levels():
    """Default ShardingSpec replicates small levels; solve must still match."""
    cyc = CycleSpec(nu1=2, nu2=2, restriction="pt", tol=1e-9, max_cycles=40)
    cfg = models.poisson2d(finest_level=4, cycle=cyc)
    hier = build_hierarchy(cfg)
    ref = solve(hier, cfg.cycle, mode="tol")

    mesh = make_device_mesh(8)
    sspec = ShardingSpec(min_points_per_device=8 * 8)
    hier_sh = build_sharded_hierarchy(cfg, mesh, sspec)
    got = solve(hier_sh, cfg.cycle, mode="tol")
    assert int(got.num_cycles) == int(ref.num_cycles)
    mf = cfg.hierarchy.elements_at(cfg.hierarchy.finest_level) + 1
    np.testing.assert_allclose(
        np.asarray(got.u)[:mf, :mf], np.asarray(ref.u), rtol=1e-12, atol=1e-13
    )


@requires_8_devices
def test_sharded_3d_solve():
    cyc = CycleSpec(nu1=2, nu2=2, restriction="pt", tol=1e-8, max_cycles=40)
    cfg = models.poisson3d(finest_level=1, coarsest_level=0,
                           coarsest_elements=6, dtype="float64", cycle=cyc)
    hier = build_hierarchy(cfg)
    ref = solve(hier, cfg.cycle, mode="tol")
    mesh = make_device_mesh(8)
    hier_sh = build_sharded_hierarchy(cfg, mesh, ShardingSpec(min_points_per_device=2))
    got = solve(hier_sh, cfg.cycle, mode="tol")
    assert int(got.num_cycles) == int(ref.num_cycles)
    mf = cfg.hierarchy.elements_at(cfg.hierarchy.finest_level) + 1
    np.testing.assert_allclose(
        np.asarray(got.u)[:mf, :mf, :mf], np.asarray(ref.u), rtol=1e-11, atol=1e-12
    )


def test_sharded_mgcg_matches_single_device():
    """MG-preconditioned CG on a GSPMD-sharded hierarchy: the CG dot
    products become psums via the SPMD partitioner, and iteration counts
    match the single-device solve (SURVEY §2c distributed-reductions
    requirement; the sharded counterpart of PETSc KSP under MPI)."""
    from multigrid_dolfinx_tpu.solver.krylov import solve_mgcg

    cyc = CycleSpec(nu1=2, nu2=2, smoother="rbgs", restriction="pt",
                    tol=1e-10, max_cycles=20)
    cfg = models.poisson2d(finest_level=4, coarsest_level=1,
                           dtype="float64", cycle=cyc)
    h1 = build_hierarchy(cfg)
    r1 = solve_mgcg(h1, cyc)
    assert bool(r1.converged)

    mesh = make_device_mesh(8)
    hs = build_sharded_hierarchy(cfg, mesh, ShardingSpec(min_points_per_device=4))
    rs = solve_mgcg(hs, cyc)
    assert bool(rs.converged)
    assert int(rs.num_iters) == int(r1.num_iters)
    mf = cfg.hierarchy.elements_at(4) + 1
    np.testing.assert_allclose(
        np.asarray(rs.u)[:mf, :mf], np.asarray(r1.u)[:mf, :mf],
        rtol=1e-11, atol=1e-12)
