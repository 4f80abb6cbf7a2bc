"""Distributed 3D Pallas smoothing (z-decomposition + slab halo exchange)
== single-device fused kernels, on the 8-device CPU mesh (interpret)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from multigrid_dolfinx_tpu.ops.pallas import stencil3d
from multigrid_dolfinx_tpu.parallel.halo3d import (
    make_distributed_jacobi_smoother,
    make_distributed_rb_smoother,
)


requires_8_devices = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)

LM = 29                      # logical points per dim
SHAPE = (32, 32, 128)        # padded global (z divides 8 -> local 4 slabs)
WC, WOFF = 6.0 / 28.0, -1.0 / 28.0


def _fields(seed):
    rng = np.random.default_rng(seed)
    v = np.zeros(SHAPE, np.float32)
    f = np.zeros(SHAPE, np.float32)
    v[:LM, :LM, :LM] = rng.standard_normal((LM,) * 3)
    f[:LM, :LM, :LM] = rng.standard_normal((LM,) * 3)
    return jnp.asarray(v), jnp.asarray(f)


@requires_8_devices
def test_distributed_rb_matches_single_device():
    mesh = Mesh(np.array(jax.devices()[:8]), ("gz",))
    v, f = _fields(0)
    want = v
    for _ in range(2):
        want = stencil3d.rb_sweep_fused(want, f, LM, WC, WOFF,
                                        interpret=True)

    sm = make_distributed_rb_smoother(mesh, LM, WC, WOFF, nsweeps=2,
                                      interpret=True)
    sh = NamedSharding(mesh, P("gz"))
    got = sm(jax.device_put(v, sh), jax.device_put(f, sh))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-6, atol=2e-6)


@requires_8_devices
def test_distributed_jacobi_matches_single_device():
    mesh = Mesh(np.array(jax.devices()[:8]), ("gz",))
    v, f = _fields(1)
    want = v
    for _ in range(3):
        want = stencil3d.jacobi_sweep(want, f, LM, WC, WOFF, 2.0 / 3.0,
                                      interpret=True)

    sm = make_distributed_jacobi_smoother(mesh, LM, WC, WOFF, 2.0 / 3.0,
                                          nsweeps=3, interpret=True)
    sh = NamedSharding(mesh, P("gz"))
    got = sm(jax.device_put(v, sh), jax.device_put(f, sh))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-6, atol=2e-6)


# ----------------------------------------------------------------------
# Full distributed V-cycle solve (transfers + norms + coarse included)
# ----------------------------------------------------------------------

@requires_8_devices
@pytest.mark.isolate
@pytest.mark.parametrize("smoother,dtype,utol,cycle,pallas,flevel", [
    ("rbgs", "float32", 1e-5, "V", False, 3),
    ("rbgs", "float64", 1e-12, "V", False, 3),
    ("jacobi", "float64", 1e-12, "V", False, 3),
    ("rbgs", "float64", 1e-12, "W", False, 3),
    ("rbgs", "float64", 1e-12, "F", False, 3),
    ("chebyshev", "float64", 1e-12, "V", False, 3),
    # use_pallas=True: sharded levels run the fused halo-aware kernels
    # (ops/pallas/stencil3d_dist) in interpret mode.  The 4-level case
    # shards from level 2 under the aligned plan, so its intermediate
    # replicated level exercises the single-device-kernel (redundant
    # coarse compute) branches too.
    ("rbgs", "float32", 1e-5, "V", True, 3),
    ("rbgs", "float32", 1e-5, "V", True, 4),
    ("jacobi", "float32", 1e-5, "V", True, 3),
    ("rbgs", "float32", 1e-5, "W", True, 3),
    ("chebyshev", "float32", 1e-5, "V", True, 3),
])
def test_distributed_vcycle_solve_matches_single_device(smoother, dtype,
                                                        utol, cycle,
                                                        pallas, flevel):
    """The full z-decomposed FMG+V/W/F-cycle solve (distributed smoothing,
    residual, pt restriction, trilinear prolongation, class-table FEM-L2
    norm psums, replicated coarse tail) reproduces the single-device lean
    solve: identical cycle counts, u to roundoff."""
    from multigrid_dolfinx_tpu import models, solve
    from multigrid_dolfinx_tpu.config import CycleSpec
    from multigrid_dolfinx_tpu.solver.hierarchy import build_lean_hierarchy
    from multigrid_dolfinx_tpu.parallel.halo3d import build_halo_solver3d

    cyc = CycleSpec(nu1=2, nu2=2, smoother=smoother, restriction="pt",
                    cycle=cycle, tol=0.0, rtol=1e-6, max_cycles=40,
                    use_pallas=pallas)
    cfg = models.poisson3d(finest_level=flevel, coarsest_level=1,
                           coarsest_elements=4, dtype=dtype, cycle=cyc)
    r1 = solve(build_lean_hierarchy(cfg), cyc, mode="tol")

    mesh = Mesh(np.array(jax.devices()[:8]), ("gz",))
    hier, solve_fn = build_halo_solver3d(cfg, mesh)
    u, k, done, hist = solve_fn(hier)

    assert bool(done)
    assert int(k) == int(r1.num_cycles)
    m = cfg.hierarchy.elements_at(cfg.hierarchy.finest_level) + 1
    u1 = np.asarray(r1.u)[:m, :m, :m]
    ud = np.asarray(u)[:m, :m, :m]
    np.testing.assert_allclose(ud, u1, atol=utol, rtol=utol)


@requires_8_devices
@pytest.mark.isolate
def test_distributed_vcycle_solution_accuracy():
    """Distributed solve lands on the manufactured solution (center value
    of u* = 1 + x^2 + 2y^2 + 3z^2 at (0.5,0.5,0.5) is 2.5)."""
    from multigrid_dolfinx_tpu import models
    from multigrid_dolfinx_tpu.config import CycleSpec
    from multigrid_dolfinx_tpu.parallel.halo3d import build_halo_solver3d

    cyc = CycleSpec(nu1=2, nu2=2, smoother="rbgs", restriction="pt",
                    tol=0.0, rtol=1e-6, max_cycles=40)
    cfg = models.poisson3d(finest_level=2, coarsest_level=1,
                           coarsest_elements=8, dtype="float32", cycle=cyc)
    mesh = Mesh(np.array(jax.devices()[:8]), ("gz",))
    hier, solve_fn = build_halo_solver3d(cfg, mesh)
    u, k, done, hist = solve_fn(hier)
    assert bool(done)
    m = cfg.hierarchy.elements_at(cfg.hierarchy.finest_level) + 1
    ud = np.asarray(u)
    assert abs(ud[m // 2, m // 2, m // 2] - 2.5) < 5e-3


@requires_8_devices
@pytest.mark.parametrize("kind", ["injection", "full_weighting"])
def test_halo3d_reference_restriction_kinds(kind):
    """Injection / full-weighting restriction (the reference-parity kinds,
    bc residual carried through) distributed under z-decomposition ==
    single-device, at a fixed cycle count (the non-variational pairs
    converge too slowly for a tolerance test — FW's coarse correction is
    8x under-scaled in 3D)."""
    from multigrid_dolfinx_tpu import models, solve
    from multigrid_dolfinx_tpu.config import CycleSpec
    from multigrid_dolfinx_tpu.parallel.halo3d import build_halo_solver3d
    from multigrid_dolfinx_tpu.solver.hierarchy import build_lean_hierarchy

    cyc = CycleSpec(nu1=2, nu2=2, smoother="rbgs", restriction=kind,
                    tol=0.0, rtol=0.0, max_cycles=4)
    cfg = models.poisson3d(finest_level=3, coarsest_level=1,
                           coarsest_elements=4, dtype="float64", cycle=cyc)
    mesh = Mesh(np.array(jax.devices()), ("gz",))
    hier, solve_fn = build_halo_solver3d(cfg, mesh)
    u, k, done, hist = solve_fn(hier)

    h1 = build_lean_hierarchy(cfg)
    r1 = solve(h1, cyc, mode="tol")
    assert int(k) == int(r1.num_cycles) == 4
    lm = cfg.hierarchy.elements_at(3) + 1
    np.testing.assert_allclose(
        np.asarray(u)[:lm, :lm, :lm], np.asarray(r1.u)[:lm, :lm, :lm],
        rtol=1e-11, atol=1e-12,
    )


# ----------------------------------------------------------------------
# Distributed MG-CG (BASELINE config 5's multi-chip half)
# ----------------------------------------------------------------------

@requires_8_devices
@pytest.mark.isolate
@pytest.mark.parametrize("dtype,utol,pallas,rtol", [
    ("float64", 1e-11, False, 1e-8),
    # f32: 1e-8 relative residual sits below f32 roundoff — CG stagnates
    # and rz underflows to NaN (single- and multi-device alike), so the
    # f32 leg stops at an attainable 1e-5.
    ("float32", 2e-5, True, 1e-5),
])
def test_distributed_mgcg_matches_single_device(dtype, utol, pallas, rtol):
    """The z-decomposed flexible MG-CG (FMG start, distributed V-cycle
    preconditioner, psum dot-products, FEM-L2 norm check) reproduces the
    single-device solver.krylov.mgcg_solve: identical iteration counts,
    matching residual histories, u to roundoff."""
    from multigrid_dolfinx_tpu import models
    from multigrid_dolfinx_tpu.config import CycleSpec
    from multigrid_dolfinx_tpu.parallel.halo3d import build_halo_mgcg3d
    from multigrid_dolfinx_tpu.solver.hierarchy import build_lean_hierarchy
    from multigrid_dolfinx_tpu.solver.krylov import solve_mgcg

    cyc = CycleSpec(nu1=2, nu2=2, smoother="rbgs", restriction="pt",
                    tol=0.0, rtol=rtol, max_cycles=30, use_pallas=pallas)
    cfg = models.poisson3d(finest_level=3, coarsest_level=1,
                           coarsest_elements=4, dtype=dtype, cycle=cyc)
    r1 = solve_mgcg(build_lean_hierarchy(cfg), cyc, fmg_start=True)
    assert bool(r1.converged)

    mesh = Mesh(np.array(jax.devices()[:8]), ("gz",))
    hier, mgcg_fn = build_halo_mgcg3d(cfg, mesh)
    u, k, conv, hist = mgcg_fn(hier)

    assert bool(conv)
    assert int(k) == int(r1.num_iters)
    kk = int(k)
    # f32: the single-device check runs the fused tet-norm kernel while
    # the distributed one psums class-table quadratures — at the converged
    # point (~6e-8, the f32 floor) the two programs disagree by a few
    # percent of pure roundoff; iteration counts and u are the semantic
    # assertions.
    np.testing.assert_allclose(np.asarray(hist)[:kk],
                               np.asarray(r1.res_hist)[:kk],
                               rtol=5e-2 if dtype == "float32" else 1e-9)
    m = cfg.hierarchy.elements_at(cfg.hierarchy.finest_level) + 1
    np.testing.assert_allclose(np.asarray(u)[:m, :m, :m],
                               np.asarray(r1.u)[:m, :m, :m],
                               rtol=utol, atol=utol)


@requires_8_devices
@pytest.mark.isolate
def test_distributed_checkpoint_resume(tmp_path):
    """Kill-and-resume on the 8-device mesh: a solve interrupted at 2
    cycles, checkpointed (save_halo_checkpoint), and resumed
    (build_halo_resume3d) reproduces the uninterrupted solve — same total
    cycle count, same residual history, same u (f64; V-cycles are
    stateless between iterations, so the resumed sequence is the
    uninterrupted one)."""
    import dataclasses

    from multigrid_dolfinx_tpu import models
    from multigrid_dolfinx_tpu.config import CycleSpec
    from multigrid_dolfinx_tpu.parallel.halo3d import (
        build_halo_resume3d,
        build_halo_solver3d,
    )
    from multigrid_dolfinx_tpu.utils.checkpoint import (
        load_halo_checkpoint,
        save_halo_checkpoint,
    )

    cyc = CycleSpec(nu1=1, nu2=1, smoother="rbgs", restriction="pt",
                    tol=0.0, rtol=1e-9, max_cycles=40)
    cfg = models.poisson3d(finest_level=3, coarsest_level=1,
                           coarsest_elements=4, dtype="float64", cycle=cyc)
    mesh = Mesh(np.array(jax.devices()[:8]), ("gz",))

    hier, solve_fn = build_halo_solver3d(cfg, mesh)
    u_a, k_a, done_a, hist_a = solve_fn(hier)
    assert bool(done_a) and int(k_a) > 3

    # interrupted run: stop unconverged after 2 cycles, checkpoint
    cfg_cut = dataclasses.replace(
        cfg, cycle=dataclasses.replace(cyc, max_cycles=2))
    hier_cut, solve_cut = build_halo_solver3d(cfg_cut, mesh)
    u_c, k_c, done_c, hist_c = solve_cut(hier_cut)
    assert int(k_c) == 2 and not bool(done_c)
    path = save_halo_checkpoint(tmp_path / "ck", cfg, u_c, int(k_c),
                                np.asarray(hist_c))

    # resume under the original spec
    u0, k0, hist0 = load_halo_checkpoint(path, cfg)
    hier_r, resume_fn = build_halo_resume3d(cfg, mesh)
    u_b, k_b, done_b, hist_b = resume_fn(hier_r, u0, k0, hist0)

    assert bool(done_b)
    assert int(k_b) == int(k_a)
    kk = int(k_a)
    np.testing.assert_allclose(np.asarray(hist_b)[:kk],
                               np.asarray(hist_a)[:kk], rtol=1e-13)
    np.testing.assert_allclose(np.asarray(u_b), np.asarray(u_a),
                               rtol=1e-13, atol=1e-14)


@requires_8_devices
@pytest.mark.isolate
@pytest.mark.parametrize("smoother,coarse_op", [
    ("rbgs", "galerkin"),
    ("jacobi", "galerkin"),
    ("rbgs", "rediscretize"),
])
def test_distributed_var_kappa_matches_single_device(smoother, coarse_op):
    """The z-decomposed VARIABLE-coefficient solve (parallel/halo3d_var:
    K-plane slabs sharded alongside v/f, 2^3-color GS with global
    parities, replicated Galerkin coarse tail) reproduces the
    single-device build_var_hierarchy solve: identical cycle counts, u to
    f64 roundoff.  This is the capability the round-4 guard promised
    ('shard over parallel/halo3d') before the planes path existed."""
    import dataclasses as _dc

    from multigrid_dolfinx_tpu import build_var_hierarchy, models, solve
    from multigrid_dolfinx_tpu.config import CycleSpec
    from multigrid_dolfinx_tpu.parallel.halo3d import build_halo_solver3d

    cyc = CycleSpec(nu1=2, nu2=2, smoother=smoother, restriction="pt",
                    tol=0.0, rtol=1e-6, max_cycles=40)
    cfg = models.variable_coefficient_3d(
        lambda x, y, z: 1.0 + x + 2.0 * y + z,
        finest_level=3, coarsest_level=1, coarsest_elements=4,
        dtype="float64", cycle=cyc)
    cfg = _dc.replace(cfg, hierarchy=_dc.replace(
        cfg.hierarchy, coarse_operator=coarse_op))
    r1 = solve(build_var_hierarchy(cfg), cyc, mode="tol")
    assert bool(r1.converged)

    mesh = Mesh(np.array(jax.devices()[:8]), ("gz",))
    hier, solve_fn = build_halo_solver3d(cfg, mesh)
    u, k, done, hist = solve_fn(hier)

    assert bool(done)
    assert int(k) == int(r1.num_cycles)
    m = cfg.hierarchy.elements_at(cfg.hierarchy.finest_level) + 1
    np.testing.assert_allclose(np.asarray(u)[:m, :m, :m],
                               np.asarray(r1.u)[:m, :m, :m],
                               atol=1e-11, rtol=1e-11)
    kk = int(k)
    np.testing.assert_allclose(np.asarray(hist)[:kk],
                               np.asarray(r1.res_hist)[:kk],
                               rtol=1e-9, atol=1e-13)


@requires_8_devices
@pytest.mark.isolate
def test_distributed_var_kappa_mgcg_matches_single_device():
    """Distributed variable-kappa MG-CG (z-decomposed planes V-cycle as
    preconditioner, psum dots) matches solver.krylov.solve_mgcg iteration
    counts and solution on the 8-device mesh."""
    from multigrid_dolfinx_tpu import build_var_hierarchy, models
    from multigrid_dolfinx_tpu.config import CycleSpec
    from multigrid_dolfinx_tpu.parallel.halo3d import build_halo_mgcg3d
    from multigrid_dolfinx_tpu.solver.krylov import solve_mgcg

    cyc = CycleSpec(nu1=2, nu2=2, smoother="rbgs", restriction="pt",
                    tol=0.0, rtol=1e-6, max_cycles=40)
    cfg = models.variable_coefficient_3d(
        lambda x, y, z: 1.0 + x + 2.0 * y + z,
        finest_level=3, coarsest_level=1, coarsest_elements=4,
        dtype="float64", cycle=cyc)
    r1 = solve_mgcg(build_var_hierarchy(cfg), cyc)
    assert bool(r1.converged)

    mesh = Mesh(np.array(jax.devices()[:8]), ("gz",))
    hier, mgcg_fn = build_halo_mgcg3d(cfg, mesh)
    u, k, conv, hist = mgcg_fn(hier)

    assert bool(conv)
    assert int(k) == int(r1.num_iters)
    m = cfg.hierarchy.elements_at(cfg.hierarchy.finest_level) + 1
    np.testing.assert_allclose(np.asarray(u)[:m, :m, :m],
                               np.asarray(r1.u)[:m, :m, :m],
                               atol=1e-10, rtol=1e-10)


@requires_8_devices
@pytest.mark.isolate
def test_distributed_p2_matches_single_device():
    """The z-decomposed P2 solve (parallel/halo3d_p2: depth-2 slab
    halos, global parity/face classes, replicated O(1) parity tables)
    reproduces the single-device build_p2_hierarchy solve: identical
    cycle counts, u to f64 roundoff — the multi-chip story of BASELINE
    config 4's P2 half (VERDICT r4 #5)."""
    from multigrid_dolfinx_tpu import solve
    from multigrid_dolfinx_tpu.config import (
        CycleSpec, HierarchySpec, ProblemSpec, SolverConfig,
    )
    from multigrid_dolfinx_tpu.parallel.halo3d_p2 import build_halo_p2_3d
    from multigrid_dolfinx_tpu.solver.hierarchy import build_p2_hierarchy

    cyc = CycleSpec(nu1=2, nu2=2, smoother="jacobi", restriction="pt",
                    tol=0.0, rtol=1e-8, max_cycles=40)
    cfg = SolverConfig(
        problem=ProblemSpec(ndim=3, degree=2, rhs_const=-12.0),
        hierarchy=HierarchySpec(coarsest_elements=4, coarsest_level=0,
                                finest_level=2,
                                coarse_operator="rediscretize"),
        cycle=cyc, dtype="float64")
    r1 = solve(build_p2_hierarchy(cfg), cyc, mode="tol")
    assert bool(r1.converged)

    mesh = Mesh(np.array(jax.devices()[:8]), ("gz",))
    hier, solve_fn = build_halo_p2_3d(cfg, mesh)
    u, k, done, hist = solve_fn(hier)

    assert bool(done)
    assert int(k) == int(r1.num_cycles)
    m = 2 * cfg.hierarchy.elements_at(cfg.hierarchy.finest_level) + 1
    np.testing.assert_allclose(np.asarray(u)[:m, :m, :m],
                               np.asarray(r1.u)[:m, :m, :m],
                               atol=1e-11, rtol=1e-11)
    kk = int(k)
    np.testing.assert_allclose(np.asarray(hist)[:kk],
                               np.asarray(r1.res_hist)[:kk],
                               rtol=1e-9, atol=1e-13)
