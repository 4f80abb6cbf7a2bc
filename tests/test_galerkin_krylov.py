"""Galerkin (RAP) coarse operators and MG-preconditioned CG
(BASELINE.json configs 4 and 5, small instances)."""
import numpy as np
import pytest

from multigrid_dolfinx_tpu import build_hierarchy, models, solve
from multigrid_dolfinx_tpu.config import CycleSpec, HierarchySpec, ProblemSpec, SolverConfig
from multigrid_dolfinx_tpu.solver.krylov import solve_mgcg


def _kappa(x, y):
    return 1.0 + 8.0 * x * x * y


def test_galerkin_rap_properties():
    """RAP coarse operator: symmetric, radius-1 stencil, identity bc rows,
    and exactly A_c v = P^T A_f (P v) on random vectors."""
    import scipy.sparse as sp
    from multigrid_dolfinx_tpu.fem import assembly as fa
    from multigrid_dolfinx_tpu.fem.galerkin import (
        galerkin_coarsen_hierarchy,
        prolongation_csr,
    )
    from multigrid_dolfinx_tpu.mesh import build_grid_hierarchy

    cfg = models.variable_coefficient_2d(_kappa, finest_level=2,
                                         coarsest_level=1)
    grids = build_grid_hierarchy(cfg.hierarchy, ndim=2)
    asms = fa.assemble_hierarchy(grids, cfg.problem)
    gal = galerkin_coarsen_hierarchy(asms)

    A_c = fa.stencil_to_csr(gal[0].offsets, gal[0].A_planes)
    assert abs(A_c - A_c.T).max() < 1e-12

    A_f = fa.stencil_to_csr(gal[1].offsets, gal[1].A_planes)
    P = prolongation_csr(grids[0].shape, 2)
    rng = np.random.default_rng(0)
    # compare on interior vectors (bc rows re-eliminated to identity)
    interior = gal[0].interior.reshape(-1)
    v = rng.standard_normal(A_c.shape[0]) * interior
    got = (A_c @ v) * interior
    want = (P.T @ (A_f @ (P @ v))) * interior
    np.testing.assert_allclose(got, want, rtol=1e-11, atol=1e-12)


def test_variable_coefficient_galerkin_convergence():
    """Variable-coefficient diffusion with Galerkin coarse operators must
    converge h-independently; rediscretized coarse operators on the same
    problem are the control."""
    cyc = CycleSpec(nu1=2, nu2=2, smoother="rbgs", restriction="pt",
                    tol=1e-9, max_cycles=60)
    cfg = models.variable_coefficient_2d(_kappa, finest_level=4,
                                         coarsest_level=1, cycle=cyc)
    hier = build_hierarchy(cfg)
    res = solve(hier, cfg.cycle, mode="tol")
    assert bool(res.converged)
    assert int(res.num_cycles) < 25


def test_variable_coefficient_matches_direct_solve():
    from scipy.sparse.linalg import spsolve
    from multigrid_dolfinx_tpu.fem import assembly as fa

    cyc = CycleSpec(nu1=2, nu2=2, smoother="rbgs", restriction="pt",
                    tol=1e-11, max_cycles=80)
    cfg = models.variable_coefficient_2d(_kappa, finest_level=3,
                                         coarsest_level=1, cycle=cyc)
    hier = build_hierarchy(cfg)
    res = solve(hier, cfg.cycle, mode="tol")
    assert bool(res.converged)

    # direct solve of the same (finest, eliminated) system
    from multigrid_dolfinx_tpu.mesh import build_grid_hierarchy

    grids = build_grid_hierarchy(cfg.hierarchy, ndim=2)
    asm = fa.assemble_level(grids[-1], cfg.problem)
    A = fa.stencil_to_csr(asm.offsets, asm.A_planes)
    u_direct = spsolve(A.tocsc(), asm.b.reshape(-1))
    np.testing.assert_allclose(
        np.asarray(res.u).reshape(-1), u_direct, rtol=1e-6, atol=1e-9
    )


@pytest.mark.parametrize("fmg_start", [True, False])
def test_mgcg_converges_and_matches_direct(fmg_start):
    from scipy.sparse.linalg import spsolve
    from multigrid_dolfinx_tpu.fem import assembly as fa
    from multigrid_dolfinx_tpu.mesh import build_grid_hierarchy

    cyc = CycleSpec(nu1=2, nu2=2, smoother="rbgs", restriction="pt",
                    tol=1e-11, max_cycles=50)
    cfg = models.poisson2d(finest_level=3, cycle=cyc)
    hier = build_hierarchy(cfg)
    res = solve_mgcg(hier, cfg.cycle, fmg_start=fmg_start)
    assert bool(res.converged)
    assert int(res.num_iters) < 15

    grids = build_grid_hierarchy(cfg.hierarchy, ndim=2)
    asm = fa.assemble_level(grids[-1], cfg.problem)
    A = fa.stencil_to_csr(asm.offsets, asm.A_planes)
    u_direct = spsolve(A.tocsc(), asm.b.reshape(-1))
    np.testing.assert_allclose(
        np.asarray(res.u).reshape(-1), u_direct, rtol=1e-7, atol=1e-10
    )


def test_mgcg_beats_plain_vcycles_on_anisotropic():
    """On a problem where plain V-cycles struggle (strong anisotropy),
    CG acceleration should cut the iteration count."""
    aniso = lambda x, y: 1.0 + 0.0 * x  # placeholder coefficient
    # anisotropy via coefficient jump instead: kappa jumps 1 -> 100
    jump = lambda x, y: np.where(x < 0.5, 1.0, 100.0)
    cyc = CycleSpec(nu1=1, nu2=1, smoother="jacobi", restriction="pt",
                    tol=1e-9, max_cycles=80)
    cfg = models.variable_coefficient_2d(jump, finest_level=3,
                                         coarsest_level=1, cycle=cyc)
    hier = build_hierarchy(cfg)
    plain = solve(hier, cfg.cycle, mode="tol")
    accel = solve_mgcg(hier, cfg.cycle, fmg_start=False)
    assert bool(accel.converged)
    assert int(accel.num_iters) <= int(plain.num_cycles)


def test_galerkin_3d():
    """Galerkin RAP in 3D: trilinear P keeps the coarse stencil compact and
    the variable-coefficient solve converges."""
    kap = lambda x, y, z: 1.0 + 3.0 * x * y + z
    from multigrid_dolfinx_tpu.config import (
        HierarchySpec, ProblemSpec, SolverConfig,
    )

    cyc = CycleSpec(nu1=2, nu2=2, smoother="rbgs", restriction="pt",
                    tol=1e-8, max_cycles=40)
    cfg = SolverConfig(
        problem=ProblemSpec(ndim=3, rhs_const=-12.0, kappa=kap),
        hierarchy=HierarchySpec(coarsest_elements=4, coarsest_level=0,
                                finest_level=2, coarse_operator="galerkin"),
        cycle=cyc, dtype="float64",
    )
    hier = build_hierarchy(cfg)
    res = solve(hier, cfg.cycle, mode="tol")
    assert bool(res.converged)
    assert int(res.num_cycles) < 25


def test_solve_batched_multiple_rhs():
    """DP analogue: vmapped solves over a batch of right-hand sides share
    one hierarchy (SURVEY.md §2c)."""
    import jax.numpy as jnp
    from multigrid_dolfinx_tpu.solver.batched import solve_batched

    cyc = CycleSpec(nu1=2, nu2=2, smoother="rbgs", restriction="pt",
                    tol=1e-9, max_cycles=40)
    cfg = models.poisson2d(finest_level=3, cycle=cyc)
    hier = build_hierarchy(cfg)
    f = hier.finest.b
    batch = jnp.stack([f, 0.5 * f, 2.0 * f])
    res = solve_batched(hier, cyc, batch)
    assert res.u.shape[0] == 3
    assert bool(np.all(np.asarray(res.converged)))
    # single solve for the unscaled RHS must match batch element 0
    single = solve(hier, cyc, mode="tol")
    np.testing.assert_allclose(
        np.asarray(res.u[0]), np.asarray(single.u), rtol=1e-9, atol=1e-11
    )


def test_solve_batched_pallas_lax_map():
    """use_pallas batches go through lax.map of full fused-kernel solves
    (Pallas doesn't vmap; previously the flag was silently dropped and the
    DP path ran only the slower jnp solve).  3D f32, interpret mode."""
    import jax.numpy as jnp
    from multigrid_dolfinx_tpu.solver.batched import solve_batched

    cyc = CycleSpec(nu1=2, nu2=2, smoother="rbgs", restriction="pt",
                    tol=0.0, rtol=1e-5, max_cycles=40, use_pallas=True,
                    track_error=False)
    cfg = models.poisson3d(finest_level=2, coarsest_level=1,
                           coarsest_elements=4, dtype="float32", cycle=cyc)
    from multigrid_dolfinx_tpu.solver.hierarchy import build_lean_hierarchy

    hier = build_lean_hierarchy(cfg)
    f = hier.finest.b
    batch = jnp.stack([f, 0.5 * f])
    res = solve_batched(hier, cyc, batch)
    assert res.u.shape[0] == 2
    assert bool(np.all(np.asarray(res.converged)))
    single = solve(hier, cyc, mode="tol")
    np.testing.assert_allclose(
        np.asarray(res.u[0]), np.asarray(single.u), rtol=1e-5, atol=1e-6
    )


def test_stencil_rap_matches_csr_triple_product():
    """The scalable stencil-form Galerkin product (closed-form strided
    contraction, fem.galerkin.galerkin_rap_stencil) equals the scipy CSR
    P^T A P it replaces, entry by entry, for variable-coefficient 2D and
    3D fine operators."""
    import numpy as np
    from multigrid_dolfinx_tpu.config import HierarchySpec, ProblemSpec
    from multigrid_dolfinx_tpu.mesh import build_grid_hierarchy
    from multigrid_dolfinx_tpu.fem import assembly as fa
    from multigrid_dolfinx_tpu.fem import galerkin as gk

    for ndim, fl in ((2, 3), (3, 2)):
        prob = ProblemSpec(
            ndim=ndim,
            kappa=(lambda *xs: 1.0 + xs[0] + 2.0 * xs[-1]),
            rhs_const=-6.0,
        )
        hs = HierarchySpec(coarsest_elements=4, coarsest_level=1,
                           finest_level=fl)
        grids = build_grid_hierarchy(hs, ndim=ndim)
        fine = fa.assemble_level(grids[-1], prob)
        coarse = fa.assemble_level(grids[-2], prob)

        A_f = fa.stencil_to_csr(fine.offsets, fine.A_planes)
        P = gk.prolongation_csr(coarse.grid.shape, ndim)
        A_c = (P.T @ A_f @ P).tocsr()
        A_c = gk.eliminate_dirichlet_csr(A_c, (~coarse.interior).reshape(-1))
        A_c.eliminate_zeros()
        offs_csr, planes_csr = gk.csr_to_stencil(
            A_c, coarse.grid.shape, radius=1)

        offs_st, planes_st = gk.galerkin_rap_stencil(
            fine.offsets, fine.A_planes)
        planes_st = gk.eliminate_dirichlet_planes(
            offs_st, planes_st, coarse.interior)

        d1 = {o: planes_csr[k] for k, o in enumerate(offs_csr)}
        d2 = {o: planes_st[k] for k, o in enumerate(offs_st)}
        for o in sorted(set(d1) | set(d2)):
            np.testing.assert_allclose(
                d1.get(o, np.zeros(coarse.grid.shape)),
                d2.get(o, np.zeros(coarse.grid.shape)),
                atol=1e-12, err_msg=f"ndim={ndim} offset={o}")
