"""P2 elements on the half-step DOF lattice (BASELINE.json config 4).

The reference's manufactured solution u* = 1 + x^2 + 2y^2 lies IN the P2
space, so the P2 discrete solution equals u* at every node up to solver
tolerance — a very sharp oracle.
"""
import numpy as np
import pytest

from multigrid_dolfinx_tpu import build_hierarchy, models, solve
from multigrid_dolfinx_tpu.config import (
    CycleSpec, HierarchySpec, ProblemSpec, SolverConfig,
)
from multigrid_dolfinx_tpu.fem import assembly as fa
from multigrid_dolfinx_tpu.mesh import GridLevel


def test_p2_assembly_golden():
    grid = GridLevel(level=0, ndim=2, n=4)
    problem = ProblemSpec(ndim=2, degree=2)
    asm = fa.assemble_level(grid, problem)
    # DOF lattice is (2n+1)^2
    assert asm.grid.shape == (9, 9)
    # radius-2 stencil
    assert max(max(abs(c) for c in off) for off in asm.offsets) == 2
    A = fa.stencil_to_csr(asm.offsets, asm.A_planes)
    assert abs(A - A.T).max() < 1e-12
    # raw stiffness annihilates constants
    Araw = fa.stencil_to_csr(asm.offsets, asm.A_raw_planes)
    ones = np.ones(Araw.shape[0])
    assert np.abs(Araw @ ones).max() < 1e-12
    # P2 energy of the nodal interpolant of u* = 1 + x^2 + 2y^2 is exact:
    # int |grad u*|^2 = int (2x)^2 + (4y)^2 = 4/3 + 16/3 = 20/3
    x, y = asm.grid.coords()
    u = (1.0 + x ** 2 + 2.0 * y ** 2).reshape(-1)
    assert u @ (Araw @ u) == pytest.approx(20.0 / 3.0, rel=1e-12)
    # mass integrates exactly: total = area, and u^T M u = int (u*)^2 = 40/9
    M = fa.stencil_to_csr(asm.M_offsets, asm.M_planes)
    assert ones @ (M @ ones) == pytest.approx(1.0, rel=1e-12)
    assert u @ (M @ u) == pytest.approx(40.0 / 9.0, rel=1e-12)


def test_p2_direct_solve_is_exact_for_quadratic():
    """P2 + the quadratic manufactured solution: the discrete solution IS
    u* at the nodes (Galerkin exactness)."""
    from scipy.sparse.linalg import spsolve

    grid = GridLevel(level=0, ndim=2, n=8)
    problem = ProblemSpec(ndim=2, degree=2)
    asm = fa.assemble_level(grid, problem)
    A = fa.stencil_to_csr(asm.offsets, asm.A_planes)
    u = spsolve(A.tocsc(), asm.b.reshape(-1))
    x, y = asm.grid.coords()
    ustar = (1.0 + x ** 2 + 2.0 * y ** 2).reshape(-1)
    np.testing.assert_allclose(u, ustar, rtol=1e-10, atol=1e-11)


def test_p2_multigrid_converges_to_exact():
    cfg = models.poisson2d_p2(finest_level=3, coarsest_level=1)
    hier = build_hierarchy(cfg)
    cyc = cfg.cycle
    res = solve(hier, cyc, mode="tol")
    assert bool(res.converged)
    assert int(res.num_cycles) < 40
    # error norm vs u* must sit at solver tolerance, NOT at a
    # discretization floor (u* is in the P2 space)
    k = int(res.num_cycles)
    final_err = float(np.asarray(res.err_hist)[k - 1])
    assert final_err < 1e-8


def test_p2_variable_coefficient_converges():
    kappa = lambda x, y: 1.0 + 4.0 * x * y
    cyc = CycleSpec(nu1=3, nu2=3, smoother="rbgs", restriction="pt",
                    tol=1e-9, max_cycles=60)
    cfg = models.poisson2d_p2(finest_level=3, coarsest_level=1,
                              cycle=cyc, kappa=kappa)
    hier = build_hierarchy(cfg)
    res = solve(hier, cfg.cycle, mode="tol")
    assert bool(res.converged)
    assert int(res.num_cycles) < 40


# ----------------------------------------------------------------------
# P2 in 3D (Kuhn tetrahedra, half-step DOF lattice) + 3D diagonal variants
# ----------------------------------------------------------------------

def test_p2_3d_direct_solve_is_exact_for_quadratic():
    """P2 on Kuhn tets contains the quadratic u*, so the assembled system's
    direct solve reproduces it to roundoff (the 3D analogue of the CG2
    'exact' space, reference Multigrid_prototype.py:126-130)."""
    from scipy.sparse.linalg import spsolve
    from multigrid_dolfinx_tpu.fem.assembly import (
        assemble_level, stencil_to_csr,
    )
    from multigrid_dolfinx_tpu.mesh import GridLevel
    from multigrid_dolfinx_tpu.config import ProblemSpec

    p = ProblemSpec(ndim=3, degree=2, rhs_const=-12.0)
    asm = assemble_level(GridLevel(level=0, ndim=3, n=4), p)
    A = stencil_to_csr(asm.offsets, asm.A_planes)
    u = spsolve(A.tocsc(), asm.b.reshape(-1))
    x, y, z = asm.grid.coords()
    ustar = (1.0 + x ** 2 + 2.0 * y ** 2 + 3.0 * z ** 2).reshape(-1)
    np.testing.assert_allclose(u, ustar, rtol=1e-10, atol=1e-10)


def test_p2_3d_multigrid_converges_to_exact():
    """3D P2 Galerkin multigrid lands on u* at solver tolerance (jacobi
    smoothing: the radius-2 lattice stencil would need 27 GS color
    classes)."""
    from multigrid_dolfinx_tpu.config import (
        HierarchySpec, ProblemSpec, SolverConfig,
    )

    cyc = CycleSpec(nu1=3, nu2=3, smoother="jacobi", restriction="pt",
                    tol=0.0, rtol=1e-10, max_cycles=60)
    cfg = SolverConfig(
        problem=ProblemSpec(ndim=3, degree=2, rhs_const=-12.0),
        hierarchy=HierarchySpec(coarsest_elements=2, coarsest_level=1,
                                finest_level=2, coarse_operator="galerkin"),
        cycle=cyc, dtype="float64",
    )
    hier = build_hierarchy(cfg)
    res = solve(hier, cyc, mode="tol")
    assert bool(res.converged)
    m = hier.finest.n + 1
    xs = np.linspace(0.0, 1.0, m)
    X, Y, Z = np.meshgrid(xs, xs, xs, indexing="ij")
    ustar = 1.0 + X ** 2 + 2.0 * Y ** 2 + 3.0 * Z ** 2
    assert np.abs(np.asarray(res.u) - ustar).max() < 1e-8


def test_3d_left_diagonal_matches_right():
    """The mirrored-Kuhn ('left') decomposition yields the same 7-point
    const Laplacian and the same convergence/error behavior as 'right'
    (the dolfinx cube-diagonal capability axis)."""
    from multigrid_dolfinx_tpu.config import (
        HierarchySpec, ProblemSpec, SolverConfig,
    )

    results = {}
    for diag in ("right", "left"):
        cyc = CycleSpec(nu1=2, nu2=2, smoother="rbgs", restriction="pt",
                        tol=0.0, rtol=1e-8, max_cycles=40)
        cfg = SolverConfig(
            problem=ProblemSpec(ndim=3, rhs_const=-12.0, diagonal=diag),
            hierarchy=HierarchySpec(coarsest_elements=4, coarsest_level=1,
                                    finest_level=2),
            cycle=cyc, dtype="float64",
        )
        hier = build_hierarchy(cfg)
        assert hier.finest.A.const_weights is not None
        res = solve(hier, cyc, mode="tol")
        assert bool(res.converged)
        k = int(res.num_cycles)
        results[diag] = (k, float(np.asarray(res.err_hist)[k - 1]))
    assert results["right"][0] == results["left"][0]
    np.testing.assert_allclose(results["right"][1], results["left"][1],
                               rtol=1e-10)


def test_p2_3d_radius2_pallas_kernels_match_jnp():
    """The radius-2 planes kernels (halo-2 windows, mod-3 GS colors) on a
    3D P2 operator produce the same smoothing/residual/transfer results
    as the jnp path — one V-cycle compared end-to-end (a full interpret-
    mode solve with 27 color passes per sweep is too slow for CI)."""
    import dataclasses as dc
    import jax.numpy as jnp
    from multigrid_dolfinx_tpu.config import (
        HierarchySpec, SolverConfig,
    )
    from multigrid_dolfinx_tpu.ops import dispatch
    from multigrid_dolfinx_tpu.solver.vcycle import vcycle

    cyc = CycleSpec(nu1=1, nu2=1, smoother="rbgs", restriction="pt",
                    use_pallas=True, track_error=False)
    cfg = SolverConfig(
        problem=ProblemSpec(ndim=3, degree=2, rhs_const=-12.0),
        hierarchy=HierarchySpec(coarsest_elements=2, coarsest_level=0,
                                finest_level=1),
        cycle=cyc, dtype="float32",
    )
    hier = build_hierarchy(cfg)
    fl = hier.finest
    assert fl.A.radius == 2
    assert dispatch.pallas_planes_eligible(fl.A, fl.shape, jnp.float32)

    f = fl.b
    v0 = jnp.zeros_like(f)
    vp = vcycle(hier, cyc, hier.num_levels - 1, v0, f)
    vj = vcycle(hier, dc.replace(cyc, use_pallas=False),
                hier.num_levels - 1, v0, f)
    np.testing.assert_allclose(np.asarray(vp), np.asarray(vj),
                               rtol=2e-5, atol=2e-5)


def test_p2_3d_jacobi_kernel_matches_jnp():
    """Radius-2 planes Jacobi (single kernel pass per sweep — the P2
    production smoother beside Chebyshev) vs the jnp path."""
    import jax.numpy as jnp
    from multigrid_dolfinx_tpu.config import HierarchySpec, SolverConfig
    from multigrid_dolfinx_tpu.ops.smoothers import jacobi_smooth, smooth

    cyc = CycleSpec(nu1=2, nu2=2, smoother="jacobi", use_pallas=True)
    cfg = SolverConfig(
        problem=ProblemSpec(ndim=3, degree=2, rhs_const=-12.0),
        hierarchy=HierarchySpec(coarsest_elements=2, coarsest_level=0,
                                finest_level=1),
        cycle=cyc, dtype="float32",
    )
    hier = build_hierarchy(cfg)
    fl = hier.finest
    rng = np.random.default_rng(0)
    v = jnp.asarray(
        rng.standard_normal(fl.shape).astype(np.float32))
    got = smooth(fl.sm, fl.A, v, fl.b, 2, "jacobi", use_pallas=True)
    want = jacobi_smooth(fl.sm, v, fl.b, 2, A=fl.A)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_p2_3d_variable_coefficient_converges_h_independent():
    """BASELINE config 4 COMPOSED in 3D: variable kappa x P2 elements x
    Galerkin (RAP) coarse operators, through the exact host assembler
    (the only var-P2 path; fem.fast_p2 requires constant kappa and
    fem.fast_var is P1-only — documented cap, see PARITY.md).  Converges
    at two consecutive mesh sizes with h-independent cycle counts
    (within 2), the classic GMG property (reference iteration-count
    sweeps, multigrid.py:296-302)."""
    kappa = lambda x, y, z: 1.0 + x + 2.0 * y + z
    cyc = CycleSpec(nu1=3, nu2=3, smoother="rbgs", restriction="pt",
                    tol=0.0, rtol=1e-8, max_cycles=60)
    counts = []
    for finest in (1, 2):
        cfg = SolverConfig(
            problem=ProblemSpec(ndim=3, degree=2, rhs_const=-12.0,
                                kappa=kappa),
            hierarchy=HierarchySpec(coarsest_elements=4, coarsest_level=0,
                                    finest_level=finest,
                                    coarse_operator="galerkin"),
            cycle=cyc, dtype="float64")
        hier = build_hierarchy(cfg)
        res = solve(hier, cyc, mode="tol")
        assert bool(res.converged)
        counts.append(int(res.num_cycles))
    assert abs(counts[1] - counts[0]) <= 2, counts
