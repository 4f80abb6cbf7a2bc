"""Multigrid convergence-property tests — the 'implied oracle tests' of
SURVEY.md §4: two-grid convergence factors, h-independent V-cycle counts,
smoother/cycle variants, and 3D.

These use practical configs (V(2,2), full weighting) rather than the
reference's V(50,50)+injection, which is what production runs look like.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from multigrid_dolfinx_tpu import build_hierarchy, models, solve
from multigrid_dolfinx_tpu.config import CycleSpec


def _iter_count(cfg):
    hier = build_hierarchy(cfg)
    res = solve(hier, cfg.cycle, mode="tol")
    assert bool(res.converged), "solver did not converge"
    return int(res.num_cycles), res


def test_vcycle_residual_contraction_factor():
    """V(2,2) weighted-Jacobi + full weighting must contract the residual by
    a healthy, h-independent factor each cycle (model-problem theory ~0.3;
    assert < 0.5 with margin)."""
    cyc = CycleSpec(nu1=2, nu2=2, restriction="pt",
                    tol=1e-10, max_cycles=60)
    cfg = models.poisson2d(finest_level=3, cycle=cyc)
    _, res = _iter_count(cfg)
    hist = np.asarray(res.res_hist)
    k = int(res.num_cycles)
    ratios = hist[3:k - 1] / hist[2:k - 2]
    assert np.nanmax(ratios) < 0.5


@pytest.mark.parametrize("smoother", ["jacobi", "rbgs", "chebyshev"])
def test_smoothers_converge(smoother):
    cyc = CycleSpec(nu1=2, nu2=2, smoother=smoother,
                    restriction="pt", tol=1e-9, max_cycles=60)
    cfg = models.poisson2d(finest_level=3, cycle=cyc)
    k, _ = _iter_count(cfg)
    assert k < 40


def test_rbgs_faster_than_jacobi():
    """Gauss-Seidel smoothing should beat Jacobi at equal sweep counts."""
    base = dict(nu1=2, nu2=2, restriction="pt",
                tol=1e-9, max_cycles=60)
    kj, _ = _iter_count(models.poisson2d(
        finest_level=3, cycle=CycleSpec(smoother="jacobi", **base)))
    kg, _ = _iter_count(models.poisson2d(
        finest_level=3, cycle=CycleSpec(smoother="rbgs", **base)))
    assert kg <= kj


def test_h_independent_iteration_counts():
    """The defining property of multigrid: V-cycle counts must not grow
    with resolution (the reference's iter-count CSV sweep is this exact
    experiment, multigrid.py:296-302)."""
    cyc = CycleSpec(nu1=2, nu2=2, restriction="pt",
                    tol=1e-9, max_cycles=60)
    counts = []
    for finest in (2, 3, 4):   # 32, 64, 128 elements per dim
        cfg = models.poisson2d(finest_level=finest, cycle=cyc)
        k, _ = _iter_count(cfg)
        counts.append(k)
    assert max(counts) - min(counts) <= 2
    assert counts[-1] <= counts[0] + 2


def test_wcycle_at_least_as_good_as_vcycle():
    base = dict(nu1=2, nu2=2, restriction="pt",
                tol=1e-9, max_cycles=60)
    kv, _ = _iter_count(models.poisson2d(
        finest_level=4, cycle=CycleSpec(cycle="V", **base)))
    kw, _ = _iter_count(models.poisson2d(
        finest_level=4, cycle=CycleSpec(cycle="W", **base)))
    assert kw <= kv


def test_six_level_deep_hierarchy():
    """BASELINE.json config 2: 6-level V(2,2)."""
    cyc = CycleSpec(nu1=2, nu2=2, restriction="pt",
                    tol=1e-9, max_cycles=60)
    cfg = models.poisson2d(finest_level=5, coarsest_level=0,
                           coarsest_elements=4, cycle=cyc)
    assert cfg.hierarchy.num_levels == 6
    k, res = _iter_count(cfg)
    assert k < 30


def test_3d_poisson_converges():
    """BASELINE.json config 3 (small instance): 3D Poisson P1 on the unit
    cube, trilinear transfers, Kuhn-tet assembly."""
    cyc = CycleSpec(nu1=2, nu2=2, restriction="pt",
                    tol=1e-8, max_cycles=60)
    cfg = models.poisson3d(finest_level=2, coarsest_level=0,
                           coarsest_elements=4, dtype="float64", cycle=cyc)
    k, res = _iter_count(cfg)
    assert k < 30
    # solution error should sit at the discretization floor and be small
    errs = np.asarray(res.err_hist)
    assert errs[k - 1] < 5e-2


def test_divergence_guard():
    """omega=1.9 makes weighted Jacobi divergent; the solver must stop at
    max_cycles or flag divergence instead of looping forever (the
    reference's while-True would hang, SURVEY.md §5)."""
    cyc = CycleSpec(nu1=2, nu2=2, omega=1.95, restriction="pt",
                    tol=1e-12, max_cycles=10)
    cfg = models.poisson2d(finest_level=3, cycle=cyc)
    hier = build_hierarchy(cfg)
    res = solve(hier, cfg.cycle, mode="tol")
    assert not bool(res.converged)
    assert bool(res.diverged) or int(res.num_cycles) == 10


def test_big_tpu_solve_guard(monkeypatch):
    """Above ~3e8 storage points on a TPU backend, solve() must refuse
    with an actionable error instead of executing the program that
    crashed the TPU worker at driver level in round 3 (BENCHMARKS.md
    'Scale headroom'); MG_BIG_SOLVE=1 overrides."""
    import types
    import pytest
    import jax

    from multigrid_dolfinx_tpu.solver import fmg

    fake_hier = types.SimpleNamespace(
        finest=types.SimpleNamespace(
            b=types.SimpleNamespace(shape=(776, 769, 896))
        )
    )
    small_hier = types.SimpleNamespace(
        finest=types.SimpleNamespace(
            b=types.SimpleNamespace(shape=(520, 513, 640))
        )
    )

    class _Dev:
        platform = "tpu"

    monkeypatch.setattr(jax, "devices", lambda *a, **k: [_Dev()])
    monkeypatch.delenv("MG_BIG_SOLVE", raising=False)
    with pytest.raises(RuntimeError, match="driver level"):
        fmg._guard_big_tpu_solve(fake_hier)
    # 512^3 padded storage stays under the guard
    fmg._guard_big_tpu_solve(small_hier)
    # explicit override passes through
    monkeypatch.setenv("MG_BIG_SOLVE", "1")
    fmg._guard_big_tpu_solve(fake_hier)
    # CPU backend never refuses
    monkeypatch.delenv("MG_BIG_SOLVE", raising=False)
    _Dev.platform = "cpu"
    fmg._guard_big_tpu_solve(fake_hier)


def test_screened_poisson_converges_and_matches_exact():
    """-Laplace(u) + c u = f: the reaction term adds c*M to the operator;
    MG must converge and the discrete solution approaches u* at O(h^2)."""
    from scipy.sparse.linalg import spsolve
    from multigrid_dolfinx_tpu.fem import assembly as fa
    from multigrid_dolfinx_tpu.mesh import build_grid_hierarchy

    cyc = CycleSpec(nu1=2, nu2=2, smoother="rbgs", restriction="pt",
                    tol=1e-11, max_cycles=60)
    cfg = models.screened_poisson2d(c=25.0, finest_level=3, cycle=cyc)
    hier = build_hierarchy(cfg)
    res = solve(hier, cfg.cycle, mode="tol")
    assert bool(res.converged)
    assert int(res.num_cycles) < 30
    # matches the direct solve of the same system
    grids = build_grid_hierarchy(cfg.hierarchy, ndim=2)
    asm = fa.assemble_level(grids[-1], cfg.problem)
    A = fa.stencil_to_csr(asm.offsets, asm.A_planes)
    u_direct = spsolve(A.tocsc(), asm.b.reshape(-1))
    np.testing.assert_allclose(np.asarray(res.u).reshape(-1), u_direct,
                               rtol=1e-7, atol=1e-10)
    # and the FEM-L2 error vs u* is small (discretization floor)
    k = int(res.num_cycles)
    assert float(np.asarray(res.err_hist)[k - 1]) < 5e-4


def test_track_error_off_keeps_convergence():
    """track_error=False skips the per-cycle error quadrature (S*Q compute
    passes at scale): err_hist is NaN, residual history and cycle count
    are unchanged."""
    import dataclasses as dc
    from multigrid_dolfinx_tpu import build_hierarchy, models, solve
    from multigrid_dolfinx_tpu.config import CycleSpec

    cyc = CycleSpec(nu1=2, nu2=2, smoother="rbgs", restriction="pt",
                    tol=0.0, rtol=1e-8, max_cycles=30)
    cfg = models.poisson2d(finest_level=3, dtype="float64", cycle=cyc)
    hier = build_hierarchy(cfg)
    r_on = solve(hier, cyc, mode="tol")
    r_off = solve(hier, dc.replace(cyc, track_error=False), mode="tol")
    k = int(r_on.num_cycles)
    assert int(r_off.num_cycles) == k
    assert np.all(np.isnan(np.asarray(r_off.err_hist)))
    np.testing.assert_array_equal(np.asarray(r_off.res_hist)[:k],
                                  np.asarray(r_on.res_hist)[:k])


def test_cheby_phase_mapping():
    """cheby_degree=0 (default): one polynomial of degree nu per phase
    (PETSc convention, equal matvec budget to nu GS/Jacobi sweeps);
    explicit degree d: nu rounds of degree d (legacy form)."""
    from multigrid_dolfinx_tpu.ops.smoothers import cheby_phase

    assert cheby_phase(2, 0) == (1, 2)
    assert cheby_phase(5, 0) == (1, 5)
    assert cheby_phase(0, 0) == (0, 1)
    assert cheby_phase(2, 4) == (2, 4)
    assert cheby_phase(1, 1) == (1, 1)


def test_cheby_default_matvec_budget():
    """The default V(2,2) chebyshev smoothing phase costs exactly nu
    matvecs (counted through the residual_fn hook)."""
    from multigrid_dolfinx_tpu import build_hierarchy
    from multigrid_dolfinx_tpu.ops import smoothers

    cyc = CycleSpec(nu1=2, nu2=2, smoother="chebyshev",
                    restriction="pt", tol=1e-9, max_cycles=60)
    cfg = models.poisson2d(finest_level=2, cycle=cyc)
    hier = build_hierarchy(cfg)
    lv = hier.finest
    calls = []

    def counting_residual(v, f):
        calls.append(1)
        return f - lv.A.apply(v)

    v = jnp.zeros_like(lv.b)
    smoothers.chebyshev_smooth(lv.sm, lv.A, v, lv.b, 2,
                               residual_fn=counting_residual)
    assert len(calls) == 2
