"""Pallas kernel correctness vs the jnp reference ops (interpret mode on
CPU; the same kernels compile via Mosaic on TPU).

Uses the padded-storage discipline: arrays (M, W) with logical (lm, lm)
corner, zero padding, rows % 8 == 0, cols % 128 == 0.
"""
import dataclasses

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from multigrid_dolfinx_tpu import build_hierarchy, models, solve
from multigrid_dolfinx_tpu.config import CycleSpec
from multigrid_dolfinx_tpu.ops import dispatch
from multigrid_dolfinx_tpu.ops.pallas import stencil2d
from multigrid_dolfinx_tpu.ops.smoothers import (
    jacobi_smooth,
    multicolor_gs_smooth,
    smooth,
)
from multigrid_dolfinx_tpu.solver import vcycle as vc


LM = 65           # logical points per dim (64 elements)
M, W = 128, 128   # padded storage (rows and cols rounded to 128)


@pytest.fixture(scope="module")
def lev():
    """A pallas-padded float32 hierarchy level (finest of a small 2-level
    problem) plus matching jnp-path hierarchy."""
    cyc = CycleSpec(nu1=2, nu2=2, smoother="rbgs", restriction="pt",
                    tol=1e-6, max_cycles=30, use_pallas=True)
    cfg = models.poisson2d(finest_level=3, coarsest_level=2,
                           coarsest_elements=8, dtype="float32", cycle=cyc)
    hier = build_hierarchy(cfg)
    return cfg, hier


def _rand_state(shape, lm, seed=0):
    rng = np.random.default_rng(seed)
    v = np.zeros(shape, np.float32)
    v[:lm, :lm] = rng.standard_normal((lm, lm)).astype(np.float32)
    return jnp.asarray(v)


def test_padding_shapes(lev):
    cfg, hier = lev
    assert hier.finest.shape == (128, 128)
    assert hier.finest.A.const_weights is not None
    assert dispatch.pallas_eligible(hier.finest.A, hier.finest.shape,
                                    jnp.float32)


def test_jacobi_sweep_matches_jnp(lev):
    cfg, hier = lev
    fl = hier.finest
    lm = fl.n + 1
    v = _rand_state(fl.shape, lm, 1)
    f = fl.b
    want = jacobi_smooth(fl.sm, v, f, 1)
    df = fl.sm.dinv * f
    got = stencil2d.jacobi_sweep(v, df, lm, fl.sm.omega, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-6, atol=2e-6)
    # padding must remain exactly zero
    assert np.all(np.asarray(got)[lm:, :] == 0)
    assert np.all(np.asarray(got)[:, lm:] == 0)


def test_rb_sweep_matches_jnp(lev):
    cfg, hier = lev
    fl = hier.finest
    lm = fl.n + 1
    v = _rand_state(fl.shape, lm, 2)
    f = fl.b
    want = multicolor_gs_smooth(fl.sm, fl.A, v, f, 1)
    got = stencil2d.rb_sweep(v, f, lm, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_residual_matches_jnp(lev):
    cfg, hier = lev
    fl = hier.finest
    lm = fl.n + 1
    v = _rand_state(fl.shape, lm, 3)
    f = fl.b
    want = f - fl.A.apply(v)
    got = stencil2d.residual(v, f, lm, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-6, atol=2e-6)


def test_restrict_pt_matches_jnp(lev):
    cfg, hier = lev
    fl, cl = hier.finest, hier.levels[0]
    lmf, lmc = fl.n + 1, cl.n + 1
    r = _rand_state(fl.shape, lmf, 4)
    want = vc.restrict_level(r, fl, cl, "pt", use_pallas=False)
    got = stencil2d.restrict_pt(r, cl.shape, lmf, lmc, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-6, atol=2e-6)


def test_prolong_matches_jnp(lev):
    cfg, hier = lev
    fl, cl = hier.finest, hier.levels[0]
    lmc = cl.n + 1
    c = _rand_state(cl.shape, lmc, 5)
    want = vc.prolong_level(c, cl, fl, "bilinear", use_pallas=False)
    got = stencil2d.prolong_linear(c, fl.shape, fl.n + 1, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-6, atol=2e-6)


def test_full_pallas_solve_matches_jnp_solve():
    """End-to-end: use_pallas=True (interpret on CPU) == plain jnp solve."""
    base = dict(nu1=2, nu2=2, smoother="rbgs", restriction="pt",
                tol=1e-5, max_cycles=30)
    cyc_p = CycleSpec(use_pallas=True, **base)
    cyc_j = CycleSpec(use_pallas=False, **base)
    cfg_p = models.poisson2d(finest_level=3, dtype="float32", cycle=cyc_p)
    cfg_j = models.poisson2d(finest_level=3, dtype="float32", cycle=cyc_j)
    rp = solve(build_hierarchy(cfg_p), cfg_p.cycle, mode="tol")
    rj = solve(build_hierarchy(cfg_j), cfg_j.cycle, mode="tol")
    assert bool(rp.converged)
    assert int(rp.num_cycles) == int(rj.num_cycles)
    lm = cfg_p.hierarchy.elements_at(3) + 1
    np.testing.assert_allclose(
        np.asarray(rp.u)[:lm, :lm], np.asarray(rj.u)[:lm, :lm],
        rtol=1e-4, atol=1e-5,
    )


# ----------------------------------------------------------------------
# 3D kernels
# ----------------------------------------------------------------------

@pytest.fixture(scope="module")
def lev3d():
    cyc = CycleSpec(nu1=2, nu2=2, smoother="rbgs", restriction="pt",
                    tol=0.0, rtol=1e-6, max_cycles=30, use_pallas=True)
    cfg = models.poisson3d(finest_level=1, coarsest_level=0,
                           coarsest_elements=8, dtype="float32", cycle=cyc)
    from multigrid_dolfinx_tpu.solver.hierarchy import build_lean_hierarchy

    hier = build_lean_hierarchy(cfg)
    return cfg, hier


def test_3d_eligibility_and_weights(lev3d):
    cfg, hier = lev3d
    fl = hier.finest
    assert dispatch.pallas_eligible(fl.A, fl.shape, jnp.float32)
    wc, woff = dispatch.const7_weights(fl.A)
    # 3D Kuhn P1 == 7-point: wc = 6h, woff = -h at h=1/16
    assert wc == pytest.approx(6.0 / 16.0, rel=1e-6)
    assert woff == pytest.approx(-1.0 / 16.0, rel=1e-6)


def _rand3(shape, lm, seed):
    rng = np.random.default_rng(seed)
    v = np.zeros(shape, np.float32)
    v[:lm, :lm, :lm] = rng.standard_normal((lm,) * 3).astype(np.float32)
    return jnp.asarray(v)


def test_3d_rb_half_sweeps_match_jnp(lev3d):
    from multigrid_dolfinx_tpu.ops.pallas import stencil3d

    cfg, hier = lev3d
    fl = hier.finest
    lm = fl.n + 1
    wc, woff = dispatch.const7_weights(fl.A)
    v = _rand3(fl.shape, lm, 1)
    f = fl.b
    want = multicolor_gs_smooth(fl.sm, fl.A, v, f, 1)
    got = stencil3d.rb_half_sweep(v, f, lm, wc, woff, 0, interpret=True)
    got = stencil3d.rb_half_sweep(got, f, lm, wc, woff, 1, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=3e-5, atol=3e-5)


def test_3d_jacobi_matches_jnp(lev3d):
    from multigrid_dolfinx_tpu.ops.pallas import stencil3d

    cfg, hier = lev3d
    fl = hier.finest
    lm = fl.n + 1
    wc, woff = dispatch.const7_weights(fl.A)
    v = _rand3(fl.shape, lm, 2)
    f = fl.b
    want = jacobi_smooth(fl.sm, v, f, 1, A=fl.A)
    got = stencil3d.jacobi_sweep(v, f, lm, wc, woff, fl.sm.omega,
                                 interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=3e-5, atol=3e-5)


def test_3d_residual_matches_jnp(lev3d):
    from multigrid_dolfinx_tpu.ops.pallas import stencil3d

    cfg, hier = lev3d
    fl = hier.finest
    lm = fl.n + 1
    wc, woff = dispatch.const7_weights(fl.A)
    v = _rand3(fl.shape, lm, 3)
    f = fl.b
    want = f - fl.A.apply(v)
    got = stencil3d.residual(v, f, lm, wc, woff, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=3e-5, atol=3e-5)


def test_3d_transfers_match_jnp(lev3d):
    from multigrid_dolfinx_tpu.ops.pallas import stencil3d

    cfg, hier = lev3d
    fl, cl = hier.finest, hier.levels[0]
    lmf, lmc = fl.n + 1, cl.n + 1
    r = _rand3(fl.shape, lmf, 4)
    want = vc.restrict_level(r, fl, cl, "pt", use_pallas=False)
    got = stencil3d.restrict_pt(r, cl.shape, lmf, lmc, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=3e-5, atol=3e-5)

    c = _rand3(cl.shape, lmc, 5)
    wantp = vc.prolong_level(c, cl, fl, "bilinear", use_pallas=False)
    gotp = stencil3d.prolong_linear(c, fl.shape, lmf, interpret=True)
    np.testing.assert_allclose(np.asarray(gotp), np.asarray(wantp),
                               rtol=3e-5, atol=3e-5)


def test_3d_full_pallas_solve_matches_jnp():
    from multigrid_dolfinx_tpu.solver.hierarchy import build_lean_hierarchy

    base = dict(nu1=2, nu2=2, smoother="rbgs", restriction="pt",
                tol=0.0, rtol=1e-5, max_cycles=30)
    cyc_p = CycleSpec(use_pallas=True, **base)
    cyc_j = CycleSpec(use_pallas=False, **base)
    cfg_p = models.poisson3d(finest_level=1, coarsest_level=0,
                             coarsest_elements=8, dtype="float32",
                             cycle=cyc_p)
    rp = solve(build_lean_hierarchy(cfg_p), cyc_p, mode="tol")
    cfg_j = cfg_p.replace(cycle=cyc_j)
    rj = solve(build_lean_hierarchy(cfg_j), cyc_j, mode="tol")
    assert bool(rp.converged)
    assert int(rp.num_cycles) == int(rj.num_cycles)
    lm = cfg_p.hierarchy.elements_at(1) + 1
    np.testing.assert_allclose(
        np.asarray(rp.u)[:lm, :lm, :lm], np.asarray(rj.u)[:lm, :lm, :lm],
        rtol=1e-4, atol=1e-5,
    )


def test_3d_rb_fused_matches_half_sweeps(lev3d):
    from multigrid_dolfinx_tpu.ops.pallas import stencil3d

    cfg, hier = lev3d
    fl = hier.finest
    lm = fl.n + 1
    wc, woff = dispatch.const7_weights(fl.A)
    v = _rand3(fl.shape, lm, 7)
    f = fl.b
    want = stencil3d.rb_half_sweep(v, f, lm, wc, woff, 0, interpret=True)
    want = stencil3d.rb_half_sweep(want, f, lm, wc, woff, 1, interpret=True)
    got = stencil3d.rb_sweep_fused(v, f, lm, wc, woff, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-6, atol=2e-6)


def test_3d_rb_double_sweep_matches_two_sweeps(lev3d, monkeypatch):
    """rb_sweep2_fused (two full RB sweeps in ONE rolling HBM pass, h=4
    dependency pyramid) == two sequential rb_sweep_fused calls, and the
    smoother pairs sweeps through it for even sweep counts.  Opt-in knob
    (default off — slower than two singles on v5e, see rb_sweep2_fused)."""
    from multigrid_dolfinx_tpu.ops.pallas import stencil3d

    monkeypatch.setenv("MG_RB2", "1")
    cfg, hier = lev3d
    fl = hier.finest
    lm = fl.n + 1
    wc, woff = dispatch.const7_weights(fl.A)
    v = _rand3(fl.shape, lm, 11)
    f = fl.b
    want = stencil3d.rb_sweep_fused(v, f, lm, wc, woff, interpret=True)
    want = stencil3d.rb_sweep_fused(want, f, lm, wc, woff, interpret=True)
    got = stencil3d.rb_sweep2_fused(v, f, lm, wc, woff, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-6, atol=2e-6)
    # odd sweep counts via the smoother: pair + single tail == 3 singles
    want3 = stencil3d.rb_sweep_fused(want, f, lm, wc, woff, interpret=True)
    got3 = smooth(fl.sm, fl.A, v, f, 3, "rbgs", use_pallas=True)
    np.testing.assert_allclose(np.asarray(got3), np.asarray(want3),
                               rtol=2e-6, atol=2e-6)


@pytest.mark.parametrize("tz", [1, 2])
def test_3d_rolling_small_tz_output_offsets(lev3d, monkeypatch, tz):
    """Rolling kernels with tz < h: output offsets are NOT just {0, h, 2h}
    (bottom-clipped blocks land on intermediate multiples of tz).  The
    original enumeration left those blocks' output slabs unwritten —
    silent garbage; this pins the general _branch_offsets fix for every
    rolling kernel (single RB sweep h=2, double sweep h=4, jacobi and
    residual h=1) at the VMEM-constrained tz picks (e.g. tz=1 at 768^3)."""
    from multigrid_dolfinx_tpu.ops.pallas import stencil3d

    cfg, hier = lev3d
    fl = hier.finest
    lm = fl.n + 1
    wc, woff = dispatch.const7_weights(fl.A)
    v = _rand3(fl.shape, lm, 13)
    f = fl.b
    want1 = multicolor_gs_smooth(fl.sm, fl.A, v, f, 1)
    want2 = multicolor_gs_smooth(fl.sm, fl.A, want1, f, 1)
    wantr = f - fl.A.apply(v)
    monkeypatch.setenv("MG_TZ", str(tz))
    monkeypatch.setenv("MG_RB2", "1")
    got1 = stencil3d.rb_sweep_fused(v, f, lm, wc, woff, interpret=True)
    got2 = stencil3d.rb_sweep2_fused(v, f, lm, wc, woff, interpret=True)
    gotr = stencil3d.residual(v, f, lm, wc, woff, interpret=True)
    np.testing.assert_allclose(np.asarray(got1), np.asarray(want1),
                               rtol=3e-5, atol=3e-5)
    np.testing.assert_allclose(np.asarray(got2), np.asarray(want2),
                               rtol=3e-5, atol=3e-5)
    np.testing.assert_allclose(np.asarray(gotr), np.asarray(wantr),
                               rtol=3e-5, atol=3e-5)


def test_pallas_solve_reference_jacobi_injection_nonzero_bc():
    """Solve-level Pallas-vs-jnp parity at the reference's OWN smoother/
    restriction family (weighted-Jacobi V(50,50) + injection,
    multigrid.py:223-268) with nonzero Dirichlet boundary values
    (uD = 1 + x^2 + 2y^2 in [1,4] on the boundary): identical cycle
    counts and matching u through the fused 2D kernels.  Closes the
    boundary-semantics hole: the kernel computes
    (1-w)v + (w/4)S(v) + w*df, which is only correct because boundary
    rows of df carry f (= uD) and the interior masks align."""
    base = dict(nu1=50, nu2=50, smoother="jacobi",
                restriction="injection", prolongation="bilinear",
                tol=2e-4, max_cycles=30)
    cyc_j = CycleSpec(**base, use_pallas=False)
    cyc_p = CycleSpec(**base, use_pallas=True)
    cfg_j = models.poisson2d(finest_level=3, coarsest_level=2,
                             coarsest_elements=8, dtype="float32",
                             cycle=cyc_j)
    cfg_p = models.poisson2d(finest_level=3, coarsest_level=2,
                             coarsest_elements=8, dtype="float32",
                             cycle=cyc_p)
    # use_pallas pads storage to (128,128) tiles; build both on that
    # layout so the comparison isolates the kernel path.
    pad = [(128, 128), (128, 128)]
    hj = build_hierarchy(cfg_j, pad_points=pad)
    hp = build_hierarchy(cfg_p, pad_points=pad)
    rj = solve(hj, cyc_j, mode="tol")
    rp = solve(hp, cyc_p, mode="tol")
    assert bool(rp.converged)
    assert int(rp.num_cycles) == int(rj.num_cycles)
    lm = 65
    np.testing.assert_allclose(
        np.asarray(rp.u)[:lm, :lm], np.asarray(rj.u)[:lm, :lm],
        rtol=2e-5, atol=2e-5,
    )
    # boundary rows must carry the exact Dirichlet data
    g = np.asarray(hj.finest.g)
    up = np.asarray(rp.u)
    np.testing.assert_allclose(up[0, :lm], g[0, :lm], rtol=1e-6)
    np.testing.assert_allclose(up[:lm, lm - 1], g[:lm, lm - 1], rtol=1e-6)


# ----------------------------------------------------------------------
# Variable-coefficient (planes) kernels
# ----------------------------------------------------------------------

@pytest.fixture(scope="module")
def lev_kappa():
    """Pallas-padded variable-kappa 2D hierarchy (planes operators —
    ineligible for the const kernels, exercising the planes path)."""
    cyc = CycleSpec(nu1=2, nu2=2, smoother="rbgs", restriction="pt",
                    tol=0.0, rtol=1e-6, max_cycles=30, use_pallas=True)
    cfg = models.variable_coefficient_2d(
        lambda x, y: 1.0 + x + 2.0 * y, finest_level=3, coarsest_level=2,
        coarsest_elements=8, dtype="float32", cycle=cyc)
    hier = build_hierarchy(cfg)
    return cfg, hier


def test_planes_eligibility(lev_kappa):
    cfg, hier = lev_kappa
    fl = hier.finest
    assert fl.A.planes is not None
    assert not dispatch.pallas_eligible(fl.A, fl.shape, jnp.float32)
    assert dispatch.pallas_planes_eligible(fl.A, fl.shape, jnp.float32)


def test_planes_jacobi_matches_jnp(lev_kappa):
    cfg, hier = lev_kappa
    fl = hier.finest
    v = _rand_state(fl.shape, fl.n + 1, 11)
    f = fl.b
    want = jacobi_smooth(fl.sm, v, f, 1, A=fl.A)
    got = stencil2d.planes_jacobi_sweep(v, f, fl.A.planes, fl.A.offsets,
                                        fl.sm.omega, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)
    assert np.all(np.asarray(got)[fl.n + 1:, :] == 0)


def test_planes_gs_matches_jnp(lev_kappa):
    cfg, hier = lev_kappa
    fl = hier.finest
    v = _rand_state(fl.shape, fl.n + 1, 12)
    f = fl.b
    want = multicolor_gs_smooth(fl.sm, fl.A, v, f, 1)
    axis_only = fl.A.axis_only and fl.A.radius == 1
    got = stencil2d.planes_gs_sweep(v, f, fl.A.planes, fl.A.offsets,
                                    axis_only, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_planes_residual_matches_jnp(lev_kappa):
    cfg, hier = lev_kappa
    fl = hier.finest
    v = _rand_state(fl.shape, fl.n + 1, 13)
    f = fl.b
    want = f - fl.A.apply(v)
    got = stencil2d.planes_residual(v, f, fl.A.planes, fl.A.offsets,
                                    interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_planes_full_solve_matches_jnp_path(lev_kappa):
    """Variable-kappa solve through the planes kernels == jnp path:
    same cycle count, same solution."""
    cfg, hier = lev_kappa
    rp = solve(hier, cfg.cycle, mode="tol")
    import dataclasses as dc

    cyc_j = dc.replace(cfg.cycle, use_pallas=False)
    rj = solve(hier, cyc_j, mode="tol")
    assert bool(rp.converged)
    assert int(rp.num_cycles) == int(rj.num_cycles)
    lm = hier.finest.n + 1
    np.testing.assert_allclose(
        np.asarray(rp.u)[:lm, :lm], np.asarray(rj.u)[:lm, :lm],
        rtol=3e-5, atol=3e-5,
    )


def test_3d_prolong_add_matches_separate(lev3d):
    """Fused v + P(c) kernel == prolong then add (the V-cycle correction,
    reference multigrid.py:258-260, in one HBM pass)."""
    from multigrid_dolfinx_tpu.ops.pallas import stencil3d

    cfg, hier = lev3d
    fl = hier.finest
    cl = hier.levels[-2]
    lmf = fl.n + 1
    lmc = cl.n + 1
    rng = np.random.default_rng(21)
    c = np.zeros(cl.shape, np.float32)
    c[:lmc, :lmc, :lmc] = rng.standard_normal((lmc,) * 3)
    v = _rand3(fl.shape, lmf, 22)
    c = jnp.asarray(c)
    want = v + stencil3d.prolong_linear(c, fl.shape, lmf, interpret=True)
    got = stencil3d.prolong_linear_add(c, v, lmf, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-6, atol=2e-6)


def test_3d_restrict_residual_fused_matches_separate(lev3d):
    """Fused P^T(f - A v) kernel == residual kernel then restrict kernel
    (the V-cycle's coarse RHS in one pass over v and f)."""
    from multigrid_dolfinx_tpu.ops.pallas import stencil3d

    cfg, hier = lev3d
    fl = hier.finest
    cl = hier.levels[-2]
    lmf, lmc = fl.n + 1, cl.n + 1
    wc, woff = dispatch.const7_weights(fl.A)
    v = _rand3(fl.shape, lmf, 31)
    f = fl.b
    r = stencil3d.residual(v, f, lmf, wc, woff, interpret=True)
    want = stencil3d.restrict_pt(r, cl.shape, lmf, lmc, interpret=True)
    got = stencil3d.restrict_residual_pt(v, f, cl.shape, lmf, lmc,
                                         wc, woff, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-6, atol=2e-6)


# ----------------------------------------------------------------------
# Variable-coefficient (planes) kernels — 3D
# ----------------------------------------------------------------------

@pytest.fixture(scope="module")
def lev_kappa3():
    """Pallas-padded variable-kappa 3D hierarchy: the finest operator is
    a rediscretized radius-1 planes operator (variable kappa breaks the
    7-point cancellation -> non-axis offsets -> 2^3-color GS), the coarse
    operator is Galerkin RAP (27-point box)."""
    cyc = CycleSpec(nu1=2, nu2=2, smoother="rbgs", restriction="pt",
                    tol=0.0, rtol=1e-5, max_cycles=30, use_pallas=True)
    cfg = models.variable_coefficient_3d(
        lambda x, y, z: 1.0 + x + 2.0 * y + z, finest_level=1,
        coarsest_level=0, coarsest_elements=8, dtype="float32", cycle=cyc)
    hier = build_hierarchy(cfg)
    return cfg, hier


def test_planes3_eligibility(lev_kappa3):
    cfg, hier = lev_kappa3
    fl = hier.finest
    assert fl.A.planes is not None
    assert fl.A.radius == 1
    assert not dispatch.pallas_eligible(fl.A, fl.shape, jnp.float32)
    assert dispatch.pallas_planes_eligible(fl.A, fl.shape, jnp.float32)


def test_planes3_jacobi_matches_jnp(lev_kappa3):
    from multigrid_dolfinx_tpu.ops.pallas import stencil3d

    cfg, hier = lev_kappa3
    fl = hier.finest
    v = _rand3(fl.shape, fl.n + 1, 41)
    f = fl.b
    want = jacobi_smooth(fl.sm, v, f, 1, A=fl.A)
    got = stencil3d.planes3_jacobi_sweep(v, f, fl.A.planes, fl.A.offsets,
                                         fl.sm.omega, interpret=True)
    assert got is not None
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)
    assert np.all(np.asarray(got)[fl.n + 1:, :, :] == 0)


def test_planes3_gs_matches_jnp(lev_kappa3):
    """2^3-coordinate-parity multicolor GS through the per-color kernel
    passes == the jnp multicolor_gs_smooth (same color order)."""
    from multigrid_dolfinx_tpu.ops.pallas import stencil3d

    cfg, hier = lev_kappa3
    fl = hier.finest
    v = _rand3(fl.shape, fl.n + 1, 42)
    f = fl.b
    want = multicolor_gs_smooth(fl.sm, fl.A, v, f, 1)
    got = stencil3d.planes3_gs_sweep(v, f, fl.A.planes, fl.A.offsets,
                                     interpret=True)
    assert got is not None
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_planes3_gs_axis_only_colors():
    """Axis-only planes operators take the sum-parity 2-color schedule —
    run the const-7 operator's planes form (full, non-lean hierarchy)
    through the planes kernel and compare against the jnp red-black
    sweep."""
    from multigrid_dolfinx_tpu.ops.pallas import stencil3d

    cyc = CycleSpec(nu1=2, nu2=2, smoother="rbgs", restriction="pt",
                    tol=0.0, rtol=1e-6, max_cycles=30, use_pallas=True)
    cfg = models.poisson3d(finest_level=1, coarsest_level=0,
                           coarsest_elements=8, dtype="float32", cycle=cyc)
    hier = build_hierarchy(cfg)
    fl = hier.finest
    assert fl.A.planes is not None and fl.A.axis_only
    v = _rand3(fl.shape, fl.n + 1, 43)
    f = fl.b
    want = multicolor_gs_smooth(fl.sm, fl.A, v, f, 1)
    got = stencil3d.planes3_gs_sweep(v, f, fl.A.planes, fl.A.offsets,
                                     interpret=True)
    assert got is not None
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_planes3_residual_matches_jnp(lev_kappa3):
    from multigrid_dolfinx_tpu.ops.pallas import stencil3d

    cfg, hier = lev_kappa3
    fl = hier.finest
    v = _rand3(fl.shape, fl.n + 1, 44)
    f = fl.b
    want = f - fl.A.apply(v)
    got = stencil3d.planes3_residual(v, f, fl.A.planes, fl.A.offsets,
                                     interpret=True)
    assert got is not None
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_planes3_full_solve_matches_jnp_path(lev_kappa3):
    """Variable-kappa 3D solve through the planes kernels (smoothing +
    residual + pt transfers, Galerkin coarse level) == jnp path: same
    cycle count, same solution."""
    cfg, hier = lev_kappa3
    rp = solve(hier, cfg.cycle, mode="tol")
    import dataclasses as dc

    cyc_j = dc.replace(cfg.cycle, use_pallas=False)
    rj = solve(hier, cyc_j, mode="tol")
    assert bool(rp.converged)
    assert int(rp.num_cycles) == int(rj.num_cycles)
    lm = hier.finest.n + 1
    np.testing.assert_allclose(
        np.asarray(rp.u)[:lm, :lm, :lm], np.asarray(rj.u)[:lm, :lm, :lm],
        rtol=3e-5, atol=3e-5,
    )


def test_planes3_screened_solve_matches_jnp_path():
    """3D screened Poisson (-Laplace u + c u = f): the reaction term's
    15-point box stencil takes the 2^3-color planes kernels; pallas ==
    jnp path (same cycle count, same u) and the solve lands on the
    manufactured solution."""
    cyc = CycleSpec(nu1=2, nu2=2, smoother="rbgs", restriction="pt",
                    tol=0.0, rtol=1e-5, max_cycles=30, use_pallas=True)
    cfg = models.screened_poisson3d(
        c=10.0, finest_level=1, coarsest_level=0, coarsest_elements=8,
        dtype="float32", cycle=cyc)
    hier = build_hierarchy(cfg)
    fl = hier.finest
    assert fl.A.planes is not None and not fl.A.axis_only
    assert dispatch.pallas_planes_eligible(fl.A, fl.shape, jnp.float32)
    rp = solve(hier, cfg.cycle, mode="tol")
    import dataclasses as dc

    rj = solve(hier, dc.replace(cfg.cycle, use_pallas=False), mode="tol")
    assert bool(rp.converged)
    assert int(rp.num_cycles) == int(rj.num_cycles)
    lm = fl.n + 1
    np.testing.assert_allclose(
        np.asarray(rp.u)[:lm, :lm, :lm], np.asarray(rj.u)[:lm, :lm, :lm],
        rtol=3e-5, atol=3e-5,
    )
    u = np.asarray(rp.u)
    assert abs(u[lm // 2, lm // 2, lm // 2] - 2.5) < 2e-2


def test_fused_tail_matches_per_level_kernels(monkeypatch):
    """The two-kernel fused coarse tail (ops.pallas.stencil3d_tail) is
    bitwise-equivalent to the per-level kernel V-cycle it replaces: same
    candidate expressions, masks, [1,2,1]^3 restriction, trilinear
    prolongation — only the launch structure changes."""
    from multigrid_dolfinx_tpu import models
    from multigrid_dolfinx_tpu.config import CycleSpec
    from multigrid_dolfinx_tpu.solver.hierarchy import build_lean_hierarchy
    from multigrid_dolfinx_tpu.solver.vcycle import (
        _fused_tail_levels,
        vcycle,
    )

    cyc = CycleSpec(nu1=2, nu2=2, smoother="rbgs", restriction="pt",
                    tol=0.0, rtol=1e-6, max_cycles=40, use_pallas=True,
                    track_error=False)
    cfg = models.poisson3d(finest_level=3, coarsest_level=1,
                           coarsest_elements=4, dtype="float32", cycle=cyc)
    hier = build_lean_hierarchy(cfg)
    L = hier.num_levels - 1
    assert _fused_tail_levels(hier, cyc, L - 1) is not None

    f = hier.finest.b
    v0 = jnp.zeros_like(f)
    v_tail = vcycle(hier, cyc, L, v0, f)

    monkeypatch.setenv("MG_TAIL_LM", "0")       # force per-level kernels
    assert _fused_tail_levels(hier, cyc, L - 1) is None
    v_ref = vcycle(hier, cyc, L, v0, f)
    np.testing.assert_allclose(np.asarray(v_tail), np.asarray(v_ref),
                               rtol=0.0, atol=1e-6)


def test_cycle_step_fusion_matches_per_op_kernels(monkeypatch):
    """The cycle-step fusion kernels (ops.pallas.stencil3d_cycle): the
    last-pre-smooth+residual+restrict pass and the prolong+correct+
    first-post-smooth pass are bitwise-equivalent to the per-op kernel
    chain they replace, across full V-cycles and at nu=1 edges."""
    from multigrid_dolfinx_tpu import models
    from multigrid_dolfinx_tpu.config import CycleSpec
    from multigrid_dolfinx_tpu.solver.hierarchy import build_lean_hierarchy
    from multigrid_dolfinx_tpu.solver import vcycle as vc

    for nu in (2, 1):
        cyc = CycleSpec(nu1=nu, nu2=nu, smoother="rbgs", restriction="pt",
                        tol=0.0, rtol=1e-6, max_cycles=40,
                        use_pallas=True, track_error=False)
        cfg = models.poisson3d(finest_level=3, coarsest_level=1,
                               coarsest_elements=4, dtype="float32",
                               cycle=cyc)
        hier = build_lean_hierarchy(cfg)
        L = hier.num_levels - 1
        f = hier.finest.b
        v0 = jnp.zeros_like(f)
        monkeypatch.setenv("MG_CYCLE_FUSE", "1")
        v_fused = vc.vcycle(hier, cyc, L, v0, f)
        monkeypatch.setenv("MG_CYCLE_FUSE", "0")
        v_ref = vc.vcycle(hier, cyc, L, v0, f)
        np.testing.assert_allclose(np.asarray(v_fused), np.asarray(v_ref),
                                   rtol=0.0, atol=1e-6)


def test_cycle_fusion_kernels_direct():
    """Direct interpret-mode equivalence of both fusion kernels vs the
    validated per-op kernels on a mid-size aligned shape."""
    from multigrid_dolfinx_tpu.ops.pallas import stencil3d as s3
    from multigrid_dolfinx_tpu.ops.pallas import stencil3d_cycle as sc

    rng = np.random.default_rng(7)
    lmf, lmc = 33, 17
    fs, cs = (40, 40, 128), (24, 24, 128)
    wc, woff = 6.0, -1.0

    def mk(shape, lm, interior_only=False):
        x = rng.standard_normal(shape).astype(np.float32)
        m = np.zeros(shape, bool)
        if interior_only:
            m[1:lm - 1, 1:lm - 1, 1:lm - 1] = True
        else:
            m[:lm, :lm, :lm] = True
        return jnp.asarray(np.where(m, x, 0.0))

    v, f = mk(fs, lmf), mk(fs, lmf)
    c = mk(cs, lmc, interior_only=True)

    v1 = s3.rb_sweep_fused(v, f, lmf, wc, woff, interpret=True)
    fc_ref = s3.restrict_residual_pt(v1, f, cs, lmf, lmc, wc, woff,
                                     interpret=True)
    out = sc.rb_residual_restrict_fused(v, f, cs, lmf, lmc, wc, woff,
                                        interpret=True)
    assert out is not None
    va, fca = out
    np.testing.assert_allclose(np.asarray(va), np.asarray(v1), atol=1e-6)
    np.testing.assert_allclose(np.asarray(fca), np.asarray(fc_ref),
                               atol=1e-6)

    v2_ref = s3.rb_sweep_fused(
        s3.prolong_linear_add(c, v, lmf, interpret=True), f, lmf,
        wc, woff, interpret=True)
    v2 = sc.prolong_correct_rb_fused(c, v, f, lmf, wc, woff,
                                     interpret=True)
    assert v2 is not None
    np.testing.assert_allclose(np.asarray(v2), np.asarray(v2_ref),
                               atol=1e-6)


def test_fused_residual_mass_norm_matches_reference(monkeypatch):
    """The fused residual+FEM-L2-norm kernel (ops.pallas.stencil3d_norm)
    equals quadratic_form(M, r, r) with r = compute_residual(...) on the
    class-table mass operator, including all boundary classes, and the
    tolerance solve stops at the same cycle count either way."""
    from multigrid_dolfinx_tpu import models
    from multigrid_dolfinx_tpu.config import CycleSpec
    from multigrid_dolfinx_tpu.ops import dispatch
    from multigrid_dolfinx_tpu.ops.operators import quadratic_form
    from multigrid_dolfinx_tpu.ops.pallas import stencil3d_norm
    from multigrid_dolfinx_tpu.solver import fmg
    from multigrid_dolfinx_tpu.solver.hierarchy import build_lean_hierarchy
    from multigrid_dolfinx_tpu.solver.vcycle import compute_residual

    cyc = CycleSpec(nu1=2, nu2=2, smoother="rbgs", restriction="pt",
                    tol=0.0, rtol=1e-6, max_cycles=40,
                    use_pallas=True, track_error=False)
    cfg = models.poisson3d(finest_level=3, coarsest_level=1,
                           coarsest_elements=4, dtype="float32",
                           cycle=cyc)
    hier = build_lean_hierarchy(cfg)
    lv = hier.finest
    lm = lv.n + 1
    rng = np.random.default_rng(11)

    def boxed(x):
        m = np.zeros(x.shape, bool)
        m[:lm, :lm, :lm] = True
        return jnp.asarray(np.where(m, x, 0.0), jnp.float32)

    v = boxed(rng.standard_normal(lv.shape).astype(np.float32))
    f = boxed(rng.standard_normal(lv.shape).astype(np.float32))
    w = dispatch.const7_weights(lv.A)
    q = stencil3d_norm.residual_mass_quad(
        v, f, hier.M_fine.class_tables, hier.M_fine.offsets, lm,
        w[0], w[1], interpret=True)
    assert q is not None
    r = compute_residual(lv, v, f, use_pallas=True)
    q_ref = quadratic_form(hier.M_fine, r, r)
    np.testing.assert_allclose(float(q), float(q_ref),
                               rtol=2e-5, atol=0.0)

    # end-to-end: identical iteration counts with the fused check on/off
    f0 = hier.finest.b
    v0 = jnp.zeros_like(f0)
    monkeypatch.setenv("MG_FUSED_NORM", "1")
    res_a = fmg.tolerance_solve(hier, cyc, v0, f0)
    monkeypatch.setenv("MG_FUSED_NORM", "0")
    res_b = fmg.tolerance_solve(hier, cyc, v0, f0)
    assert int(res_a.num_cycles) == int(res_b.num_cycles)
    ka = int(res_a.num_cycles)
    np.testing.assert_allclose(
        np.asarray(res_a.res_hist[:ka]), np.asarray(res_b.res_hist[:ka]),
        rtol=1e-5)


# ----------------------------------------------------------------------
# Distributed 2D halo-strip kernels (stencil2d_dist) vs the single-device
# kernels on the same GLOBAL data — shard-by-shard, with multi-block
# shards (nprog > 1) so the window splicing at block seams is exercised,
# not just the single-window case the shard_map solve test covers.
# ----------------------------------------------------------------------

def _global_2d(Mg, W, lm, seed=0):
    rng = np.random.default_rng(seed)
    v = jnp.asarray(rng.standard_normal((Mg, W)), jnp.float32)
    f = jnp.asarray(rng.standard_normal((Mg, W)), jnp.float32)
    return v, f


def _shards(x, nsh, hp):
    """Split global rows into nsh shards; return (shard, lo, hi) per
    shard with zero strips at the domain edges."""
    M = x.shape[0] // nsh
    z = jnp.zeros((hp, x.shape[1]), x.dtype)
    out = []
    for s in range(nsh):
        lo = x[s * M - hp:s * M] if s > 0 else z
        hi = x[(s + 1) * M:(s + 1) * M + hp] if s < nsh - 1 else z
        out.append((x[s * M:(s + 1) * M], lo, hi))
    return out


def test_dist2d_rb_sweep_matches_single_device():
    from multigrid_dolfinx_tpu.ops.pallas import stencil2d_dist as s2d

    Mg, W, lm = 1024, 128, 1000   # 2 shards x 512 rows = 2 blocks each
    v, f = _global_2d(Mg, W, lm)
    want = stencil2d.rb_sweep(v, f, lm, interpret=True)
    for s, (vs, vlo, vhi) in enumerate(_shards(v, 2, s2d.HP)):
        fs, flo, fhi = _shards(f, 2, s2d.HP)[s]
        got = s2d.rb_sweep_dist(vs, fs, vlo, vhi, flo, fhi, lm,
                                4.0, -1.0, s * 512, interpret=True)
        np.testing.assert_array_equal(np.asarray(got),
                                      np.asarray(want[s * 512:(s + 1) * 512]))


def test_dist2d_jacobi_and_residual_match_single_device():
    from multigrid_dolfinx_tpu.ops.pallas import stencil2d_dist as s2d

    Mg, W, lm = 1024, 128, 1021
    v, f = _global_2d(Mg, W, lm, seed=1)
    # df = Dinv*f with the Dirichlet-identity diagonal: 1/wc at interior
    # rows, 1 at bc/padding rows (reference getJacobiMatrices semantics)
    gr = jnp.arange(Mg)[:, None]
    gc = jnp.arange(W)[None, :]
    interior = ((gr >= 1) & (gr <= lm - 2) & (gc >= 1) & (gc <= lm - 2))
    df = jnp.where(interior, f / 4.0, f)
    want_j = stencil2d.jacobi_sweep(v, df, lm, 2.0 / 3.0, interpret=True)
    want_r = stencil2d.residual(v, f, lm, interpret=True)
    for s, (vs, vlo, vhi) in enumerate(_shards(v, 2, s2d.HP)):
        fs = f[s * 512:(s + 1) * 512]
        got_j = s2d.jacobi_sweep_dist(vs, fs, vlo, vhi, lm, 4.0, -1.0,
                                      2.0 / 3.0, s * 512, interpret=True)
        # single-device jacobi adds w*df with df precomputed; the dist
        # kernel folds the division by wc — identical for wc = 4
        np.testing.assert_allclose(
            np.asarray(got_j), np.asarray(want_j[s * 512:(s + 1) * 512]),
            rtol=0, atol=1e-6)
        got_r = s2d.residual_dist(vs, fs, vlo, vhi, lm, 4.0, -1.0,
                                  s * 512, interpret=True)
        np.testing.assert_array_equal(
            np.asarray(got_r), np.asarray(want_r[s * 512:(s + 1) * 512]))


def test_dist2d_transfers_match_single_device():
    from multigrid_dolfinx_tpu.ops.pallas import stencil2d_dist as s2d

    Mg, Wf, lmf, lmc = 1024, 256, 1021, 511
    r, _ = _global_2d(Mg, Wf, lmf, seed=2)
    want = stencil2d.restrict_pt(r, (Mg // 2, Wf // 2), lmf, lmc,
                                 interpret=True)
    for s, (rs, rlo, rhi) in enumerate(_shards(r, 2, s2d.HPR)):
        got = s2d.restrict_pt_dist(rs, rlo, rhi, (256, Wf // 2),
                                   lmf, lmc, s * 512, interpret=True)
        np.testing.assert_array_equal(
            np.asarray(got), np.asarray(want[s * 256:(s + 1) * 256]))

    c, _ = _global_2d(Mg // 2, Wf // 2, lmc, seed=3)
    vfine, _ = _global_2d(Mg, Wf, lmf, seed=4)
    want_p = vfine + stencil2d.prolong_linear(c, (Mg, Wf), lmf,
                                              interpret=True)
    for s, (cs, clo, chi) in enumerate(_shards(c, 2, s2d.HP)):
        vs = vfine[s * 512:(s + 1) * 512]
        got_p = s2d.prolong_add_dist(cs, clo, chi, vs, lmf, s * 512,
                                     interpret=True)
        np.testing.assert_allclose(
            np.asarray(got_p), np.asarray(want_p[s * 512:(s + 1) * 512]),
            rtol=0, atol=1e-6)


@pytest.mark.parametrize("diagonal", ["right", "left"])
def test_tet_residual_mass_norm_matches_reference(diagonal):
    """residual_tet_quad (exact per-tetrahedron geometric quadratic
    form) equals quadratic_form(M, r, r) on the class-table consistent
    mass for BOTH Kuhn diagonals — no boundary-shell correction exists,
    so this pins boundary/edge/corner cells too."""
    from multigrid_dolfinx_tpu import models
    from multigrid_dolfinx_tpu.config import CycleSpec
    from multigrid_dolfinx_tpu.ops import dispatch
    from multigrid_dolfinx_tpu.ops.operators import quadratic_form
    from multigrid_dolfinx_tpu.ops.pallas import stencil3d_norm
    from multigrid_dolfinx_tpu.solver.hierarchy import build_lean_hierarchy
    from multigrid_dolfinx_tpu.solver.vcycle import compute_residual
    import dataclasses

    cyc = CycleSpec(nu1=2, nu2=2, smoother="rbgs", restriction="pt",
                    tol=0.0, rtol=1e-6, max_cycles=40,
                    use_pallas=True, track_error=False)
    cfg = models.poisson3d(finest_level=3, coarsest_level=1,
                           coarsest_elements=4, dtype="float32",
                           cycle=cyc)
    cfg = dataclasses.replace(
        cfg, problem=dataclasses.replace(cfg.problem, diagonal=diagonal))
    hier = build_lean_hierarchy(cfg)
    lv = hier.finest
    lm = lv.n + 1
    assert hier.M_fine.uniform_p1_mass == diagonal
    rng = np.random.default_rng(7)

    def boxed(x):
        m = np.zeros(x.shape, bool)
        m[:lm, :lm, :lm] = True
        return jnp.asarray(np.where(m, x, 0.0), jnp.float32)

    v = boxed(rng.standard_normal(lv.shape).astype(np.float32))
    f = boxed(rng.standard_normal(lv.shape).astype(np.float32))
    w = dispatch.const7_weights(lv.A)
    q = stencil3d_norm.residual_tet_quad(
        v, f, lm, w[0], w[1], diagonal, interpret=True)
    assert q is not None
    r = compute_residual(lv, v, f, use_pallas=True)
    q_ref = quadratic_form(hier.M_fine, r, r)
    np.testing.assert_allclose(float(q), float(q_ref),
                               rtol=2e-5, atol=0.0)


def test_fused_chebyshev_phase_matches_jnp():
    """The momentum-form fused Chebyshev step kernel
    (ops.pallas.stencil3d_cheby) reproduces chebyshev_smooth's p-form
    recurrence (algebraically identical; f32 rounding only)."""
    from multigrid_dolfinx_tpu import models
    from multigrid_dolfinx_tpu.config import CycleSpec
    from multigrid_dolfinx_tpu.ops import smoothers
    from multigrid_dolfinx_tpu.ops.pallas import stencil3d_cheby
    from multigrid_dolfinx_tpu.solver.hierarchy import build_lean_hierarchy

    cyc = CycleSpec(nu1=2, nu2=2, smoother="chebyshev", restriction="pt",
                    tol=0.0, rtol=1e-6, max_cycles=40,
                    use_pallas=True, track_error=False)
    cfg = models.poisson3d(finest_level=3, coarsest_level=1,
                           coarsest_elements=4, dtype="float32",
                           cycle=cyc)
    hier = build_lean_hierarchy(cfg)
    lv = hier.finest
    rng = np.random.default_rng(23)
    lm = lv.n + 1
    m = np.zeros(lv.shape, bool)
    m[:lm, :lm, :lm] = True
    v = jnp.asarray(np.where(m, rng.standard_normal(lv.shape), 0.0),
                    jnp.float32)
    f = lv.b
    ref = smoothers.chebyshev_smooth(lv.sm, lv.A, v, f, 2)
    out = stencil3d_cheby.chebyshev_phase_fused(
        lv.sm, lv.A, v, f, 2, interpret=True)
    assert out is not None
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=0.0, atol=5e-6)
    # explicit-degree (legacy rounds) form too
    import dataclasses
    sm4 = dataclasses.replace(lv.sm, cheby_degree=3)
    ref4 = smoothers.chebyshev_smooth(sm4, lv.A, v, f, 2)
    out4 = stencil3d_cheby.chebyshev_phase_fused(
        sm4, lv.A, v, f, 2, interpret=True)
    assert out4 is not None
    np.testing.assert_allclose(np.asarray(out4), np.asarray(ref4),
                               rtol=0.0, atol=5e-6)


# ----------------------------------------------------------------------
# 2D radius-2 (P2) planes kernels
# ----------------------------------------------------------------------

@pytest.fixture(scope="module")
def lev_p2_2d():
    cyc = CycleSpec(nu1=2, nu2=2, smoother="rbgs", restriction="pt",
                    tol=0.0, rtol=1e-5, max_cycles=30, use_pallas=True)
    cfg = models.poisson2d_p2(finest_level=2, coarsest_level=1,
                              coarsest_elements=16, dtype="float32",
                              cycle=cyc)
    hier = build_hierarchy(cfg)
    return cfg, hier


def test_planes2_radius2_eligibility(lev_p2_2d):
    cfg, hier = lev_p2_2d
    fl = hier.finest
    assert fl.A.radius == 2
    assert dispatch.pallas_planes_eligible(fl.A, fl.shape, jnp.float32)


def test_planes2_radius2_gs_matches_jnp(lev_p2_2d):
    """Radius-2 (P2) mod-3 multicolor GS through the single-window 2D
    planes kernel == ops.smoothers.multicolor_gs_smooth: all 9 color
    stages run inside one 24-row-halo window, so the per-stage edge
    invalidation (9 stages x radius 2 = 18 rows) never reaches the
    emitted block."""
    cfg, hier = lev_p2_2d
    fl = hier.finest
    lm = fl.n + 1
    v = _rand_state(fl.shape, lm, 21)
    f = fl.b
    want = multicolor_gs_smooth(fl.sm, fl.A, v, f, 1)
    got = stencil2d.planes_gs_sweep(v, f, fl.A.planes, fl.A.offsets,
                                    False, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_planes2_radius2_residual_matches_jnp(lev_p2_2d):
    cfg, hier = lev_p2_2d
    fl = hier.finest
    lm = fl.n + 1
    v = _rand_state(fl.shape, lm, 22)
    f = fl.b
    want = f - fl.A.apply(v)
    got = stencil2d.planes_residual(v, f, fl.A.planes, fl.A.offsets,
                                    interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_p2_2d_solve_pallas_matches_jnp_path(lev_p2_2d):
    """P2 2D solve through the radius-2 planes kernels == jnp path:
    same cycle count, same solution."""
    cfg, hier = lev_p2_2d
    rp = solve(hier, cfg.cycle, mode="tol")
    cyc_j = dataclasses.replace(cfg.cycle, use_pallas=False)
    rj = solve(hier, cyc_j, mode="tol")
    assert bool(rp.converged)
    assert int(rp.num_cycles) == int(rj.num_cycles)
    np.testing.assert_allclose(np.asarray(rp.u), np.asarray(rj.u),
                               rtol=0.0, atol=5e-5)
