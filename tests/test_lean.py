"""Lean (O(1)-host-memory, plane-free) hierarchy: bit-equivalence with the
full assembler and scale-mode norm semantics."""
import numpy as np
import pytest
import jax.numpy as jnp

from multigrid_dolfinx_tpu import build_hierarchy, models, solve
from multigrid_dolfinx_tpu.config import CycleSpec
from multigrid_dolfinx_tpu.solver.hierarchy import build_lean_hierarchy


CYC = CycleSpec(nu1=2, nu2=2, smoother="rbgs", restriction="pt",
                tol=0.0, rtol=1e-6, max_cycles=40)


@pytest.mark.parametrize("ndim,finest", [(2, 3), (3, 2)])
def test_lean_matches_full_hierarchy(ndim, finest):
    model = models.poisson2d if ndim == 2 else models.poisson3d
    cfg = model(finest_level=finest, coarsest_level=1, dtype="float32",
                cycle=CYC)
    h_full = build_hierarchy(cfg)
    h_lean = build_lean_hierarchy(cfg)

    for lf, ll in zip(h_full.levels, h_lean.levels):
        # identical RHS/Dirichlet data, but no stored planes or Dinv
        np.testing.assert_array_equal(np.asarray(lf.b), np.asarray(ll.b))
        np.testing.assert_array_equal(np.asarray(lf.g), np.asarray(ll.g))
        assert ll.A.planes is None
        assert ll.sm.dinv is None
        assert ll.A.const_weights is not None
        # operator actions agree
        rng = np.random.default_rng(lf.level)
        v = jnp.asarray(rng.standard_normal(lf.shape), jnp.float32)
        np.testing.assert_allclose(
            np.asarray(lf.A.apply(v)), np.asarray(ll.A.apply(v)),
            rtol=1e-6, atol=1e-6,
        )

    r_full = solve(h_full, CYC, mode="tol")
    r_lean = solve(h_lean, CYC, mode="tol")
    assert bool(r_lean.converged)
    assert int(r_lean.num_cycles) == int(r_full.num_cycles)
    np.testing.assert_array_equal(np.asarray(r_lean.u), np.asarray(r_full.u))


@pytest.mark.parametrize("ndim,finest", [(2, 3), (3, 2)])
def test_lean_error_norm_finite_and_matches_full(ndim, finest):
    """Scale mode keeps the FEM-L2 error-vs-exact norm (reference
    err_calculator, multigrid.py:213-218): ErrorQuad is all-static and
    u*(x_q) is evaluated on the fly, so lean err_hist is finite and equals
    the full hierarchy's to fp64 roundoff."""
    model = models.poisson2d if ndim == 2 else models.poisson3d
    cfg = model(finest_level=finest, coarsest_level=1, dtype="float64",
                cycle=CYC)
    from multigrid_dolfinx_tpu.solver.fmg import error_norm

    h_full = build_hierarchy(cfg)
    h_lean = build_lean_hierarchy(cfg)
    r_full = solve(h_full, CYC, mode="tol")
    r_lean = solve(h_lean, CYC, mode="tol")
    k = int(r_lean.num_cycles)
    eh_lean = np.asarray(r_lean.err_hist)[:k]
    eh_full = np.asarray(r_full.err_hist)[:k]
    assert np.all(np.isfinite(eh_lean))
    # the two solves' u differ by smoother arithmetic order (~1e-15 abs),
    # so histories agree to ~1e-9; on the SAME u the norms agree to 1e-14.
    np.testing.assert_allclose(eh_lean, eh_full, rtol=1e-8)
    np.testing.assert_allclose(
        float(error_norm(h_lean, r_full.u)),
        float(error_norm(h_full, r_full.u)),
        rtol=1e-14,
    )
    rh = np.asarray(r_lean.res_hist)[:k]
    assert np.all(np.isfinite(rh))


def test_lean_rejects_variable_coefficient():
    cfg = models.variable_coefficient_2d(lambda x, y: 1.0 + x)
    with pytest.raises(ValueError):
        build_lean_hierarchy(cfg)


@pytest.mark.parametrize("ndim,finest", [(2, 3), (3, 2)])
def test_lean_mass_norm_matches_full(ndim, finest):
    """The class-table mass operator reproduces the assembled consistent
    mass matrix exactly — FEM-L2 residual semantics (and tol-mode
    iteration counts) survive into scale mode."""
    from multigrid_dolfinx_tpu.ops.operators import mass_norm

    model = models.poisson2d if ndim == 2 else models.poisson3d
    cyc = CycleSpec(nu1=2, nu2=2, smoother="rbgs", restriction="pt",
                    tol=1e-7, max_cycles=40)
    cfg = model(finest_level=finest, coarsest_level=1, dtype="float64",
                cycle=cyc)
    h_full = build_hierarchy(cfg)
    h_lean = build_lean_hierarchy(cfg)
    rng = np.random.default_rng(0)
    r = jnp.asarray(rng.standard_normal(h_full.finest.shape))
    np.testing.assert_allclose(
        float(mass_norm(h_lean.M_fine, r)),
        float(mass_norm(h_full.M_fine, r)),
        rtol=1e-13,
    )
    # identical tol-mode convergence behavior
    r_full = solve(h_full, cyc, mode="tol")
    r_lean = solve(h_lean, cyc, mode="tol")
    assert bool(r_lean.converged)
    assert int(r_lean.num_cycles) == int(r_full.num_cycles)


def test_chunked_quadratic_form_matches_plain():
    """The z-chunked class-table quadratic form (the no-full-grid-temp
    path used for >=512^3 residual norms, where XLA's per-call-site HLO
    temps otherwise cost 7 fine arrays of HBM) == the plain fused matvec
    reduction, on an oddly-sized padded 3D grid."""
    from multigrid_dolfinx_tpu.ops.operators import (
        _class_quad_chunked,
        quadratic_form,
    )

    cyc = CycleSpec(nu1=2, nu2=2, smoother="rbgs", restriction="pt",
                    tol=1e-7, max_cycles=40, use_pallas=True)
    cfg = models.poisson3d(finest_level=2, coarsest_level=1,
                           dtype="float64", cycle=cyc)
    h = build_lean_hierarchy(cfg)          # padded: Mz % 8 == 0
    M = h.M_fine
    rng = np.random.default_rng(3)
    u = jnp.asarray(rng.standard_normal(h.finest.shape))
    v = jnp.asarray(rng.standard_normal(h.finest.shape))
    want = float(quadratic_form(M, u, v))        # small grid -> plain path
    got = float(_class_quad_chunked(M, u, v))
    np.testing.assert_allclose(got, want, rtol=1e-12)
    # chunk size not dividing evenly into clamped windows at both ends
    got4 = float(_class_quad_chunked(M, u, v, chunk=4))
    np.testing.assert_allclose(got4, want, rtol=1e-12)


def test_crop_points_policy():
    """Cropped lean storage drops the masked high-boundary node plane
    only when that shrinks a tile dim: x crops to n iff n % 128 == 0,
    y iff n % 8 == 0, z never (the rolling sweeps' pass-through slab
    needs >= 2 z-padding slabs, stencil3d._rb_prelude)."""
    from multigrid_dolfinx_tpu.solver.hierarchy import _crop_points_3d

    assert _crop_points_3d(512) == (520, 512, 512)
    assert _crop_points_3d(256) == (264, 256, 256)
    assert _crop_points_3d(128) == (136, 128, 128)
    # tail-kernel levels keep full storage
    assert _crop_points_3d(64) is None
    assert _crop_points_3d(8) is None
    # non-multiples of 128 gain nothing in the lane dim
    assert _crop_points_3d(192) is None


def test_cropped_storage_vcycle_bitwise_equal():
    """crop_storage=True stores 513^3 logical grids in (520, 512, 512)
    instead of (520, 520, 640) — the high-boundary Dirichlet plane is
    never read by any kernel (vt = where(interior, v, 0) before every
    neighbor sum) and its lifting into the adjacent interior rows comes
    from the logical grid (fem.fast_const), so the V-cycle must be
    BITWISE equal on the stored overlap.  This is the storage mode behind
    the 512^3 headline bench (bench.py MG_BENCH_CROP)."""
    from multigrid_dolfinx_tpu.solver.fmg import _fused_residual_norm
    from multigrid_dolfinx_tpu.solver.vcycle import vcycle

    cyc = CycleSpec(nu1=2, nu2=2, smoother="rbgs", restriction="pt",
                    tol=0.0, rtol=1e-8, max_cycles=10, use_pallas=True,
                    track_error=False)
    cfg = models.poisson3d(finest_level=4, coarsest_level=0,
                           coarsest_elements=8, dtype="float32", cycle=cyc)
    h_full = build_lean_hierarchy(cfg)
    h_crop = build_lean_hierarchy(cfg, crop_storage=True)
    L = h_full.num_levels - 1
    assert h_crop.finest.shape == (136, 128, 128)
    assert h_full.finest.shape == (136, 136, 256)

    bf = np.asarray(h_full.finest.b)
    bc = np.asarray(h_crop.finest.b)
    sz, sy, sx = bc.shape
    np.testing.assert_array_equal(bf[:sz, :sy, :sx], bc)

    vf = vcycle(h_full, cyc, L, jnp.zeros_like(h_full.finest.b),
                h_full.finest.b)
    vc = vcycle(h_crop, cyc, L, jnp.zeros_like(h_crop.finest.b),
                h_crop.finest.b)
    np.testing.assert_array_equal(np.asarray(vf)[:sz, :sy, :sx],
                                  np.asarray(vc))

    # the fused FEM-L2 residual norm (the tolerance check) agrees too:
    # after one cycle the stored boundary rows hold v = f exactly, so the
    # cropped plane's (zero) residual contribution matches the full one
    nf = _fused_residual_norm(h_full, cyc, vf, h_full.finest.b)
    nc = _fused_residual_norm(h_crop, cyc, vc, h_crop.finest.b)
    assert nf is not None and nc is not None
    np.testing.assert_allclose(float(nf), float(nc), rtol=1e-6)


def _crop_cfg(rtol=1e-6, track_error=False, max_cycles=12):
    cyc = CycleSpec(nu1=2, nu2=2, smoother="rbgs", restriction="pt",
                    tol=0.0, rtol=rtol, max_cycles=max_cycles,
                    use_pallas=True, track_error=track_error)
    return models.poisson3d(finest_level=4, coarsest_level=0,
                            coarsest_elements=8, dtype="float32",
                            cycle=cyc), cyc


def test_cropped_fused_norm_matches_plain_for_any_iterate():
    """On cropped storage the fused tet-norm kernel and the plain
    class-table path share one semantics — r := 0 on the missing
    high-boundary planes (the plain path zero-extends via jnp.pad) —
    for ARBITRARY iterates, not just post-smoothing ones."""
    from multigrid_dolfinx_tpu.ops.operators import mass_norm
    from multigrid_dolfinx_tpu.solver.fmg import _fused_residual_norm
    from multigrid_dolfinx_tpu.solver.vcycle import compute_residual

    cfg, cyc = _crop_cfg()
    h = build_lean_hierarchy(cfg, crop_storage=True)
    rng = np.random.default_rng(7)
    v = jnp.asarray(rng.standard_normal(h.finest.shape), jnp.float32)
    nf = _fused_residual_norm(h, cyc, v, h.finest.b)
    assert nf is not None
    r = compute_residual(h.finest, v, h.finest.b, use_pallas=False)
    np.testing.assert_allclose(float(nf), float(mass_norm(h.M_fine, r)),
                               rtol=2e-5)


def test_cropped_rn_ref_is_exact_full_storage_value():
    """crop builds precompute ||b - A*0||_M on a transient FULL layout —
    bitwise what a full-storage check_norm(0) computes — because the
    cropped arrays cannot see the missing planes' r = b contribution
    (the O(surface) rtol-threshold drift flagged in ADVICE r3)."""
    from multigrid_dolfinx_tpu.solver.fmg import _fused_residual_norm

    cfg, cyc = _crop_cfg()
    h_full = build_lean_hierarchy(cfg)
    h_crop = build_lean_hierarchy(cfg, crop_storage=True)
    assert h_full.rn_ref is None and h_crop.rn_ref is not None
    ref_full = _fused_residual_norm(
        h_full, cyc, jnp.zeros_like(h_full.finest.b), h_full.finest.b)
    assert ref_full is not None
    np.testing.assert_array_equal(np.asarray(h_crop.rn_ref),
                                  np.asarray(ref_full))
    # and it is strictly larger than the cropped-view norm (the missing
    # planes carry r = b = uD != 0 for the zero iterate)
    nc = _fused_residual_norm(
        h_crop, cyc, jnp.zeros_like(h_crop.finest.b), h_crop.finest.b)
    assert float(h_crop.rn_ref) > float(nc)


def test_cropped_tolerance_solve_matches_full():
    """End-to-end: FMG + tolerance solve on cropped storage stops after
    the IDENTICAL cycle count as full storage, with matching residual
    histories and the same solution on the stored overlap — including
    track_error (error_norm reconstructs the missing plane
    analytically) and the crop-aware FMG ramp."""
    cfg, cyc = _crop_cfg(track_error=True)
    h_full = build_lean_hierarchy(cfg)
    h_crop = build_lean_hierarchy(cfg, crop_storage=True)
    r_full = solve(h_full, cyc, mode="tol")
    r_crop = solve(h_crop, cyc, mode="tol")
    assert int(r_full.num_cycles) == int(r_crop.num_cycles)
    assert bool(r_crop.converged)
    k = int(r_full.num_cycles)
    # The cropped solve is a different-but-equivalent f32 program (crop-
    # aware FMG ramp, masked norm kernel), so iterates agree only to f32
    # roundoff (~1e-7); near the discretization floor that shows as a few
    # e-4 relative on res_hist (measured 1.9e-4) and, because err ~ 8.7e-5
    # while the perturbation is absolute ~3e-7, up to ~1e-2 relative on
    # err_hist (measured 3.2e-3).  Cycle counts and convergence (asserted
    # exactly above) are the reference-semantics quantities.
    np.testing.assert_allclose(np.asarray(r_full.res_hist[:k]),
                               np.asarray(r_crop.res_hist[:k]), rtol=1e-3)
    np.testing.assert_allclose(np.asarray(r_full.err_hist[:k]),
                               np.asarray(r_crop.err_hist[:k]), rtol=1e-2)
    sz, sy, sx = r_crop.u.shape
    np.testing.assert_allclose(np.asarray(r_full.u)[:sz, :sy, :sx],
                               np.asarray(r_crop.u), rtol=1e-5, atol=1e-6)
