"""Device-side constant-coefficient P2 hierarchy (fem.fast_p2 +
solver.hierarchy.build_p2_hierarchy) == the exact host assembler.

The parity-class-table identification: interior rows of the constant-kappa
P2 operator on the half-step lattice are exactly period-2 (each parity
class is one P2 node type), the only non-periodic raw rows sit ON the
domain faces — so the whole operator is (K, 4^d) scalars (reference P2
capability: Multigrid_prototype.py:88-110)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from multigrid_dolfinx_tpu import build_hierarchy, solve
from multigrid_dolfinx_tpu.config import (
    CycleSpec, HierarchySpec, ProblemSpec, SolverConfig,
)
from multigrid_dolfinx_tpu.ops.operators import box_interior_mask, mass_norm
from multigrid_dolfinx_tpu.solver.hierarchy import build_p2_hierarchy

jax.config.update("jax_enable_x64", True)


def _cfg(ndim, finest=1, smoother="jacobi", dtype="float64", pallas=False,
         coarsest_elements=4):
    rhs = -6.0 if ndim == 2 else -12.0
    cyc = CycleSpec(nu1=2, nu2=2, smoother=smoother, restriction="pt",
                    tol=0.0, rtol=1e-10 if dtype == "float64" else 1e-6,
                    max_cycles=40, use_pallas=pallas)
    return SolverConfig(
        problem=ProblemSpec(ndim=ndim, degree=2, rhs_const=rhs),
        hierarchy=HierarchySpec(coarsest_elements=coarsest_elements,
                                coarsest_level=0, finest_level=finest,
                                coarse_operator="rediscretize"),
        cycle=cyc, dtype=dtype)


@pytest.mark.parametrize("ndim", [2, 3])
def test_p2_device_build_matches_host_assembler(ndim):
    """Entry-exact: b, g, A-apply and the consistent-mass norm of every
    level of the device parity-table build match the host assembler's
    planes build (rediscretized coarse ops) to f64 roundoff."""
    cfg = _cfg(ndim)
    h_host = build_hierarchy(cfg)
    h_dev = build_p2_hierarchy(cfg)
    assert h_dev.num_levels == h_host.num_levels
    for li, (lh, ld) in enumerate(zip(h_host.levels, h_dev.levels)):
        assert lh.shape == ld.shape and lh.n == ld.n
        np.testing.assert_allclose(np.asarray(ld.b), np.asarray(lh.b),
                                   rtol=1e-13, atol=1e-13)
        np.testing.assert_allclose(np.asarray(ld.g), np.asarray(lh.g),
                                   rtol=0, atol=0)
        rng = np.random.default_rng(li)
        u = jnp.asarray(rng.standard_normal(lh.shape))
        np.testing.assert_allclose(np.asarray(ld.A.apply(u)),
                                   np.asarray(lh.A.apply(u)),
                                   rtol=1e-12, atol=1e-12)
    # mass norm on an interior-supported residual (the only rows r^T M r
    # reads — r vanishes on identity bc rows)
    r = jnp.asarray(np.random.default_rng(9).standard_normal(
        h_host.levels[-1].shape))
    r = jnp.where(box_interior_mask(r.shape, h_host.levels[-1].n + 1),
                  r, 0.0)
    np.testing.assert_allclose(float(mass_norm(h_dev.M_fine, r)),
                               float(mass_norm(h_host.M_fine, r)),
                               rtol=1e-12)


def test_p2_device_solve_matches_host():
    """Full tolerance solve through the parity operator: identical cycle
    counts and u to roundoff vs the host planes hierarchy (3D)."""
    cfg = _cfg(3, smoother="jacobi")
    r1 = solve(build_hierarchy(cfg), cfg.cycle, mode="tol")
    r2 = solve(build_p2_hierarchy(cfg), cfg.cycle, mode="tol")
    assert bool(r1.converged) and bool(r2.converged)
    assert int(r1.num_cycles) == int(r2.num_cycles)
    np.testing.assert_allclose(np.asarray(r2.u), np.asarray(r1.u),
                               rtol=1e-11, atol=1e-12)


def test_p2_device_rbgs_vcycles_match_host():
    """Two V(2,2) cycles of 27-color mod-3 GS (the generic multicolor
    path on the parity operator) == the host planes hierarchy.  Fixed
    cycle count: a full rbgs tolerance solve costs 27 radius-2 jnp
    applies per sweep and runs for many CPU-minutes."""
    from multigrid_dolfinx_tpu.solver.vcycle import vcycle

    cfg = _cfg(3, smoother="rbgs")
    h1 = build_hierarchy(cfg)
    h2 = build_p2_hierarchy(cfg)
    L = h1.num_levels - 1
    v1 = jnp.zeros_like(h1.finest.b)
    v2 = jnp.zeros_like(h2.finest.b)
    for _ in range(2):
        v1 = vcycle(h1, cfg.cycle, L, v1, h1.finest.b)
        v2 = vcycle(h2, cfg.cycle, L, v2, h2.finest.b)
    np.testing.assert_allclose(np.asarray(v2), np.asarray(v1),
                               rtol=1e-11, atol=1e-12)


def test_p2_device_solve_lands_on_exact():
    """u* = 1 + x^2 + 2y^2 + 3z^2 lies IN the P2 space, so the converged
    device-built solve equals u* at every lattice node to tolerance."""
    cfg = _cfg(3, finest=2)
    hier = build_p2_hierarchy(cfg)
    r = solve(hier, cfg.cycle, mode="tol")
    assert bool(r.converged)
    lm = hier.finest.n + 1
    delta = 0.5 / (lm // 2)          # lattice spacing h/2
    ax = np.arange(lm) * delta
    x, y, z = np.meshgrid(ax, ax, ax, indexing="ij")
    ustar = 1.0 + x**2 + 2.0*y**2 + 3.0*z**2
    np.testing.assert_allclose(np.asarray(r.u)[:lm, :lm, :lm], ustar,
                               rtol=1e-8, atol=1e-8)


def test_p2_template_scale_invariance():
    """The unit-normalized tables are h-independent: extraction at the
    n0 = 4 prototype equals extraction at n0 = 6 after rescaling (the
    h^(d-2) / h^d scaling laws the per-level build relies on)."""
    from multigrid_dolfinx_tpu.fem.assembly import assemble_level
    from multigrid_dolfinx_tpu.fem.fast_p2 import (
        _CLS_REP, build_p2_template,
    )
    from multigrid_dolfinx_tpu.mesh import GridLevel

    p = ProblemSpec(ndim=3, degree=2, rhs_const=-12.0)
    t = build_p2_template(p)
    n6 = 6
    asm = assemble_level(GridLevel(level=0, ndim=3, n=n6), p)
    h6 = 1.0 / n6
    rep6 = dict(_CLS_REP)
    rep6[3] = 2 * n6
    import itertools
    for combo in itertools.product(range(4), repeat=3):
        flat = (combo[0] * 4 + combo[1]) * 4 + combo[2]
        node = tuple(rep6[c] for c in combo)
        np.testing.assert_allclose(
            asm.A_raw_planes[(slice(None),) + node] / h6,
            t.a_unit[:, flat], rtol=1e-11, atol=1e-11)
        np.testing.assert_allclose(
            asm.M_planes[(slice(None),) + node] / h6 ** 3,
            t.m_unit[:, flat], rtol=1e-11, atol=1e-11)


# ----------------------------------------------------------------------
# Plane-free P2 Pallas kernels (stencil3d_p2, interpret mode off-TPU)
# ----------------------------------------------------------------------

def _p2_pallas_fixture(finest=1):
    cfg = _cfg(3, finest=finest, smoother="jacobi", dtype="float32",
               pallas=True)
    hier = build_p2_hierarchy(cfg)
    fl = hier.finest
    from multigrid_dolfinx_tpu.ops import dispatch
    assert dispatch.pallas_parity_eligible(fl.A, fl.shape, jnp.float32)
    rng = np.random.default_rng(3)
    v = jnp.asarray(rng.standard_normal(fl.shape), jnp.float32)
    f = jnp.asarray(rng.standard_normal(fl.shape), jnp.float32)
    # solver invariants the kernels rely on: zero outside the logical box
    from multigrid_dolfinx_tpu.fem.fast_p2 import _inbox
    box = _inbox(fl.shape, fl.n + 1)
    return cfg, hier, fl, jnp.where(box, v, 0), jnp.where(box, f, 0)


def test_p2_kernel_residual_matches_jnp():
    from multigrid_dolfinx_tpu.ops.pallas import stencil3d_p2

    cfg, hier, fl, v, f = _p2_pallas_fixture()
    got = stencil3d_p2.p2_residual(v, f, fl.n + 1, fl.A.parity_weights,
                                   fl.A.offsets, interpret=True)
    assert got is not None
    want = f - fl.A.apply(v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=3e-5, atol=3e-5)


def test_p2_kernel_jacobi_matches_jnp():
    from multigrid_dolfinx_tpu.ops.pallas import stencil3d_p2
    from multigrid_dolfinx_tpu.ops.smoothers import jacobi_smooth

    cfg, hier, fl, v, f = _p2_pallas_fixture()
    got = stencil3d_p2.p2_jacobi_sweep(
        v, f, fl.n + 1, fl.A.parity_weights, fl.A.offsets,
        fl.sm.omega, interpret=True)
    assert got is not None
    # snap_bc: the parity kernel snaps Dirichlet rows to f (the crop
    # contract) and the host twin must match it
    want = jacobi_smooth(fl.sm, v, f, 1, A=fl.A, snap_bc=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=3e-5, atol=3e-5)


@pytest.mark.parametrize("smoother", ["jacobi", "chebyshev"])
def test_p2_pallas_vcycles_match_plain(smoother):
    """Two kernel-path P2 V(2,2) cycles (jacobi/chebyshev sweeps, fused
    residual, pt restriction, trilinear prolongation through the shared
    transfer kernels) == the jnp-path cycles.  Fixed cycle count: full
    interpret-mode solves cost CPU-minutes per cycle; the full-solve
    equivalence runs on the TPU benches (scripts/bench_p2.py)."""
    import dataclasses

    from multigrid_dolfinx_tpu.solver.vcycle import vcycle

    cfg = _cfg(3, finest=1, smoother=smoother, dtype="float32",
               pallas=True)
    cfg_plain = dataclasses.replace(
        cfg, cycle=dataclasses.replace(cfg.cycle, use_pallas=False))
    h = build_p2_hierarchy(cfg)
    L = h.num_levels - 1
    v_pal = jnp.zeros_like(h.finest.b)
    v_pl = jnp.zeros_like(h.finest.b)
    for _ in range(2):
        v_pal = vcycle(h, cfg.cycle, L, v_pal, h.finest.b)
        v_pl = vcycle(h, cfg_plain.cycle, L, v_pl, h.finest.b)
    np.testing.assert_allclose(np.asarray(v_pal), np.asarray(v_pl),
                               rtol=2e-4, atol=2e-4)


def test_p2_mass_quad_matches_plain():
    """The fused r^T M r (parity kernel + O(surface) shell delta) equals
    the plain raw-mode parity matvec + dot, including the face-row
    contributions (the shell delta's job)."""
    from multigrid_dolfinx_tpu.ops.operators import quadratic_form
    from multigrid_dolfinx_tpu.ops.pallas import stencil3d_p2

    cfg, hier, fl, v, f = _p2_pallas_fixture()
    M = hier.M_fine
    assert M.parity_weights is not None
    r = f - fl.A.apply(v)                 # raw residual incl. bc rows
    got = stencil3d_p2.p2_mass_quad(
        r, fl.A.logical_m, M.parity_weights, M.offsets, M.parity_tables,
        interpret=True)
    assert got is not None
    want = quadratic_form(M, r, r)
    np.testing.assert_allclose(float(got), float(want),
                               rtol=3e-5, atol=3e-6)


def test_p2_fused_norm_matches_plain_check():
    """solver.fmg._fused_residual_norm takes the P2 parity branch and
    equals residual_norm(compute_residual(...)) — the convergence check
    P2 tolerance solves and MG-CG run every cycle.  Compared on a
    POST-SWEEP iterate: the fused check skips the O(surface) shell
    delta (include_shell=False), exact precisely because snap-jacobi
    zeroes the boundary residual — the only iterates the check ever
    sees."""
    from multigrid_dolfinx_tpu.ops.smoothers import smooth
    from multigrid_dolfinx_tpu.solver.fmg import (
        _fused_residual_norm,
        residual_norm,
    )
    from multigrid_dolfinx_tpu.solver.vcycle import compute_residual

    cfg, hier, fl, v, f = _p2_pallas_fixture()
    v = smooth(fl.sm, fl.A, v, f, 1, "jacobi", use_pallas=False)
    rn = _fused_residual_norm(hier, cfg.cycle, v, f)
    assert rn is not None                 # the parity branch engaged
    want = residual_norm(
        hier, compute_residual(fl, v, f, use_pallas=False))
    np.testing.assert_allclose(float(rn), float(want),
                               rtol=3e-5, atol=3e-6)


# ----------------------------------------------------------------------
# Cropped P2 lean storage (solver/hierarchy._crop_points_p2): drop the
# high-boundary Dirichlet plane in y/x on crop-eligible levels.  The
# correctness contract is the SNAP-jacobi sweep (boundary rows hold
# exactly f = uD after every sweep) — mirrored from tests/test_lean.py's
# P1 crop suite.
# ----------------------------------------------------------------------

def _crop_cfg_p2(rtol=1e-5, max_cycles=10):
    cyc = CycleSpec(nu1=2, nu2=2, smoother="jacobi", restriction="pt",
                    tol=0.0, rtol=rtol, max_cycles=max_cycles,
                    use_pallas=True, track_error=False)
    return SolverConfig(
        problem=ProblemSpec(ndim=3, degree=2, rhs_const=-12.0),
        hierarchy=HierarchySpec(coarsest_elements=8, coarsest_level=0,
                                finest_level=3,
                                coarse_operator="rediscretize"),
        cycle=cyc, dtype="float32")


def test_p2_crop_points_policy():
    from multigrid_dolfinx_tpu.solver.hierarchy import _crop_points_p2

    assert _crop_points_p2(256) == (520, 512, 512)   # lm 513 production
    assert _crop_points_p2(128) == (264, 256, 256)
    assert _crop_points_p2(64) == (136, 128, 128)
    assert _crop_points_p2(32) is None               # 64 % 128 != 0
    assert _crop_points_p2(96) is None               # 192 % 128 != 0


def test_p2_crop_requires_snap_jacobi():
    import dataclasses as dc

    cfg = _crop_cfg_p2()
    cfg = dc.replace(cfg, cycle=dc.replace(cfg.cycle,
                                           smoother="chebyshev"))
    with pytest.raises(ValueError, match="snap"):
        build_p2_hierarchy(cfg, crop_storage=True)


def test_p2_jacobi_snap_bc_rows():
    """After ONE parity-kernel jacobi sweep, Dirichlet rows hold exactly
    f (bitwise) — the invariant cropped storage's norm equality rests
    on; the host A-form twin (snap_bc, engaged by ops.smoothers.smooth
    for parity-table operators) matches the kernel everywhere."""
    from multigrid_dolfinx_tpu.fem.fast_p2 import _inbox
    from multigrid_dolfinx_tpu.ops.pallas import stencil3d_p2
    from multigrid_dolfinx_tpu.ops.smoothers import smooth

    cfg, hier, fl, v, f = _p2_pallas_fixture()
    lm = fl.n + 1
    got = stencil3d_p2.p2_jacobi_sweep(
        v, f, lm, fl.A.parity_weights, fl.A.offsets, fl.sm.omega,
        interpret=True)
    assert got is not None
    box = _inbox(fl.shape, lm)
    interior = box_interior_mask(fl.shape, lm)
    bc = np.asarray(box & (~interior))
    np.testing.assert_array_equal(np.asarray(got)[bc], np.asarray(f)[bc])
    want = smooth(fl.sm, fl.A, v, f, 1, "jacobi", use_pallas=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=3e-5, atol=3e-5)


def test_p2_cropped_vcycle_matches_full_on_overlap():
    """crop_storage=True stores the lm=129 finest level in
    (136, 128, 128) instead of (136, 136, 256); builds and one V-cycle
    agree with full storage on the stored overlap, and the fused FEM-L2
    check agrees (boundary residual is identically zero post-sweep under
    snap-jacobi)."""
    from multigrid_dolfinx_tpu.solver.fmg import _fused_residual_norm
    from multigrid_dolfinx_tpu.solver.vcycle import vcycle

    cfg = _crop_cfg_p2()
    h_full = build_p2_hierarchy(cfg)
    h_crop = build_p2_hierarchy(cfg, crop_storage=True)
    assert h_full.finest.shape == (136, 136, 256)
    assert h_crop.finest.shape == (136, 128, 128)
    L = h_full.num_levels - 1

    bf = np.asarray(h_full.finest.b)
    bc = np.asarray(h_crop.finest.b)
    sz, sy, sx = bc.shape
    np.testing.assert_array_equal(bf[:sz, :sy, :sx], bc)

    vf = vcycle(h_full, cfg.cycle, L, jnp.zeros_like(h_full.finest.b),
                h_full.finest.b)
    vc = vcycle(h_crop, cfg.cycle, L, jnp.zeros_like(h_crop.finest.b),
                h_crop.finest.b)
    np.testing.assert_allclose(np.asarray(vf)[:sz, :sy, :sx],
                               np.asarray(vc), rtol=2e-5, atol=2e-5)

    nf = _fused_residual_norm(h_full, cfg.cycle, vf, h_full.finest.b)
    nc = _fused_residual_norm(h_crop, cfg.cycle, vc, h_crop.finest.b)
    assert nf is not None and nc is not None
    np.testing.assert_allclose(float(nf), float(nc), rtol=1e-5)


def test_p2_cropped_rn_ref_is_exact_full_storage_value():
    """EVERY 3D parity build precomputes ||b - A*0||_M on the full
    layout WITH the shell delta (r = b has nonzero Dirichlet rows); the
    per-cycle fused check deliberately skips the delta (valid only
    post-sweep), so rn_ref must come from the build, and must agree
    between storage layouts.  The plain full-layout mass_norm is the
    independent oracle."""
    from multigrid_dolfinx_tpu.ops.operators import mass_norm
    from multigrid_dolfinx_tpu.solver.fmg import _fused_residual_norm

    cfg = _crop_cfg_p2()
    h_full = build_p2_hierarchy(cfg)
    h_crop = build_p2_hierarchy(cfg, crop_storage=True)
    assert h_full.rn_ref is not None and h_crop.rn_ref is not None
    np.testing.assert_allclose(float(h_crop.rn_ref),
                               float(h_full.rn_ref), rtol=1e-6)
    oracle = float(mass_norm(h_full.M_fine, h_full.finest.b))
    np.testing.assert_allclose(float(h_full.rn_ref), oracle, rtol=2e-5)
    # the shell-skipping per-cycle check on the ZERO iterate is smaller
    # (it cannot see the Dirichlet rows' r = b contribution)
    nc = _fused_residual_norm(
        h_crop, cfg.cycle, jnp.zeros_like(h_crop.finest.b),
        h_crop.finest.b)
    assert float(h_crop.rn_ref) > float(nc)


def test_p2_cropped_tolerance_solve_matches_full():
    """End-to-end FMG + tolerance solve on cropped P2 storage stops
    after the IDENTICAL cycle count as full storage with matching
    residual histories (crop-aware ramp + exact rn_ref + zero boundary
    residual under snap-jacobi)."""
    cfg = _crop_cfg_p2()
    h_full = build_p2_hierarchy(cfg)
    h_crop = build_p2_hierarchy(cfg, crop_storage=True)
    r_full = solve(h_full, cfg.cycle, mode="tol")
    r_crop = solve(h_crop, cfg.cycle, mode="tol")
    assert bool(r_full.converged) and bool(r_crop.converged)
    assert int(r_full.num_cycles) == int(r_crop.num_cycles)
    k = int(r_full.num_cycles)
    np.testing.assert_allclose(
        np.asarray(r_full.res_hist[:k]), np.asarray(r_crop.res_hist[:k]),
        rtol=1e-4)
    sz, sy, sx = r_crop.u.shape
    np.testing.assert_allclose(
        np.asarray(r_full.u)[:sz, :sy, :sx], np.asarray(r_crop.u),
        rtol=2e-5, atol=2e-5)
