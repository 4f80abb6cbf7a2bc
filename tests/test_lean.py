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


def test_lean_error_norm_is_nan_and_resume_works():
    cfg = models.poisson2d(finest_level=3, dtype="float32", cycle=CYC)
    hier = build_lean_hierarchy(cfg)
    res = solve(hier, CYC, mode="tol")
    k = int(res.num_cycles)
    # scale mode has no mass/error machinery: err history is NaN,
    # residual history is the vector 2-norm (finite, decreasing)
    assert np.all(np.isnan(np.asarray(res.err_hist)[:k]))
    rh = np.asarray(res.res_hist)[:k]
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
