"""Mixed-precision (float32 refinement around a bfloat16 V-cycle) solve.

The inner V-cycle only preconditions — classical iterative refinement —
so the solve must reach the same float32 residual tolerance and the same
discretization-floor error as the all-float32 solve, in a comparable
number of cycles (the bfloat16 preconditioner perturbs the contraction
factor by O(2^-8), not the fixed point).  Reference substrate: the
finest-level while-True of FullMultiGrid (multigrid.py:286-296).
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multigrid_dolfinx_tpu import (
    build_lean_hierarchy,
    build_mixed,
    models,
    solve,
    solve_mixed,
)
from multigrid_dolfinx_tpu.config import CycleSpec


def _cfg3d(use_pallas: bool, rtol: float = 1e-6):
    cyc = CycleSpec(nu1=2, nu2=2, smoother="rbgs", restriction="pt",
                    tol=0.0, rtol=rtol, max_cycles=40,
                    use_pallas=use_pallas, track_error=True)
    return models.poisson3d(finest_level=3, coarsest_level=0,
                            coarsest_elements=4, dtype="float32",
                            cycle=cyc)


@pytest.mark.parametrize("use_pallas", [False, True])
def test_mixed_matches_f32_solve_3d(use_pallas):
    cfg = _cfg3d(use_pallas)
    mh = build_mixed(cfg)
    res16 = solve_mixed(mh, cfg.cycle)
    res32 = solve(build_lean_hierarchy(cfg), cfg.cycle)

    assert bool(res16.converged) and not bool(res16.diverged)
    # same tolerance reached; iteration count within the refinement slack
    assert int(res16.num_cycles) <= int(res32.num_cycles) + 2
    # same discretization-floor error as the float32 solve
    e16 = float(res16.err_hist[int(res16.num_cycles) - 1])
    e32 = float(res32.err_hist[int(res32.num_cycles) - 1])
    assert np.isfinite(e16)
    assert e16 <= 1.05 * e32 + 1e-12
    # solution value at the center of the manufactured solution
    u = np.asarray(res16.u)
    m = cfg.hierarchy.elements_at(cfg.hierarchy.finest_level)
    assert abs(u[m // 2, m // 2, m // 2] - 2.5) < 1e-2


def test_mixed_2d():
    cyc = CycleSpec(nu1=2, nu2=2, smoother="rbgs", restriction="pt",
                    tol=0.0, rtol=1e-6, max_cycles=40,
                    use_pallas=False, track_error=False)
    cfg = models.poisson2d(finest_level=4, coarsest_level=1,
                           coarsest_elements=4, dtype="float32", cycle=cyc)
    mh = build_mixed(cfg)
    res = solve_mixed(mh, cfg.cycle)
    assert bool(res.converged)
    u = np.asarray(res.u)
    m = cfg.hierarchy.elements_at(cfg.hierarchy.finest_level)
    assert abs(u[m // 2, m // 2] - 1.75) < 1e-2


def test_mixed_rejects_non_f32():
    cfg = dataclasses.replace(_cfg3d(False), dtype="float64")
    with pytest.raises(ValueError, match="float32"):
        build_mixed(cfg)


def test_bf16_hierarchy_padding_and_dtypes():
    cfg = _cfg3d(True)
    mh = build_mixed(cfg)
    for lv in mh.h16.levels:
        assert lv.b.dtype == jnp.bfloat16
        assert lv.shape[-2] % 16 == 0 and lv.shape[-1] % 128 == 0
    # float32-factored coarse solve casts at the boundary
    e = mh.h16.coarse.solve(jnp.zeros(mh.h16.levels[0].shape, jnp.bfloat16))
    assert e.dtype == jnp.bfloat16


def test_bf16_vcycle_runs_pallas_kernels_interpret():
    """The bfloat16 inner V-cycle really takes the Pallas path (dispatch
    admits bf16 on (16,128)-aligned storage) and returns a finite,
    error-reducing correction in interpret mode."""
    from multigrid_dolfinx_tpu.ops import dispatch
    from multigrid_dolfinx_tpu.solver.vcycle import vcycle

    cfg = _cfg3d(True)
    mh = build_mixed(cfg)
    h16 = mh.h16
    lv = h16.finest
    assert dispatch.pallas_eligible(lv.A, tuple(lv.shape), jnp.bfloat16)

    rng = np.random.default_rng(3)
    lm = lv.n + 1
    r = np.zeros(lv.shape, np.float32)
    r[1:lm - 1, 1:lm - 1, 1:lm - 1] = rng.standard_normal(
        (lm - 2,) * 3).astype(np.float32)
    r16 = jnp.asarray(r, jnp.bfloat16)
    L = h16.num_levels - 1
    e = vcycle(h16, cfg.cycle, L, jnp.zeros_like(r16), r16)
    assert e.dtype == jnp.bfloat16
    e_np = np.asarray(e, dtype=np.float32)
    assert np.isfinite(e_np).all()
    # one V-cycle on A e = r must cut the correction-equation residual
    A = lv.A
    res0 = np.linalg.norm(r)
    res1 = np.linalg.norm(
        np.asarray(r - np.asarray(A.apply(jnp.asarray(e, jnp.float32)),
                                  dtype=np.float32)))
    assert res1 < 0.2 * res0
