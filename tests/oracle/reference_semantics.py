"""Scipy/numpy oracle: an independent re-execution of the reference
solver's *semantics* (nikhilTkur/Multigrid_dolfinx) used as the correctness
baseline for the JAX framework.

This is NOT a copy of the reference: it reimplements, from the math, the
exact computational behavior documented in SURVEY.md §3 —

  * CSR operators (built here from this framework's own AOT assembly, which
    replaces dolfinx; stencil->CSR conversion gives the same matrix the
    reference exports at Multigrid_prototype.py:95-99 up to dof ordering),
  * Jacobi splitting R_omega = Dinv (A - D)  (multigrid.py:48-56),
  * the smoother association sol = (1-w) v + w Dinv f - w R_omega v
    (multigrid.py:223-228),
  * injection restriction of the residual (multigrid.py:251-252),
  * bilinear interpolation (multigrid.py:59-120),
  * recursive V-cycle with spsolve at the coarsest level
    (multigrid.py:231-268),
  * FMG with per-level assembled RHS, mu0 cycles at intermediate levels,
    while-residual>1e-11 at the finest with mass-weighted FEM-L2 norms
    (multigrid.py:271-307),

but on the framework's lexicographic grid ordering (every quantity involved
is permutation-equivariant, so histories agree with the reference's
dof-ordered run to rounding).
"""
from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Tuple

import numpy as np
import scipy.sparse as sp
from scipy.sparse.linalg import spsolve

from multigrid_dolfinx_tpu.config import SolverConfig
from multigrid_dolfinx_tpu.fem import assembly as fa
from multigrid_dolfinx_tpu.fem.norms import error_quadrature
from multigrid_dolfinx_tpu.mesh import build_grid_hierarchy


@dataclasses.dataclass
class OracleLevel:
    n: int
    shape: Tuple[int, ...]
    A: sp.csr_matrix          # BC-eliminated stiffness
    R_omega: sp.csr_matrix
    Dinv: sp.csr_matrix
    b: np.ndarray             # flat RHS (lexicographic)
    M: sp.csr_matrix          # full mass


@dataclasses.dataclass
class OracleProblem:
    levels: List[OracleLevel]  # coarsest..finest
    omega: float
    err_quad: object           # fem.norms.ErrorQuadrature (finest level)


def build_oracle(config: SolverConfig) -> OracleProblem:
    grids = build_grid_hierarchy(config.hierarchy, ndim=config.problem.ndim)
    asms = fa.assemble_hierarchy(grids, config.problem)
    levels = []
    for asm in asms:
        A = fa.stencil_to_csr(asm.offsets, asm.A_planes)
        M = fa.stencil_to_csr(asm.M_offsets, asm.M_planes)
        diag = A.diagonal()
        Dinv = sp.diags(1.0 / diag, 0).tocsr()
        R = A - sp.diags(diag, 0)
        R_omega = (Dinv @ R).tocsr()
        levels.append(
            OracleLevel(
                n=asm.grid.n,
                shape=asm.grid.shape,
                A=A,
                R_omega=R_omega,
                Dinv=Dinv,
                b=asm.b.reshape(-1).copy(),
                M=M,
            )
        )
    eq = error_quadrature(grids[-1], config.problem)
    return OracleProblem(
        levels=levels,
        omega=config.cycle.omega,
        err_quad=eq,
    )


# ---- reference-semantics kernels (flat vectors, lexicographic order) ----

def jacobi_relaxation(lv: OracleLevel, omega: float, v, f, nw: int):
    """sol = (1-w) v + w Dinv f - w R_omega v, nw times
    (multigrid.py:223-228)."""
    for _ in range(nw):
        v = (1.0 - omega) * v + omega * (lv.Dinv @ f) - omega * (lv.R_omega @ v)
    return v


def restrict_inject(r_fine: np.ndarray, fine_shape, ndim) -> np.ndarray:
    """Reference Restriction2D_direct (multigrid.py:123-132)."""
    g = r_fine.reshape(fine_shape)
    return g[(slice(None, None, 2),) * ndim].reshape(-1).copy()


def prolong_linear(v_coarse: np.ndarray, coarse_shape, ndim) -> np.ndarray:
    """Reference Interpolation2D (multigrid.py:59-120): multilinear."""
    import itertools

    c = v_coarse.reshape(coarse_shape)
    fine_shape = tuple(2 * (s - 1) + 1 for s in coarse_shape)
    out = np.zeros(fine_shape)
    for parity in itertools.product((0, 1), repeat=ndim):
        corners = []
        for corner in itertools.product(
            *[range(2) if p else range(1) for p in parity]
        ):
            sl = tuple(
                slice(None)
                if p == 0
                else (slice(0, -1) if cc == 0 else slice(1, None))
                for p, cc in zip(parity, corner)
            )
            corners.append(c[sl])
        avg = sum(corners) / len(corners)
        out[tuple(slice(p, None, 2) for p in parity)] = avg
    return out.reshape(-1)


def mass_norm(lv: OracleLevel, r: np.ndarray) -> float:
    """sqrt(r^T M r) — semantics of reference res_calculator
    (multigrid.py:203-208)."""
    return float(np.sqrt(max(r @ (lv.M @ r), 0.0)))


def error_norm(prob: OracleProblem, u: np.ndarray) -> float:
    """Per-quadrature-point FEM-L2 error (semantics of reference
    err_calculator, multigrid.py:213-218; see fem.norms.ErrorQuadrature)."""
    eq = prob.err_quad
    ug = u.reshape(prob.levels[-1].shape)
    n = ug.shape[0] - 1
    ndim = ug.ndim
    origins = [
        idx * eq.h for idx in np.indices((n,) * ndim, dtype=np.float64)
    ]
    acc = 0.0
    for s, voffs in enumerate(eq.voffs):
        for q, vw in enumerate(eq.vw[s]):
            interp = None
            for a, voff in enumerate(voffs):
                slab = tuple(slice(v, v + n) for v in voff)
                term = eq.lambdas[s][q][a] * ug[slab]
                interp = term if interp is None else interp + term
            xq = [o + xo for o, xo in zip(origins, eq.xq_local[s][q])]
            e = interp - eq.exact_fn(*xq)
            acc += vw * float(np.sum(e * e))
    return float(np.sqrt(max(acc, 0.0)))


def v_cycle(prob: OracleProblem, config: SolverConfig, lidx: int,
            v: np.ndarray, f: np.ndarray) -> np.ndarray:
    """Reference V_cycle_scheme (multigrid.py:231-268)."""
    cyc = config.cycle
    ndim = config.problem.ndim
    if lidx == 0:
        return spsolve(prob.levels[0].A.tocsc(), f)
    lv = prob.levels[lidx]
    v = jacobi_relaxation(lv, prob.omega, v, f, cyc.nu1)
    r = f - lv.A @ v
    f_c = restrict_inject(r, lv.shape, ndim)
    v_c = np.zeros_like(f_c)
    v_c = v_cycle(prob, config, lidx - 1, v_c, f_c)
    err = prolong_linear(v_c, prob.levels[lidx - 1].shape, ndim)
    v = v + err
    v = jacobi_relaxation(lv, prob.omega, v, f, cyc.nu2)
    return v


@dataclasses.dataclass
class OracleResult:
    u: np.ndarray
    res_hist: List[float]
    err_hist: List[float]
    num_cycles: int


def full_multigrid(prob: OracleProblem, config: SolverConfig,
                   mode: str = "tol") -> OracleResult:
    """Reference FullMultiGrid (mode='tol', multigrid.py:271-307) /
    FullMultiGrid_test (mode='fixed', multigrid.py:312-339)."""
    cyc = config.cycle
    ndim = config.problem.ndim
    nlev = len(prob.levels)

    v = spsolve(prob.levels[0].A.tocsc(), prob.levels[0].b)
    res_hist: List[float] = []
    err_hist: List[float] = []
    cycles = 0

    for li in range(1, nlev):
        v = prolong_linear(v, prob.levels[li - 1].shape, ndim)
        f = prob.levels[li].b
        is_finest = li == nlev - 1
        if not is_finest or mode == "fixed":
            for _ in range(cyc.mu0):
                v = v_cycle(prob, config, li, v, f)
                if is_finest:
                    cycles += 1
        else:
            lv = prob.levels[li]
            while True:
                v = v_cycle(prob, config, li, v, f)
                cycles += 1
                r = f - lv.A @ v
                err_hist.append(error_norm(prob, v))
                rn = mass_norm(lv, r)
                res_hist.append(rn)
                if rn <= cyc.tol or cycles >= cyc.max_cycles:
                    break
    return OracleResult(u=v, res_hist=res_hist, err_hist=err_hist,
                        num_cycles=cycles)
