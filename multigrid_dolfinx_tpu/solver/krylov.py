"""Multigrid-preconditioned (flexible) conjugate gradients.

The capstone solver of BASELINE.json config 5 (FMG start + MG-CG at scale).
The reference has no Krylov layer — its closest analogue is the dolfinx
LinearProblem direct solve used for validation (Multigrid_prototype.py:121-123).
Here CG runs entirely on device inside one `lax.while_loop`; each
preconditioner application is one V-cycle with zero initial guess.  The
flexible (Polak-Ribiere) beta makes CG robust to the mildly nonsymmetric
preconditioner that a non-symmetrized multicolor-GS V-cycle is.
"""
from __future__ import annotations

import dataclasses
from functools import lru_cache, partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import CycleSpec
from .fmg import (_fused_residual_norm, _guard_big_tpu_solve, fmg_solve,
                  residual_norm)
from .hierarchy import Hierarchy
from .vcycle import compute_residual, vcycle


class CGResult(NamedTuple):
    u: jax.Array
    res_hist: jax.Array        # FEM-L2 (mass-weighted) residual per iter
    num_iters: jax.Array
    converged: jax.Array
    diverged: jax.Array


def mgcg_solve(
    hier: Hierarchy,
    spec: CycleSpec,
    fmg_start: bool = True,
) -> CGResult:
    """Flexible MG-preconditioned CG on the finest level.

    fmg_start=True seeds CG with one Full-Multigrid pass (nested iteration)
    so the Krylov loop starts at discretization-error accuracy.

    At-scale fast paths (the capstone BASELINE config 5 runs this at
    512^3 = 135M DOFs):

      * A p through the fused Pallas residual kernel as
        p - (p - A p) — one rolling pass instead of the plain padded
        15-slice matvec (~2.4 ms vs ~50 ms at 512^3).  Boundary
        (identity) rows give p - 0 = p, padding rows p, both exact
        because p is zero there by the solver invariants (every term
        feeding p is a residual/V-cycle output, zero outside the box).
      * the per-iteration convergence check recomputes ||b - A x||_M
        with the fused per-tetrahedron norm kernel (6.3 ms vs ~35 ms
        plain at 512^3) — the same check tolerance_solve uses, so
        rtol semantics match the plain V-cycle loop's.

    Stops at rn <= tol OR rn <= rtol * ||b - A*0||_M (when rtol > 0),
    mirroring solver.fmg.tolerance_solve; cropped hierarchies use their
    exact build-time full-storage rn_ref."""
    L = hier.num_levels - 1
    lv = hier.finest
    A = lv.A
    f = lv.b
    dtype = f.dtype
    max_it = spec.max_cycles

    if fmg_start and hier.num_levels > 1:
        fixed = dataclasses.replace(spec, mu0=1)
        x0 = fmg_solve(hier, fixed, mode="fixed").u
    else:
        x0 = jnp.zeros_like(f)

    def precond(r):
        return vcycle(hier, spec, L, jnp.zeros_like(r), r)

    def apply_A(p):
        if spec.use_pallas:
            from ..ops import dispatch

            # parity (P2) operators MUST take the fused path too: the
            # plain _apply_parity matvec is K=51 full-grid class-gather
            # passes, which XLA materializes — measured 48.8 GB of HLO
            # temps (compile-time OOM) inside the CG while-loop at the
            # cropped 513^3 lattice.
            if (dispatch.pallas_eligible(A, p.shape, p.dtype)
                    or dispatch.pallas_parity_eligible(
                        A, p.shape, p.dtype)):
                return p - compute_residual(lv, p, p, use_pallas=True)
        return A.apply(p)

    def check_norm(x):
        rn = _fused_residual_norm(hier, spec, x, f)
        if rn is not None:
            return rn
        return residual_norm(
            hier, compute_residual(lv, x, f, use_pallas=spec.use_pallas))

    r0 = compute_residual(lv, x0, f, use_pallas=spec.use_pallas)
    z0 = precond(r0)
    nan = jnp.array(jnp.nan, dtype=dtype)
    hist0 = jnp.full((max_it,), nan, dtype=dtype)
    if spec.rtol > 0.0:
        if hier.rn_ref is not None:
            rn_ref = hier.rn_ref
        else:
            rn_ref = check_norm(jnp.zeros_like(f))
    else:
        rn_ref = jnp.array(jnp.inf, dtype=dtype)

    def body(carry):
        x, r, z, p, rz, k, _, _, hist = carry
        Ap = apply_A(p)
        pAp = jnp.sum(p * Ap)
        alpha = rz / pAp
        x = x + alpha * p
        r_new = r - alpha * Ap
        z_new = precond(r_new)
        # flexible (Polak-Ribiere) beta: z_new . (r_new - r) / rz
        beta = jnp.sum(z_new * (r_new - r)) / rz
        p = z_new + beta * p
        rz_new = jnp.sum(r_new * z_new)
        rn = check_norm(x)
        hist = hist.at[k].set(rn)
        converged = rn <= spec.tol
        if spec.rtol > 0.0:
            converged = converged | (rn <= spec.rtol * rn_ref)
        diverged = ~jnp.isfinite(rn)
        return (x, r_new, z_new, p, rz_new, k + 1, converged, diverged, hist)

    def cond(carry):
        _, _, _, _, _, k, converged, diverged, _ = carry
        return (~converged) & (~diverged) & (k < max_it)

    init = (
        x0, r0, z0, z0, jnp.sum(r0 * z0),
        jnp.array(0, jnp.int32), jnp.array(False), jnp.array(False), hist0,
    )
    x, r, z, p, rz, k, converged, diverged, hist = jax.lax.while_loop(
        cond, body, init
    )
    return CGResult(
        u=x, res_hist=hist, num_iters=k, converged=converged, diverged=diverged
    )


@lru_cache(maxsize=64)
def _jitted_mgcg(spec: CycleSpec, fmg_start: bool):
    return jax.jit(partial(mgcg_solve, spec=spec, fmg_start=fmg_start))


def solve_mgcg(hier: Hierarchy, spec: CycleSpec, fmg_start: bool = True,
               jit: bool = True) -> CGResult:
    # Same guard as solver.fmg.solve: the MG-CG program runs the same
    # class of program (FMG ramp + while_loop + per-cycle norm) that
    # faults the TPU driver at 768^3 (VERDICT r4 weak #4).
    _guard_big_tpu_solve(hier)
    if jit:
        return _jitted_mgcg(spec, fmg_start)(hier)
    return mgcg_solve(hier, spec, fmg_start=fmg_start)
