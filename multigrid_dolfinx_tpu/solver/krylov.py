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
from .fmg import fmg_solve, residual_norm
from .hierarchy import Hierarchy
from .vcycle import vcycle


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
    so the Krylov loop starts at discretization-error accuracy."""
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

    r0 = f - A.apply(x0)
    z0 = precond(r0)
    nan = jnp.array(jnp.nan, dtype=dtype)
    hist0 = jnp.full((max_it,), nan, dtype=dtype)

    def body(carry):
        x, r, z, p, rz, k, _, _, hist = carry
        Ap = A.apply(p)
        pAp = jnp.sum(p * Ap)
        alpha = rz / pAp
        x = x + alpha * p
        r_new = r - alpha * Ap
        z_new = precond(r_new)
        # flexible (Polak-Ribiere) beta: z_new . (r_new - r) / rz
        beta = jnp.sum(z_new * (r_new - r)) / rz
        p = z_new + beta * p
        rz_new = jnp.sum(r_new * z_new)
        rn = residual_norm(hier, r_new)
        hist = hist.at[k].set(rn)
        converged = rn <= spec.tol
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
    if jit:
        return _jitted_mgcg(spec, fmg_start)(hier)
    return mgcg_solve(hier, spec, fmg_start=fmg_start)
