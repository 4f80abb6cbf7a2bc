"""Batched multi-right-hand-side solves (the data-parallel analogue).

The reference solves a single RHS (SURVEY.md §2c: DP absent).  Because the
whole solve is a pure jitted function of the hierarchy, vmapping over the
finest-level RHS gives a batched solver for free — useful for multiple
load cases / time steps sharing one operator hierarchy.
"""
from __future__ import annotations

import dataclasses
from functools import lru_cache

import jax

from ..config import CycleSpec
from .fmg import SolveResult, tolerance_solve
from .hierarchy import Hierarchy
from .vcycle import prolong_level, vcycle


def _solve_one(hier: Hierarchy, spec: CycleSpec, f_fine: jax.Array):
    """FMG + tolerance loop for one custom finest-level RHS.

    Coarse-level FMG right-hand sides still come from the hierarchy's
    assembled b (reference FullMultiGrid semantics, multigrid.py:279); only
    the finest-level RHS varies across the batch."""
    nlev = hier.num_levels
    v = hier.coarse.solve(hier.levels[0].b)
    for li in range(1, nlev):
        v = prolong_level(v, hier.levels[li - 1], hier.levels[li],
                          spec.prolongation, use_pallas=spec.use_pallas)
        if li < nlev - 1:
            for _ in range(spec.mu0):
                v = vcycle(hier, spec, li, v, hier.levels[li].b)
    return tolerance_solve(hier, spec, v, f_fine)


@lru_cache(maxsize=32)
def _jitted_batched(spec: CycleSpec):
    def fn(hier, f_fine):
        return _solve_one(hier, spec, f_fine)

    return jax.jit(jax.vmap(fn, in_axes=(None, 0)))


@lru_cache(maxsize=32)
def _jitted_batched_map(spec: CycleSpec):
    # lax.map (not vmap): Pallas kernels don't vmap, but under lax.map
    # each batch element runs the full fused-kernel solve sequentially —
    # at 135M-DOF scale the kernels' ~3x per-cycle advantage over the jnp
    # path far outweighs vmap's cross-batch op amortization (and a batch
    # of large grids wouldn't fit HBM concurrently anyway).
    def fn(hier, rhs_batch):
        return jax.lax.map(lambda f: _solve_one(hier, spec, f), rhs_batch)

    return jax.jit(fn)


def solve_batched(hier: Hierarchy, spec: CycleSpec,
                  rhs_batch: jax.Array) -> SolveResult:
    """Solve A u_i = f_i for a batch of finest-level right-hand sides
    (leading axis of `rhs_batch`).  Returns a SolveResult with a leading
    batch axis on every field.

    With spec.use_pallas and a kernel-eligible finest level, the batch is
    a `lax.map` over full-speed fused-kernel solves; otherwise a vmap of
    the jnp-path solve (which DOES vmap, and wins for small grids where
    per-op overhead dominates)."""
    if spec.use_pallas:
        from ..ops import dispatch

        lv = hier.finest
        if (dispatch.pallas_eligible(lv.A, lv.shape, rhs_batch.dtype)
                or dispatch.pallas_planes_eligible(lv.A, lv.shape,
                                                   rhs_batch.dtype)):
            return _jitted_batched_map(spec)(hier, rhs_batch)
        spec = dataclasses.replace(spec, use_pallas=False)
    return _jitted_batched(spec)(hier, rhs_batch)
