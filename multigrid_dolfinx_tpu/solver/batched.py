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


def solve_batched(hier: Hierarchy, spec: CycleSpec,
                  rhs_batch: jax.Array) -> SolveResult:
    """Solve A u_i = f_i for a batch of finest-level right-hand sides
    (leading axis of `rhs_batch`).  Returns a SolveResult with a leading
    batch axis on every field.

    Note: Pallas kernels don't vmap — use spec.use_pallas=False here (the
    const-stencil jnp path is used automatically)."""
    if spec.use_pallas:
        spec = dataclasses.replace(spec, use_pallas=False)
    return _jitted_batched(spec)(hier, rhs_batch)
