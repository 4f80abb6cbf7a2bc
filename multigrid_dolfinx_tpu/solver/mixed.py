"""Mixed-precision solve: float32 iterative refinement around a bfloat16
V-cycle.

The V-cycle is an affine operator: V(v, f) = v + B(f - A v) with B the
multigrid preconditioner (every smoother here — weighted Jacobi, red-black
GS, Chebyshev — is affine in (v, f), and so are the transfers and the
coarse solve).  The stationary iteration v <- V(v, f) is therefore exactly
the defect-correction loop

    r = f - A v          (float32 residual + FEM-L2 norm)
    e = B(r)             (ONE V-cycle on the correction equation, zero
                          initial guess — run entirely in bfloat16)
    v <- v + e           (float32 accumulation)

and the inner B tolerates low precision: it only has to reduce the error,
not resolve it (classical iterative refinement).  On TPU this halves the
HBM traffic of every sweep/transfer on every level — the fine-level RB
sweeps sit at ~85% of the HBM roofline in float32 (BENCHMARKS.md), so
bandwidth is the only lever left.  The correction's boundary rows are
homogeneous by construction (residual is zero on Dirichlet rows), so the
bfloat16 hierarchy needs no boundary-value grids (store_g=False).

The bfloat16 hierarchy is padded to (16, 128) tiles in the minor-two dims
(bfloat16's native tile is twice as tall as float32's (8, 128)); the
float32 hierarchy keeps its default (8, 128) padding, and the two casts
per iteration (pad+downcast r, slice+upcast-add e) are single fused XLA
passes over the data.

Reference substrate: the finest-level while-True of FullMultiGrid
(multigrid.py:286-296) — same iteration, same FEM-L2 convergence test,
with the V-cycle application moved to bfloat16.
"""
from __future__ import annotations

import dataclasses
from functools import lru_cache, partial
from typing import Tuple

import jax
import jax.numpy as jnp

from ..config import CycleSpec, SolverConfig
from .fmg import SolveResult, error_norm, residual_norm
from .hierarchy import Hierarchy, build_lean_hierarchy
from .vcycle import compute_residual, prolong_level, vcycle


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["h32", "h16"],
    meta_fields=[],
)
@dataclasses.dataclass(frozen=True)
class MixedHierarchy:
    """The float32 hierarchy (residuals, norms, accumulation, FMG) paired
    with its bfloat16 shadow (the inner correction V-cycle)."""

    h32: Hierarchy
    h16: Hierarchy

    @property
    def num_levels(self) -> int:
        return self.h32.num_levels


def _bf16_pad_points(config: SolverConfig):
    """Tile-aligned storage for bfloat16: second-minor on 16, minor on
    128 (z free in 3D — kernels window it in slabs)."""
    from .hierarchy import build_grid_hierarchy

    def _r(x, m):
        return ((x + m - 1) // m) * m

    grids = build_grid_hierarchy(config.hierarchy, ndim=config.problem.ndim)
    if config.problem.ndim == 2:
        return [(_r(g.points_per_dim, 16), _r(g.points_per_dim, 128))
                for g in grids]
    return [(_r(g.points_per_dim, 8), _r(g.points_per_dim, 16),
             _r(g.points_per_dim, 128)) for g in grids]


def build_mixed(config: SolverConfig, store_g: bool = True) -> MixedHierarchy:
    """Lean float32 hierarchy + its bfloat16 shadow.

    Only constant-coefficient lean (O(1)-host) builds are supported — the
    production at-scale configuration.  The bfloat16 hierarchy carries no
    boundary grids (the correction equation is homogeneous) and its coarse
    solve stays float32-factored (CoarseSolver casts at the boundary).
    """
    if jnp.dtype(config.dtype) != jnp.float32:
        raise ValueError(
            "mixed-precision solve refines in float32; config.dtype must "
            f"be float32, got {config.dtype!r}"
        )
    h32 = build_lean_hierarchy(config, store_g=store_g)
    cfg16 = dataclasses.replace(config, dtype="bfloat16")
    h16 = build_lean_hierarchy(
        cfg16, pad_points=_bf16_pad_points(config), store_g=False
    )
    return MixedHierarchy(h32=h32, h16=h16)


def _to16(r: jax.Array, shape16: Tuple[int, ...]) -> jax.Array:
    pads = tuple((0, t - s) for s, t in zip(r.shape, shape16))
    if any(p != (0, 0) for p in pads):
        r = jnp.pad(r, pads)
    return r.astype(jnp.bfloat16)


def _from16(e: jax.Array, shape32: Tuple[int, ...]) -> jax.Array:
    sl = tuple(slice(0, s) for s in shape32)
    return e[sl].astype(jnp.float32)


def ir_tolerance_solve(
    mh: MixedHierarchy, spec: CycleSpec, v0: jax.Array, f: jax.Array
) -> SolveResult:
    """Iteratively refine v0 with bfloat16 V-cycle corrections until the
    float32 FEM-L2 residual meets tol/rtol — one float32 residual+norm and
    one bfloat16 V-cycle per iteration (same per-iteration structure as
    fmg.tolerance_solve, which computes the same residual for its norm)."""
    h32, h16 = mh.h32, mh.h16
    L = h32.num_levels - 1
    lv32 = h32.finest
    shape16 = tuple(h16.finest.shape)
    shape32 = tuple(lv32.shape)
    dtype = v0.dtype
    max_c = spec.max_cycles
    nan = jnp.array(jnp.nan, dtype=dtype)
    f16_zero = jnp.zeros(shape16, jnp.bfloat16)

    rn_ref = residual_norm(
        h32, compute_residual(lv32, jnp.zeros_like(v0), f,
                              use_pallas=spec.use_pallas)
    )

    def refine(v, r):
        e16 = vcycle(h16, spec, L, f16_zero, _to16(r, shape16))
        return v + _from16(e16, shape32)

    def body(carry):
        v, r, k, _, _, rn0, res_h, err_h = carry
        v = refine(v, r)
        r = compute_residual(lv32, v, f, use_pallas=spec.use_pallas)
        rn = residual_norm(h32, r)
        en = error_norm(h32, v) if spec.track_error else nan
        res_h = res_h.at[k].set(rn)
        err_h = err_h.at[k].set(en)
        rn0 = jnp.where(k == 0, rn, rn0)
        converged = rn <= spec.tol
        if spec.rtol > 0.0:
            converged = converged | (rn <= spec.rtol * rn_ref)
        diverged = (~jnp.isfinite(rn)) | (rn > 1e8 * rn0)
        return (v, r, k + 1, converged, diverged, rn0, res_h, err_h)

    def cond(carry):
        _, _, k, converged, diverged, _, _, _ = carry
        return (~converged) & (~diverged) & (k < max_c)

    r0 = compute_residual(lv32, v0, f, use_pallas=spec.use_pallas)
    res_h0 = jnp.full((max_c,), nan, dtype=dtype)
    err_h0 = jnp.full((max_c,), nan, dtype=dtype)
    init = (v0, r0, jnp.array(0, jnp.int32), jnp.array(False),
            jnp.array(False), jnp.array(jnp.inf, dtype=dtype),
            res_h0, err_h0)
    v, _, k, converged, diverged, _, res_h, err_h = jax.lax.while_loop(
        cond, body, init
    )
    return SolveResult(
        u=v,
        res_hist=res_h,
        err_hist=err_h,
        num_cycles=k,
        converged=converged,
        diverged=diverged,
    )


def mixed_fmg_solve(mh: MixedHierarchy, spec: CycleSpec) -> SolveResult:
    """FMG start on the float32 hierarchy (one-time, off the hot path),
    then bfloat16 iterative refinement to tolerance at the finest level —
    the mixed-precision production solve."""
    h32 = mh.h32
    nlev = h32.num_levels
    v = h32.coarse.solve(h32.levels[0].b)
    if nlev == 1:
        hist = jnp.full((spec.max_cycles,), jnp.nan, dtype=v.dtype)
        return SolveResult(
            u=v, res_hist=hist, err_hist=hist,
            num_cycles=jnp.array(0, jnp.int32),
            converged=jnp.array(True), diverged=jnp.array(False),
        )
    for li in range(1, nlev):
        v = prolong_level(v, h32.levels[li - 1], h32.levels[li],
                          spec.prolongation, use_pallas=spec.use_pallas)
        if li < nlev - 1:
            for _ in range(spec.mu0):
                v = vcycle(h32, spec, li, v, h32.levels[li].b)
    return ir_tolerance_solve(mh, spec, v, h32.finest.b)


@lru_cache(maxsize=64)
def _jitted_mixed(spec: CycleSpec):
    return jax.jit(partial(mixed_fmg_solve, spec=spec))


def solve_mixed(mh: MixedHierarchy, spec: CycleSpec,
                jit: bool = True) -> SolveResult:
    """Jit-compiled mixed-precision FMG + iterative-refinement solve."""
    if jit:
        return _jitted_mixed(spec)(mh)
    return mixed_fmg_solve(mh, spec)
