"""Multigrid cycles, unrolled over levels into one XLA program.

The reference V-cycle is a Python recursion over scipy matrices with a
SuperLU direct solve at the bottom (multigrid.py:231-268).  Levels here are
a static tuple with fixed shapes, so the recursion unrolls at trace time
into a single jitted program: smoothing loops are `lax.fori_loop`s, the
coarse solve is a pre-factorized dense solve, and there is no host round
trip anywhere inside a cycle (SURVEY.md §7 translation 3).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import CycleSpec
from ..ops import transfer
from ..ops.smoothers import smooth
from .hierarchy import Hierarchy


def logical_view(u, level) -> jax.Array:
    """Slice off sharding/tile padding: the logical grid is (n+1)^d."""
    m = level.n + 1
    sl = tuple(slice(0, m) for _ in range(u.ndim))
    return u[sl] if u.shape != (m,) * u.ndim else u


def pad_to(x: jax.Array, shape) -> jax.Array:
    pads = tuple((0, t - s) for s, t in zip(x.shape, shape))
    if any(p != (0, 0) for p in pads):
        return jnp.pad(x, pads)
    return x


def compute_residual(level, v, f, use_pallas: bool = False) -> jax.Array:
    """r = f - A v, fused into one Pallas pass when eligible."""
    if use_pallas:
        from ..ops import dispatch

        if dispatch.pallas_eligible(level.A, v.shape, v.dtype):
            if v.ndim == 2:
                from ..ops.pallas import stencil2d

                return stencil2d.residual(
                    v, f, level.A.logical_m,
                    interpret=dispatch.interpret_mode(),
                )
            from ..ops.pallas import stencil3d

            wc, woff = dispatch.const7_weights(level.A)
            return stencil3d.residual(
                v, f, level.A.logical_m, wc, woff,
                interpret=dispatch.interpret_mode(),
            )
        if dispatch.pallas_parity_eligible(level.A, v.shape, v.dtype):
            from ..ops.pallas import stencil3d_p2

            out = stencil3d_p2.p2_residual(
                v, f, level.A.logical_m, level.A.parity_weights,
                level.A.offsets, interpret=dispatch.interpret_mode(),
            )
            if out is not None:
                return out
        if dispatch.pallas_planes_eligible(level.A, v.shape, v.dtype):
            if v.ndim == 2:
                from ..ops.pallas import stencil2d

                return stencil2d.planes_residual(
                    v, f, level.A.planes, level.A.offsets,
                    interpret=dispatch.interpret_mode(),
                )
            from ..ops.pallas import stencil3d

            out = stencil3d.planes3_residual(
                v, f, level.A.planes, level.A.offsets,
                interpret=dispatch.interpret_mode(),
            )
            if out is not None:
                return out
    return f - level.A.apply(v)


def restrict_level(r, fine_level, coarse_level, kind: str,
                   use_pallas: bool = False) -> jax.Array:
    """Restrict the fine residual to the coarse grid.

    For the variational 'pt' restriction the coarse problem is a pure
    *correction* equation: the error vanishes at Dirichlet nodes, so the
    boundary residual is masked out before restriction and the coarse bc
    RHS zeroed after (feeding the 2^d-scaled boundary residual into the
    identity bc rows of the coarse operator is unstable — it amplifies the
    boundary error every cycle).  The reference-parity kinds ('injection',
    'full_weighting') keep the reference's behavior of carrying the bc
    residual through (multigrid.py:251-252)."""
    from ..ops.operators import box_interior_mask

    if use_pallas and kind == "pt":
        from ..ops import dispatch

        if (
            (dispatch.pallas_eligible(fine_level.A, r.shape, r.dtype)
             or dispatch.pallas_planes_eligible(fine_level.A, r.shape,
                                                r.dtype)
             or dispatch.pallas_parity_eligible(fine_level.A, r.shape,
                                                r.dtype))
            and dispatch.layout_aligned(coarse_level.shape)
        ):
            if r.ndim == 2:
                from ..ops.pallas import stencil2d

                return stencil2d.restrict_pt(
                    r, coarse_level.shape,
                    fine_level.n + 1, coarse_level.n + 1,
                    interpret=dispatch.interpret_mode(),
                )
            from ..ops.pallas import stencil3d

            return stencil3d.restrict_pt(
                r, coarse_level.shape,
                fine_level.n + 1, coarse_level.n + 1,
                interpret=dispatch.interpret_mode(),
            )

    r_log = logical_view(r, fine_level)
    if kind == "pt":
        mask_f = box_interior_mask(r_log.shape, fine_level.n + 1)
        r_log = jnp.where(mask_f, r_log, jnp.zeros_like(r_log))
    fc = transfer.restrict(r_log, kind)
    if kind == "pt":
        mask_c = box_interior_mask(fc.shape, coarse_level.n + 1)
        fc = jnp.where(mask_c, fc, jnp.zeros_like(fc))
    return pad_to(fc, coarse_level.shape)


def prolong_level(vc, coarse_level, fine_level, kind: str,
                  use_pallas: bool = False) -> jax.Array:
    if use_pallas and kind == "bilinear":
        from ..ops import dispatch

        if (
            (dispatch.pallas_eligible(fine_level.A, fine_level.shape,
                                      vc.dtype)
             or dispatch.pallas_planes_eligible(fine_level.A,
                                                fine_level.shape, vc.dtype)
             or dispatch.pallas_parity_eligible(fine_level.A,
                                                fine_level.shape, vc.dtype))
            and dispatch.layout_aligned(vc.shape)
        ):
            if vc.ndim == 2:
                from ..ops.pallas import stencil2d

                return stencil2d.prolong_linear(
                    vc, fine_level.shape, fine_level.n + 1,
                    interpret=dispatch.interpret_mode(),
                )
            from ..ops.pallas import stencil3d

            return stencil3d.prolong_linear(
                vc, fine_level.shape, fine_level.n + 1,
                interpret=dispatch.interpret_mode(),
            )
    e = transfer.prolong(
        logical_view(vc, coarse_level), kind, fine_level.diagonal
    )
    return pad_to(e, fine_level.shape)


def prolong_correct(vc, coarse_level, fine_level, v, kind: str,
                    use_pallas: bool = False) -> jax.Array:
    """v + P(vc) — the V-cycle correction (reference multigrid.py:258-260),
    fused into the prolongation kernel where eligible (the separate add
    costs 3 extra HBM passes at 135M DOFs)."""
    if use_pallas and kind == "bilinear" and v.ndim == 3:
        from ..ops import dispatch

        if (
            (dispatch.pallas_eligible(fine_level.A, fine_level.shape,
                                      v.dtype)
             or dispatch.pallas_parity_eligible(fine_level.A,
                                                fine_level.shape, v.dtype))
            and dispatch.layout_aligned(vc.shape)
        ):
            from ..ops.pallas import stencil3d

            return stencil3d.prolong_linear_add(
                vc, v, fine_level.n + 1,
                interpret=dispatch.interpret_mode(),
            )
    return v + prolong_level(vc, coarse_level, fine_level, kind,
                             use_pallas=use_pallas)


def _residual_restrict_fused(lv, lv_c, v, f, spec):
    """Coarse correction RHS = P^T (f - A v) in one kernel pass over v/f
    (no residual array materialized); None when the fused path doesn't
    apply (caller does the two-step)."""
    if not (spec.use_pallas and spec.restriction == "pt" and v.ndim == 3):
        return None
    from ..ops import dispatch

    if not (
        dispatch.pallas_eligible(lv.A, v.shape, v.dtype)
        and dispatch.layout_aligned(lv_c.shape)
    ):
        return None
    from ..ops.pallas import stencil3d

    wc, woff = dispatch.const7_weights(lv.A)
    return stencil3d.restrict_residual_pt(
        v, f, lv_c.shape, lv.n + 1, lv_c.n + 1, wc, woff,
        interpret=dispatch.interpret_mode(),
    )


def _cycle_fuse_ok(lv, lv_c, spec, v, f):
    """Static eligibility of the cycle-step fusion kernels
    (ops.pallas.stencil3d_cycle): 3D const-7 f32 rbgs levels with
    tile-aligned fine AND coarse storage."""
    if not (spec.use_pallas and spec.smoother == "rbgs"
            and spec.restriction == "pt" and spec.prolongation == "bilinear"
            and v.ndim == 3):
        return None
    from ..ops import dispatch

    if not (dispatch.pallas_eligible(lv.A, v.shape, v.dtype)
            and dispatch.layout_aligned(lv_c.shape)):
        return None
    return dispatch.const7_weights(lv.A)


def _fused_tail_levels(hier: Hierarchy, spec: CycleSpec, j: int):
    """Static eligibility of the fused coarse-tail kernels for the
    sub-hierarchy 0..j (see ops.pallas.stencil3d_tail): pure-V recursion,
    f32 const-7 levels with aligned storage, top level under the VMEM
    threshold.  Returns the levels tuple or None."""
    # the tail kernels smooth with red-black GS only (the production
    # smoother); other smoothers keep the per-level path
    if (not spec.use_pallas or spec.cycle != "V" or j < 1
            or spec.smoother != "rbgs"):
        return None
    from ..ops import dispatch
    from ..ops.pallas import stencil3d_tail as tail

    levels = []
    for lv in hier.levels[: j + 1]:
        if lv.A.planes is not None or len(lv.shape) != 3:
            return None
        w = dispatch.const7_weights(lv.A)
        if w is None:
            return None
        levels.append((lv.n + 1, tuple(lv.shape), w[0], w[1]))
    if hier.levels[j].b.dtype not in (jnp.float32, jnp.bfloat16):
        # bfloat16 tail serves the mixed-precision inner cycle
        # (solver/mixed.py); the kernels are dtype-generic.
        return None
    if not tail.tail_eligible(levels):
        return None
    return tuple(levels)


def _tail_or_recurse(hier, spec, j, vc, fc):
    """Recursion step into level j with zero initial guess: the fused
    two-kernel tail when eligible, else the per-level vcycle."""
    levels = _fused_tail_levels(hier, spec, j)
    if levels is not None:
        from ..ops import dispatch
        from ..ops.pallas import stencil3d_tail as tail

        return tail.fused_tail_vcycle(
            levels, fc, hier.coarse.solve, spec.nu1, spec.nu2,
            interpret=dispatch.interpret_mode(),
        )
    return vcycle(hier, spec, j, vc, fc)


def vcycle(
    hier: Hierarchy,
    spec: CycleSpec,
    lidx: int,
    v: jax.Array,
    f: jax.Array,
    collect_debug: bool = False,
):
    """One cycle (V, W, or F shape per spec.cycle) at level index `lidx`
    (0 = coarsest) with initial guess v and right-hand side f.

    Semantics at reference multigrid.py:231-268: coarsest -> direct solve;
    else pre-smooth nu1, restrict the residual (injection by default, as the
    reference's active path at :251-252), recurse with zero initial guess,
    prolong the coarse error and correct, post-smooth nu2.

    With collect_debug=True also returns (restricted residual, coarse error,
    interpolated correction) — the reference's test=True plumb-through
    (multigrid.py:262-266).
    """
    if lidx == 0:
        u = hier.coarse.solve(f)
        return (u, None) if collect_debug else u

    lv = hier.levels[lidx]
    lv_c = hier.levels[lidx - 1]
    # Cycle-step fusion (MG_CYCLE_FUSE=1, measured and REJECTED — off by
    # default): the LAST pre-smooth sweep + residual + P^T restriction in
    # one rolling pass, and prolong+correct + FIRST post-smooth likewise.
    # Each saves a 2.4-2.6 ms fine-grid re-read at 512^3 but the fused
    # sweep's dependency pyramid (halo 4 / halo 2 stage ranges) tips the
    # DMA-bound sweep compute-bound: traced 25.6 (A only) / 25.7 (B only)
    # vs 21.1 ms/V-cycle baseline.  Kept behind the flag with bitwise
    # equivalence tests (tests/test_pallas_kernels.py) — same verdict as
    # the MG_RB2 double-sweep fusion (BENCHMARKS.md measured-rejects).
    import os as _os
    _fuse = _os.environ.get("MG_CYCLE_FUSE", "0") == "1"
    cw = _cycle_fuse_ok(lv, lv_c, spec, v, f) if _fuse else None
    fc = None
    fuse_a = cw is not None and _os.environ.get("MG_FUSE_A", "1") == "1"
    fuse_b = cw is not None and _os.environ.get("MG_FUSE_B", "1") == "1"
    if fuse_a and spec.nu1 >= 1:
        from ..ops import dispatch
        from ..ops.pallas import stencil3d_cycle

        v1 = smooth(lv.sm, lv.A, v, f, spec.nu1 - 1, spec.smoother,
                    use_pallas=spec.use_pallas) if spec.nu1 > 1 else v
        out = stencil3d_cycle.rb_residual_restrict_fused(
            v1, f, lv_c.shape, lv.n + 1, lv_c.n + 1, cw[0], cw[1],
            interpret=dispatch.interpret_mode(),
        )
        if out is not None:
            v, fc = out
        else:
            v = smooth(lv.sm, lv.A, v1, f, 1, spec.smoother,
                       use_pallas=spec.use_pallas)
    else:
        v = smooth(lv.sm, lv.A, v, f, spec.nu1, spec.smoother,
                   use_pallas=spec.use_pallas)
    if fc is None:
        fc = _residual_restrict_fused(lv, lv_c, v, f, spec)
    if fc is None:
        r = compute_residual(lv, v, f, use_pallas=spec.use_pallas)
        fc = restrict_level(r, lv, lv_c, spec.restriction,
                            use_pallas=spec.use_pallas)
    vc = jnp.zeros_like(fc)

    if spec.cycle == "V" or lidx - 1 == 0:
        vc = _tail_or_recurse(hier, spec, lidx - 1, vc, fc)
    elif spec.cycle == "W":
        vc = vcycle(hier, spec, lidx - 1, vc, fc)
        vc = vcycle(hier, spec, lidx - 1, vc, fc)
    elif spec.cycle == "F":
        # F-cycle: one F-recursion followed by one V-cycle on the coarse
        # problem.
        import dataclasses as _dc

        vc = vcycle(hier, spec, lidx - 1, vc, fc)
        v_spec = _dc.replace(spec, cycle="V")
        vc = vcycle(hier, v_spec, lidx - 1, vc, fc)
    else:
        raise ValueError(f"unknown cycle {spec.cycle!r}")

    if collect_debug:
        # debug plumb-through needs the raw correction (reference
        # test=True internals) — keep the unfused path there.
        e = prolong_level(vc, lv_c, lv, spec.prolongation,
                          use_pallas=spec.use_pallas)
        v = v + e
        v = smooth(lv.sm, lv.A, v, f, spec.nu2, spec.smoother,
                   use_pallas=spec.use_pallas)
    else:
        # Cycle-step fusion: prolong+correct + the FIRST post-smooth
        # sweep in one rolling pass (saves re-reading v and f).
        v2 = None
        if fuse_b and spec.nu2 >= 1:
            from ..ops import dispatch
            from ..ops.pallas import stencil3d_cycle

            v2 = stencil3d_cycle.prolong_correct_rb_fused(
                vc, v, f, lv.n + 1, cw[0], cw[1],
                interpret=dispatch.interpret_mode(),
            )
        if v2 is not None:
            v = smooth(lv.sm, lv.A, v2, f, spec.nu2 - 1, spec.smoother,
                       use_pallas=spec.use_pallas) if spec.nu2 > 1 else v2
        else:
            v = prolong_correct(vc, lv_c, lv, v, spec.prolongation,
                                use_pallas=spec.use_pallas)
            v = smooth(lv.sm, lv.A, v, f, spec.nu2, spec.smoother,
                       use_pallas=spec.use_pallas)
    if collect_debug:
        return v, (fc, vc, e)
    return v
