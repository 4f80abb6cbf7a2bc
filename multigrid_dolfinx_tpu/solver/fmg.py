"""Full Multigrid (FMG) drivers and the tolerance-driven solve loop.

Reproduces both reference entry points:

  * `FullMultiGrid` (multigrid.py:271-307): recursive FMG using each level's
    *assembled* RHS (b_dict, not a restricted residual), mu0 V-cycles at
    intermediate levels, and at the finest level V-cycles until the
    mass-weighted residual norm drops below tol — here as a single
    `lax.while_loop` on device with fixed-size history buffers, a
    max-iteration guard, and NaN/divergence detection (the reference's loop
    is unbounded `while True`, SURVEY.md §5 'failure detection').
  * `FullMultiGrid_test` (multigrid.py:312-339): fixed mu0 V-cycles at every
    level including the finest, optionally exposing the finest V-cycle's
    internals (test=True plumb-through).
"""
from __future__ import annotations

from functools import lru_cache, partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import CycleSpec
from ..ops.operators import mass_norm
from .hierarchy import Hierarchy
from .vcycle import compute_residual, prolong_level, vcycle


class SolveResult(NamedTuple):
    """Solution + convergence telemetry (device arrays).

    res_hist / err_hist are fixed-size (max_cycles) buffers padded with NaN
    beyond num_cycles — the device-resident version of the reference's
    residual_per_V_cycle_finest / error_per_V_cycle_finest lists
    (multigrid.py:292-295)."""

    u: jax.Array
    res_hist: jax.Array
    err_hist: jax.Array
    num_cycles: jax.Array
    converged: jax.Array
    diverged: jax.Array


def residual_norm(hier: Hierarchy, r: jax.Array) -> jax.Array:
    """FEM-L2 (mass-weighted) residual norm — reference res_calculator
    (multigrid.py:203-208).  Falls back to the vector 2-norm only if the
    hierarchy carries no mass operator (lean hierarchies use a zero-memory
    boundary-class-table mass matrix, so they keep FEM-L2 semantics)."""
    if hier.M_fine is None:
        return jnp.sqrt(jnp.sum(r * r))
    return mass_norm(hier.M_fine, r)


def error_norm(hier: Hierarchy, u: jax.Array) -> jax.Array:
    """FEM-L2 error vs the manufactured (quadratic, hence 'CG2-exact')
    solution — reference err_calculator (multigrid.py:213-218).

    Evaluated per quadrature point:  sum_s vol_s sum_q w_q
    (u_h(x_q) - u*(x_q))^2 — exact-arithmetic-identical to dolfinx's
    assemble_scalar but without the catastrophic cancellation of the
    expanded u^T M u - 2 c^T u + d form."""
    if hier.err_quad is None:
        return jnp.array(jnp.nan, dtype=u.dtype)
    eq = hier.err_quad
    st = eq.stride
    nc = eq.ncells                       # logical element cells per dim
    ndim = u.ndim
    lm = st * nc + 1
    if any(s < lm for s in u.shape):
        # Cropped lean storage: the missing high-boundary Dirichlet plane
        # holds u = uD = u* exactly (GS-family smoothers set boundary rows
        # to f = g each sweep), so reconstruct it analytically before the
        # quadrature slabs slice up to index lm-1.
        cropped = [a for a in range(ndim) if u.shape[a] < lm]
        u = jnp.pad(u, [(0, max(0, lm - s)) for s in u.shape])
        coords = [
            jax.lax.broadcasted_iota(jnp.int32, u.shape, a).astype(u.dtype)
            * (eq.h / st) for a in range(ndim)
        ]
        missing = None
        for a in cropped:
            i = jax.lax.broadcasted_iota(jnp.int32, u.shape, a)
            mm = i == lm - 1
            missing = mm if missing is None else missing | mm
        u = jnp.where(missing, eq.exact_fn(*coords).astype(u.dtype), u)
    cshape = (nc,) * ndim
    # u*(x_q) is evaluated on the fly: x_q = cell_index*h + xq_local, with
    # cell indices from broadcasted_iota — zero stored bytes (the round-1
    # stored-ustar design cost S*Q = 66 grid copies in 3D).  Slabs slice to
    # the logical cell box, so sharding/tile padding never enters.
    iotas = [
        jax.lax.broadcasted_iota(u.dtype, cshape, axis) * eq.h
        for axis in range(ndim)
    ]
    acc = None
    for s, voffs in enumerate(eq.voffs):
        for q, vw in enumerate(eq.vw[s]):
            interp = None
            for a, voff in enumerate(voffs):
                slab = tuple(
                    slice(v, v + st * (nc - 1) + 1, st) for v in voff
                )
                term = eq.lambdas[s][q][a] * u[slab]
                interp = term if interp is None else interp + term
            xq = [io + xo for io, xo in zip(iotas, eq.xq_local[s][q])]
            e = interp - eq.exact_fn(*xq)
            contrib = vw * jnp.sum(e * e)
            acc = contrib if acc is None else acc + contrib
    return jnp.sqrt(jnp.maximum(acc, 0.0))


def _fused_residual_norm(hier: Hierarchy, spec: CycleSpec, v, f):
    """The per-cycle convergence check r = f - Av, rn = sqrt(r^T M r) as
    ONE rolling Pallas pass over (v, f) — or None off the fast path.

    The plain-XLA path costs ~35 ms at 512^3 (residual kernel + padded
    class-table mass matvec + dot), MORE than the ~21 ms V-cycle it
    guards; the per-tetrahedron fused kernel measures 6.3 ms (one read
    of v and f; ops/pallas/stencil3d_norm.residual_tet_quad).  The
    generic table-correlation kernel (286 ms — relayout-bound) remains
    only as the fallback for non-certified mass operators.  Semantics
    identical to residual_norm(compute_residual(...)): reference
    res_calculator, multigrid.py:203-208."""
    import os

    if os.environ.get("MG_FUSED_NORM", "1") != "1":
        return None
    M = hier.M_fine
    if M is None or v.ndim != 3 or not spec.use_pallas:
        return None
    from ..ops import dispatch

    lv = hier.finest
    if (M.parity_tables is not None and M.parity_weights is not None
            and dispatch.pallas_parity_eligible(lv.A, tuple(v.shape),
                                                v.dtype)):
        # P2 parity-table path: fused residual kernel + fused mass
        # quadratic form (vs the plain K = 51 shifted-pass matvec the
        # check otherwise costs every cycle at 513^3 — VERDICT r4 #3).
        from ..ops.pallas import stencil3d_p2

        # include_shell=False: the check always runs on POST-SWEEP
        # iterates, where snap-jacobi leaves boundary rows holding
        # exactly f (r == 0 on every face) — the O(surface) shell delta
        # is then identically zero, and skipping it saves 4.1 s/call at
        # the full 513^3 layout (the ~90 small strip ops don't fuse).
        q = stencil3d_p2.p2_residual_mass_quad(
            v, f, lv.A.logical_m, lv.A.parity_weights, lv.A.offsets,
            M.parity_weights, M.offsets, M.parity_tables,
            interpret=dispatch.interpret_mode(), include_shell=False,
        )
        if q is None:
            return None
        return jnp.sqrt(jnp.maximum(q, 0.0)).astype(v.dtype)
    if M.class_tables is None:
        return None
    if not dispatch.pallas_eligible(lv.A, tuple(v.shape), v.dtype):
        return None
    w = dispatch.const7_weights(lv.A)
    if w is None:
        return None
    from ..ops.pallas import stencil3d_norm

    q = None
    if M.uniform_p1_mass in ("right", "left"):
        # Exact per-tetrahedron geometric form — the fast path (the
        # generic table-correlation kernel below measured compute-bound
        # on v5e; see residual_tet_quad).
        q = stencil3d_norm.residual_tet_quad(
            v, f, lv.n + 1, w[0], w[1], M.uniform_p1_mass,
            interpret=dispatch.interpret_mode(),
        )
    if q is None:
        q = stencil3d_norm.residual_mass_quad(
            v, f, M.class_tables, M.offsets, lv.n + 1, w[0], w[1],
            interpret=dispatch.interpret_mode(),
        )
    if q is None:
        return None
    return jnp.sqrt(jnp.maximum(q, 0.0)).astype(v.dtype)


def tolerance_solve(
    hier: Hierarchy, spec: CycleSpec, v0: jax.Array, f: jax.Array
) -> SolveResult:
    """V-cycle until residual <= tol, with history recording — the
    reference's finest-level while-True (multigrid.py:286-296) made
    device-resident, bounded, and divergence-guarded."""
    L = hier.num_levels - 1
    A_fine = hier.finest.A
    dtype = v0.dtype
    max_c = spec.max_cycles
    nan = jnp.array(jnp.nan, dtype=dtype)

    def check_norm(v):
        rn = _fused_residual_norm(hier, spec, v, f)
        if rn is not None:
            return rn
        r = compute_residual(hier.finest, v, f, use_pallas=spec.use_pallas)
        return residual_norm(hier, r)

    # rtol is measured against the residual of the zero iterate (i.e.
    # ||b||-ish), NOT the post-FMG starting residual — FMG already lands
    # near the discretization floor, so a further 1e-6 relative drop from
    # there would be unreachable.  Cropped hierarchies carry the exact
    # full-storage value precomputed at build time (the cropped arrays
    # cannot see the missing boundary planes' r = b contribution), valid
    # only for the hierarchy's own RHS.
    if hier.rn_ref is not None and f is hier.finest.b:
        rn_ref = hier.rn_ref
    else:
        rn_ref = check_norm(jnp.zeros_like(v0))

    def body(carry):
        v, k, _, _, rn0, res_h, err_h = carry
        v = vcycle(hier, spec, L, v, f)
        rn = check_norm(v)
        en = error_norm(hier, v) if spec.track_error else nan
        res_h = res_h.at[k].set(rn)
        err_h = err_h.at[k].set(en)
        rn0 = jnp.where(k == 0, rn, rn0)
        converged = rn <= spec.tol
        if spec.rtol > 0.0:
            converged = converged | (rn <= spec.rtol * rn_ref)
        # Divergence guard (absent in the reference's unbounded while-True,
        # SURVEY.md §5): non-finite residual OR runaway growth.
        diverged = (~jnp.isfinite(rn)) | (rn > 1e8 * rn0)
        return (v, k + 1, converged, diverged, rn0, res_h, err_h)

    def cond(carry):
        _, k, converged, diverged, _, _, _ = carry
        return (~converged) & (~diverged) & (k < max_c)

    res_h0 = jnp.full((max_c,), nan, dtype=dtype)
    err_h0 = jnp.full((max_c,), nan, dtype=dtype)
    init = (v0, jnp.array(0, jnp.int32), jnp.array(False), jnp.array(False),
            jnp.array(jnp.inf, dtype=dtype), res_h0, err_h0)
    v, k, converged, diverged, _, res_h, err_h = jax.lax.while_loop(
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


def _ramp_prolong(hier: Hierarchy, li: int, v, spec: CycleSpec):
    """The FMG ramp's SOLUTION prolongation from level li-1 to li.

    Unlike the V-cycle's correction prolongation (whose boundary values
    are zero by construction), the ramp carries nonzero Dirichlet values.
    Under cropped lean storage the coarse level's high-boundary planes are
    not stored, so prolonging the raw array would feed zeros where uD
    belongs and degrade the FMG initial guess near the high faces
    (ADVICE r3).  Reconstruct them analytically — GS-family smoothers
    leave boundary rows holding exactly f = g = uD after every sweep —
    and prolong on the logical box (plain path; runs once per level per
    solve, not per cycle)."""
    lo, hi = hier.levels[li - 1], hier.levels[li]
    m_lo, m_hi = lo.n + 1, hi.n + 1
    lo_cropped = any(s < m_lo for s in lo.shape)
    hi_cropped = any(s < m_hi for s in hi.shape)
    if not (lo_cropped or hi_cropped):
        return prolong_level(v, lo, hi, spec.prolongation,
                             use_pallas=spec.use_pallas)
    from ..ops import transfer
    from .vcycle import pad_to

    vbox = v[tuple(slice(0, min(m_lo, s)) for s in v.shape)]
    stored = vbox.shape
    vfull = pad_to(vbox, (m_lo,) * v.ndim)
    if lo_cropped and hier.err_quad is not None:
        h_lo = 1.0 / lo.n
        coords = [
            jax.lax.broadcasted_iota(jnp.int32, vfull.shape, a)
            .astype(v.dtype) * h_lo
            for a in range(v.ndim)
        ]
        missing = None
        for a in range(v.ndim):
            if stored[a] < m_lo:
                i = jax.lax.broadcasted_iota(jnp.int32, vfull.shape, a)
                mm = i >= stored[a]
                missing = mm if missing is None else missing | mm
        uD = hier.err_quad.exact_fn(*coords).astype(v.dtype)
        vfull = jnp.where(missing, uD, vfull)
    if spec.use_pallas and spec.prolongation == "bilinear" and v.ndim == 3:
        # Fast path: reconstruct the coarse level to a FULL (tile-padded)
        # layout — cheap at coarse size — and run the fused Pallas
        # prolongation full -> full, then slice back to cropped storage.
        # The plain transfer.prolong path below costs ~1.3 s at the
        # 256 -> 512 step (strided-scatter XLA); this is ~10 ms.
        from ..ops import dispatch
        from ..ops.pallas import stencil3d

        def _r8(x):
            return ((x + 7) // 8) * 8

        def _r128(x):
            return ((x + 127) // 128) * 128

        full_lo = (_r8(m_lo), _r8(m_lo), _r128(m_lo))
        full_hi = (_r8(m_hi), _r8(m_hi), _r128(m_hi))
        if (dispatch.layout_aligned(full_lo)
                and dispatch.dtype_layout_ok(full_lo, v.dtype)):
            vc_full = jnp.zeros(full_lo, v.dtype)
            vc_full = vc_full.at[
                tuple(slice(0, s) for s in vfull.shape)].set(vfull)
            ef = stencil3d.prolong_linear(
                vc_full, full_hi, m_hi,
                interpret=dispatch.interpret_mode(),
            )
            return ef[tuple(slice(0, s) for s in hi.shape)]
    e = transfer.prolong(vfull, spec.prolongation, hi.diagonal)
    box = tuple(slice(0, min(m_hi, s)) for s in hi.shape)
    out = jnp.zeros(hi.shape, v.dtype)
    return out.at[box].set(e[tuple(slice(0, b.stop) for b in box)])


def fmg_solve(
    hier: Hierarchy,
    spec: CycleSpec,
    mode: str = "tol",
    collect_debug: bool = False,
):
    """Full Multigrid from the coarsest level up.

    mode='tol'   == reference FullMultiGrid (multigrid.py:271-307).
    mode='fixed' == reference FullMultiGrid_test (multigrid.py:312-339):
                    mu0 cycles at every level including the finest.
    collect_debug (fixed mode) additionally returns the finest V-cycle's
    (restricted residual, coarse error, interpolated correction), matching
    the reference's test=True return (multigrid.py:262-266).
    """
    if mode not in ("tol", "fixed"):
        raise ValueError(f"mode must be 'tol' or 'fixed', got {mode!r}")
    nlev = hier.num_levels
    v = hier.coarse.solve(hier.levels[0].b)
    debug = None

    if nlev == 1:
        zero_hist = jnp.full((spec.max_cycles,), jnp.nan, dtype=v.dtype)
        res = SolveResult(
            u=v,
            res_hist=zero_hist,
            err_hist=zero_hist,
            num_cycles=jnp.array(0, jnp.int32),
            converged=jnp.array(True),
            diverged=jnp.array(False),
        )
        return (res, debug) if collect_debug else res

    for li in range(1, nlev):
        v = _ramp_prolong(hier, li, v, spec)
        f = hier.levels[li].b
        is_finest = li == nlev - 1
        if not is_finest or mode == "fixed":
            for c in range(spec.mu0):
                want_debug = collect_debug and is_finest and c == spec.mu0 - 1
                out = vcycle(hier, spec, li, v, f, collect_debug=want_debug)
                if want_debug:
                    v, debug = out
                else:
                    v = out
        else:
            result = tolerance_solve(hier, spec, v, f)
            return (result, debug) if collect_debug else result

    # fixed mode: compute final norms once for telemetry.
    A_fine = hier.finest.A
    f = hier.finest.b
    r = f - A_fine.apply(v)
    rn = residual_norm(hier, r)
    dtype = v.dtype
    en = (error_norm(hier, v) if spec.track_error
          else jnp.array(jnp.nan, dtype=dtype))
    res_h = jnp.full((spec.max_cycles,), jnp.nan, dtype=dtype).at[0].set(rn)
    err_h = jnp.full((spec.max_cycles,), jnp.nan, dtype=dtype).at[0].set(en)
    result = SolveResult(
        u=v,
        res_hist=res_h,
        err_hist=err_h,
        num_cycles=jnp.array(spec.mu0, jnp.int32),
        converged=rn <= spec.tol,
        diverged=~jnp.isfinite(rn),
    )
    return (result, debug) if collect_debug else result


def _guard_big_tpu_solve(hier: Hierarchy) -> None:
    """Refuse the known-fault configuration loudly instead of wedging
    the chip.

    Executing the full tolerance-solve PROGRAM at 768^3 (4.6e8 nodes) on
    a real TPU crashed the worker at DRIVER level in round 3 — no Python
    exception, the chip wedges for ~2 h (BENCHMARKS.md "Scale headroom").
    V-cycle THROUGHPUT at 768^3 is fine (scripts/big_demo.py, 77.6 ms);
    only the solve program (FMG ramp + while_loop + per-cycle norm)
    faults.  Until the driver fault is pinned, solves above the guard
    size are refused on TPU with an actionable message; MG_BIG_SOLVE=1
    overrides (accepting the wedge risk).  Production solves at this
    scale are the z-decomposed multi-chip path (parallel/halo3d)."""
    import os

    if os.environ.get("MG_BIG_SOLVE", "0") == "1":
        return
    try:
        platform = jax.devices()[0].platform.lower()
    except Exception:
        return
    if not ("tpu" in platform or "axon" in platform):
        return
    points = 1
    for s in hier.finest.b.shape:
        points *= int(s)
    if points > 3 * 10**8:  # 512^3 padded ~1.7e8 ok; 768^3 ~4.6e8 faults
        raise RuntimeError(
            f"refusing single-chip tolerance/FMG solve at {points:.2e} "
            "storage points on TPU: executing this program crashed the "
            "TPU worker at driver level (not a catchable error — the "
            "chip wedges ~2 h; see BENCHMARKS.md 'Scale headroom'). "
            "V-cycle throughput at this size works (scripts/big_demo.py)."
            " Use the multi-chip z-decomposed solver "
            "(parallel/halo3d.build_halo_solver3d) for production solves"
            " at >512^3, or set MG_BIG_SOLVE=1 to attempt anyway."
        )


def resume_solve(hier: Hierarchy, spec: CycleSpec, v0) -> SolveResult:
    """Continue V-cycling from a previous iterate (e.g. a loaded
    checkpoint) until tolerance — the resume path the reference lacks
    (SURVEY.md §5)."""
    _guard_big_tpu_solve(hier)
    return _jitted_resume(spec)(hier, jnp.asarray(v0))


@lru_cache(maxsize=64)
def _jitted_resume(spec: CycleSpec):
    def run(hier, v0):
        return tolerance_solve(hier, spec, v0, hier.finest.b)

    return jax.jit(run)


@lru_cache(maxsize=128)
def _jitted_solver(spec: CycleSpec, mode: str):
    # CycleSpec is a frozen (hashable) dataclass, so the jitted program is
    # cached per (spec, mode); without this, wrapping a fresh closure in
    # jax.jit on every call would silently recompile each solve.
    return jax.jit(partial(fmg_solve, spec=spec, mode=mode))


def solve(
    hier: Hierarchy,
    spec: CycleSpec,
    mode: str = "tol",
    jit: bool = True,
) -> SolveResult:
    """Jit-compiled FMG solve over a prebuilt hierarchy."""
    _guard_big_tpu_solve(hier)
    if jit:
        return _jitted_solver(spec, mode)(hier)
    return fmg_solve(hier, spec, mode=mode)
