"""Smoothers: weighted Jacobi (reference-exact), multicolor Gauss-Seidel,
and Chebyshev polynomial smoothing.

The reference has exactly one smoother — weighted Jacobi with omega=2/3,
implemented as `sol = (1-w)v + w*Dinv.dot(f) - w*R_omega.dot(v)` repeated nw
times (multigrid.py:223-228, splitting built at :48-56).  `jacobi_smooth`
reproduces that update *in the same algebraic association* so fixed points
and rounding behavior match; the reference's per-sweep recomputation of
Dinv*f (an avoidable SpMV, SURVEY.md §3.4) is hoisted out of the loop.

Red-black / multicolor Gauss-Seidel and Chebyshev are the TPU-friendly
additions (BASELINE.json configs 2-3): color updates are mask-parallel and
race-free by construction, Chebyshev needs only matvecs.
"""
from __future__ import annotations

import dataclasses
import itertools
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from .operators import StencilOperator


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["r_omega", "dinv", "lmax"],
    meta_fields=["omega", "cheby_degree", "cheby_eig_ratio"],
)
@dataclasses.dataclass(frozen=True)
class SmootherData:
    """Per-level precomputed smoother state (device pytree).

    r_omega: Dinv*(A - D) as a stencil op — the reference's R_omega matrix
             (multigrid.py:55).
    dinv:    1/diag(A) grid — the reference's diag_A_inv (multigrid.py:54);
             None for plane-free const levels (synthesized from iota via
             A.dinv(), zero HBM).
    lmax:    estimate of the largest eigenvalue of Dinv*A (Chebyshev).
    """

    r_omega: StencilOperator
    dinv: Optional[jax.Array]
    lmax: jax.Array
    omega: float
    cheby_degree: int
    cheby_eig_ratio: float

    def dinv_for(self, A: StencilOperator) -> jax.Array:
        return self.dinv if self.dinv is not None else A.dinv()


def color_mask(shape: Tuple[int, ...], parity: Tuple[int, ...],
               modulus: int = 2) -> jnp.ndarray:
    """Coordinate-residue mask, computed on the fly from iota (no stored
    mask arrays — free at any grid size).  The modulus^d residue classes
    are independent sets for any stencil of radius modulus-1, so masked
    simultaneous updates are exact Gauss-Seidel and race-free by
    construction (SURVEY.md §5); radius-1 stencils use modulus 2 (the
    classic 2^d coloring), radius-2 (P2) stencils modulus 3."""
    m = None
    for axis, p in enumerate(parity):
        g = (jax.lax.broadcasted_iota(jnp.int32, shape, axis) % modulus) == p
        m = g if m is None else m & g
    return m


def sum_parity_mask(shape: Tuple[int, ...], parity: int) -> jnp.ndarray:
    """Red/black mask by coordinate-sum parity — a valid 2-coloring whenever
    the stencil has only axis-aligned neighbors (the 5-/7-point Poisson
    case), halving the color loop vs the generic 2^d classes."""
    acc = None
    for axis in range(len(shape)):
        i = jax.lax.broadcasted_iota(jnp.int32, shape, axis)
        acc = i if acc is None else acc + i
    return (acc % 2) == parity


def jacobi_smooth(
    sm: SmootherData,
    v: jax.Array,
    f: jax.Array,
    nsweeps: int,
    unroll: bool = False,
    A: Optional[StencilOperator] = None,
    snap_bc: bool = False,
) -> jax.Array:
    """nw sweeps of  v <- (1-w) v + w (Dinv f) - w (R_omega v).

    Bitwise-faithful to reference jacobiRelaxation (multigrid.py:223-228)
    modulo summation order inside the matvec; Dinv*f hoisted (the reference
    recomputes it every sweep with identical value — multigrid.py:226).

    snap_bc=True (parity-table P2 path only) sets Dirichlet rows to f
    each sweep instead of the damped mixing — the host twin of the
    stencil3d_p2 jacobi kernel's snap, which cropped P2 storage relies
    on (boundary residual identically zero at every check).  Never set
    on the reference-parity paths: the reference mixes bc rows
    ((1-w) v + w f, multigrid.py:226 with identity rows)."""
    w = sm.omega
    dinv = sm.dinv if sm.dinv is not None else (
        A.dinv() if A is not None else sm.r_omega.dinv()
    )

    r = sm.r_omega
    if r.planes is None and r.const_weights is None:
        # hierarchy built without R_omega storage (HBM saver for
        # non-Jacobi variable-coefficient configs): the algebraically
        # identical A-form  v <- v + w Dinv (f - A v)
        if A is None:
            raise ValueError(
                "this hierarchy was built without R_omega planes "
                "(smoother != 'jacobi' at build time); pass A or rebuild "
                "with smoother='jacobi'")

        if snap_bc:
            from .operators import box_interior_mask

            interior = box_interior_mask(f.shape, A.logical_m)

            def sweep(_, v):
                v2 = v + w * (dinv * (f - A.apply(v)))
                return jnp.where(interior, v2, f)
        else:

            def sweep(_, v):
                return v + w * (dinv * (f - A.apply(v)))
    else:
        df = dinv * f

        def sweep(_, v):
            return (1.0 - w) * v + w * df - w * sm.r_omega.apply(v)

    if unroll or nsweeps <= 2:
        for k in range(nsweeps):
            v = sweep(k, v)
        return v
    return jax.lax.fori_loop(0, nsweeps, sweep, v)


def multicolor_gs_smooth(
    sm: SmootherData,
    A: StencilOperator,
    v: jax.Array,
    f: jax.Array,
    nsweeps: int,
) -> jax.Array:
    """Multicolor (red-black in its 2-class specialization) Gauss-Seidel:
    for each color c in turn, v[c] <- v[c] + dinv*(f - A v)[c].

    Each color update touches an independent set, so the masked vectorized
    update is exact lexicographic-within-color GS and fully parallel.
    Axis-only stencils (5-/7-point) use true red-black (2 colors); general
    radius-1 stencils use the 2^d coordinate-parity classes."""
    d = v.ndim
    if A.axis_only and A.radius == 1:
        masks = [partial(sum_parity_mask, parity=p) for p in (0, 1)]
    else:
        mod = A.radius + 1
        masks = [
            partial(color_mask, parity=p, modulus=mod)
            for p in itertools.product(range(mod), repeat=d)
        ]

    dinv = sm.dinv_for(A)

    def sweep(_, v):
        for mk in masks:
            mask = mk(v.shape)
            r = f - A.apply(v)
            v = jnp.where(mask, v + dinv * r, v)
        return v

    if nsweeps <= 2:
        for k in range(nsweeps):
            v = sweep(k, v)
        return v
    return jax.lax.fori_loop(0, nsweeps, sweep, v)


def cheby_phase(nsweeps: int, cheby_degree: int):
    """(rounds, degree) of a Chebyshev smoothing phase asked for
    `nsweeps` sweeps.

    cheby_degree == 0 (the default): the PETSc/production convention —
    the phase is ONE Chebyshev polynomial of degree `nsweeps` (nu
    matvecs: the same matvec budget as nu Jacobi/GS sweeps, so smoother
    choices compare at equal work).  cheby_degree d > 0: `nsweeps`
    applications of a degree-d polynomial (nu * d matvecs — the
    explicit-degree form)."""
    if cheby_degree <= 0:
        return (1, int(nsweeps)) if nsweeps > 0 else (0, 1)
    return int(nsweeps), int(cheby_degree)


def chebyshev_smooth(
    sm: SmootherData,
    A: StencilOperator,
    v: jax.Array,
    f: jax.Array,
    nrounds: int,
    residual_fn=None,
) -> jax.Array:
    """Chebyshev polynomial smoothing on the Dinv-preconditioned operator,
    targeting [lmax/eig_ratio, lmax] (the standard parallel-MG smoother:
    matvec-only, no sequential dependencies — cf. BASELINE.json config 3).

    `nrounds` (= nu) and `sm.cheby_degree` map to (rounds, degree) via
    `cheby_phase`: with the default cheby_degree=0 the phase is ONE
    polynomial of degree nu; an explicit degree d runs nu rounds of
    degree d.  `residual_fn(v, f)` overrides the r = f - A v computation
    (the Pallas path substitutes the fused residual kernel — Chebyshev
    is matvec-only, so that single substitution puts the whole smoother
    at kernel speed)."""
    nrounds, degree = cheby_phase(nrounds, sm.cheby_degree)
    lmax = sm.lmax * 1.05           # safety margin on the lmax estimate
    lmin = lmax / sm.cheby_eig_ratio
    theta = 0.5 * (lmax + lmin)
    delta = 0.5 * (lmax - lmin)
    sigma = theta / delta

    dinv = sm.dinv_for(A)
    if residual_fn is None:
        def residual_fn(v, f):
            return f - A.apply(v)

    def one_round(_, v):
        r = residual_fn(v, f)
        z = dinv * r
        p = z / theta
        v = v + p
        rho_prev = 1.0 / sigma
        for _k in range(1, degree):
            r = residual_fn(v, f)
            z = dinv * r
            rho = 1.0 / (2.0 * sigma - rho_prev)
            p = rho * rho_prev * p + (2.0 * rho / delta) * z
            v = v + p
            rho_prev = rho
        return v

    if nrounds <= 2:
        for k in range(nrounds):
            v = one_round(k, v)
        return v
    return jax.lax.fori_loop(0, nrounds, one_round, v)


def _pallas_jacobi(sm, A, v, f, nsweeps):
    from . import dispatch

    interp = dispatch.interpret_mode()
    lm = A.logical_m
    if v.ndim == 2:
        from .pallas import stencil2d

        df = sm.dinv_for(A) * f

        def sweep(_, v):
            return stencil2d.jacobi_sweep(v, df, lm, sm.omega,
                                          interpret=interp)
    else:
        from .pallas import stencil3d

        wc, woff = dispatch.const7_weights(A)

        def sweep(_, v):
            return stencil3d.jacobi_sweep(v, f, lm, wc, woff, sm.omega,
                                          interpret=interp)

    if nsweeps <= 2:
        for k in range(nsweeps):
            v = sweep(k, v)
        return v
    return jax.lax.fori_loop(0, nsweeps, sweep, v)


def _pallas_rbgs(sm, A, v, f, nsweeps):
    from . import dispatch

    interp = dispatch.interpret_mode()
    lm = A.logical_m
    if v.ndim == 2:
        from .pallas import stencil2d

        def sweep(_, v):
            return stencil2d.rb_sweep(v, f, lm, interpret=interp)
    else:
        from .pallas import stencil3d

        wc, woff = dispatch.const7_weights(A)

        def sweep(_, v):
            return stencil3d.rb_sweep_fused(v, f, lm, wc, woff,
                                            interpret=interp)

        def sweep2(_, v):
            # consecutive sweep PAIRS can fuse into one rolling kernel
            # (v and f cross HBM once for both sweeps) — opt-in via
            # MG_RB2=1; by default this falls back to two single fused
            # sweeps, which measure faster on v5e (see rb_sweep2_fused)
            return stencil3d.rb_sweep2_fused(v, f, lm, wc, woff,
                                             interpret=interp)

        pairs, rem = divmod(nsweeps, 2)
        if pairs <= 2:
            for k in range(pairs):
                v = sweep2(k, v)
        else:
            v = jax.lax.fori_loop(0, pairs, sweep2, v)
        if rem:
            v = sweep(0, v)
        return v

    if nsweeps <= 2:
        for k in range(nsweeps):
            v = sweep(k, v)
        return v
    return jax.lax.fori_loop(0, nsweeps, sweep, v)


def _pallas_planes(sm, A, v, f, nsweeps, kind):
    """Planes-kernel smoothing (variable-coefficient / Galerkin, 2D and
    3D).  Returns None when the 3D kernels don't admit the shape (caller
    falls back to the jnp path)."""
    from . import dispatch

    interp = dispatch.interpret_mode()
    axis_only = A.axis_only and A.radius == 1

    if v.ndim == 2:
        from .pallas import stencil2d

        def sweep(_, v):
            if kind == "jacobi":
                return stencil2d.planes_jacobi_sweep(
                    v, f, A.planes, A.offsets, sm.omega, interpret=interp)
            return stencil2d.planes_gs_sweep(
                v, f, A.planes, A.offsets, axis_only, interpret=interp)
    else:
        from .pallas import stencil3d

        if not stencil3d.planes3_admits(v.shape, A.planes.shape[0],
                                        A.radius):
            return None                  # shape doesn't admit the kernel

        def sweep(_, v):
            if kind == "jacobi":
                return stencil3d.planes3_jacobi_sweep(
                    v, f, A.planes, A.offsets, sm.omega, interpret=interp)
            return stencil3d.planes3_gs_sweep(
                v, f, A.planes, A.offsets, interpret=interp)

    if nsweeps <= 2:
        for k in range(nsweeps):
            v = sweep(k, v)
        return v
    return jax.lax.fori_loop(0, nsweeps, sweep, v)


def smooth(
    sm: SmootherData,
    A: StencilOperator,
    v: jax.Array,
    f: jax.Array,
    nsweeps: int,
    kind: str,
    use_pallas: bool = False,
) -> jax.Array:
    if nsweeps <= 0:
        return v
    if use_pallas:
        from . import dispatch

        if dispatch.pallas_eligible(A, v.shape, v.dtype):
            if kind == "jacobi":
                return _pallas_jacobi(sm, A, v, f, nsweeps)
            if kind == "rbgs":
                return _pallas_rbgs(sm, A, v, f, nsweeps)
            if kind == "chebyshev":
                interp = dispatch.interpret_mode()
                lm = A.logical_m
                if v.ndim == 3:
                    # fused momentum-form step kernel: 4 HBM passes per
                    # matvec step vs ~8 for residual-kernel + XLA updates
                    from .pallas import stencil3d_cheby

                    out = stencil3d_cheby.chebyshev_phase_fused(
                        sm, A, v, f, nsweeps, interpret=interp)
                    if out is not None:
                        return out
                if v.ndim == 2:
                    from .pallas import stencil2d

                    def res_fn(vv, ff):
                        return stencil2d.residual(vv, ff, lm,
                                                  interpret=interp)
                else:
                    from .pallas import stencil3d

                    wc, woff = dispatch.const7_weights(A)

                    def res_fn(vv, ff):
                        return stencil3d.residual(vv, ff, lm, wc, woff,
                                                  interpret=interp)
                return chebyshev_smooth(sm, A, v, f, nsweeps,
                                        residual_fn=res_fn)
        elif dispatch.pallas_parity_eligible(A, v.shape, v.dtype):
            # plane-free const-P2 kernels (stencil3d_p2): jacobi is one
            # rolling pass per sweep; chebyshev substitutes the fused
            # residual into the matvec-only polynomial (same wiring as
            # the const-7 path); rbgs (27 mod-3 colors) falls through to
            # the jnp path — production P2 smoothing is jacobi/chebyshev.
            from .pallas import stencil3d_p2

            interp = dispatch.interpret_mode()
            if kind == "jacobi":
                def sweep(_, vv):
                    return stencil3d_p2.p2_jacobi_sweep(
                        vv, f, A.logical_m, A.parity_weights, A.offsets,
                        sm.omega, interpret=interp)

                if nsweeps <= 2:
                    for k in range(nsweeps):
                        v = sweep(k, v)
                    return v
                return jax.lax.fori_loop(0, nsweeps, sweep, v)
            if kind == "chebyshev":
                def res_fn(vv, ff):
                    return stencil3d_p2.p2_residual(
                        vv, ff, A.logical_m, A.parity_weights, A.offsets,
                        interpret=interp)

                return chebyshev_smooth(sm, A, v, f, nsweeps,
                                        residual_fn=res_fn)
        elif (kind in ("jacobi", "rbgs")
              and dispatch.pallas_planes_eligible(A, v.shape, v.dtype)):
            out = _pallas_planes(sm, A, v, f, nsweeps, kind)
            if out is not None:
                return out
    if kind == "jacobi":
        # parity-table (P2) operators snap bc rows, matching the
        # stencil3d_p2 kernel — see jacobi_smooth's docstring.
        snap = (A is not None and A.parity_tables is not None
                and A.boundary_mode == "identity")
        return jacobi_smooth(sm, v, f, nsweeps, A=A, snap_bc=snap)
    if kind == "rbgs":
        return multicolor_gs_smooth(sm, A, v, f, nsweeps)
    if kind == "chebyshev":
        return chebyshev_smooth(sm, A, v, f, nsweeps)
    raise ValueError(f"unknown smoother {kind!r}")
