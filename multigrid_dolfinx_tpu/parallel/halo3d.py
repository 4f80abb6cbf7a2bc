"""Distributed 3D smoothing at Pallas-kernel speed: z-decomposition under
shard_map with explicit slab halo exchange.

The 2D halo path (parallel/halo.py) uses jnp ops per shard.  In 3D the
grid's leading z axis carries no TPU tiling constraints, so a 1D
z-decomposition composes *directly* with the fused Pallas kernels
(ops/pallas/stencil3d): each device

  1. exchanges 1- or 2-deep z-slab halos with its mesh neighbors via
     `jax.lax.ppermute` (RDMA over ICI on real hardware),
  2. runs the fused kernel on its halo-extended local block with the
     global z origin threaded in (the kernels' `z_base` SMEM scalar keeps
     boundary masks and red-black parity globally consistent),
  3. drops the halo slabs from the output.

This is the multi-chip production pattern for the north-star problem: a
v5e-8 holds 8 z-slabs of a 1024^3 grid, each smoothing sweep moving only
two (My, Mx) faces per neighbor over ICI.

`build_halo_solver3d` runs the FULL cycle this way — distributed
smoothing, residual, P^T restriction and trilinear prolongation with
1-deep z-slab halos, FEM-L2 residual norms as psums, and the coarse tail
of the hierarchy replicated (all-gathered once per cycle, then solved
redundantly on every rank — the multigrid analogue of PETSc's
redundant/telescope coarse-grid strategy; reference substrate:
ghostUpdate ADD/REVERSE + FORWARD at Multigrid_prototype.py:79-80,
106-107).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..config import SolverConfig
from ..mesh import build_grid_hierarchy
from ..ops.pallas import stencil3d
from ..ops import dispatch
from ..ops import smoothers
from ..ops import transfer as xfer
from ..ops.operators import box_interior_mask
from ..solver.hierarchy import Hierarchy, build_lean_hierarchy

try:
    from jax import shard_map as _sm
    shard_map = _sm.shard_map if hasattr(_sm, "shard_map") else _sm
except Exception:  # pragma: no cover
    from jax.experimental.shard_map import shard_map  # type: ignore


def _shift_slabs(x, axis_name: str, forward: bool):
    n = jax.lax.axis_size(axis_name)
    if n == 1:
        return jnp.zeros_like(x)
    perm = (
        [(i, i + 1) for i in range(n - 1)]
        if forward else [(i + 1, i) for i in range(n - 1)]
    )
    return jax.lax.ppermute(x, axis_name, perm)


def halo_extend_z(u: jax.Array, depth: int, axis_name: str) -> jax.Array:
    """(mz, My, Mx) local block -> (mz + 2*depth, ...) with z-slab halos
    from the two z-neighbors (edge ranks get zeros — the zero extension
    the kernels' global boundary masks expect)."""
    top = _shift_slabs(u[-depth:], axis_name, forward=True)
    bot = _shift_slabs(u[:depth], axis_name, forward=False)
    return jnp.concatenate([top, u, bot], axis=0)


def make_distributed_rb_smoother(
    mesh: Mesh,
    lm: int,
    wc: float,
    woff: float,
    nsweeps: int,
    axis_name: str = "gz",
    interpret: bool | None = None,
):
    """Returns a jitted fn(v_global, f_global) -> v_global applying
    `nsweeps` fused red-black GS sweeps on the z-sharded 7-point system.

    v/f are globally-shaped arrays sharded P(axis_name) on z; the local
    blocks must satisfy the Pallas layout (y % 8 == 0, x % 128 == 0,
    local z even and >= 2)."""
    if interpret is None:
        interpret = dispatch.interpret_mode()

    def local(v, f):
        mz = v.shape[0]
        z_base = jax.lax.axis_index(axis_name) * mz - 2

        def sweep(_, vv):
            vext = halo_extend_z(vv, 2, axis_name)
            fext = halo_extend_z(f, 2, axis_name)
            out = stencil3d.rb_sweep_fused(
                vext, fext, lm, wc, woff, interpret=interpret,
                z_base=z_base,
            )
            return out[2:-2]

        if nsweeps <= 2:
            for k in range(nsweeps):
                v = sweep(k, v)
            return v
        return jax.lax.fori_loop(0, nsweeps, sweep, v)

    fn = shard_map(
        local, mesh=mesh,
        in_specs=(P(axis_name), P(axis_name)),
        out_specs=P(axis_name),
        check_vma=False,
    )
    return jax.jit(fn)


# ======================================================================
# Full distributed 3D V-cycle (z-decomposition, jnp local ops)
# ======================================================================

def _gcoords3(shape, z_off):
    gz = z_off + jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    gy = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    gx = jax.lax.broadcasted_iota(jnp.int32, shape, 2)
    return gz, gy, gx


def _masks3(shape, z_off, lm):
    gz, gy, gx = _gcoords3(shape, z_off)
    interior = (
        (gz >= 1) & (gz <= lm - 2)
        & (gy >= 1) & (gy <= lm - 2)
        & (gx >= 1) & (gx <= lm - 2)
    )
    inbox = (gz <= lm - 1) & (gy <= lm - 1) & (gx <= lm - 1)
    return interior, inbox


def _ext3(u, axis_name):
    """(mz, My, Mx) -> (mz+2, My+2, Mx+2): 1-deep z halos from the mesh
    neighbors (ppermute), zero extension in the local y/x axes (the domain
    boundary)."""
    uz = halo_extend_z(u, 1, axis_name)
    return jnp.pad(uz, ((0, 0), (1, 1), (1, 1)))


def _ext3_repl(u):
    """Replicated-level analogue of _ext3: pure zero extension."""
    return jnp.pad(u, 1)


def _nsum3(up):
    """Sum of the 6 face neighbors from a halo-extended block."""
    c = up[1:-1]
    return (
        up[:-2, 1:-1, 1:-1] + up[2:, 1:-1, 1:-1]
        + c[:, :-2, 1:-1] + c[:, 2:, 1:-1]
        + c[:, 1:-1, :-2] + c[:, 1:-1, 2:]
    )


def apply_const7_local(u, z_off, lm, wc, woff, ext):
    """Local y = A u for the Dirichlet-eliminated isotropic 7-point
    operator (identity boundary rows).  `ext` supplies the halo exchange
    (_ext3 bound to the mesh axis, or _ext3_repl)."""
    interior, _ = _masks3(u.shape, z_off, lm)
    ut = jnp.where(interior, u, jnp.zeros_like(u))
    au = wc * ut + woff * _nsum3(ext(ut))
    return jnp.where(interior, au, u)


def rbgs_sweep_local3(v, f, z_off, lm, wc, woff, ext):
    """One red-black GS sweep: two colored half-sweeps, each with its own
    halo exchange (global (gz+gy+gx) parity keeps colors consistent across
    shard boundaries)."""
    gz, gy, gx = _gcoords3(v.shape, z_off)
    interior, _ = _masks3(v.shape, z_off, lm)
    parity3 = (gz + gy + gx) % 2
    for parity in (0, 1):
        vt = jnp.where(interior, v, jnp.zeros_like(v))
        cand = jnp.where(interior, (f - woff * _nsum3(ext(vt))) / wc, f)
        v = jnp.where(parity3 == parity, cand, v)
    return v


def jacobi_sweep_local3(v, f, z_off, lm, wc, woff, omega, ext):
    interior, _ = _masks3(v.shape, z_off, lm)
    vt = jnp.where(interior, v, jnp.zeros_like(v))
    cand = jnp.where(interior, (f - woff * _nsum3(ext(vt))) / wc, f)
    return (1.0 - omega) * v + omega * cand


def restrict_pt_local3(r, z_off, lmf, lmc, ext):
    """Shard-local P^T restriction (fine local (2mz, Myf, Mxf) -> coarse
    local (mz, Myc, Mxc)): interior-masked fine residual, tensor [1,2,1]/2
    full weighting, even-index subsample.  Fine blocks are aligned 2x
    coarse blocks (pick plan), so one fine z halo suffices; y/x are whole
    axes locally."""
    interior, _ = _masks3(r.shape, z_off, lmf)
    rt = jnp.where(interior, r, jnp.zeros_like(r))
    up = ext(rt)
    a = up[:-2] + 2.0 * up[1:-1] + up[2:]
    b = a[:, :-2] + 2.0 * a[:, 1:-1] + a[:, 2:]
    full = b[:, :, :-2] + 2.0 * b[:, :, 1:-1] + b[:, :, 2:]
    coarse = full[::2, ::2, ::2] * 0.125
    interior_c, _ = _masks3(coarse.shape, z_off // 2, lmc)
    return jnp.where(interior_c, coarse, jnp.zeros_like(coarse))


def prolong_local3(c, zc_off, lmf, axis_name):
    """Shard-local trilinear prolongation: coarse local (mz, Myc, Mxc) ->
    fine local (2mz, 2Myc-1, 2Mxc-1).  Fine node 2i(+1) draws on coarse
    i (and i+1): one coarse +z halo slab; y/x interleave locally."""
    mz = c.shape[0]
    up = halo_extend_z(c, 1, axis_name)
    core = up[1:]                                  # coarse i .. i+mz
    even_z = core[:mz]
    odd_z = 0.5 * (core[:mz] + core[1:mz + 1])
    rows = jnp.stack([even_z, odd_z], axis=1).reshape(
        (2 * mz,) + c.shape[1:]
    )
    my = c.shape[1]
    even_y = rows
    odd_y = 0.5 * (rows[:, :-1] + rows[:, 1:])
    odd_y = jnp.pad(odd_y, ((0, 0), (0, 1), (0, 0)))
    yy = jnp.stack([even_y, odd_y], axis=2).reshape(
        (2 * mz, 2 * my, c.shape[2])
    )[:, : 2 * my - 1]
    mx = c.shape[2]
    even_x = yy
    odd_x = 0.5 * (yy[:, :, :-1] + yy[:, :, 1:])
    odd_x = jnp.pad(odd_x, ((0, 0), (0, 0), (0, 1)))
    fine = jnp.stack([even_x, odd_x], axis=3).reshape(
        (2 * mz, 2 * my - 1, 2 * mx)
    )[:, :, : 2 * mx - 1]
    _, inbox = _masks3(fine.shape, 2 * zc_off, lmf)
    return jnp.where(inbox, fine, jnp.zeros_like(fine))


def mass_quad_local3(r, z_off, lm, tables, offsets, ext):
    """Local partial of r^T M r with the boundary-class-table consistent
    mass operator (ops.operators class_tables mode, z-sharded): classes
    from global coords, plane values from O(3^d) tables — zero stored
    bytes.  psum over the mesh axis completes the FEM-L2 norm."""
    gz, gy, gx = _gcoords3(r.shape, z_off)

    def cls_ax(g):
        return jnp.where(g == 0, 0, jnp.where(g == lm - 1, 2, 1))

    cls = (cls_ax(gz) * 3 + cls_ax(gy)) * 3 + cls_ax(gx)
    inbox = (gz <= lm - 1) & (gy <= lm - 1) & (gx <= lm - 1)
    up = ext(r)
    acc = None
    for k, (dz, dy, dx) in enumerate(offsets):
        w = tables[k].reshape(-1)[cls]
        sl = up[1 + dz:1 + dz + r.shape[0],
                1 + dy:1 + dy + r.shape[1],
                1 + dx:1 + dx + r.shape[2]]
        term = w * sl
        acc = term if acc is None else acc + term
    mr = jnp.where(inbox, acc, jnp.zeros_like(r))
    return jnp.sum(r * mr)


def pick_z_shard_plan(config: SolverConfig, mesh: Mesh,
                      min_slab: int = 2, align: bool = False
                      ) -> Tuple[list, int]:
    """(pad plan, shard_from): levels with >= 2*ngz points per dim are
    z-padded to a mesh-divisible, 2x-progressive size (transfers stay
    shard-local); coarser levels stay replicated at logical shape.
    Returns the plan for build_lean_hierarchy plus the first sharded
    level index.

    align=True is the Pallas-kernel layout: local z slabs are multiples
    of 4 (the rolling kernels' largest block size) and (y, x) land on
    (8, 128) tile boundaries.  The z rounding quantum 4*ngz compounds up
    the 2x-progressive hierarchy, so shard_from is chosen to minimize the
    FINEST level's padded z (rounding a small level and doubling it up
    can cost 1.5x fine-array memory); near-ties break toward sharding
    more levels (deeper parallel coverage for the same storage)."""
    grids = build_grid_hierarchy(config.hierarchy, ndim=3)
    ngz = int(np.prod(mesh.devices.shape))
    lms = [g.points_per_dim for g in grids]
    L = len(lms) - 1
    # level 0 must stay replicated: the coarsest direct solve needs the
    # full grid on every rank (redundant solve beats communication there).
    valid = [i for i in range(1, len(lms)) if lms[i] >= min_slab * ngz]
    if not valid:
        raise ValueError(
            f"no level large enough to z-shard over {ngz} devices "
            f"(finest has {lms[-1]} points/dim)"
        )
    if align:
        q = 4 * ngz

        def zfin(si):
            return ((lms[si] + q - 1) // q) * q * (2 ** (L - si))

        zmin = min(zfin(si) for si in valid)
        shard_from = min(
            si for si in valid if zfin(si) - zmin <= max(zmin // 16, q))
        z0 = ((lms[shard_from] + q - 1) // q) * q

        def _r(x, m):
            return ((x + m - 1) // m) * m

        plan = []
        for i, m in enumerate(lms):
            if i < shard_from:
                # replicated levels get the single-device lean layout so
                # the plain single-device kernels run on them (redundant
                # per-rank coarse compute at kernel speed)
                plan.append((_r(m, 8), _r(m, 8), _r(m, 128)))
            else:
                z = z0 * (2 ** (i - shard_from))
                plan.append((z, _r(m, 8), _r(m, 128)))
        return plan, shard_from
    shard_from = valid[0]
    z0 = ((lms[shard_from] + ngz - 1) // ngz) * ngz
    plan = []
    for i, m in enumerate(lms):
        if i < shard_from:
            plan.append(None)
        else:
            z = z0 * (2 ** (i - shard_from))
            plan.append((z, m, m))
    return plan, shard_from


def build_halo_solver3d(config: SolverConfig, mesh: Mesh):
    """Returns (hierarchy, solve_fn): the fully explicit distributed 3D
    V-cycle solve (FMG start + tolerance loop) under one shard_map.
    solve_fn(hier) -> (u_global, num_cycles, converged); u_global is
    z-sharded with the fine level's padded shape.

    Variable-coefficient configs dispatch to the z-decomposed planes
    path (parallel/halo3d_var) — the K coefficient-plane slabs shard
    alongside v/f, which is how variable-kappa problems scale past the
    single-chip HBM cap."""
    if config.problem.kappa is not None:
        from .halo3d_var import build_halo_var3d

        return build_halo_var3d(config, mesh)
    hier, solve_fn, _, _, _ = _build_halo3d(config, mesh)
    return hier, solve_fn


def build_halo_cycler3d(config: SolverConfig, mesh: Mesh, cycles: int):
    """Returns (hierarchy, cycle_fn): cycle_fn(hier, v0) runs `cycles`
    finest-level V-cycles of the distributed solver (no norms, no FMG) —
    the benchmarking entry matching bench.py's k_cycles loop, so the
    distributed per-V-cycle time is directly comparable to the
    single-chip number."""
    hier, _, cycle_fn, _, _ = _build_halo3d(config, mesh, bench_cycles=cycles)
    return hier, cycle_fn


def build_halo_mgcg3d(config: SolverConfig, mesh: Mesh):
    """Returns (hierarchy, mgcg_fn): the distributed flexible MG-CG solve
    (FMG start + CG with the z-decomposed V-cycle as preconditioner,
    psum dot-products) under one shard_map — the multi-chip half of
    BASELINE config 5.  mgcg_fn(hier) -> (u_global, num_iters,
    converged, res_hist); iteration counts match solver.krylov.mgcg_solve
    on a single device (tests/test_halo3d.py)."""
    if config.problem.kappa is not None:
        from .halo3d_var import build_halo_var_mgcg3d

        return build_halo_var_mgcg3d(config, mesh)
    hier, _, _, mgcg_fn, _ = _build_halo3d(config, mesh)
    return hier, mgcg_fn


def build_halo_resume3d(config: SolverConfig, mesh: Mesh):
    """Returns (hierarchy, resume_fn): resume_fn(hier, v0, k0, hist0)
    continues the distributed tolerance loop from a checkpointed
    (iterate, cycle index, residual history) — the multi-chip
    checkpoint/resume surface (utils.checkpoint.save_halo_checkpoint).
    Same outputs as build_halo_solver3d's solve_fn."""
    hier, _, _, _, resume_fn = _build_halo3d(config, mesh)
    return hier, resume_fn


def _build_halo3d(config: SolverConfig, mesh: Mesh,
                  bench_cycles: int | None = None):
    """Shared builder for the distributed 3D z-decomposed cycle.

    Requirements: 3D constant-coefficient P1 (lean hierarchy, isotropic
    7-point), 1D device mesh.  Cycle counts match the single-device
    solve exactly: same FEM-L2 class-table residual norm, same tol/rtol
    semantics (solver.fmg.tolerance_solve)."""
    if config.problem.ndim != 3:
        raise ValueError("build_halo_solver3d is the 3D path")
    if len(mesh.devices.shape) != 1:
        raise ValueError("3D halo path wants a 1D ('gz',) mesh")
    spec = config.cycle
    if spec.smoother not in ("rbgs", "jacobi", "chebyshev"):
        raise NotImplementedError(
            "3D halo path: rbgs/jacobi/chebyshev smoothing")
    if spec.restriction not in ("pt", "injection", "full_weighting"):
        raise NotImplementedError(
            f"3D halo path: restriction {spec.restriction!r}")
    if spec.prolongation != "bilinear":
        raise NotImplementedError("3D halo path: bilinear prolongation")
    if spec.coarse_solver not in ("cholesky", "inverse"):
        raise NotImplementedError("3D halo path: cholesky/inverse coarse")

    # use_pallas + f32: sharded levels run the fused halo-aware Pallas
    # kernels (ops/pallas/stencil3d_dist) — per-shard throughput matches
    # the single-chip kernels.  Otherwise (f64 parity runs) jnp local ops.
    use_kernels = bool(spec.use_pallas) and (
        jnp.dtype(config.dtype) == jnp.float32)
    interp = dispatch.interpret_mode()
    plan, s = pick_z_shard_plan(config, mesh, align=use_kernels)
    hier = build_lean_hierarchy(config, pad_points=plan)
    ax = mesh.axis_names[0]
    ngz = int(np.prod(mesh.devices.shape))
    grids = build_grid_hierarchy(config.hierarchy, ndim=3)
    lms = [g.points_per_dim for g in grids]
    L = len(lms) - 1
    weights = [
        dispatch.const7_weights(lv.A) for lv in hier.levels
    ]
    if any(w is None for w in weights):
        raise NotImplementedError(
            "3D halo const path: isotropic 7-point only (variable-kappa "
            "configs dispatch to parallel/halo3d_var via "
            "build_halo_solver3d; P2 multi-chip is halo3d_p2)")
    # Chebyshev spectral windows: exact Dirichlet-Laplacian lmax per level
    # (solver.hierarchy.const_lmax_dirichlet), matching what the lean
    # hierarchy's SmootherData now carries on the single-device path.
    lmaxs = [float(lv.sm.lmax) for lv in hier.levels]
    cheby_ratio = 4.0
    m_op = hier.M_fine
    m_offsets = m_op.offsets
    mz_per = [None if i < s else plan[i][0] // ngz
              for i in range(len(plan))]

    def make_local_ops(coarse_factor, m_tables):
        # builds the per-shard op suite (smooth/residual/vcycle/norm) the
        # solve and bench entries share; everything closes over the static
        # plan, not over the RHS blocks.
        def zoff(li):
            if li < s:
                return 0
            return jax.lax.axis_index(ax) * mz_per[li]

        def ext_for(li):
            return (lambda u: _ext3(u, ax)) if li >= s else _ext3_repl

        def khalos(u, depth):
            """(lo, hi) z-slab halos from the mesh neighbors (zeros at the
            domain edges) — the separate-input form the dist kernels eat."""
            lo = _shift_slabs(u[-depth:], ax, forward=True)
            hi = _shift_slabs(u[:depth], ax, forward=False)
            return lo, hi

        def coarse_solve(f_full):
            # storage may be tile-padded (aligned kernel plan): the dense
            # factor covers the logical lm0^3 grid; padding stays zero.
            m0 = lms[0]
            fl = f_full[:m0, :m0, :m0].reshape(-1)
            if spec.coarse_solver == "inverse":
                u = coarse_factor @ fl
            else:
                u = jax.scipy.linalg.cho_solve((coarse_factor, True), fl)
            if f_full.shape == (m0, m0, m0):
                return u.reshape((m0, m0, m0))
            return jnp.zeros_like(f_full).at[:m0, :m0, :m0].set(
                u.reshape((m0, m0, m0)))

        def smooth(li, v, f, n):
            zo = zoff(li)
            wc, woff = weights[li]
            if spec.smoother == "chebyshev":
                # same polynomial recurrence as ops.smoothers.
                # chebyshev_smooth (matvec-only) with the local residual
                # (kernel or jnp) supplying r = f - A v; dinv matches the
                # lean operator's synthesized diagonal (1/wc interior,
                # 1 on bc/padding rows).
                # dtype-faithful to chebyshev_smooth: the window constants
                # are computed in the array dtype (f32 runs round the same
                # way as the single-device smoother -> identical iterates)
                lmax = jnp.asarray(lmaxs[li], v.dtype) * 1.05
                lmin = lmax / cheby_ratio
                theta = 0.5 * (lmax + lmin)
                delta = 0.5 * (lmax - lmin)
                sigma = theta / delta
                interior, _ = _masks3(v.shape, zo, lms[li])
                dinv = jnp.where(interior, 1.0 / wc,
                                 jnp.ones((), v.dtype))

                rounds, degree = smoothers.cheby_phase(
                    n, spec.cheby_degree)

                def one_round(_, vv):
                    z = dinv * residual(li, vv, f)
                    p = z / theta
                    vv = vv + p
                    rho_prev = 1.0 / sigma
                    for _k in range(1, degree):
                        z = dinv * residual(li, vv, f)
                        rho = 1.0 / (2.0 * sigma - rho_prev)
                        p = rho * rho_prev * p + (2.0 * rho / delta) * z
                        vv = vv + p
                        rho_prev = rho
                    return vv

                if rounds <= 2:
                    for k in range(rounds):
                        v = one_round(k, v)
                    return v
                return jax.lax.fori_loop(0, rounds, one_round, v)
            if use_kernels and li >= s:
                from ..ops.pallas import stencil3d_dist as sd3

                dep = 2 if spec.smoother == "rbgs" else 1
                flo, fhi = khalos(f, dep)     # f constant across sweeps

                def body(_, vv):
                    vlo, vhi = khalos(vv, dep)
                    if spec.smoother == "jacobi":
                        return sd3.jacobi_sweep_dist(
                            vv, f, vlo, vhi, flo, fhi, lms[li], wc, woff,
                            spec.omega, zo, interpret=interp)
                    return sd3.rb_sweep_fused_dist(
                        vv, f, vlo, vhi, flo, fhi, lms[li], wc, woff, zo,
                        interpret=interp)
            elif use_kernels:
                # replicated level: plain single-device fused kernels,
                # redundantly on every rank (aligned storage by plan)
                def body(_, vv):
                    if spec.smoother == "jacobi":
                        return stencil3d.jacobi_sweep(
                            vv, f, lms[li], wc, woff, spec.omega,
                            interpret=interp)
                    return stencil3d.rb_sweep_fused(
                        vv, f, lms[li], wc, woff, interpret=interp)
            else:
                ext = ext_for(li)

                def body(_, vv):
                    if spec.smoother == "jacobi":
                        return jacobi_sweep_local3(
                            vv, f, zo, lms[li], wc, woff, spec.omega, ext)
                    return rbgs_sweep_local3(vv, f, zo, lms[li], wc, woff,
                                             ext)

            if n <= 2:
                for k in range(n):
                    v = body(k, v)
                return v
            return jax.lax.fori_loop(0, n, body, v)

        def residual(li, v, f):
            wc, woff = weights[li]
            if use_kernels and li >= s:
                from ..ops.pallas import stencil3d_dist as sd3

                vlo, vhi = khalos(v, 1)
                flo, fhi = khalos(f, 1)
                return sd3.residual_dist(
                    v, f, vlo, vhi, flo, fhi, lms[li], wc, woff,
                    zoff(li), interpret=interp)
            if use_kernels:
                return stencil3d.residual(v, f, lms[li], wc, woff,
                                          interpret=interp)
            return f - apply_const7_local(
                v, zoff(li), lms[li], wc, woff, ext_for(li))

        def restrict_repl(r_full, lmf, lmc):
            # replicated levels: plain single-device pt restriction
            rl = r_full[:lmf, :lmf, :lmf]
            mask_f = box_interior_mask(rl.shape, lmf)
            rl = jnp.where(mask_f, rl, jnp.zeros_like(rl))
            fc = xfer.restrict(rl, "pt")
            mask_c = box_interior_mask(fc.shape, lmc)
            return jnp.where(mask_c, fc, jnp.zeros_like(fc))

        def gather_full(r_local, li):
            """Sharded slab -> full logical grid (replicated)."""
            rg = jax.lax.all_gather(r_local, ax, axis=0, tiled=True)
            m = lms[li]
            return rg[:m]

        def scatter_slab(full_fine, li):
            """Full logical fine grid -> this rank's padded z-slab."""
            Z, Y, X = plan[li]
            m = lms[li]
            fz = jnp.pad(full_fine, ((0, Z - m), (0, Y - m), (0, X - m)))
            i = jax.lax.axis_index(ax)
            zero = jnp.zeros((), i.dtype)
            return jax.lax.dynamic_slice(
                fz, (i * mz_per[li], zero, zero),
                (mz_per[li], Y, X),
            )

        def prolong_up(li, vc):
            """Coarse iterate at level li-1 -> fine level li (handles the
            replicated->sharded transition)."""
            if li - 1 >= s:
                if use_kernels:
                    from ..ops.pallas import stencil3d_dist as sd3

                    chi = _shift_slabs(vc[:1], ax, forward=False)
                    zeros = jnp.zeros(
                        (mz_per[li], plan[li][1], plan[li][2]), vc.dtype)
                    return sd3.prolong_linear_add_dist(
                        vc, chi, zeros, lms[li], zoff(li), interpret=interp)
                return prolong_local3(vc, zoff(li - 1), lms[li], ax)
            full = xfer.prolong_linear(vc[:lms[li - 1], :lms[li - 1],
                                          :lms[li - 1]])
            if li >= s:
                return scatter_slab(full, li)
            if use_kernels:
                # replicated levels carry aligned (tile-padded) storage
                Z, Y, X = plan[li]
                m = lms[li]
                return jnp.pad(full, ((0, Z - m), (0, Y - m), (0, X - m)))
            return full

        def _fit(arr, tgt):
            """Slice/zero-pad each axis to the target storage shape (the
            stride-2 subsample of a padded fine slab can be smaller or
            larger than the coarse level's own padded storage; values in
            the adjusted region are zeros either way)."""
            sl = tuple(slice(0, min(a, t)) for a, t in zip(arr.shape, tgt))
            arr = arr[sl]
            pad = tuple((0, t - a) for a, t in zip(arr.shape, tgt))
            return jnp.pad(arr, pad) if any(p[1] for p in pad) else arr

        def restrict_ref_kind(li, r):
            """Reference-parity restriction kinds (injection / full
            weighting): bc residual carried through, no interior masks —
            mixed freely with kernel smoothing/prolongation (they are
            independent ops)."""
            if li - 1 >= s:
                tgt = (mz_per[li - 1],) + tuple(plan[li - 1][1:])
            elif use_kernels:
                # replicated levels carry aligned (tile-padded) storage
                tgt = tuple(plan[li - 1])
            else:
                tgt = (lms[li - 1],) * 3
            if spec.restriction == "injection":
                if li - 1 >= s:
                    return _fit(r[::2, ::2, ::2], tgt)
                rf = gather_full(r, li) if li >= s else r
                m = lms[li]
                return _fit(rf[:m:2, :m:2, :m:2], tgt)
            # full weighting: [1,2,1]^3/64 everywhere, zero extension at
            # the domain edge (the reference's boundary convention)
            if li - 1 >= s:
                up = ext_for(li)(r)
                a = up[:-2] + 2.0 * up[1:-1] + up[2:]
                b = a[:, :-2] + 2.0 * a[:, 1:-1] + a[:, 2:]
                full = b[:, :, :-2] + 2.0 * b[:, :, 1:-1] + b[:, :, 2:]
                return _fit(full[::2, ::2, ::2] * (1.0 / 64.0), tgt)
            rf = gather_full(r, li) if li >= s else r
            m = lms[li]
            fc = xfer.restrict(rf[:m, :m, :m], "full_weighting")
            return _fit(fc, tgt)

        def vcycle(li, v, f, shape=None):
            # V / W / F shapes, matching solver.vcycle:225-237 (W recurses
            # twice; F runs one F-recursion then one V-cycle)
            shape = spec.cycle if shape is None else shape
            if li == 0:
                return coarse_solve(f)
            v = smooth(li, v, f, spec.nu1)
            if spec.restriction != "pt":
                fc = restrict_ref_kind(li, residual(li, v, f))
            elif use_kernels and li >= s:
                # fused (f - A v) -> P^T restriction in one kernel pass
                from ..ops.pallas import stencil3d_dist as sd3

                wc, woff = weights[li]
                vlo, vhi = khalos(v, 2)
                flo, fhi = khalos(f, 2)
                zo = zoff(li)
                lmc = lms[li - 1]
                if li - 1 >= s:
                    cshape = (mz_per[li] // 2, plan[li - 1][1],
                              plan[li - 1][2])
                else:
                    def _r(x, m):
                        return ((x + m - 1) // m) * m

                    cshape = (mz_per[li] // 2, _r(lmc, 8), _r(lmc, 128))
                fc = sd3.restrict_residual_pt_dist(
                    v, f, vlo, vhi, flo, fhi, cshape, lms[li], lmc,
                    wc, woff, zo, zo // 2, interpret=interp)
                if li - 1 < s:
                    # shard-local restriction first, THEN gather: the
                    # all-gather at the sharded->replicated transition
                    # moves the 8x-smaller coarse grid, not the fine
                    # residual.  The replicated level's storage is the
                    # aligned single-device layout; slabs past lmc are
                    # zero (coarse mask), so slicing/zero-padding to it
                    # is exact.
                    fcg = jax.lax.all_gather(fc, ax, axis=0, tiled=True)
                    Zc = plan[li - 1][0]
                    if fcg.shape[0] >= Zc:
                        fc = fcg[:Zc]
                    else:
                        fc = jnp.pad(
                            fcg, ((0, Zc - fcg.shape[0]), (0, 0), (0, 0)))
            elif use_kernels:
                # replicated -> replicated: single-device fused kernel
                wc, woff = weights[li]
                fc = stencil3d.restrict_residual_pt(
                    v, f, tuple(plan[li - 1]), lms[li], lms[li - 1],
                    wc, woff, interpret=interp)
            else:
                r = residual(li, v, f)
                if li - 1 >= s:
                    fc = restrict_pt_local3(
                        r, zoff(li), lms[li], lms[li - 1], ext_for(li))
                else:
                    r_full = gather_full(r, li) if li >= s else r
                    fc = restrict_repl(r_full, lms[li], lms[li - 1])
            vc = vcycle(li - 1, jnp.zeros_like(fc), fc, shape)
            if li - 1 > 0:
                if shape == "W":
                    vc = vcycle(li - 1, vc, fc, "W")
                elif shape == "F":
                    vc = vcycle(li - 1, vc, fc, "V")
            if use_kernels and li >= s and li - 1 >= s:
                # trilinear prolongation fused with the correction add
                from ..ops.pallas import stencil3d_dist as sd3

                chi = _shift_slabs(vc[:1], ax, forward=False)
                v = sd3.prolong_linear_add_dist(
                    vc, chi, v, lms[li], zoff(li), interpret=interp)
            elif use_kernels and li < s:
                # replicated -> replicated: single-device fused kernel
                v = stencil3d.prolong_linear_add(vc, v, lms[li],
                                                 interpret=interp)
            else:
                v = v + prolong_up(li, vc)
            return smooth(li, v, f, spec.nu2)

        def res_norm(r):
            part = mass_quad_local3(
                r, zoff(L), lms[L], m_tables, m_offsets, ext_for(L))
            if s <= L:
                part = jax.lax.psum(part, ax)
            return jnp.sqrt(jnp.maximum(part, 0.0))

        return coarse_solve, prolong_up, vcycle, residual, res_norm

    def local_solve(bs, coarse_factor, m_tables):
        # bs: coarsest..finest local RHS blocks (replicated levels get the
        # full logical grid, sharded levels a (mz, m, m) z-slab).
        coarse_solve, prolong_up, vcycle, residual, res_norm = \
            make_local_ops(coarse_factor, m_tables)

        # ---- FMG start (reference FullMultiGrid, multigrid.py:271-307) --
        v = coarse_solve(bs[0])
        for li in range(1, L + 1):
            v = prolong_up(li, v)
            if li < L:
                for _ in range(spec.mu0):
                    v = vcycle(li, v, bs[li])

        f = bs[L]
        rn_ref = res_norm(residual(L, jnp.zeros_like(v), f))

        def cond(carry):
            _, k, done, _ = carry
            return (~done) & (k < spec.max_cycles)

        def body(carry):
            v, k, _, hist = carry
            v = vcycle(L, v, f)
            rn = res_norm(residual(L, v, f))
            hist = hist.at[k].set(rn)
            done = rn <= spec.tol
            if spec.rtol > 0.0:
                done = done | (rn <= spec.rtol * rn_ref)
            return (v, k + 1, done, hist)

        # per-cycle FEM-L2 residual history, NaN-padded past num_cycles —
        # the reference's residual_per_V_cycle_finest telemetry
        # (multigrid.py:292-295), distributed
        hist0 = jnp.full((spec.max_cycles,), jnp.nan, v.dtype)
        v, k, done, hist = jax.lax.while_loop(
            cond, body,
            (v, jnp.array(0, jnp.int32), jnp.array(False), hist0),
        )
        return v, k, done, hist

    def local_cycles(bs, coarse_factor, m_tables, v0):
        # bench entry: `bench_cycles` chained finest-level V-cycles, no
        # norms/FMG — matches bench.py's k_cycles loop shape.
        _, _, vcycle, _, _ = make_local_ops(coarse_factor, m_tables)
        f = bs[L]
        return jax.lax.fori_loop(
            0, bench_cycles, lambda i, vv: vcycle(L, vv, f), v0)

    def local_resume(bs, coarse_factor, m_tables, v0, k0, hist0):
        # checkpoint/resume entry (VERDICT r3 weak #8): continue the
        # tolerance loop from a saved (iterate, cycle index, history) —
        # no FMG re-ramp.  V-cycles are stateless between iterations, so
        # the resumed sequence is bitwise the uninterrupted one
        # (tests/test_halo3d.py::test_distributed_checkpoint_resume).
        coarse_solve, prolong_up, vcycle, residual, res_norm = \
            make_local_ops(coarse_factor, m_tables)
        f = bs[L]
        rn_ref = res_norm(residual(L, jnp.zeros_like(v0), f))

        def cond(carry):
            _, k, done, _ = carry
            return (~done) & (k < spec.max_cycles)

        def body(carry):
            v, k, _, hist = carry
            v = vcycle(L, v, f)
            rn = res_norm(residual(L, v, f))
            hist = hist.at[k].set(rn)
            done = rn <= spec.tol
            if spec.rtol > 0.0:
                done = done | (rn <= spec.rtol * rn_ref)
            return (v, k + 1, done, hist)

        return jax.lax.while_loop(
            cond, body,
            (v0, k0.astype(jnp.int32), jnp.array(False), hist0),
        )

    def local_mgcg(bs, coarse_factor, m_tables):
        # distributed flexible MG-CG — the z-decomposed V-cycle as the
        # preconditioner, psum dot-products, FEM-L2 norm check; mirrors
        # solver.krylov.mgcg_solve step for step so iteration counts
        # match the single-device solver (BASELINE config 5 substrate).
        coarse_solve, prolong_up, vcycle, residual, res_norm = \
            make_local_ops(coarse_factor, m_tables)

        # FMG start = mgcg_solve(fmg_start=True): fixed mode with mu0=1,
        # one V-cycle at every level including the finest.
        v = coarse_solve(bs[0])
        for li in range(1, L + 1):
            v = prolong_up(li, v)
            v = vcycle(li, v, bs[li])
        x0 = v
        f = bs[L]

        def dot(a, b):
            part = jnp.sum(a * b)
            return jax.lax.psum(part, ax) if s <= L else part

        def apply_A(p):
            # A p = p - (f - A p) with f == p: one residual pass;
            # identity boundary rows give p, padding rows p - 0 = p
            # (p is zero there by the solver invariants).
            return p - residual(L, p, p)

        def precond(r):
            return vcycle(L, jnp.zeros_like(r), r)

        def check_norm(x):
            return res_norm(residual(L, x, f))

        r0 = residual(L, x0, f)
        z0 = precond(r0)
        rn_ref = check_norm(jnp.zeros_like(f))
        hist0 = jnp.full((spec.max_cycles,), jnp.nan, v.dtype)

        def body(carry):
            x, r, z, p, rz, k, _, _, hist = carry
            Ap = apply_A(p)
            alpha = rz / dot(p, Ap)
            x = x + alpha * p
            r_new = r - alpha * Ap
            z_new = precond(r_new)
            # flexible (Polak-Ribiere) beta — robust to the mildly
            # nonsymmetric multicolor-GS V-cycle preconditioner
            beta = dot(z_new, r_new - r) / rz
            p = z_new + beta * p
            rz_new = dot(r_new, z_new)
            rn = check_norm(x)
            hist = hist.at[k].set(rn)
            conv = rn <= spec.tol
            if spec.rtol > 0.0:
                conv = conv | (rn <= spec.rtol * rn_ref)
            div = ~jnp.isfinite(rn)
            return (x, r_new, z_new, p, rz_new, k + 1, conv, div, hist)

        def cg_cond(carry):
            _, _, _, _, _, k, conv, div, _ = carry
            return (~conv) & (~div) & (k < spec.max_cycles)

        rz0 = dot(r0, z0)
        x, _, _, _, _, k, conv, _, hist = jax.lax.while_loop(
            cg_cond, body,
            (x0, r0, z0, z0, rz0, jnp.array(0, jnp.int32),
             jnp.array(False), jnp.array(False), hist0))
        return x, k, conv, hist

    bspecs = [P(ax) if i >= s else P() for i in range(len(plan))]
    kwargs = dict(
        mesh=mesh,
        in_specs=(bspecs, P(), P()),
        out_specs=(P(ax), P(), P(), P()),
    )
    try:
        fn = shard_map(local_solve, check_vma=False, **kwargs)
    except TypeError:  # pragma: no cover - older jax spelling
        fn = shard_map(local_solve, check_rep=False, **kwargs)

    cycle_fn = None
    if bench_cycles is not None:
        ckwargs = dict(
            mesh=mesh,
            in_specs=(bspecs, P(), P(), P(ax)),
            out_specs=P(ax),
        )
        try:
            cfn = shard_map(local_cycles, check_vma=False, **ckwargs)
        except TypeError:  # pragma: no cover
            cfn = shard_map(local_cycles, check_rep=False, **ckwargs)
        cinner = jax.jit(cfn)

        def cycle_fn(h: Hierarchy, v0):
            bs = [lv.b for lv in h.levels]
            return cinner(bs, h.coarse.factor, jnp.asarray(
                m_op.class_tables), v0)

    tables = jnp.asarray(m_op.class_tables)
    inner = jax.jit(fn)

    def _global_inputs(h: Hierarchy):
        bs = [lv.b for lv in h.levels]
        factor = h.coarse.factor
        tbl = tables
        if jax.process_count() > 1:
            # multi-controller runtime (parallel.multihost): inputs must be
            # GLOBAL arrays over the (possibly multi-host) mesh — each
            # process contributes its addressable shards from the
            # identically-built host hierarchy (SPMD; the reference's
            # mpirun substrate analogue, Multigrid_prototype.py:66).
            from jax.sharding import NamedSharding

            bs = [
                jax.device_put(np.asarray(b), NamedSharding(mesh, sp))
                for b, sp in zip(bs, bspecs)
            ]
            factor = jax.device_put(np.asarray(factor),
                                    NamedSharding(mesh, P()))
            tbl = jax.device_put(np.asarray(tables),
                                 NamedSharding(mesh, P()))
        return bs, factor, tbl

    def solve_fn(h: Hierarchy):
        return inner(*_global_inputs(h))

    try:
        gfn = shard_map(local_mgcg, check_vma=False, **kwargs)
    except TypeError:  # pragma: no cover - older jax spelling
        gfn = shard_map(local_mgcg, check_rep=False, **kwargs)
    ginner = jax.jit(gfn)

    def mgcg_fn(h: Hierarchy):
        return ginner(*_global_inputs(h))

    rkwargs = dict(
        mesh=mesh,
        in_specs=(bspecs, P(), P(), P(ax), P(), P()),
        out_specs=(P(ax), P(), P(), P()),
    )
    try:
        rfn = shard_map(local_resume, check_vma=False, **rkwargs)
    except TypeError:  # pragma: no cover - older jax spelling
        rfn = shard_map(local_resume, check_rep=False, **rkwargs)
    rinner = jax.jit(rfn)

    def resume_fn(h: Hierarchy, v0, k0, hist0):
        bs, factor, tbl = _global_inputs(h)
        v0 = jnp.asarray(v0, h.finest.b.dtype)
        k0 = jnp.asarray(k0, jnp.int32)
        hist0 = jnp.asarray(hist0, h.finest.b.dtype)
        # a checkpoint written under a smaller max_cycles carries a
        # shorter history — pad with the NaN sentinel to this spec's.
        if hist0.shape[0] < spec.max_cycles:
            hist0 = jnp.pad(hist0, (0, spec.max_cycles - hist0.shape[0]),
                            constant_values=jnp.nan)
        if jax.process_count() > 1:
            from jax.sharding import NamedSharding

            v0 = jax.device_put(np.asarray(v0),
                                NamedSharding(mesh, P(ax)))
            k0 = jax.device_put(np.asarray(k0), NamedSharding(mesh, P()))
            hist0 = jax.device_put(np.asarray(hist0),
                                   NamedSharding(mesh, P()))
        return rinner(bs, factor, tbl, v0, k0, hist0)

    return hier, solve_fn, cycle_fn, mgcg_fn, resume_fn


def make_distributed_jacobi_smoother(
    mesh: Mesh,
    lm: int,
    wc: float,
    woff: float,
    omega: float,
    nsweeps: int,
    axis_name: str = "gz",
    interpret: bool | None = None,
):
    """As make_distributed_rb_smoother, for weighted Jacobi (1-deep halo)."""
    if interpret is None:
        interpret = dispatch.interpret_mode()

    def local(v, f):
        mz = v.shape[0]
        z_base = jax.lax.axis_index(axis_name) * mz - 1

        def sweep(_, vv):
            vext = halo_extend_z(vv, 1, axis_name)
            fext = halo_extend_z(f, 1, axis_name)
            out = stencil3d.jacobi_sweep(
                vext, fext, lm, wc, woff, omega, interpret=interpret,
                z_base=z_base,
            )
            return out[1:-1]

        if nsweeps <= 2:
            for k in range(nsweeps):
                v = sweep(k, v)
            return v
        return jax.lax.fori_loop(0, nsweeps, sweep, v)

    fn = shard_map(
        local, mesh=mesh,
        in_specs=(P(axis_name), P(axis_name)),
        out_specs=P(axis_name),
        check_vma=False,
    )
    return jax.jit(fn)
