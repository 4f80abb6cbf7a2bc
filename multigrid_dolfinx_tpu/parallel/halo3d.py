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
                      min_slab: int = 2) -> Tuple[list, int]:
    """(pad plan, shard_from): levels with >= 2*ngz points per dim are
    z-padded to a mesh-divisible, 2x-progressive size (transfers stay
    shard-local); coarser levels stay replicated at logical shape.
    Returns the plan for build_lean_hierarchy plus the first sharded
    level index."""
    grids = build_grid_hierarchy(config.hierarchy, ndim=3)
    ngz = int(np.prod(mesh.devices.shape))
    lms = [g.points_per_dim for g in grids]
    shard_from = None
    # level 0 must stay replicated: the coarsest direct solve needs the
    # full grid on every rank (redundant solve beats communication there).
    for i, m in enumerate(lms):
        if i >= 1 and m >= min_slab * ngz:
            shard_from = i
            break
    if shard_from is None:
        raise ValueError(
            f"no level large enough to z-shard over {ngz} devices "
            f"(finest has {lms[-1]} points/dim)"
        )
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

    Requirements: 3D constant-coefficient P1 (lean hierarchy, isotropic
    7-point), 1D device mesh.  Cycle counts match the single-device
    solve exactly: same FEM-L2 class-table residual norm, same tol/rtol
    semantics (solver.fmg.tolerance_solve)."""
    if config.problem.ndim != 3:
        raise ValueError("build_halo_solver3d is the 3D path")
    if len(mesh.devices.shape) != 1:
        raise ValueError("3D halo path wants a 1D ('gz',) mesh")
    spec = config.cycle
    if spec.smoother not in ("rbgs", "jacobi"):
        raise NotImplementedError("3D halo path: rbgs/jacobi smoothing")
    if spec.restriction != "pt" or spec.prolongation != "bilinear":
        raise NotImplementedError("3D halo path: pt/bilinear transfers")
    if spec.coarse_solver not in ("cholesky", "inverse"):
        raise NotImplementedError("3D halo path: cholesky/inverse coarse")

    plan, s = pick_z_shard_plan(config, mesh)
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
        raise NotImplementedError("3D halo path: isotropic 7-point only")
    m_op = hier.M_fine
    m_offsets = m_op.offsets
    mz_per = [None if plan[i] is None else plan[i][0] // ngz
              for i in range(len(plan))]

    def local_solve(bs, coarse_factor, m_tables):
        # bs: coarsest..finest local RHS blocks (replicated levels get the
        # full logical grid, sharded levels a (mz, m, m) z-slab).
        def zoff(li):
            if li < s:
                return 0
            return jax.lax.axis_index(ax) * mz_per[li]

        def ext_for(li):
            return (lambda u: _ext3(u, ax)) if li >= s else _ext3_repl

        def coarse_solve(f_full):
            fl = f_full.reshape(-1)
            if spec.coarse_solver == "inverse":
                u = coarse_factor @ fl
            else:
                u = jax.scipy.linalg.cho_solve((coarse_factor, True), fl)
            return u.reshape(f_full.shape)

        def smooth(li, v, f, n):
            zo = zoff(li)
            wc, woff = weights[li]
            ext = ext_for(li)

            def body(_, vv):
                if spec.smoother == "jacobi":
                    return jacobi_sweep_local3(
                        vv, f, zo, lms[li], wc, woff, spec.omega, ext)
                return rbgs_sweep_local3(vv, f, zo, lms[li], wc, woff, ext)

            if n <= 2:
                for k in range(n):
                    v = body(k, v)
                return v
            return jax.lax.fori_loop(0, n, body, v)

        def residual(li, v, f):
            wc, woff = weights[li]
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
            Z = plan[li][0]
            m = lms[li]
            fz = jnp.pad(full_fine, ((0, Z - m), (0, 0), (0, 0)))
            i = jax.lax.axis_index(ax)
            zero = jnp.zeros((), i.dtype)
            return jax.lax.dynamic_slice(
                fz, (i * mz_per[li], zero, zero),
                (mz_per[li],) + full_fine.shape[1:],
            )

        def prolong_up(li, vc):
            """Coarse iterate at level li-1 -> fine level li (handles the
            replicated->sharded transition)."""
            if li - 1 >= s:
                return prolong_local3(vc, zoff(li - 1), lms[li], ax)
            full = xfer.prolong_linear(vc[:lms[li - 1], :lms[li - 1],
                                          :lms[li - 1]])
            if li >= s:
                return scatter_slab(full, li)
            return full

        def vcycle(li, v, f, shape=None):
            # V / W / F shapes, matching solver.vcycle:225-237 (W recurses
            # twice; F runs one F-recursion then one V-cycle)
            shape = spec.cycle if shape is None else shape
            if li == 0:
                return coarse_solve(f)
            v = smooth(li, v, f, spec.nu1)
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
            v = v + prolong_up(li, vc)
            return smooth(li, v, f, spec.nu2)

        def res_norm(r):
            part = mass_quad_local3(
                r, zoff(L), lms[L], m_tables, m_offsets, ext_for(L))
            if s <= L:
                part = jax.lax.psum(part, ax)
            return jnp.sqrt(jnp.maximum(part, 0.0))

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
            _, k, done = carry
            return (~done) & (k < spec.max_cycles)

        def body(carry):
            v, k, _ = carry
            v = vcycle(L, v, f)
            rn = res_norm(residual(L, v, f))
            done = rn <= spec.tol
            if spec.rtol > 0.0:
                done = done | (rn <= spec.rtol * rn_ref)
            return (v, k + 1, done)

        v, k, done = jax.lax.while_loop(
            cond, body, (v, jnp.array(0, jnp.int32), jnp.array(False))
        )
        return v, k, done

    bspecs = [P() if plan[i] is None else P(ax) for i in range(len(plan))]
    kwargs = dict(
        mesh=mesh,
        in_specs=(bspecs, P(), P()),
        out_specs=(P(ax), P(), P()),
    )
    try:
        fn = shard_map(local_solve, check_vma=False, **kwargs)
    except TypeError:  # pragma: no cover - older jax spelling
        fn = shard_map(local_solve, check_rep=False, **kwargs)

    tables = jnp.asarray(m_op.class_tables)

    def solve_fn(h: Hierarchy):
        bs = [lv.b for lv in h.levels]
        return fn(bs, h.coarse.factor, tables)

    return hier, jax.jit(solve_fn)


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
