"""Distributed 3D VARIABLE-COEFFICIENT multigrid: z-decomposition of the
K-plane stencil operators under shard_map.

The const-coefficient distributed path (parallel/halo3d) carries zero
operator bytes — its kernels bake the 7-point weights as immediates.  A
variable-kappa level instead MATERIALIZES K coefficient planes (15
structural offsets on the finest/rediscretized levels, the full 27-point
box on Galerkin-coarsened ones), so the distributed form shards the
planes' z-slabs alongside v/f:

  * every level >= shard_from holds (K, mz, My, Mx) plane slabs, a
    (mz, My, Mx) dinv slab and RHS slab per rank — the STEADY-STATE
    plane sets spread over the mesh instead of one chip, which is what
    lets variable-kappa hierarchies past the ~448^3 single-chip HBM cap
    (solver.hierarchy._guard_var_build_hbm; the build's logical-shape
    transients still stage one level at a time through the default
    device — see build_var_hierarchy's sharding note);
  * the operator apply needs only a 1-deep z halo of v (`ppermute` over
    ICI on hardware) — the planes themselves are row-indexed, no halo;
  * smoothing is the same 2^d coordinate-parity multicolor GS as the
    single-device planes path (ops.smoothers.multicolor_gs_smooth) with
    GLOBAL parities (gz from the rank's z offset), so iterates and hence
    cycle counts match the single-device solve exactly;
  * coarse levels below shard_from are replicated (redundant compute, the
    same level-size-aware strategy as halo3d), and the coarsest dense
    factorization is applied redundantly on every rank.

Built by `build_halo_var3d`; `parallel.halo3d.build_halo_solver3d`
dispatches here automatically for kappa != None, so the CLI's
`--kappa ... --shard halo3d` just works.  Equivalence vs the
single-device `build_var_hierarchy` solve is pinned on the 8-device CPU
mesh in tests/test_halo3d.py.

Reference substrate: dolfinx/PETSc are MPI-parallel for EVERY coefficient
(Multigrid_prototype.py:66); this module is that capability for the
planes operators, TPU-native.
"""
from __future__ import annotations

import itertools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..config import SolverConfig
from ..mesh import build_grid_hierarchy
from ..ops import transfer as xfer
from ..ops.operators import box_interior_mask
from ..solver.hierarchy import Hierarchy, build_var_hierarchy
from .halo3d import (
    _ext3,
    _ext3_repl,
    mass_quad_local3,
    pick_z_shard_plan,
    prolong_local3,
    restrict_pt_local3,
    shard_map,
)


def apply_planes_local(planes, offsets, v, ext):
    """Local y = A v for a z-sharded K-plane stencil operator: the plane
    slabs are row-local (no halo), v gets a 1-deep z halo from `ext`.
    Dirichlet elimination/identity rows are already baked into the plane
    VALUES (fem.fast_var.eliminate_dirichlet_device), so no masks — the
    same arithmetic as StencilOperator._apply_planes, shard-local."""
    up = ext(v)
    mz = v.shape[0]
    out = None
    for k, (dz, dy, dx) in enumerate(offsets):
        sl = up[1 + dz:1 + dz + mz,
                1 + dy:1 + dy + v.shape[1],
                1 + dx:1 + dx + v.shape[2]]
        term = planes[k] * sl
        out = term if out is None else out + term
    return out


def build_halo_var3d(config: SolverConfig, mesh: Mesh):
    """Returns (hierarchy, solve_fn) — the distributed variable-kappa
    3D solve (FMG start + tolerance V-cycle loop) under one shard_map.
    solve_fn(hier) -> (u_global, num_cycles, converged, res_hist)."""
    hier, solve_fn, _ = _build_halo3d_var(config, mesh)
    return hier, solve_fn


def build_halo_var_mgcg3d(config: SolverConfig, mesh: Mesh):
    """Returns (hierarchy, mgcg_fn): distributed flexible MG-CG with the
    z-decomposed variable-coefficient V-cycle as preconditioner."""
    hier, _, mgcg_fn = _build_halo3d_var(config, mesh)
    return hier, mgcg_fn


def _build_halo3d_var(config: SolverConfig, mesh: Mesh):
    if config.problem.ndim != 3:
        raise ValueError("build_halo_var3d is the 3D path")
    if config.problem.kappa is None:
        raise ValueError("build_halo_var3d is the variable-coefficient "
                         "path; use build_halo_solver3d for kappa=None")
    if config.problem.degree != 1:
        raise NotImplementedError("distributed variable-kappa: P1 only "
                                  "(P2 multi-chip is halo3d_p2)")
    if len(mesh.devices.shape) != 1:
        raise ValueError("3D halo path wants a 1D ('gz',) mesh")
    spec = config.cycle
    if spec.smoother not in ("rbgs", "jacobi"):
        raise NotImplementedError(
            "distributed variable-kappa: rbgs/jacobi smoothing")
    if spec.restriction != "pt":
        raise NotImplementedError(
            "distributed variable-kappa: variational 'pt' restriction")
    if spec.prolongation != "bilinear":
        raise NotImplementedError("3D halo path: bilinear prolongation")
    if spec.coarse_solver not in ("cholesky", "inverse"):
        raise NotImplementedError("3D halo path: cholesky/inverse coarse")

    plan, s = pick_z_shard_plan(config, mesh, align=False)
    hier = build_var_hierarchy(config, pad_points=plan, mesh=mesh,
                               shard_from=s)
    ax = mesh.axis_names[0]
    ngz = int(np.prod(mesh.devices.shape))
    grids = build_grid_hierarchy(config.hierarchy, ndim=3)
    lms = [g.points_per_dim for g in grids]
    L = len(lms) - 1
    offsets = [tuple(map(tuple, lv.A.offsets)) for lv in hier.levels]
    want_jacobi = spec.smoother == "jacobi"
    m_op = hier.M_fine
    m_offsets = m_op.offsets
    mz_per = [None if i < s else plan[i][0] // ngz
              for i in range(len(plan))]

    def local_ops(planes_l, rpl_l, dinv_l, coarse_factor, m_tables):
        def zoff(li):
            if li < s:
                return 0
            return jax.lax.axis_index(ax) * mz_per[li]

        def ext_for(li):
            return (lambda u: _ext3(u, ax)) if li >= s else _ext3_repl

        def apply_A(li, v):
            return apply_planes_local(planes_l[li], offsets[li], v,
                                      ext_for(li))

        def residual(li, v, f):
            return f - apply_A(li, v)

        def coarse_solve(f_full):
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

        def gcoords(shape, zo):
            gz = zo + jax.lax.broadcasted_iota(jnp.int32, shape, 0)
            gy = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
            gx = jax.lax.broadcasted_iota(jnp.int32, shape, 2)
            return gz, gy, gx

        def smooth(li, v, f, n):
            zo = zoff(li)
            dinv = dinv_l[li]
            if want_jacobi:
                w = spec.omega
                if rpl_l[li] is not None:
                    # reference-form sweep (ops.smoothers.jacobi_smooth):
                    # v <- (1-w) v + w (dinv f) - w (R_omega v); R_omega's
                    # bc/padding rows are zero in the plane VALUES.
                    df = dinv * f

                    def sweep(_, vv):
                        rv = apply_planes_local(
                            rpl_l[li], offsets[li], vv, ext_for(li))
                        return (1.0 - w) * vv + w * df - w * rv
                else:
                    def sweep(_, vv):
                        return vv + w * (dinv * residual(li, vv, f))
            else:
                # 2^3 coordinate-parity multicolor GS, global parities —
                # the same color order as multicolor_gs_smooth
                # (itertools.product over (0, 1)^3).
                gz, gy, gx = gcoords(v.shape, zo)
                cmasks = [
                    ((gz % 2) == pz) & ((gy % 2) == py) & ((gx % 2) == px)
                    for pz, py, px in itertools.product((0, 1), repeat=3)
                ]

                def sweep(_, vv):
                    for mask in cmasks:
                        r = residual(li, vv, f)
                        vv = jnp.where(mask, vv + dinv * r, vv)
                    return vv

            if n <= 2:
                for k in range(n):
                    v = sweep(k, v)
                return v
            return jax.lax.fori_loop(0, n, sweep, v)

        def gather_full(r_local, li):
            rg = jax.lax.all_gather(r_local, ax, axis=0, tiled=True)
            return rg[:lms[li]]

        def scatter_slab(full_fine, li):
            Z, Y, X = plan[li]
            m = lms[li]
            fz = jnp.pad(full_fine,
                         ((0, Z - m), (0, Y - m), (0, X - m)))
            i = jax.lax.axis_index(ax)
            zero = jnp.zeros((), i.dtype)
            return jax.lax.dynamic_slice(
                fz, (i * mz_per[li], zero, zero), (mz_per[li], Y, X))

        def restrict_repl(r_full, lmf, lmc):
            rl = r_full[:lmf, :lmf, :lmf]
            mask_f = box_interior_mask(rl.shape, lmf)
            rl = jnp.where(mask_f, rl, jnp.zeros_like(rl))
            fc = xfer.restrict(rl, "pt")
            mask_c = box_interior_mask(fc.shape, lmc)
            return jnp.where(mask_c, fc, jnp.zeros_like(fc))

        def restrict_down(li, r):
            """P^T restriction level li -> li-1 across the sharded /
            replicated transition."""
            if li - 1 >= s:
                return restrict_pt_local3(
                    r, zoff(li), lms[li], lms[li - 1], ext_for(li))
            r_full = gather_full(r, li) if li >= s else r
            return restrict_repl(r_full, lms[li], lms[li - 1])

        def prolong_up(li, vc):
            if li - 1 >= s:
                return prolong_local3(vc, zoff(li - 1), lms[li], ax)
            full = xfer.prolong_linear(
                vc[:lms[li - 1], :lms[li - 1], :lms[li - 1]])
            if li >= s:
                return scatter_slab(full, li)
            return full

        def vcycle(li, v, f, shape=None):
            shape = spec.cycle if shape is None else shape
            if li == 0:
                return coarse_solve(f)
            v = smooth(li, v, f, spec.nu1)
            fc = restrict_down(li, residual(li, v, f))
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

        return coarse_solve, prolong_up, vcycle, residual, res_norm

    def local_solve(planes_l, rpl_l, dinv_l, bs, coarse_factor, m_tables):
        coarse_solve, prolong_up, vcycle, residual, res_norm = local_ops(
            planes_l, rpl_l, dinv_l, coarse_factor, m_tables)

        # FMG ramp (reference FullMultiGrid): per-level assembled RHS
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

        hist0 = jnp.full((spec.max_cycles,), jnp.nan, v.dtype)
        v, k, done, hist = jax.lax.while_loop(
            cond, body,
            (v, jnp.array(0, jnp.int32), jnp.array(False), hist0))
        return v, k, done, hist

    def local_mgcg(planes_l, rpl_l, dinv_l, bs, coarse_factor, m_tables):
        coarse_solve, prolong_up, vcycle, residual, res_norm = local_ops(
            planes_l, rpl_l, dinv_l, coarse_factor, m_tables)

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

        x, _, _, _, _, k, conv, _, hist = jax.lax.while_loop(
            cg_cond, body,
            (x0, r0, z0, z0, dot(r0, z0), jnp.array(0, jnp.int32),
             jnp.array(False), jnp.array(False), hist0))
        return x, k, conv, hist

    pspecs = [P(None, ax) if i >= s else P() for i in range(len(plan))]
    gspecs = [P(ax) if i >= s else P() for i in range(len(plan))]
    kwargs = dict(
        mesh=mesh,
        in_specs=(pspecs, pspecs if want_jacobi else [P()] * len(plan),
                  gspecs, gspecs, P(), P()),
        out_specs=(P(ax), P(), P(), P()),
    )
    try:
        fn = shard_map(local_solve, check_vma=False, **kwargs)
    except TypeError:  # pragma: no cover - older jax spelling
        fn = shard_map(local_solve, check_rep=False, **kwargs)
    inner = jax.jit(fn)
    try:
        gfn = shard_map(local_mgcg, check_vma=False, **kwargs)
    except TypeError:  # pragma: no cover
        gfn = shard_map(local_mgcg, check_rep=False, **kwargs)
    ginner = jax.jit(gfn)

    tables = jnp.asarray(m_op.class_tables)

    def _inputs(h: Hierarchy):
        planes = [lv.A.planes for lv in h.levels]
        rpl = [lv.sm.r_omega.planes if want_jacobi else jnp.zeros(())
               for lv in h.levels]
        dinvs = [lv.sm.dinv for lv in h.levels]
        bs = [lv.b for lv in h.levels]
        return planes, rpl, dinvs, bs, h.coarse.factor, tables

    def solve_fn(h: Hierarchy):
        return inner(*_inputs(h))

    def mgcg_fn(h: Hierarchy):
        return ginner(*_inputs(h))

    return hier, solve_fn, mgcg_fn
