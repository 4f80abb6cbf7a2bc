"""Explicit halo-exchange multigrid under shard_map.

parallel/sharding.py lets the XLA SPMD partitioner derive the collectives
from sharding annotations (GSPMD).  This module is the hand-scheduled
alternative — the direct TPU-native analogue of PETSc's VecScatter /
ghostUpdate machinery the reference rides on (Multigrid_prototype.py:79-80,
106-107):

  * every level's grid is block-partitioned over the ('gx','gy') device
    mesh inside a single `shard_map`-ped solve;
  * each stencil op exchanges 1-deep halos with its 4 mesh neighbors via
    `jax.lax.ppermute` (edge ranks receive zeros — exactly the zero-
    extension the operators' boundary masks expect);
  * norm reductions are explicit `psum`s over both mesh axes;
  * the coarsest level is all-gathered and solved redundantly on every
    device (it is tiny; redundant compute beats communication).

Level storage for this path is geometric: the padded size of each sharded
level is exactly 2x the next-coarser one (pick_shard_pad_plan), so
restriction/prolongation are shard-local given one halo — no resharding at
transfers.  Currently 2D const-coefficient P1 (lean hierarchies); the
GSPMD path covers everything else.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..config import SolverConfig
from ..mesh import build_grid_hierarchy
from ..ops import smoothers
from ..solver.hierarchy import Hierarchy, build_lean_hierarchy

try:  # jax>=0.6 moved shard_map out of experimental
    from jax import shard_map as _shard_map_mod  # type: ignore
    shard_map = _shard_map_mod.shard_map if hasattr(_shard_map_mod, "shard_map") else _shard_map_mod
except Exception:  # pragma: no cover
    from jax.experimental.shard_map import shard_map  # type: ignore


# ----------------------------------------------------------------------
# Halo exchange
# ----------------------------------------------------------------------

def _shift(x, axis_name: str, forward: bool):
    """Nearest-neighbor ppermute along a mesh axis; ranks with no source
    receive zeros (the domain-boundary zero extension)."""
    n = jax.lax.axis_size(axis_name)
    if n == 1:
        return jnp.zeros_like(x)
    if forward:
        perm = [(i, i + 1) for i in range(n - 1)]
    else:
        perm = [(i + 1, i) for i in range(n - 1)]
    return jax.lax.ppermute(x, axis_name, perm)


def halo_pad2d(u: jax.Array, ax: Tuple[str, str]) -> jax.Array:
    """Local (mb, nb) block -> (mb+2, nb+2) with 1-deep halos from the 4
    mesh neighbors.  The second (gy) shift sends columns of the already
    gx-extended block, so corner values relay through the edge neighbors
    in two hops — the standard two-phase exchange that makes diagonal
    (9-point, e.g. consistent-mass) stencils correct without explicit
    corner messages."""
    gx, gy = ax
    top = _shift(u[-1:, :], gx, forward=True)     # row from gx-1 neighbor
    bot = _shift(u[:1, :], gx, forward=False)     # row from gx+1 neighbor
    u2 = jnp.concatenate([top, u, bot], axis=0)
    left = _shift(u2[:, -1:], gy, forward=True)
    right = _shift(u2[:, :1], gy, forward=False)
    return jnp.concatenate([left, u2, right], axis=1)


# ----------------------------------------------------------------------
# Shard-local const-5 operators (global-position-aware masks)
# ----------------------------------------------------------------------

def _global_coords(shape, offsets):
    gi = offsets[0] + jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    gj = offsets[1] + jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    return gi, gj


def _masks_local(shape, offsets, lm):
    gi, gj = _global_coords(shape, offsets)
    interior = (gi >= 1) & (gi <= lm - 2) & (gj >= 1) & (gj <= lm - 2)
    inbox = (gi <= lm - 1) & (gj <= lm - 1)
    return interior, inbox


def _nsum(up):
    """N+S+E+W from a halo-padded block."""
    return (up[:-2, 1:-1] + up[2:, 1:-1] + up[1:-1, :-2] + up[1:-1, 2:])


def apply_const5_local(u, offsets, lm, ax, wc, woff):
    """Local y = A u for the Dirichlet-eliminated const-5 operator."""
    interior, _ = _masks_local(u.shape, offsets, lm)
    ut = jnp.where(interior, u, jnp.zeros_like(u))
    up = halo_pad2d(ut, ax)
    au = wc * ut + woff * _nsum(up)
    return jnp.where(interior, au, u)


def rbgs_sweep_local(v, f, offsets, lm, ax, wc, woff):
    """One full red-black GS sweep (two colored half-sweeps, each with its
    own halo exchange — the update pattern PETSc-based codes implement
    with ghostUpdate between colors)."""
    gi, gj = _global_coords(v.shape, offsets)
    interior, _ = _masks_local(v.shape, offsets, lm)
    for parity in (0, 1):
        vt = jnp.where(interior, v, jnp.zeros_like(v))
        up = halo_pad2d(vt, ax)
        cand = jnp.where(interior, (f - woff * _nsum(up)) / wc, f)
        color = ((gi + gj) % 2) == parity
        v = jnp.where(color, cand, v)
    return v


def jacobi_sweep_local(v, f, offsets, lm, ax, wc, woff, omega):
    interior, _ = _masks_local(v.shape, offsets, lm)
    vt = jnp.where(interior, v, jnp.zeros_like(v))
    up = halo_pad2d(vt, ax)
    cand = jnp.where(interior, (f - woff * _nsum(up)) / wc, f)
    return (1.0 - omega) * v + omega * cand


def restrict_pt_local(r, f_offsets, lmf, lmc, ax):
    """Shard-local P^T restriction: fine local block (2mb, 2nb) -> coarse
    local block (mb, nb).  Fine blocks are aligned 2x coarse blocks (see
    pick_shard_pad_plan), so only a 1-deep fine halo is needed."""
    interior, _ = _masks_local(r.shape, f_offsets, lmf)
    rt = jnp.where(interior, r, jnp.zeros_like(r))
    up = halo_pad2d(rt, ax)
    rows = up[:-2, :] + 2.0 * up[1:-1, :] + up[2:, :]
    full = rows[:, :-2] + 2.0 * rows[:, 1:-1] + rows[:, 2:]
    coarse = full[::2, ::2] * 0.25
    c_offsets = (f_offsets[0] // 2, f_offsets[1] // 2)
    interior_c, _ = _masks_local(coarse.shape, c_offsets, lmc)
    return jnp.where(interior_c, coarse, jnp.zeros_like(coarse))


def restrict_inject_local(r):
    """Shard-local injection (reference Restriction2D_direct,
    multigrid.py:123-132): coarse value = fine value at the coincident
    node.  Shards are aligned 2x blocks and row/col 0 of every shard is
    globally even, so this is a plain stride-2 slice — no halo, no masks
    (the reference carries the bc residual through)."""
    return r[::2, ::2]


def restrict_fw_local(r, ax):
    """Shard-local full weighting with the reference's boundary
    convention (multigrid.py:135-198): [1 2 1]^2/16 everywhere, missing
    neighbors contribute zero (halo_pad2d's zero edge extension IS that
    convention at the domain boundary), bc residual carried through —
    exactly transfer.restrict_full_weighting, distributed."""
    up = halo_pad2d(r, ax)
    rows = up[:-2, :] + 2.0 * up[1:-1, :] + up[2:, :]
    full = rows[:, :-2] + 2.0 * rows[:, 1:-1] + rows[:, 2:]
    return full[::2, ::2] * (1.0 / 16.0)


def mass_quad_local2(r, off, lm, tables, offsets, ax):
    """Local partial of r^T M r with the boundary-class-table consistent
    mass operator (zero stored bytes; classes from global coords) — the
    FEM-L2 residual norm the reference's res_calculator computes via
    dolfinx assemble_scalar (multigrid.py:203-208).  psum over both mesh
    axes completes the norm; the 9-point mass stencil's corner reads are
    served by halo_pad2d's two-phase corner relay."""
    gi, gj = _global_coords(r.shape, off)

    def cls_ax(g):
        return jnp.where(g == 0, 0, jnp.where(g == lm - 1, 2, 1))

    cls = cls_ax(gi) * 3 + cls_ax(gj)
    inbox = (gi <= lm - 1) & (gj <= lm - 1)
    up = halo_pad2d(r, ax)
    acc = None
    for k, (di, dj) in enumerate(offsets):
        w = tables[k].reshape(-1)[cls]
        sl = up[1 + di:1 + di + r.shape[0], 1 + dj:1 + dj + r.shape[1]]
        term = w * sl
        acc = term if acc is None else acc + term
    mr = jnp.where(inbox, acc, jnp.zeros_like(r))
    return jnp.sum(r * mr)


def prolong_local(c, c_offsets, lmf, ax):
    """Shard-local bilinear prolongation: coarse (mb, nb) -> fine
    (2mb, 2nb).  Fine node 2i (+1) draws on coarse i (and i+1): one coarse
    halo row/col suffices."""
    up = halo_pad2d(c, ax)                       # (mb+2, nb+2)
    core = up[1:, 1:]                            # coarse i .. i+mb (halo tail)
    mb, nb = c.shape
    # rows: even -> c_i, odd -> (c_i + c_{i+1})/2
    even_r = core[:mb, :]
    odd_r = 0.5 * (core[:mb, :] + core[1:mb + 1, :])
    rows = jnp.stack([even_r, odd_r], axis=1).reshape(2 * mb, nb + 1)
    fine = jnp.stack(
        [rows[:, :nb], 0.5 * (rows[:, :nb] + rows[:, 1:nb + 1])], axis=2
    ).reshape(2 * mb, 2 * nb)
    f_offsets = (2 * c_offsets[0], 2 * c_offsets[1])
    _, inbox = _masks_local(fine.shape, f_offsets, lmf)
    return jnp.where(inbox, fine, jnp.zeros_like(fine))


# ----------------------------------------------------------------------
# Shard-mapped solver
# ----------------------------------------------------------------------

def pick_shard_pad_plan(config: SolverConfig, mesh: Mesh):
    """Padded points per level such that (a) the coarsest padded size is a
    multiple of the mesh dims and (b) each finer level is exactly 2x the
    previous — making transfers shard-local.  Kernel-path configs
    (use_pallas f32 on a row-decomposed ('gx', 1) mesh) additionally pad
    to TPU tiling: widths multiples of 128 (lanes) and per-shard rows
    multiples of 16 (sublane-aligned window DMAs, stencil2d_dist)."""
    grids = build_grid_hierarchy(config.hierarchy, ndim=config.problem.ndim)
    px, py = (int(d) for d in mesh.devices.shape)
    base = max(grids[0].points_per_dim, 2)
    # Kernel-path (stencil2d_dist) alignment — 128-lane widths, 16-row
    # shards — is NOT forced here: it emerges at the finer levels
    # (m0 * 2^i) and the per-level admission in build_halo_solver falls
    # back to the jnp local ops at the small non-aligned coarse levels,
    # where kernels would be launch-bound anyway.  Forcing an aligned
    # coarsest size would inflate every level's padding by that ratio.
    unit = int(np.lcm(np.lcm(px, py), 2))
    m0 = ((base + unit - 1) // unit) * unit
    plan = []
    for i, g in enumerate(grids):
        m = m0 * (2 ** i)
        assert m >= g.points_per_dim
        plan.append((m, m))
    return plan


def build_halo_cycler(config: SolverConfig, mesh: Mesh, cycles: int):
    """Returns (hierarchy, cycle_fn): cycle_fn(hier) runs `cycles`
    finest-level V-cycles of the distributed 2D solver from a zero guess
    (no norms, no FMG) — the benchmarking entry matching bench.py's
    k_cycles loop, so the distributed per-V-cycle time is directly
    comparable to the single-chip 2D number (cf. halo3d.
    build_halo_cycler3d)."""
    return build_halo_solver(config, mesh, bench_cycles=cycles)


def build_halo_solver(config: SolverConfig, mesh: Mesh,
                      bench_cycles=None):
    """Returns (hierarchy, solve_fn) where solve_fn(hier) runs the fully
    explicit shard_map V-cycle solve (FMG start + tolerance loop) and
    returns (u_global, num_cycles, converged).

    Requirements: 2D constant-coefficient P1 (lean hierarchy)."""
    if config.problem.ndim != 2:
        raise NotImplementedError("halo path currently covers 2D")
    spec = config.cycle
    if spec.prolongation != "bilinear":
        raise NotImplementedError("halo path: bilinear prolongation")
    if spec.restriction not in ("pt", "injection", "full_weighting"):
        raise NotImplementedError(
            f"halo path: restriction {spec.restriction!r}")
    plan = pick_shard_pad_plan(config, mesh)
    hier = build_lean_hierarchy(config, pad_points=plan)
    ax = tuple(mesh.axis_names)
    px, py = (int(d) for d in mesh.devices.shape)
    grids = build_grid_hierarchy(config.hierarchy, ndim=2)
    lms = [g.points_per_dim for g in grids]
    weights = [
        (lv.A.const_weights[lv.A.center_index()],
         lv.A.const_weights[0])
        for lv in hier.levels
    ]

    m_op = hier.M_fine
    m_offsets = m_op.offsets

    # Kernel-speed dispatch (stencil2d_dist): per-shard fused Pallas
    # kernels with ppermute'd halo strips as separate inputs — the 2D
    # counterpart of the halo3d distributed kernel path.  Row-decomposed
    # ('gx', 1) meshes only (full-width shards keep columns local); per-
    # level admission is static, ineligible levels run the jnp local ops.
    lmaxs = [float(lv.sm.lmax) for lv in hier.levels]
    use_kern = (spec.use_pallas and py == 1
                and config.dtype == "float32")
    if use_kern:
        from ..ops import dispatch as _dispatch
        from ..ops.pallas import stencil2d_dist as s2d

        _interp = _dispatch.interpret_mode()

        def _mloc(li):
            return plan[li][0] // px

        def _kern_base(li):
            m, w = plan[li]
            return (w % 128 == 0 and _mloc(li) % 16 == 0
                    and _mloc(li) >= 16)

        kern_sm = [_kern_base(li) for li in range(len(plan))]
        # transfers touch both levels: the coarse width must be
        # lane-aligned too.  Restriction windows the fine shard with
        # 16-row strips; prolongation needs a >= 8-row coarse shard.
        kern_rs = [li > 0 and _kern_base(li) and _mloc(li) >= 32
                   and plan[li - 1][1] % 128 == 0
                   for li in range(len(plan))]
        kern_pr = [li > 0 and _kern_base(li) and _mloc(li - 1) >= 8
                   and plan[li - 1][1] % 128 == 0
                   for li in range(len(plan))]
    else:
        kern_sm = kern_rs = kern_pr = [False] * len(plan)

    def local_solve(levels_b, coarse_factor, m_tables, v0=None):
        # levels_b: list of local RHS blocks, coarsest..finest
        def off(level_idx, shape):
            ix = jax.lax.axis_index(ax[0]) * shape[0]
            iy = jax.lax.axis_index(ax[1]) * shape[1]
            return (ix, iy)

        def coarse_solve(f_local):
            # all-gather the coarsest level and solve redundantly
            fg = jax.lax.all_gather(f_local, ax[1], axis=1, tiled=True)
            fg = jax.lax.all_gather(fg, ax[0], axis=0, tiled=True)
            m0 = lms[0]
            sl = fg[:m0, :m0].reshape(-1)
            u = coarse_factor @ sl if spec.coarse_solver == "inverse" else (
                jax.scipy.linalg.cho_solve((coarse_factor, True), sl)
            )
            ug = jnp.zeros_like(fg).at[:m0, :m0].set(u.reshape(m0, m0))
            bx = fg.shape[0] // px
            by = fg.shape[1] // py
            i = jax.lax.axis_index(ax[0])
            j = jax.lax.axis_index(ax[1])
            return jax.lax.dynamic_slice(ug, (i * bx, j * by), (bx, by))

        def strips(x, hp):
            """(lo, hi) halo row strips from the gx neighbors (zeros at
            the domain edge ranks — the zero extension the masks expect)."""
            lo = _shift(x[-hp:, :], ax[0], forward=True)
            hi = _shift(x[:hp, :], ax[0], forward=False)
            return lo, hi

        def residual_at(li, o, vv, f):
            wc, woff = weights[li]
            if kern_sm[li]:
                vlo, vhi = strips(vv, s2d.HP)
                return s2d.residual_dist(vv, f, vlo, vhi, lms[li], wc,
                                         woff, o[0], interpret=_interp)
            return f - apply_const5_local(vv, o, lms[li], ax, wc, woff)

        def smooth(li, v, f, n):
            o = off(li, v.shape)
            wc, woff = weights[li]
            niter = n
            if spec.smoother == "chebyshev":
                # same polynomial recurrence as ops.smoothers.
                # chebyshev_smooth (matvec-only), the local residual —
                # kernel or jnp — supplying r = f - A v; dinv matches the
                # lean operator's synthesized diagonal (halo3d.py:436-465)
                lmax = jnp.asarray(lmaxs[li], v.dtype) * 1.05
                lmin = lmax / 4.0
                theta = 0.5 * (lmax + lmin)
                delta = 0.5 * (lmax - lmin)
                sigma = theta / delta
                interior, _ = _masks_local(v.shape, o, lms[li])
                dinv = jnp.where(interior, 1.0 / wc, jnp.ones((), v.dtype))
                niter, degree = smoothers.cheby_phase(
                    n, spec.cheby_degree)

                def body(_, vv):
                    z = dinv * residual_at(li, o, vv, f)
                    p = z / theta
                    vv = vv + p
                    rho_prev = 1.0 / sigma
                    for _k in range(1, degree):
                        z = dinv * residual_at(li, o, vv, f)
                        rho = 1.0 / (2.0 * sigma - rho_prev)
                        p = rho * rho_prev * p + (2.0 * rho / delta) * z
                        vv = vv + p
                        rho_prev = rho
                    return vv
            elif kern_sm[li]:
                flo, fhi = strips(f, s2d.HP)

                def body(_, vv):
                    vlo, vhi = strips(vv, s2d.HP)
                    if spec.smoother == "jacobi":
                        return s2d.jacobi_sweep_dist(
                            vv, f, vlo, vhi, lms[li], wc, woff,
                            spec.omega, o[0], interpret=_interp)
                    return s2d.rb_sweep_dist(
                        vv, f, vlo, vhi, flo, fhi, lms[li], wc, woff,
                        o[0], interpret=_interp)
            else:
                def body(_, vv):
                    if spec.smoother == "jacobi":
                        return jacobi_sweep_local(vv, f, o, lms[li], ax,
                                                  wc, woff, spec.omega)
                    return rbgs_sweep_local(vv, f, o, lms[li], ax, wc,
                                            woff)
            if niter <= 2:
                for k in range(niter):
                    v = body(k, v)
                return v
            return jax.lax.fori_loop(0, niter, body, v)

        def vcycle(li, v, f, shape=None):
            # V / W / F cycle shapes, matching solver.vcycle:327-337 and
            # halo3d (W recurses twice; F runs one F-recursion then one
            # V-cycle on the coarse problem)
            shape = spec.cycle if shape is None else shape
            if li == 0:
                return coarse_solve(f)
            o = off(li, v.shape)
            wc, woff = weights[li]
            v = smooth(li, v, f, spec.nu1)
            r = residual_at(li, o, v, f)
            if spec.restriction == "injection":
                fc = restrict_inject_local(r)
            elif spec.restriction == "full_weighting":
                fc = restrict_fw_local(r, ax)
            elif kern_rs[li]:
                rlo, rhi = strips(r, s2d.HPR)
                fc = s2d.restrict_pt_dist(
                    r, rlo, rhi, (r.shape[0] // 2, plan[li - 1][1]),
                    lms[li], lms[li - 1], o[0], interpret=_interp)
            else:
                fc = restrict_pt_local(r, o, lms[li], lms[li - 1], ax)
            vc = vcycle(li - 1, jnp.zeros_like(fc), fc, shape)
            if li - 1 > 0:
                if shape == "W":
                    vc = vcycle(li - 1, vc, fc, "W")
                elif shape == "F":
                    vc = vcycle(li - 1, vc, fc, "V")
            oc = (o[0] // 2, o[1] // 2)
            if kern_pr[li]:
                clo, chi = strips(vc, s2d.HP)
                v = s2d.prolong_add_dist(vc, clo, chi, v, lms[li], o[0],
                                         interpret=_interp)
            else:
                v = v + prolong_local(vc, oc, lms[li], ax)
            return smooth(li, v, f, spec.nu2)

        def norm_l2(r):
            # FEM-L2 (mass-weighted) norm — same class-table machinery as
            # the single-device lean solver, so absolute-`tol` configs stop
            # at identical cycle counts (previously this was the vector
            # 2-norm, which silently disagreed with solver.fmg under
            # absolute tolerances).
            o = off(L, r.shape)
            s = mass_quad_local2(r, o, lms[L], m_tables, m_offsets, ax)
            s = jax.lax.psum(s, ax[0])
            s = jax.lax.psum(s, ax[1])
            return jnp.sqrt(jnp.maximum(s, 0.0))

        L = len(levels_b) - 1
        if bench_cycles is not None:
            # benchmarking entry: K norm-free V-cycles from the given
            # guess (per-rep distinct inputs defeat remote-exec caching)
            fL = levels_b[L]
            return jax.lax.fori_loop(
                0, bench_cycles,
                lambda i, vv: vcycle(L, vv, fL), v0)

        # FMG start
        v = coarse_solve(levels_b[0])
        for li in range(1, L + 1):
            oc = (jax.lax.axis_index(ax[0]) * v.shape[0],
                  jax.lax.axis_index(ax[1]) * v.shape[1])
            if kern_pr[li]:
                clo, chi = strips(v, s2d.HP)
                v = s2d.prolong_add_dist(
                    v, clo, chi,
                    jnp.zeros((2 * v.shape[0], plan[li][1]), v.dtype),
                    lms[li], 2 * oc[0], interpret=_interp)
            else:
                v = prolong_local(v, oc, lms[li], ax)
            if li < L:
                for _ in range(spec.mu0):
                    v = vcycle(li, v, levels_b[li])

        f = levels_b[L]
        o = off(L, v.shape)
        wc, woff = weights[L]

        def fine_residual(vv):
            return residual_at(L, o, vv, f)

        rn_ref = norm_l2(fine_residual(jnp.zeros_like(v)))

        def cond(carry):
            _, k, done, _ = carry
            return (~done) & (k < spec.max_cycles)

        def body(carry):
            v, k, _, hist = carry
            v = vcycle(L, v, f)
            rn = norm_l2(fine_residual(v))
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

    if spec.coarse_solver not in ("cholesky", "inverse"):
        raise NotImplementedError("halo path: cholesky/inverse coarse solve")
    bspecs = [P(ax[0], ax[1])] * hier.num_levels
    if bench_cycles is not None:
        ins = (bspecs, P(), P(), P(ax[0], ax[1]))
        outs = P(ax[0], ax[1])
    else:
        ins = (bspecs, P(), P())
        outs = (P(ax[0], ax[1]), P(), P(), P())
    try:
        fn = shard_map(
            local_solve,
            mesh=mesh,
            in_specs=ins,
            out_specs=outs,
            check_vma=False,
        )
    except TypeError:
        fn = shard_map(
            local_solve,
            mesh=mesh,
            in_specs=ins,
            out_specs=outs,
            check_rep=False,
        )

    tables = jnp.asarray(m_op.class_tables)

    if bench_cycles is not None:
        def cycle_fn(h: Hierarchy, v0):
            bs = [lv.b for lv in h.levels]
            return fn(bs, h.coarse.factor, tables, v0)

        return hier, jax.jit(cycle_fn)

    def solve_fn(h: Hierarchy):
        bs = [lv.b for lv in h.levels]
        return fn(bs, h.coarse.factor, tables)

    return hier, jax.jit(solve_fn)
