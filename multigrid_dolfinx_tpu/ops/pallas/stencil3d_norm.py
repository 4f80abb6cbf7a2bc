"""Fused residual + FEM-L2 norm: q = r^T M r with r = f - A v, with v
and f crossing HBM exactly once.

Why: the tolerance loop pays a residual + mass-weighted norm every
V-cycle (reference res_calculator semantics, multigrid.py:203-208,
checked at :292-296).  The class-table mass matvec in plain XLA costs
~37 ms at 512^3 (pad + 15 shifted slice copies + per-point table
gathers) — MORE than the 22 ms V-cycle it guards.

Split that keeps the kernel lean:

  * r extended by zero outside the logical box makes every correlation
    full-space: C_k = sum_p r(p) r(p+off_k) = C_{-k} EXACTLY (index
    substitution; wrapped rolls land in the >= 1 zero-padded rows).  So
    the INTERIOR-class part of the quadratic form is
        q_int = w_c * sum r^2 + 2 * sum_{7 one-sided offsets} w_k C_k,
    computed slab-by-slab in ONE rolling pass that derives r from (v, f)
    in-window — ~15 VPU ops per slab, nowhere near the DMA bound.
  * the class-table deviation (M - M_int) is nonzero only on the
    boundary SHELL of the box; its exact contribution
    sum_{p in shell} r(p) sum_k dT_k[cls(p)] r(p+off_k) is O(surface)
    and runs as plain jnp on thin strips (z-faces, y-faces, x-faces,
    partitioned so edges/corners count once) — table gathers are fine
    at N^2 size.

Matches ops.operators.quadratic_form(M, r, r) with
r = compute_residual(...) (unmasked: f - Av on interior rows, f - v on
boundary rows, 0 outside the logical box) to f32 reduction tolerance —
pinned by tests/test_pallas_kernels.py.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .stencil2d import _roll
from .stencil3d import _branch_offsets


def _one_sided(offsets):
    """(center index, list of (k, off)) keeping one offset per +-pair."""
    center = offsets.index((0, 0, 0))
    seen = set()
    pairs = []
    for k, off in enumerate(offsets):
        if k == center or off in seen:
            continue
        neg = tuple(-a for a in off)
        if neg not in [o for _, o in pairs]:
            pairs.append((k, off))
        seen.add(off)
    return center, pairs


def _norm_kernel(zb_ref, t_ref, v_hbm, f_hbm, out_ref, vwin, fwin,
                 vnew, fnew, ttmp, sems, *,
                 Mz, My, Mx, lm, tz, wc, woff, center, pairs):
    h = 2
    i = pl.program_id(0)
    nprog = pl.num_programs(0)
    ws = tz + 2 * h
    zb = zb_ref[0, 0]
    h2 = 2 * h

    def start(block):
        return jnp.clip(block * tz - h, 0, Mz - ws)

    def new_copies(block, slot):
        z0 = start(block) + h2
        return (
            pltpu.make_async_copy(
                v_hbm.at[pl.ds(z0, tz), :, :], vnew.at[slot],
                sems.at[slot, 0]),
            pltpu.make_async_copy(
                f_hbm.at[pl.ds(z0, tz), :, :], fnew.at[slot],
                sems.at[slot, 1]),
        )

    @pl.when(i == 0)
    def _():
        cv = pltpu.make_async_copy(
            v_hbm.at[pl.ds(start(0), ws), :, :], vwin, sems.at[2, 0])
        cf = pltpu.make_async_copy(
            f_hbm.at[pl.ds(start(0), ws), :, :], fwin, sems.at[2, 1])
        cv.start()
        cf.start()
        if nprog > 1:
            for c in new_copies(1, 1):
                c.start()
        cv.wait()
        cf.wait()

    @pl.when(i > 0)
    def _():
        shift = start(i) - start(i - 1)
        ttmp[:] = vwin[pl.ds(shift, h2)]
        vwin[:h2] = ttmp[:]
        ttmp[:] = fwin[pl.ds(shift, h2)]
        fwin[:h2] = ttmp[:]
        slot = jax.lax.rem(i, jnp.int32(2))
        for c in new_copies(i, slot):
            c.wait()
        vwin[h2:] = vnew[slot]
        fwin[h2:] = fnew[slot]
        if nprog > 2:
            @pl.when(i + 1 < nprog)
            def _():
                for c in new_copies(
                        i + 1, jax.lax.rem(i + 1, jnp.int32(2))):
                    c.start()

    v = vwin[:]
    f = fwin[:]
    z0 = start(i) + zb
    y = jax.lax.broadcasted_iota(jnp.int32, (My, Mx), 0)
    x = jax.lax.broadcasted_iota(jnp.int32, (My, Mx), 1)
    inplane_int = (y >= 1) & (y <= lm - 2) & (x >= 1) & (x <= lm - 2)
    inplane_box = (y <= lm - 1) & (x <= lm - 1)
    zero = jnp.zeros((My, Mx), v.dtype)
    o = i * tz - start(i)

    w_c = t_ref[center, 13]                 # interior class = (1,1,1)
    w_pair = {k: t_ref[k, 13] for k, _ in pairs}

    def r_slab(s):
        """Unmasked residual of window slab s: f - Av interior,
        f - v on boundary rows, 0 outside the box."""
        zg = z0 + s
        interior = jnp.logical_and(
            inplane_int, (zg >= 1) & (zg <= lm - 2))
        inbox = jnp.logical_and(inplane_box, zg <= lm - 1)
        vm = {
            t: jnp.where(
                jnp.logical_and(inplane_int,
                                (z0 + t >= 1) & (z0 + t <= lm - 2)),
                v[t], zero)
            for t in (s - 1, s, s + 1) if 0 <= t < ws
        }
        c = vm.get(s, zero)
        ssum = (
            vm.get(s - 1, zero) + vm.get(s + 1, zero)
            + _roll(c, 1, 0) + _roll(c, -1, 0)
            + _roll(c, 1, 1) + _roll(c, -1, 1)
        )
        av = wc * c + woff * ssum
        r = jnp.where(interior, f[s] - av, f[s] - v[s])
        return jnp.where(inbox, r, zero)

    for oc in _branch_offsets(tz, h):
        @pl.when(o == oc)
        def _(oc=oc):
            hi = min(oc + tz + 1, ws)       # one extra slab for dz=+1
            rs = {s: r_slab(s) for s in range(oc, hi)}
            partial = jnp.float32(0.0)
            for sl in range(tz):
                s = oc + sl
                rz = rs[s]
                # sum_k w_k C_k contributions anchored at slab s:
                # center + 2x the one-sided pairs (C_k == C_{-k}).
                acc = w_c * rz
                for k, (dz, dy, dx) in pairs:
                    if dz == 0:
                        src = rz
                    elif dz == 1:
                        src = rs.get(s + 1, zero)
                    else:                    # dz == -1: mirror to +1
                        src = rs.get(s + 1, zero)
                        dy, dx = -dy, -dx
                    sh = src
                    if dy:
                        sh = _roll(sh, -dy, 0)
                    if dx:
                        sh = _roll(sh, -dx, 1)
                    acc = acc + (2.0 * w_pair[k]) * sh
                partial = partial + jnp.sum(rz * acc, dtype=jnp.float32)
            # Accumulate into the single SMEM scalar (constant-index
            # output block lives across the sequential TPU grid).  A
            # per-program (i, 0) blocked output is rejected by Mosaic:
            # SMEM output blocks must equal the array dims.
            @pl.when(i == 0)
            def _():
                out_ref[0, 0] = partial

            @pl.when(i > 0)
            def _():
                out_ref[0, 0] = out_ref[0, 0] + partial


def _tet_norm_kernel(zb_ref, v_hbm, f_hbm, out_ref, vwin, fwin,
                     vnew, fnew, ttmp, sems, *,
                     Mz, My, Mx, lm, tz, wc, woff, tets, counts,
                     crop_y=False, crop_x=False):
    """q_raw = sum_{cells} [ sum_{6 tets} (sum_{4 corners} r)^2
                             + sum_{corners} count * r^2 ]
    with r the unmasked residual derived in-window from (v, f) — the
    exact consistent-P1-mass quadratic form up to the static factor
    h^3/120 applied by the wrapper (int_T (sum r_i phi_i)^2 =
    (V/20)[(sum r_i)^2 + sum r_i^2] for a linear tet).  Cells are
    anchored at their low corner; each block owns the anchors of its
    output slabs, so every cell is counted exactly once and NO
    boundary-shell correction exists (the per-tet sum IS the boundary
    handling).

    crop_y / crop_x: cropped lean storage (solver/hierarchy.
    _crop_points_3d) drops the high-boundary Dirichlet node plane, so
    My (Mx) == lm - 1 and the +1 corner rolls at the last stored row
    (col) wrap onto row (col) 0 instead of the missing plane.  Those
    corners are masked to r = 0 — the same zero-extension the plain
    class-table path applies (jnp.pad in StencilOperator.
    _apply_class_tables), so fused and plain norms agree bitwise on
    cropped storage; they equal the full-storage norm whenever the
    missing plane's residual vanishes (GS-family smoothers leave
    boundary rows with v = f after every sweep)."""
    h = 2
    i = pl.program_id(0)
    nprog = pl.num_programs(0)
    ws = tz + 2 * h
    zb = zb_ref[0, 0]
    h2 = 2 * h

    def start(block):
        return jnp.clip(block * tz - h, 0, Mz - ws)

    def new_copies(block, slot):
        z0 = start(block) + h2
        return (
            pltpu.make_async_copy(
                v_hbm.at[pl.ds(z0, tz), :, :], vnew.at[slot],
                sems.at[slot, 0]),
            pltpu.make_async_copy(
                f_hbm.at[pl.ds(z0, tz), :, :], fnew.at[slot],
                sems.at[slot, 1]),
        )

    @pl.when(i == 0)
    def _():
        cv = pltpu.make_async_copy(
            v_hbm.at[pl.ds(start(0), ws), :, :], vwin, sems.at[2, 0])
        cf = pltpu.make_async_copy(
            f_hbm.at[pl.ds(start(0), ws), :, :], fwin, sems.at[2, 1])
        cv.start()
        cf.start()
        if nprog > 1:
            for c in new_copies(1, 1):
                c.start()
        cv.wait()
        cf.wait()

    @pl.when(i > 0)
    def _():
        shift = start(i) - start(i - 1)
        ttmp[:] = vwin[pl.ds(shift, h2)]
        vwin[:h2] = ttmp[:]
        ttmp[:] = fwin[pl.ds(shift, h2)]
        fwin[:h2] = ttmp[:]
        slot = jax.lax.rem(i, jnp.int32(2))
        for c in new_copies(i, slot):
            c.wait()
        vwin[h2:] = vnew[slot]
        fwin[h2:] = fnew[slot]
        if nprog > 2:
            @pl.when(i + 1 < nprog)
            def _():
                for c in new_copies(
                        i + 1, jax.lax.rem(i + 1, jnp.int32(2))):
                    c.start()

    v = vwin[:]
    f = fwin[:]
    z0 = start(i) + zb
    y = jax.lax.broadcasted_iota(jnp.int32, (My, Mx), 0)
    x = jax.lax.broadcasted_iota(jnp.int32, (My, Mx), 1)
    inplane_int = (y >= 1) & (y <= lm - 2) & (x >= 1) & (x <= lm - 2)
    inplane_box = (y <= lm - 1) & (x <= lm - 1)
    anchor_plane = (y <= lm - 2) & (x <= lm - 2)
    zero = jnp.zeros((My, Mx), v.dtype)
    o = i * tz - start(i)

    def r_slab(s):
        zg = z0 + s
        interior = jnp.logical_and(
            inplane_int, (zg >= 1) & (zg <= lm - 2))
        inbox = jnp.logical_and(inplane_box, zg <= lm - 1)
        vm = {
            t: jnp.where(
                jnp.logical_and(inplane_int,
                                (z0 + t >= 1) & (z0 + t <= lm - 2)),
                v[t], zero)
            for t in (s - 1, s, s + 1) if 0 <= t < ws
        }
        c = vm.get(s, zero)
        ssum = (
            vm.get(s - 1, zero) + vm.get(s + 1, zero)
            + _roll(c, 1, 0) + _roll(c, -1, 0)
            + _roll(c, 1, 1) + _roll(c, -1, 1)
        )
        av = wc * c + woff * ssum
        r = jnp.where(interior, f[s] - av, f[s] - v[s])
        return jnp.where(inbox, r, zero)

    for oc in _branch_offsets(tz, h):
        @pl.when(o == oc)
        def _(oc=oc):
            hi = min(oc + tz + 1, ws)       # one extra slab for dz=+1
            quads = {}
            for s in range(oc, hi):
                r = r_slab(s)
                ry = _roll(r, -1, 0)
                rx = _roll(r, -1, 1)
                rxy = _roll(ry, -1, 1)
                if crop_y:
                    # +y corner at the last stored row lives on the
                    # missing Dirichlet plane: r = 0 there.
                    oky = y < My - 1
                    ry = jnp.where(oky, ry, zero)
                    rxy = jnp.where(oky, rxy, zero)
                if crop_x:
                    okx = x < Mx - 1
                    rx = jnp.where(okx, rx, zero)
                    rxy = jnp.where(okx, rxy, zero)
                quads[s] = (r, rx, ry, rxy)   # index by dy*2 + dx

            def corner(s, dz, dy, dx):
                q = quads.get(s + dz)
                return zero if q is None else q[dy * 2 + dx]

            partial = jnp.float32(0.0)
            for sl in range(tz):
                s = oc + sl
                cs = {(dz, dy, dx): corner(s, dz, dy, dx)
                      for dz in (0, 1) for dy in (0, 1) for dx in (0, 1)}
                acc = zero
                for b, cnt in counts.items():
                    acc = acc + jnp.float32(cnt) * cs[b] * cs[b]
                for tet in tets:
                    t = cs[tet[0]] + cs[tet[1]] + cs[tet[2]] + cs[tet[3]]
                    acc = acc + t * t
                anchor = jnp.logical_and(anchor_plane, z0 + s <= lm - 2)
                partial = partial + jnp.sum(
                    jnp.where(anchor, acc, zero), dtype=jnp.float32)
            # single (1, 1) SMEM scalar accumulated across the
            # sequential grid (constant-index output block; see
            # _norm_kernel for why per-program blocks don't lower).
            @pl.when(i == 0)
            def _():
                out_ref[0, 0] = partial

            @pl.when(i > 0)
            def _():
                out_ref[0, 0] = out_ref[0, 0] + partial


def _pick_tz_tet(Mz, My, Mx, itemsize: int = 4) -> int:
    import os

    slab = My * Mx * itemsize
    budget = 121 * 1024 * 1024
    env = os.environ.get("MG_TZ_TET")    # measurement override
    cand = (int(env),) if env else (8, 4, 2)
    for tz in cand:
        ws = tz + 4
        # windows + prefetch slots + ttmp, 4 rolled residual planes per
        # window slab held live in the branch body, ~8 corner/temp planes
        need = (2 * ws + 4 * tz + 4) * slab \
            + 4 * (tz + 1) * slab + 8 * slab
        if Mz % tz == 0 and ws <= Mz and (env or need <= budget):
            return tz
    return 0


def residual_tet_quad(v, f, lm, wc, woff, diagonal,
                      interpret: bool = False):
    """q = r^T M r with M the consistent P1 mass of the uniform Kuhn
    grid (`diagonal` = 'right' | 'left'), r = f - A v unmasked — via the
    exact per-tetrahedron geometric sum.  One rolling pass over (v, f),
    ~7 relayout ops per slab (vs ~20 table-correlation rolls in
    _norm_kernel, which measured compute-bound at 286 ms vs 35 ms plain
    at 512^3 on v5e).  Returns the scalar, or None when the shape
    doesn't admit the kernel.

    Accepted y/x layouts per axis: padded (M >= lm + 1, rolled reads
    land in >= 1 zero row/col) or cropped (M == lm - 1, the missing
    high-boundary plane's residual is taken as 0 — see
    _tet_norm_kernel's crop note).  z must hold the full logical extent
    (cropping never applies to z, solver/hierarchy._crop_points_3d)."""
    Mz, My, Mx = v.shape
    if My % 8 or Mx % 128 or Mz < lm:
        return None
    if not (My >= lm + 1 or My == lm - 1):
        return None      # padded rolls rely on >= 1 zero row/col
    if not (Mx >= lm + 1 or Mx == lm - 1):
        return None
    crop_y = My == lm - 1
    crop_x = Mx == lm - 1
    tz = _pick_tz_tet(Mz, My, Mx)
    if tz == 0 or Mz // tz < 2:
        return None
    from ...fem.assembly import simplex_vertex_offsets

    tets = tuple(
        tuple(tuple(int(c) for c in corner) for corner in tet)
        for tet in simplex_vertex_offsets(3, diagonal)
    )
    counts = {}
    for tet in tets:
        for corner in tet:
            counts[corner] = counts.get(corner, 0) + 1
    ws = tz + 4
    kernel = functools.partial(
        _tet_norm_kernel, Mz=Mz, My=My, Mx=Mx, lm=lm, tz=tz,
        wc=float(wc), woff=float(woff), tets=tets, counts=counts,
        crop_y=crop_y, crop_x=crop_x,
    )
    zb = jnp.zeros((1, 1), jnp.int32)
    nblocks = Mz // tz
    parts = pl.pallas_call(
        kernel,
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec((1, 1), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((ws, My, Mx), v.dtype),
            pltpu.VMEM((ws, My, Mx), v.dtype),
            pltpu.VMEM((2, tz, My, Mx), v.dtype),
            pltpu.VMEM((2, tz, My, Mx), v.dtype),
            pltpu.VMEM((4, My, Mx), v.dtype),
            pltpu.SemaphoreType.DMA((3, 2)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=127 * 1024 * 1024,
        ),
        interpret=interpret,
    )(zb, v, f)
    h3 = (1.0 / (lm - 1)) ** 3
    return parts[0, 0] * jnp.float32(h3 / 120.0)


def _pick_tz_norm(Mz, My, Mx, itemsize: int = 4) -> int:
    slab = My * Mx * itemsize
    budget = 121 * 1024 * 1024
    for tz in (8, 4, 2):
        ws = tz + 4
        need = (2 * ws + 4 * tz + 4) * slab \
            + (tz + 1) * slab + int(2.5 * ws) * slab
        if Mz % tz == 0 and ws <= Mz and need <= budget:
            return tz
    return 0


# ----------------------------------------------------------------------
# Boundary-shell delta (wrapper-side, plain jnp on O(surface) strips)
# ----------------------------------------------------------------------

def _strip_context(a, lo, hi, axis, halo):
    """a sliced to [lo-halo, hi+halo) along axis, zero-padded where the
    range leaves storage."""
    n = a.shape[axis]
    lo0, hi0 = max(lo - halo, 0), min(hi + halo, n)
    sl = [slice(None)] * a.ndim
    sl[axis] = slice(lo0, hi0)
    x = a[tuple(sl)]
    pads = [(0, 0)] * a.ndim
    pads[axis] = (lo0 - (lo - halo), (hi + halo) - hi0)
    if any(p != (0, 0) for p in pads):
        x = jnp.pad(x, pads)
    return x


def _iotas(shape, starts):
    return [
        jax.lax.broadcasted_iota(jnp.int32, shape, a) + starts[a]
        for a in range(len(shape))
    ]


def _r_strip(v, f, lo, hi, axis, lm, wc, woff):
    """Unmasked residual on the strip [lo, hi) along `axis` (full extent
    elsewhere), via zero-padded context slices — same semantics as the
    kernel's r_slab."""
    vc = _strip_context(v, lo, hi, axis, 1)
    fc = _strip_context(f, lo, hi, axis, 0)
    starts = [0, 0, 0]
    starts[axis] = lo - 1
    ii = _iotas(vc.shape, starts)
    interior_c = None
    inbox_c = None
    for a in range(3):
        t = (ii[a] >= 1) & (ii[a] <= lm - 2)
        b = (ii[a] >= 0) & (ii[a] <= lm - 1)
        interior_c = t if interior_c is None else interior_c & t
        inbox_c = b if inbox_c is None else inbox_c & b
    vt = jnp.where(interior_c, vc, 0.0)
    ssum = None
    for a in range(3):
        for d in (-1, 1):
            t = jnp.roll(vt, -d, axis=a)
            ssum = t if ssum is None else ssum + t
    # rolls along `axis` mix the context halo incorrectly only at the
    # context's own edges, which the middle slice below never reads;
    # rolls along the other (full-extent, >=1-padded) axes wrap into
    # zero padding, matching the zero extension.
    av = wc * vt + woff * ssum
    mid = [slice(None)] * 3
    mid[axis] = slice(1, 1 + (hi - lo))
    mid = tuple(mid)
    r = jnp.where(interior_c[mid], fc - av[mid], fc - vc[mid])
    return jnp.where(inbox_c[mid], r, 0.0)


def _shell_delta_quad(v, f, tables, offsets, lm, wc, woff):
    """sum_{p in boundary shell} r(p) * sum_k dT_k[cls(p)] r(p+off_k),
    dT = tables - tables[:, 13] (zero on the interior class).  Exact and
    O(surface): z-faces (full planes), y-faces (z in [1, lm-2]), x-faces
    (z, y in [1, lm-2]) partition the shell."""
    dT = tables - tables[:, 13:14]
    acc = jnp.float32(0.0)

    def strip_term(axis, face_lo):
        lo = 0 if face_lo else lm - 1
        # r on [lo-1, lo+2) along axis: the face plus both neighbors
        rr = _r_strip(v, f, lo - 1, lo + 2, axis, lm, wc, woff)
        starts = [0, 0, 0]
        starts[axis] = lo - 1
        ii = _iotas(rr.shape, starts)
        cls = None
        for a in range(3):
            c = jnp.where(ii[a] == 0, 0,
                          jnp.where(ii[a] == lm - 1, 2, 1))
            cls = c if cls is None else cls * 3 + c
        # partition mask: on this face, earlier axes restricted interior
        tmask = ii[axis] == lo
        for a in range(axis):
            tmask = tmask & (ii[a] >= 1) & (ii[a] <= lm - 2)
        out = jnp.float32(0.0)
        for k, off in enumerate(offsets):
            dw = dT[k].reshape(-1)[cls]
            src = jnp.roll(rr, tuple(-o for o in off), axis=(0, 1, 2))
            # rolls along `axis` only matter on the middle (face) row,
            # whose +-1 neighbors are inside rr; other axes wrap into
            # the >= 1 zero padding.
            out = out + jnp.sum(
                jnp.where(tmask, rr * dw * src, 0.0),
                dtype=jnp.float32)
        return out

    for axis in range(3):
        for face_lo in (True, False):
            acc = acc + strip_term(axis, face_lo)
    return acc


def residual_mass_quad(v, f, tables, offsets, lm, wc, woff,
                       interpret: bool = False):
    """q = r^T M r with r = f - A v (unmasked residual semantics), M the
    radius-1 class-table mass operator.  Returns the scalar, or None when
    the shape/operator doesn't admit the kernel."""
    Mz, My, Mx = v.shape
    if My % 8 or Mx % 128 or lm > min(Mz, My, Mx):
        return None
    if My - lm < 1 or Mx - lm < 1:
        return None      # shifted reads rely on >= 1 zero pad row/col
    offsets = tuple(map(tuple, offsets))
    if any(max(abs(a) for a in off) > 1 for off in offsets):
        return None
    if (0, 0, 0) not in offsets or tables.shape != (len(offsets), 27):
        return None
    for off in offsets:
        if tuple(-a for a in off) not in offsets and off != (0, 0, 0):
            return None  # C_k = C_{-k} pairing needs a symmetric pattern
    tz = _pick_tz_norm(Mz, My, Mx)
    if tz == 0 or Mz // tz < 2:
        return None
    center, pairs = _one_sided(offsets)
    ws = tz + 4
    kernel = functools.partial(
        _norm_kernel, Mz=Mz, My=My, Mx=Mx, lm=lm, tz=tz,
        wc=float(wc), woff=float(woff), center=center, pairs=pairs,
    )
    zb = jnp.zeros((1, 1), jnp.int32)
    nblocks = Mz // tz
    t32 = tables.astype(jnp.float32)
    parts = pl.pallas_call(
        kernel,
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec((1, 1), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((ws, My, Mx), v.dtype),
            pltpu.VMEM((ws, My, Mx), v.dtype),
            pltpu.VMEM((2, tz, My, Mx), v.dtype),
            pltpu.VMEM((2, tz, My, Mx), v.dtype),
            pltpu.VMEM((4, My, Mx), v.dtype),
            pltpu.SemaphoreType.DMA((3, 2)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=127 * 1024 * 1024,
        ),
        interpret=interpret,
    )(zb, t32.reshape(len(offsets), 27), v, f)
    q_int = parts[0, 0]
    q_shell = _shell_delta_quad(v, f, t32, offsets, lm,
                                jnp.float32(wc), jnp.float32(woff))
    return q_int + q_shell
