"""Pallas TPU kernels for the 3D const-7-point multigrid ops.

Same speed-of-light philosophy as stencil2d (one HBM pass per array per
sweep, iota masks, no index traffic), but the 3D layout is friendlier: TPU
tiling constrains only the last two dims (y, x), so z is a free leading
axis — kernels block over z-slabs, z-neighbors are static slab slices of
the DMA window, and y/x neighbors are sublane/lane rolls within a slab.

The isotropic Kuhn-tetrahedra P1 Laplacian reduces exactly to the 7-point
stencil (diagonal couplings cancel — verified against the assembled
operator in tests), with weights scaling as h; kernels take the center/
off-axis weights as compile-time immediates.

Arrays are padded to (8k_z, 8k_y, 128k_x); the logical grid is the leading
(lm)^3 corner with inert zero padding.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .stencil2d import _roll


def _plane_interior(shape2, lm):
    """2D (y, x) interior mask of one slab."""
    y = jax.lax.broadcasted_iota(jnp.int32, shape2, 0)
    x = jax.lax.broadcasted_iota(jnp.int32, shape2, 1)
    return (y >= 1) & (y <= lm - 2) & (x >= 1) & (x <= lm - 2)


def _masks3(z0, shape, lm):
    """Interior mask for a window whose global z of slab s is z0 + s.

    z is the un-tiled leading axis and z0 + s is a per-slab SCALAR, so the
    mask is one shared 2D in-plane mask AND a scalar z test per slab —
    building it from full-window 3D iotas costs ~14 int32 plane-ops per
    slab (3 iotas + 6 compares + 5 ands), comparable to the 7-point
    stencil arithmetic itself; this form costs ~9 + ws plane-ops total.
    Returns (None, None, None, interior) — no call site consumes the iota
    components."""
    ws = shape[0]
    inplane = _plane_interior(shape[1:], lm)
    interior = jnp.stack(
        [jnp.logical_and(inplane, (z0 + s >= 1) & (z0 + s <= lm - 2))
         for s in range(ws)], axis=0)
    return None, None, None, interior


def _gs_candidate(f, s, interior_c, wc, woff):
    """GS/Jacobi update value: (f + |w| * S)/wc on the interior, f on
    bc/padding rows (padding f = 0 keeps padding at 0).  wc is a
    compile-time float, so the divide is a reciprocal multiply (VPU f32
    division is several times a multiply; two of these run per element
    per RB stage)."""
    inv_wc = 1.0 / wc
    return jnp.where(interior_c, (f + (-woff) * s) * inv_wc, f)


def _pick_tz(Mz: int, My: int, Mx: int, itemsize: int = 4,
             halo: int = 2) -> int:
    """Output z-slabs per program: big enough to amortize the halo slabs
    (at tz=2 a fused RB sweep reads 3x its output; at tz=4, 2x), small
    enough that the double-buffered v/f windows + output + intermediates
    stay within VMEM and the per-slab kernel unroll compiles in seconds
    (tz=8 pushed Mosaic compile to ~9 min; tz=4 is ~20 s)."""
    import os

    slab = My * Mx * itemsize
    budget = 56 * 1024 * 1024
    env = os.environ.get("MG_TZ")
    cand = (int(env),) if env else (4, 2, 1)
    for tz in cand:
        # 2 slots x 2 arrays x (tz + halo) window slabs + tz output slabs
        if Mz % tz == 0 and (4 * (tz + halo) + tz) * slab <= budget:
            return tz
    return 1


def _window_kernel(body):
    """Shared z-slab window plumbing with double buffering: while block i
    computes, block i+1's (tz + 2)-slab windows of v and f are already in
    flight — DMA overlaps compute across the sequential grid.  Output
    range selected by static branch (window offset is 0/1/2 after
    clamping)."""

    def kernel(zb_ref, v_hbm, f_hbm, out_ref, vwin, fwin, sems, *, Mz, My,
               Mx, lm, tz, **kw):
        i = pl.program_id(0)
        nprog = pl.num_programs(0)
        ws = tz + 2
        zb = zb_ref[0, 0]

        def window_start(block):
            return jnp.clip(block * tz - 1, 0, Mz - ws)

        def start_dmas(block, slot):
            z0 = window_start(block)
            pltpu.make_async_copy(
                v_hbm.at[pl.ds(z0, ws), :, :], vwin.at[slot], sems.at[slot, 0]
            ).start()
            pltpu.make_async_copy(
                f_hbm.at[pl.ds(z0, ws), :, :], fwin.at[slot], sems.at[slot, 1]
            ).start()

        def wait_dmas(block, slot):
            z0 = window_start(block)
            pltpu.make_async_copy(
                v_hbm.at[pl.ds(z0, ws), :, :], vwin.at[slot], sems.at[slot, 0]
            ).wait()
            pltpu.make_async_copy(
                f_hbm.at[pl.ds(z0, ws), :, :], fwin.at[slot], sems.at[slot, 1]
            ).wait()

        slot = jax.lax.rem(i, jnp.int32(2))

        @pl.when(i == 0)
        def _():
            start_dmas(0, 0)

        @pl.when(i + 1 < nprog)
        def _():
            start_dmas(i + 1, jax.lax.rem(i + 1, jnp.int32(2)))

        wait_dmas(i, slot)
        v = vwin[slot]
        f = fwin[slot]
        # masks/parity see GLOBAL z = local window start + z_base (z_base
        # nonzero when the caller is a shard of a z-decomposed grid)
        res = body(v, f, window_start(i) + zb, (ws, My, Mx), lm, **kw)
        o = i * tz - window_start(i)                    # 0, 1, or 2

        for oc in (0, 1, 2):
            @pl.when(o == oc)
            def _(oc=oc):
                for sl in range(tz):
                    out_ref[sl] = res[oc + sl]

    return kernel


def _call_windowed(body, v, f, lm, interpret, z_base=None, **kw):
    Mz, My, Mx = v.shape
    tz = _pick_tz(Mz, My, Mx)
    ws = tz + 2
    kernel = functools.partial(
        _window_kernel(body), Mz=Mz, My=My, Mx=Mx, lm=lm, tz=tz, **kw
    )
    zb = jnp.full((1, 1), 0 if z_base is None else z_base, jnp.int32)
    return pl.pallas_call(
        kernel,
        grid=(Mz // tz,),
        in_specs=[
            pl.BlockSpec((1, 1), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((tz, My, Mx), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(v.shape, v.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, ws, My, Mx), v.dtype),
            pltpu.VMEM((2, ws, My, Mx), v.dtype),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=112 * 1024 * 1024,
        ),
        interpret=interpret,
    )(zb, v, f)


# ----------------------------------------------------------------------
# Rolling-window plumbing: each grid block inherits the previous block's
# window tail by VMEM copy and DMAs ONLY its tz new slabs of v and f, so
# a full sweep moves exactly 3 array passes over HBM (new v, new f, out)
# — the halo re-read of the plain windowed path ((tz+2h)/tz per array)
# disappears.  The TPU grid is sequential, so scratch persists between
# blocks; the new-slab DMA for block i+1 is issued during block i
# (double-buffered via vnew/fnew slots).  Blocks 0 and the clamped tail
# block fall back to full-window DMAs via the same start() formula.
# ----------------------------------------------------------------------

def _branch_offsets(tz: int, h: int):
    """All achievable output offsets o = i*tz - clip(i*tz - h, 0, Mz - ws).

    Un-clipped middle blocks give h.  Bottom-clipped blocks (i*tz < h)
    give the multiples of tz below h.  Top-clipped blocks give
    o ≡ 2h (mod tz) in (h, 2h] (Mz % tz == 0, so Mz - ws ≡ -2h mod tz).
    The previous {0, h, 2h} enumeration was only complete for tz >= h —
    with tz < h some blocks matched NO branch and their output slabs were
    never written (silent garbage; hit by e.g. the tz=1 rolling pick at
    768^3)."""
    offs = {0, h, 2 * h}
    offs.update(range(0, h, tz))
    o = 2 * h
    while o - tz > h:
        o -= tz
        offs.add(o)
    return sorted(offs)


def _rolling_kernel(prelude, emit, pad=0):
    """prelude(v, f, z0, shape3, lm, **kw) runs ONCE per window (e.g. the
    red half-sweep); emit(aux, v, f, z0, shape3, lm, oc, tz, **kw) runs
    inside the static output-offset branch and returns only the tz output
    slabs — the window's halo slabs never pay for the final stage.

    pad = Mz - lm (z-padding slabs).  Offsets o > h occur only at
    top-clamped blocks (window start == Mz - ws), whose output slabs are
    global z in [Mz - ws + o, Mz - ws + o + tz); when those are all
    z padding (o >= ws - pad) the branch emits plain zeros instead of
    running the stages — every kernel in this file produces 0 on padding
    rows (padding f == 0, padding v == 0, non-interior updates pass f/v
    through), and it cuts the compiled body substantially."""

    def kernel(zb_ref, v_hbm, f_hbm, out_ref, vwin, fwin, vnew, fnew, ttmp,
               sems, *, Mz, My, Mx, lm, tz, h, **kw):
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
            # roll the inherited tail down (via ttmp — ranges can overlap)
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
        z0g = start(i) + zb
        shape3 = (ws, My, Mx)
        aux = prelude(v, f, z0g, shape3, lm, **kw)
        o = i * tz - start(i)
        zero_offs = [oc for oc in _branch_offsets(tz, h)
                     if oc > h and oc >= ws - pad]
        if zero_offs:
            @pl.when(o >= zero_offs[0])
            def _():
                for sl in range(tz):
                    out_ref[sl] = jnp.zeros((My, Mx), v.dtype)

        for oc in _branch_offsets(tz, h):
            if oc in zero_offs:
                continue

            @pl.when(o == oc)
            def _(oc=oc):
                outs = emit(aux, v, f, z0g, shape3, lm, oc, tz, **kw)
                for sl in range(tz):
                    out_ref[sl] = outs[sl]

    return kernel


def _pick_tz_rolling(Mz, My, Mx, h, itemsize: int = 4) -> int:
    import os

    slab = My * Mx * itemsize
    # scratch (windows + staging + ttmp + out block) plus ~3*ws slabs of
    # Mosaic stack for the kernel-body intermediates (masked window, the
    # stacked red result, iota masks) must fit the 127M vmem limit.
    # The budget tracks that limit: at 768^3 slabs (776x896 = 2.78 MB)
    # the old 100M budget rejected tz=2 and fell to tz=1, where the
    # per-block halo recompute (h extra stage slabs per 1 output slab)
    # made the fine sweep compute-bound at ~2.4x the tz=2 cost.
    budget = 124 * 1024 * 1024
    env = os.environ.get("MG_TZ")
    cand = (int(env),) if env else (4, 2, 1)
    for tz in cand:
        ws = tz + 2 * h
        need = (2 * ws + 4 * tz + 2 * h + tz + 3 * ws) * slab
        if Mz % tz == 0 and ws <= Mz and need <= budget:
            return tz
    return 0


def _call_rolling(prelude, emit, v, f, lm, h, interpret, z_base=None,
                  alias_v=False, **kw):
    """Rolling-window pallas_call; returns None if the shape doesn't admit
    it (caller falls back to the plain windowed path).  MG_ROLLING=0
    disables it globally (debug/fallback knob).

    alias_v=True declares the output in-place over v (input_output_
    aliases).  This is safe ONLY on the rolling path: every v slab is
    DMA'd into VMEM strictly before any block writes it (block b writes
    z in [b*tz, b*tz + tz); later blocks' new-slab reads start at
    (b+1)*tz + h and the inherited tail comes from VMEM, never re-read
    from HBM).  The plain windowed fallback re-reads its lower halo from
    HBM, so it must never alias.  Callers set it for smoother sweeps
    (v = sweep(v) — the input dies), halving fine-level HBM liveness;
    XLA inserts a copy automatically where v stays live."""
    import os

    if os.environ.get("MG_ROLLING", "1") != "1":
        return None
    if z_base is not None:
        # distributed halo blocks carry real data on their window edges;
        # the rolling kernels' emit-only-output optimization relies on the
        # single-device padding guarantees (>= 1 z-padding slab, domain
        # boundary at z=0) — those shards use the plain windowed path.
        return None
    Mz, My, Mx = v.shape
    tz = _pick_tz_rolling(Mz, My, Mx, h)
    if tz == 0 or Mz // tz < 2:
        return None
    ws = tz + 2 * h
    kernel = functools.partial(
        _rolling_kernel(prelude, emit, pad=Mz - lm),
        Mz=Mz, My=My, Mx=Mx, lm=lm, tz=tz, h=h, **kw
    )
    zb = jnp.full((1, 1), 0 if z_base is None else z_base, jnp.int32)
    return pl.pallas_call(
        kernel,
        grid=(Mz // tz,),
        in_specs=[
            pl.BlockSpec((1, 1), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((tz, My, Mx), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(v.shape, v.dtype),
        scratch_shapes=[
            pltpu.VMEM((ws, My, Mx), v.dtype),
            pltpu.VMEM((ws, My, Mx), v.dtype),
            pltpu.VMEM((2, tz, My, Mx), v.dtype),
            pltpu.VMEM((2, tz, My, Mx), v.dtype),
            pltpu.VMEM((2 * h, My, Mx), v.dtype),
            pltpu.SemaphoreType.DMA((3, 2)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=127 * 1024 * 1024,
        ),
        # default off: measured perf-neutral at 512^3 (22.3 vs 22.4 ms per
        # V-cycle, one alias sample at 24.6 — in-place writes trail the
        # window reads by only h slabs, which can contend for HBM), so it
        # is an opt-in memory-headroom knob for near-HBM-capacity grids
        # (scripts/big_demo.py sets MG_ALIAS=1 for 1024^3).
        input_output_aliases=(
            {1: 0} if alias_v and os.environ.get("MG_ALIAS", "0") == "1"
            else {}),
        interpret=interpret,
    )(zb, v, f)


# ----------------------------------------------------------------------
# Sweeps
# ----------------------------------------------------------------------

def _half_rb_body(v, f, z0, shape3, lm, *, wc, woff, parity):
    ws = shape3[0]
    _, _, _, interior = _masks3(z0, shape3, lm)
    vt = jnp.where(interior, v, jnp.zeros_like(v))
    # static in-plane parity vs a dynamic per-slab target (z0 is traced;
    # Mosaic dislikes % on the dynamically-offset 3D iota)
    plane_shape = shape3[1:]
    ypx = (
        jax.lax.broadcasted_iota(jnp.int32, plane_shape, 0)
        + jax.lax.broadcasted_iota(jnp.int32, plane_shape, 1)
    ) % 2
    out_slabs = []
    for s in range(ws):
        # neighbor sum for slab s: z-neighbors are slabs s-1, s+1 (window-
        # edge wraps only reach non-interior rows and are masked)
        lo = vt[s - 1] if s > 0 else vt[ws - 1]
        hi = vt[s + 1] if s < ws - 1 else vt[0]
        c = vt[s]
        ssum = (
            lo + hi
            + _roll(c, 1, 0) + _roll(c, -1, 0)
            + _roll(c, 1, 1) + _roll(c, -1, 1)
        )
        cand = _gs_candidate(f[s], ssum, interior[s], wc, woff)
        target = (parity + z0 + s) % 2          # scalar (traced)
        color = ypx == target
        out_slabs.append(jnp.where(color, cand, v[s]))
    return out_slabs


def rb_half_sweep(v, f, lm, wc, woff, parity, interpret=False,
                  z_base=None):
    """One red or black half-sweep of Gauss-Seidel on the 7-point const
    stencil (center weight wc, off-axis weight woff < 0).  `z_base` shifts
    the global z origin (z-sharded distributed blocks)."""
    return _call_windowed(
        _half_rb_body, v, f, lm, interpret, z_base=z_base,
        wc=float(wc), woff=float(woff), parity=int(parity),
    )


def _ypx(plane_shape):
    return (
        jax.lax.broadcasted_iota(jnp.int32, plane_shape, 0)
        + jax.lax.broadcasted_iota(jnp.int32, plane_shape, 1)
    ) % 2


def _nbr_sum(vt, s, ws):
    """6-neighbor sum for slab s of a masked window; out-of-window z
    neighbors contribute zero (those candidates are always masked: the
    window edge slabs are either domain boundary or >= 2 slabs of z
    padding)."""
    c = vt[s]
    lo = vt[s - 1] if s > 0 else jnp.zeros_like(c)
    hi = vt[s + 1] if s < ws - 1 else jnp.zeros_like(c)
    return (
        lo + hi
        + _roll(c, 1, 0) + _roll(c, -1, 0)
        + _roll(c, 1, 1) + _roll(c, -1, 1)
    )


def _rb_prelude(v, f, z0, shape3, lm, *, wc, woff):
    """Red half-sweep over window slabs 0..ws-2.  Slab ws-1 passes through
    un-updated: the only black outputs that read its red value sit in z
    padding (>= 2 slabs on every stored grid) and are masked."""
    ws = shape3[0]
    _, _, _, interior = _masks3(z0, shape3, lm)
    ypx = _ypx(shape3[1:])
    vt = jnp.where(interior, v, jnp.zeros_like(v))
    outs = []
    for s in range(ws - 1):
        cand = _gs_candidate(f[s], _nbr_sum(vt, s, ws), interior[s],
                             wc, woff)
        target = (z0 + s) % 2
        outs.append(jnp.where(ypx == target, cand, v[s]))
    outs.append(v[ws - 1])
    return jnp.stack(outs, axis=0), interior, ypx


def _rb_emit(aux, v, f, z0, shape3, lm, oc, tz, *, wc, woff):
    """Black half-sweep for the tz output slabs only."""
    v1, interior, ypx = aux
    ws = shape3[0]
    vt = jnp.where(interior, v1, jnp.zeros_like(v1))
    outs = []
    for s in range(oc, oc + tz):
        cand = _gs_candidate(f[s], _nbr_sum(vt, s, ws), interior[s],
                             wc, woff)
        target = (1 + z0 + s) % 2
        outs.append(jnp.where(ypx == target, cand, v1[s]))
    return outs


def _rb_fused_kernel(zb_ref, v_hbm, f_hbm, out_ref, vwin, fwin, sems, *,
                     Mz, My, Mx, lm, tz, wc, woff):
    """Full red-black sweep in one pass: window has a 2-slab halo so the
    black stage can consume the red update straight from VMEM."""
    i = pl.program_id(0)
    nprog = pl.num_programs(0)
    ws = tz + 4

    def window_start(block):
        return jnp.clip(block * tz - 2, 0, Mz - ws)

    def start_dmas(block, slot):
        z0 = window_start(block)
        pltpu.make_async_copy(
            v_hbm.at[pl.ds(z0, ws), :, :], vwin.at[slot], sems.at[slot, 0]
        ).start()
        pltpu.make_async_copy(
            f_hbm.at[pl.ds(z0, ws), :, :], fwin.at[slot], sems.at[slot, 1]
        ).start()

    def wait_dmas(block, slot):
        z0 = window_start(block)
        pltpu.make_async_copy(
            v_hbm.at[pl.ds(z0, ws), :, :], vwin.at[slot], sems.at[slot, 0]
        ).wait()
        pltpu.make_async_copy(
            f_hbm.at[pl.ds(z0, ws), :, :], fwin.at[slot], sems.at[slot, 1]
        ).wait()

    slot = jax.lax.rem(i, jnp.int32(2))

    @pl.when(i == 0)
    def _():
        start_dmas(0, 0)

    @pl.when(i + 1 < nprog)
    def _():
        start_dmas(i + 1, jax.lax.rem(i + 1, jnp.int32(2)))

    wait_dmas(i, slot)
    v = vwin[slot]
    f = fwin[slot]
    z0 = window_start(i) + zb_ref[0, 0]
    shape3 = (ws, My, Mx)
    _, _, _, interior = _masks3(z0, shape3, lm)
    plane_shape = shape3[1:]
    ypx = (
        jax.lax.broadcasted_iota(jnp.int32, plane_shape, 0)
        + jax.lax.broadcasted_iota(jnp.int32, plane_shape, 1)
    ) % 2

    def stage(cur, parity):
        vt = jnp.where(interior, cur, jnp.zeros_like(cur))
        outs = []
        for sidx in range(ws):
            lo = vt[sidx - 1] if sidx > 0 else vt[ws - 1]
            hi = vt[sidx + 1] if sidx < ws - 1 else vt[0]
            c = vt[sidx]
            ssum = (
                lo + hi
                + _roll(c, 1, 0) + _roll(c, -1, 0)
                + _roll(c, 1, 1) + _roll(c, -1, 1)
            )
            cand = _gs_candidate(f[sidx], ssum, interior[sidx], wc, woff)
            target = (parity + z0 + sidx) % 2
            outs.append(jnp.where(ypx == target, cand, cur[sidx]))
        return jnp.stack(outs, axis=0)

    v1 = stage(v, 0)
    v2 = stage(v1, 1)
    o = i * tz - window_start(i)                    # 0, 2, or 4

    for oc in (0, 2, 4):
        @pl.when(o == oc)
        def _(oc=oc):
            for sl in range(tz):
                out_ref[sl] = v2[oc + sl]


def rb_sweep_fused(v, f, lm, wc, woff, interpret=False, z_base=None):
    """One full red-black GS sweep (both colors) in a single HBM pass —
    exactly 3 array passes (new v slabs, new f slabs, output) on the
    rolling-window path."""
    out = _call_rolling(
        _rb_prelude, _rb_emit, v, f, lm, 2, interpret, z_base=z_base,
        alias_v=True, wc=float(wc), woff=float(woff),
    )
    if out is not None:
        return out
    Mz, My, Mx = v.shape
    tz = _pick_tz(Mz, My, Mx, halo=4)
    if tz % 2 != 0:
        # odd block: window offsets would lose their parity invariant;
        # fall back to two half-sweeps (tiny z extents only)
        v = rb_half_sweep(v, f, lm, wc, woff, 0, interpret=interpret,
                          z_base=z_base)
        return rb_half_sweep(v, f, lm, wc, woff, 1, interpret=interpret,
                             z_base=z_base)
    ws = tz + 4
    kernel = functools.partial(
        _rb_fused_kernel, Mz=Mz, My=My, Mx=Mx, lm=lm, tz=tz,
        wc=float(wc), woff=float(woff),
    )
    zb = jnp.full((1, 1), 0 if z_base is None else z_base, jnp.int32)
    return pl.pallas_call(
        kernel,
        grid=(Mz // tz,),
        in_specs=[
            pl.BlockSpec((1, 1), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((tz, My, Mx), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(v.shape, v.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, ws, My, Mx), v.dtype),
            pltpu.VMEM((2, ws, My, Mx), v.dtype),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=112 * 1024 * 1024,
        ),
        interpret=interpret,
    )(zb, v, f)


def _rb2_prelude(v, f, z0, shape3, lm, *, wc, woff):
    """Double-sweep prelude: nothing heavy — all four RB stages run inside
    the static output-offset branch (emit), where the slab pyramid can be
    restricted per branch."""
    My, Mx = shape3[1:]
    y = jax.lax.broadcasted_iota(jnp.int32, (My, Mx), 0)
    x = jax.lax.broadcasted_iota(jnp.int32, (My, Mx), 1)
    inplane = (y >= 1) & (y <= lm - 2) & (x >= 1) & (x <= lm - 2)
    return inplane, (y + x) % 2


def _rb2_emit(aux, v, f, z0, shape3, lm, oc, tz, *, wc, woff):
    """Two full red-black GS sweeps (R1 B1 R2 B2) for the tz output slabs.

    Dependency pyramid: B2 on [oc, oc+tz) needs R2 on [oc-1, oc+tz+1),
    B1 on [oc-2, oc+tz+2), R1 on [oc-3, oc+tz+3) — each stage runs only
    on its (static) range, so the fused double sweep costs ~(4tz+12)/tz
    slab-stage computations per output slab vs 2(2tz+3)/tz for two single
    sweeps, while halving the HBM traffic (one v/f read + one v write for
    BOTH sweeps).  Values computed near window edges with missing
    out-of-window neighbors are never consumed by an emitted slab: the
    pyramid bottoms out on domain-boundary or z-padding rows whose update
    is `f` regardless (>= 4 z-padding slabs required — callers check)."""
    inplane, ypx = aux
    ws = shape3[0]
    zero = jnp.zeros(shape3[1:], v.dtype)

    def interior_at(s):
        zg = z0 + s
        zok = (zg >= 1) & (zg <= lm - 2)
        return jnp.logical_and(inplane, zok)

    cur = {s: v[s] for s in range(ws)}
    stages = (
        (0, oc - 3, oc + tz + 3),
        (1, oc - 2, oc + tz + 2),
        (0, oc - 1, oc + tz + 1),
        (1, oc, oc + tz),
    )
    for parity, lo, hi in stages:
        lo, hi = max(lo, 0), min(hi, ws)
        vt = {
            s: jnp.where(interior_at(s), cur[s], zero)
            for s in range(max(lo - 1, 0), min(hi + 1, ws))
        }
        new = {}
        for s in range(lo, hi):
            c = vt[s]
            ssum = (
                vt.get(s - 1, zero) + vt.get(s + 1, zero)
                + _roll(c, 1, 0) + _roll(c, -1, 0)
                + _roll(c, 1, 1) + _roll(c, -1, 1)
            )
            cand = _gs_candidate(f[s], ssum, interior_at(s), wc, woff)
            target = (parity + z0 + s) % 2
            new[s] = jnp.where(ypx == target, cand, cur[s])
        cur.update(new)
    return [cur[oc + sl] for sl in range(tz)]


def rb_sweep2_fused(v, f, lm, wc, woff, interpret=False, z_base=None):
    """TWO full red-black GS sweeps in a single rolling-window pass: v and
    f each cross HBM once for both sweeps (the V(2,2) pre-/post-smoothing
    pair costs 3 array passes instead of 6).  Falls back to two single
    fused sweeps when the shape/padding/VMEM doesn't admit it.

    Default OFF (opt in with MG_RB2=1): measured on v5e at 512^3 the
    double sweep is a net loss — 54.0 ms/V-cycle vs 30.6 ms for two
    single fused sweeps.  The single-sweep kernels already run well below
    the HBM roofline (~190 GB/s effective of ~819), i.e. they are
    issue/compute-bound, so halving HBM traffic does not pay for the
    ~(4tz+12)/(4tz+6) stage redundancy of the h=4 dependency pyramid at
    the VMEM-constrained tz.  Kept (tested in interpret mode) because the
    trade flips wherever HBM bandwidth is the binding constraint."""
    import os

    Mz = v.shape[0]
    ok = (
        os.environ.get("MG_RB2", "0") == "1"
        and z_base is None                  # same constraint as rolling
        and Mz - lm >= 4                    # 4 z-padding slabs for the h=4
                                            # edge-validity argument above
        # Compiled programs: only where the double sweep could pay (coarse-
        # level sweeps cost microseconds) — each instantiation is a large
        # Mosaic body and the remote-compile payload is size-limited.
        # Interpret mode (CPU tests) always exercises the real kernel.
        and (interpret or lm >= int(os.environ.get("MG_RB2_MIN_LM", "65")))
    )
    if ok:
        out = _call_rolling(
            _rb2_prelude, _rb2_emit, v, f, lm, 4, interpret, z_base=z_base,
            alias_v=True, wc=float(wc), woff=float(woff),
        )
        if out is not None:
            return out
    v = rb_sweep_fused(v, f, lm, wc, woff, interpret=interpret,
                       z_base=z_base)
    return rb_sweep_fused(v, f, lm, wc, woff, interpret=interpret,
                          z_base=z_base)


def _pw_prelude(v, f, z0, shape3, lm, **kw):
    """Shared single-stage prelude: interior mask + masked window."""
    _, _, _, interior = _masks3(z0, shape3, lm)
    vt = jnp.where(interior, v, jnp.zeros_like(v))
    return interior, vt


def _jacobi_emit(aux, v, f, z0, shape3, lm, oc, tz, *, wc, woff, omega):
    interior, vt = aux
    ws = shape3[0]
    outs = []
    for s in range(oc, oc + tz):
        cand = _gs_candidate(f[s], _nbr_sum(vt, s, ws), interior[s],
                             wc, woff)
        outs.append((1.0 - omega) * v[s] + omega * cand)
    return outs


def _residual_emit(aux, v, f, z0, shape3, lm, oc, tz, *, wc, woff):
    interior, vt = aux
    ws = shape3[0]
    outs = []
    for s in range(oc, oc + tz):
        av = jnp.where(interior[s],
                       wc * vt[s] + woff * _nbr_sum(vt, s, ws), v[s])
        outs.append(f[s] - av)
    return outs


def _jacobi_body(v, f, z0, shape3, lm, *, wc, woff, omega):
    ws = shape3[0]
    _, _, _, interior = _masks3(z0, shape3, lm)
    vt = jnp.where(interior, v, jnp.zeros_like(v))
    outs = []
    for s in range(ws):
        lo = vt[s - 1] if s > 0 else vt[ws - 1]
        hi = vt[s + 1] if s < ws - 1 else vt[0]
        c = vt[s]
        ssum = (
            lo + hi
            + _roll(c, 1, 0) + _roll(c, -1, 0)
            + _roll(c, 1, 1) + _roll(c, -1, 1)
        )
        cand = _gs_candidate(f[s], ssum, interior[s], wc, woff)
        outs.append((1.0 - omega) * v[s] + omega * cand)
    return outs


def jacobi_sweep(v, f, lm, wc, woff, omega, interpret=False, z_base=None):
    """One weighted-Jacobi sweep: v' = (1-w) v + w D^-1 (f - (A - D) v),
    reference association (multigrid.py:223-228) on the const-7 stencil."""
    out = _call_rolling(
        _pw_prelude, _jacobi_emit, v, f, lm, 1, interpret, z_base=z_base,
        alias_v=True, wc=float(wc), woff=float(woff), omega=float(omega),
    )
    if out is not None:
        return out
    return _call_windowed(
        _jacobi_body, v, f, lm, interpret, z_base=z_base,
        wc=float(wc), woff=float(woff), omega=float(omega),
    )


def _residual_body(v, f, z0, shape3, lm, *, wc, woff):
    ws = shape3[0]
    _, _, _, interior = _masks3(z0, shape3, lm)
    vt = jnp.where(interior, v, jnp.zeros_like(v))
    outs = []
    for s in range(ws):
        lo = vt[s - 1] if s > 0 else vt[ws - 1]
        hi = vt[s + 1] if s < ws - 1 else vt[0]
        c = vt[s]
        ssum = (
            lo + hi
            + _roll(c, 1, 0) + _roll(c, -1, 0)
            + _roll(c, 1, 1) + _roll(c, -1, 1)
        )
        av = jnp.where(interior[s], wc * c + woff * ssum, v[s])
        outs.append(f[s] - av)
    return outs


def residual(v, f, lm, wc, woff, interpret=False, z_base=None):
    """Fused r = f - A v for the const-7 operator."""
    out = _call_rolling(
        _pw_prelude, _residual_emit, v, f, lm, 1, interpret, z_base=z_base,
        wc=float(wc), woff=float(woff)
    )
    if out is not None:
        return out
    return _call_windowed(
        _residual_body, v, f, lm, interpret, z_base=z_base,
        wc=float(wc), woff=float(woff)
    )


# ----------------------------------------------------------------------
# Transfers
# ----------------------------------------------------------------------

def _plane_restrict(g, lmf, lmc, Wc_out):
    """In-plane (y, x) part of P^T restriction of one fine z-plane
    (already interior-masked and z-combined): [1 2 1] in y with even-row
    sampling (sublane reshape), then in x via the transpose trick."""
    if g.dtype.itemsize < 4:
        # Mosaic's relayout ops (strided sublane reshape, transpose) are
        # 32-bit-only; the bf16 inner cycle computes the interleave in f32
        # and casts back (the plane is VMEM-resident, converts are cheap).
        return _plane_restrict(
            g.astype(jnp.float32), lmf, lmc, Wc_out).astype(g.dtype)
    Myf, Mxf = g.shape
    rows = _roll(g, 1, 0) + 2.0 * g + _roll(g, -1, 0)
    ev_rows = rows.reshape(Myf // 2, 2, Mxf)[:, 0, :]       # y = 2j
    cols = _roll(ev_rows, 1, 1) + 2.0 * ev_rows + _roll(ev_rows, -1, 1)
    ct = cols.T                                             # (Mxf, Myf//2)
    ev = ct.reshape(Mxf // 2, 2, Myf // 2)[:, 0, :].T       # (Myf//2, Mxf//2)
    Myc, Mxc2 = ev.shape
    if Mxc2 >= Wc_out:
        return ev[:, :Wc_out]
    return jnp.concatenate(
        [ev, jnp.zeros((Myc, Wc_out - Mxc2), ev.dtype)], axis=1
    )


def _restrict_kernel(r_hbm, out_ref, rwin, sem, *, Mzf, Myf, Mxf,
                     Mzc, Myc, Mxc, lmf, lmc):
    i = pl.program_id(0)         # coarse z-slab index
    nprog = pl.num_programs(0)
    zs = jnp.clip(2 * i - 1, 0, Mzf - 3)
    slot = jax.lax.rem(i, jnp.int32(2))

    def dma(block, sl):
        z0 = jnp.clip(2 * block - 1, 0, Mzf - 3)
        return pltpu.make_async_copy(
            r_hbm.at[pl.ds(z0, 3), :, :], rwin.at[sl], sem.at[sl])

    @pl.when(i == 0)
    def _():
        dma(0, 0).start()

    @pl.when(i + 1 < nprog)
    def _():
        dma(i + 1, jax.lax.rem(i + 1, jnp.int32(2))).start()

    dma(i, slot).wait()
    r = rwin[slot]
    _, _, _, interior = _masks3(zs, (3, Myf, Mxf), lmf)
    rt = jnp.where(interior, r, jnp.zeros_like(r))
    # z-combination [1 2 1] centered on fine z = 2i; window slab of fine
    # z=2i is (2i - zs).  Coarse padding slabs (2i beyond the fine grid)
    # clamp to branch 2 and are zeroed by the coarse mask.
    o = jnp.clip(2 * i - zs, 0, 2)

    def combine(oc):
        lo = rt[oc - 1] if oc > 0 else jnp.zeros_like(rt[0])
        hi = rt[oc + 1] if oc < 2 else jnp.zeros_like(rt[0])
        return lo + 2.0 * rt[oc] + hi

    for oc in (0, 1, 2):
        @pl.when(o == oc)
        def _(oc=oc):
            g = combine(oc)
            res = _plane_restrict(g, lmf, lmc, Mxc) * 0.125  # 8 * /64
            yc = jax.lax.broadcasted_iota(jnp.int32, res.shape, 0)
            xc = jax.lax.broadcasted_iota(jnp.int32, res.shape, 1)
            mask = (
                (i >= 1) & (i <= lmc - 2)
                & (yc >= 1) & (yc <= lmc - 2)
                & (xc >= 1) & (xc <= lmc - 2)
            )
            res = jnp.where(mask, res, jnp.zeros_like(res))
            ry = res.shape[0]
            if ry >= Myc:
                out_ref[0] = res[:Myc]
            else:
                out_ref[0] = jnp.concatenate(
                    [res, jnp.zeros((Myc - ry, Mxc), res.dtype)], axis=0
                )


def restrict_pt(r_fine, coarse_shape: Tuple[int, int, int], lmf: int,
                lmc: int, interpret: bool = False):
    """3D variational P^T restriction (correction-equation BC masking
    built in, matching the jnp path in solver.vcycle.restrict_level)."""
    Mzf, Myf, Mxf = r_fine.shape
    Mzc, Myc, Mxc = coarse_shape
    kernel = functools.partial(
        _restrict_kernel, Mzf=Mzf, Myf=Myf, Mxf=Mxf,
        Mzc=Mzc, Myc=Myc, Mxc=Mxc, lmf=lmf, lmc=lmc,
    )
    return pl.pallas_call(
        kernel,
        grid=(Mzc,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((1, Myc, Mxc), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(coarse_shape, r_fine.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, 3, Myf, Mxf), r_fine.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=112 * 1024 * 1024,
        ),
        interpret=interpret,
    )(r_fine)


def _restrict_residual_kernel(v_hbm, f_hbm, out_ref, vwin, fwin, vnew,
                              fnew, ttmp, rcache, sems, *, Mzf, Myf, Mxf,
                              Mzc, Myc, Mxc, lmf, lmc, wc, woff):
    """Fused r = f - A v and P^T restriction, rolling over coarse slabs:
    v and f are each read from HBM exactly once for the whole operation
    (the separate residual pass cost 3 array passes and materialized r).

    Window = 5 fine slabs [2i-2, 2i+3); advance = 2 per coarse slab; the
    3-slab tail rolls forward in VMEM, 2 new slabs DMA in (double-
    buffered via vnew/fnew staging slots)."""
    i = pl.program_id(0)             # coarse z-slab index
    nprog = pl.num_programs(0)
    WS = 5

    def start(block):
        return jnp.clip(2 * block - 2, 0, Mzf - WS)

    def new_copies(block, slot):
        z0 = start(block) + 3
        return (
            pltpu.make_async_copy(
                v_hbm.at[pl.ds(z0, 2), :, :], vnew.at[slot],
                sems.at[slot, 0]),
            pltpu.make_async_copy(
                f_hbm.at[pl.ds(z0, 2), :, :], fnew.at[slot],
                sems.at[slot, 1]),
        )

    @pl.when(i == 0)
    def _():
        cv = pltpu.make_async_copy(
            v_hbm.at[pl.ds(start(0), WS), :, :], vwin, sems.at[2, 0])
        cf = pltpu.make_async_copy(
            f_hbm.at[pl.ds(start(0), WS), :, :], fwin, sems.at[2, 1])
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
        ttmp[:] = vwin[pl.ds(shift, 3)]
        vwin[:3] = ttmp[:]
        ttmp[:] = fwin[pl.ds(shift, 3)]
        fwin[:3] = ttmp[:]
        slot = jax.lax.rem(i, jnp.int32(2))
        for c in new_copies(i, slot):
            c.wait()
        vwin[3:] = vnew[slot]
        fwin[3:] = fnew[slot]
        if nprog > 2:
            @pl.when(i + 1 < nprog)
            def _():
                for c in new_copies(i + 1, jax.lax.rem(i + 1, jnp.int32(2))):
                    c.start()

    v = vwin[:]
    f = fwin[:]
    z0 = start(i)
    shape3 = (WS, Myf, Mxf)
    _, _, _, interior = _masks3(z0, shape3, lmf)
    vt = jnp.where(interior, v, jnp.zeros_like(v))

    def resid_row(s):
        if s < 0 or s >= WS:
            return jnp.zeros((Myf, Mxf), v.dtype)
        av = wc * vt[s] + woff * _nbr_sum(vt, s, WS)
        # interior-masked residual (the 'pt' correction-equation masking,
        # solver.vcycle.restrict_level)
        return jnp.where(interior[s], f[s] - av, jnp.zeros((Myf, Mxf),
                                                           v.dtype))

    # o = 0 only at the first block, 2 at interior blocks.  The clamped
    # tail lands on odd/large offsets, but those coarse slabs are always
    # z padding (storage pad >= 3 slabs, and the tail starts past lmc-1),
    # so they just get zeros — no compute, and the kernel body compiles
    # at 2 real branches instead of 5.
    #
    # Consecutive windows overlap by one residual row: block i's top row
    # (global fine z = 2i+1, full in-window neighbor support) is block
    # i+1's bottom row, so it is cached in persistent scratch and each
    # block computes TWO residual rows instead of three.  The cache-
    # consuming blocks are a contiguous prefix of the sequential grid
    # (once the tail clamps, every later block emits zeros), so the
    # cache is never read stale.
    o = jnp.clip(2 * i - z0, 0, 4)
    for oc in (0, 2):
        @pl.when(o == oc)
        def _(oc=oc):
            r_top = resid_row(oc + 1)
            r_bot = (jnp.zeros((Myf, Mxf), v.dtype) if oc == 0
                     else rcache[:])
            g = r_bot + 2.0 * resid_row(oc) + r_top
            rcache[:] = r_top
            res = _plane_restrict(g, lmf, lmc, Mxc) * 0.125
            yc = jax.lax.broadcasted_iota(jnp.int32, res.shape, 0)
            xc = jax.lax.broadcasted_iota(jnp.int32, res.shape, 1)
            mask = (
                (i >= 1) & (i <= lmc - 2)
                & (yc >= 1) & (yc <= lmc - 2)
                & (xc >= 1) & (xc <= lmc - 2)
            )
            res = jnp.where(mask, res, jnp.zeros_like(res))
            ry = res.shape[0]
            if ry >= Myc:
                out_ref[0] = res[:Myc]
            else:
                out_ref[0] = jnp.concatenate(
                    [res, jnp.zeros((Myc - ry, Mxc), res.dtype)], axis=0
                )

    @pl.when((o != 0) & (o != 2))
    def _():
        out_ref[0] = jnp.zeros((Myc, Mxc), v.dtype)


def restrict_residual_pt(v, f, coarse_shape: Tuple[int, int, int],
                         lmf: int, lmc: int, wc: float, woff: float,
                         interpret: bool = False):
    """Fused (f - A v) -> P^T restriction for the const-7 operator: the
    coarse RHS of the correction equation in one pass over v and f, with
    no residual array materialized.

    The fused kernel's scratch is a fixed 22 fine slabs (two 5-slab
    windows, 2x2-slab staging for each of v/f, 3-slab roll buffer, 1-slab
    row cache); past ~1000^2 planes that exceeds the 128 MB VMEM, so it
    falls back to the separate residual + restrict_pt kernels (both
    VMEM-budgeted internally; restrict_pt applies the same interior
    masking to the fine residual, so the results are identical)."""
    Mzf, Myf, Mxf = v.shape
    Mzc, Myc, Mxc = coarse_shape
    slab = Myf * Mxf * v.dtype.itemsize
    if 26 * slab > 100 * 1024 * 1024:     # 22 scratch + ~4 body temporaries
        r = residual(v, f, lmf, wc, woff, interpret=interpret)
        return restrict_pt(r, coarse_shape, lmf, lmc, interpret=interpret)
    kernel = functools.partial(
        _restrict_residual_kernel, Mzf=Mzf, Myf=Myf, Mxf=Mxf,
        Mzc=Mzc, Myc=Myc, Mxc=Mxc, lmf=lmf, lmc=lmc,
        wc=float(wc), woff=float(woff),
    )
    return pl.pallas_call(
        kernel,
        grid=(Mzc,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, Myc, Mxc), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(coarse_shape, v.dtype),
        scratch_shapes=[
            pltpu.VMEM((5, Myf, Mxf), v.dtype),
            pltpu.VMEM((5, Myf, Mxf), v.dtype),
            pltpu.VMEM((2, 2, Myf, Mxf), v.dtype),
            pltpu.VMEM((2, 2, Myf, Mxf), v.dtype),
            pltpu.VMEM((3, Myf, Mxf), v.dtype),
            pltpu.VMEM((Myf, Mxf), v.dtype),
            pltpu.SemaphoreType.DMA((3, 2)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=112 * 1024 * 1024,
        ),
        interpret=interpret,
    )(v, f)


def _plane_prolong(c, Mxf_out):
    """In-plane (y, x) bilinear interpolation of one coarse z-plane."""
    if c.dtype.itemsize < 4:
        # see _plane_restrict: interleave (stack+reshape) is 32-bit-only
        return _plane_prolong(
            c.astype(jnp.float32), Mxf_out).astype(c.dtype)
    Myc, Mxc = c.shape
    codd = 0.5 * (c + _roll(c, -1, 1))
    inter = jnp.stack([c.T, codd.T], axis=1).reshape(2 * Mxc, Myc)
    wide = inter.T                               # (Myc, 2*Mxc)
    wodd = 0.5 * (wide + _roll(wide, -1, 0))
    full = jnp.stack([wide, wodd], axis=1).reshape(2 * Myc, 2 * Mxc)
    return full[:, :Mxf_out]


def _prolong_kernel(c_hbm, *rest, Mzf, Myf, Mxf, Mzc, Myc, Mxc, lmf,
                    fused_add):
    # fused_add: rest = (v_ref, out_ref, cwin, pcache, sem) and the kernel
    # emits v + P(c) — the V-cycle correction step in the same HBM pass
    # (the separate XLA add costs 3 extra array passes).  Else rest =
    # (out_ref, cwin, pcache, sem).
    if fused_add:
        v_ref, out_ref, cwin, pcache, sem = rest
    else:
        out_ref, cwin, pcache, sem = rest
        v_ref = None
    i = pl.program_id(0)          # fine z-slab PAIR index: fine z = 2i, 2i+1
    nprog = pl.num_programs(0)
    zc = jnp.clip(i, 0, Mzc - 2)
    slot = jax.lax.rem(i, jnp.int32(2))

    def dma(block, sl):
        z0 = jnp.clip(block, 0, Mzc - 2)
        return pltpu.make_async_copy(
            c_hbm.at[pl.ds(z0, 2), :, :], cwin.at[sl], sem.at[sl])

    @pl.when(i == 0)
    def _():
        dma(0, 0).start()

    @pl.when(i + 1 < nprog)
    def _():
        dma(i + 1, jax.lax.rem(i + 1, jnp.int32(2))).start()

    dma(i, slot).wait()
    c = cwin[slot]
    o = i - zc                    # 0 normally; 1 only in the clamped tail

    # Block i's even plane is the in-plane prolongation of coarse plane i —
    # exactly the plane block i-1 interpolated as its p1 (odd-plane
    # partner).  The grid is sequential and scratch persists, so p1 is
    # cached in pcache and each block computes ONE in-plane prolongation
    # instead of two (the in-plane stage, with its two lane<->sublane
    # transposes, dominates this kernel's compute).  Block 0 seeds the
    # cache; clamped-tail blocks (o == 1) reuse it identically, since
    # their p0 source c[1] is the same coarse plane the previous block
    # prolonged as p1.
    @pl.when(i == 0)
    def _():
        pcache[:] = _plane_prolong(c[0], Mxf)[:Myf]

    for oc in (0, 1):
        @pl.when(o == oc)
        def _(oc=oc):
            p0 = pcache[:]
            p1_src = c[oc + 1] if oc + 1 < 2 else c[oc]
            p1 = _plane_prolong(p1_src, Mxf)[:Myf]
            even = p0
            odd = 0.5 * (p0 + p1)
            zf0 = 2 * i
            for sl, plane in ((0, even), (1, odd)):
                zf = zf0 + sl
                yf = jax.lax.broadcasted_iota(jnp.int32, plane.shape, 0)
                xf = jax.lax.broadcasted_iota(jnp.int32, plane.shape, 1)
                mask = (zf <= lmf - 1) & (yf <= lmf - 1) & (xf <= lmf - 1)
                e = jnp.where(mask, plane, jnp.zeros_like(plane))
                out_ref[sl] = (v_ref[sl] + e) if fused_add else e
            pcache[:] = p1


def prolong_linear(c_coarse, fine_shape: Tuple[int, int, int], lmf: int,
                   interpret: bool = False):
    """3D trilinear prolongation onto the padded fine grid."""
    Mzc, Myc, Mxc = c_coarse.shape
    Mzf, Myf, Mxf = fine_shape
    kernel = functools.partial(
        _prolong_kernel, Mzf=Mzf, Myf=Myf, Mxf=Mxf,
        Mzc=Mzc, Myc=Myc, Mxc=Mxc, lmf=lmf, fused_add=False,
    )
    return pl.pallas_call(
        kernel,
        grid=(Mzf // 2,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((2, Myf, Mxf), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(fine_shape, c_coarse.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, 2, Myc, Mxc), c_coarse.dtype),
            pltpu.VMEM((Myf, Mxf), c_coarse.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=112 * 1024 * 1024,
        ),
        interpret=interpret,
    )(c_coarse)


def prolong_linear_add(c_coarse, v_fine, lmf: int, interpret: bool = False):
    """Fused correction step v + P(c): trilinear prolongation and the
    V-cycle add in one HBM pass (reference multigrid.py:258-260).

    Under MG_ALIAS=1 the output aliases v_fine in place — input and
    output use the SAME block index map, so block i's v slabs are in VMEM
    before its output write and no other block touches them (unlike the
    sweeps there is no halo).  This removes the one point in the V-cycle
    where two fine arrays beside f are live, the peak that decides
    whether 1024^3 (4.9 GB per fine array) fits a 16 GB chip."""
    import os

    Mzc, Myc, Mxc = c_coarse.shape
    Mzf, Myf, Mxf = v_fine.shape
    kernel = functools.partial(
        _prolong_kernel, Mzf=Mzf, Myf=Myf, Mxf=Mxf,
        Mzc=Mzc, Myc=Myc, Mxc=Mxc, lmf=lmf, fused_add=True,
    )
    return pl.pallas_call(
        kernel,
        grid=(Mzf // 2,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((2, Myf, Mxf), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((2, Myf, Mxf), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(v_fine.shape, v_fine.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, 2, Myc, Mxc), c_coarse.dtype),
            pltpu.VMEM((Myf, Mxf), c_coarse.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=112 * 1024 * 1024,
        ),
        input_output_aliases=(
            {1: 0} if os.environ.get("MG_ALIAS", "0") == "1" else {}),
        interpret=interpret,
    )(c_coarse, v_fine)


# ----------------------------------------------------------------------
# Variable-coefficient (planes) kernels — 3D radius-1 operators.
#
# The eliminated planes representation (ops/operators.py) carries ALL
# boundary/padding semantics in the coefficients themselves (identity
# diagonal + zero off-diagonals on Dirichlet rows, all-zero planes on
# padding rows), so unlike the const-7 kernels these need no interior
# iota masks: wrapped roll values and out-of-window z neighbors only ever
# reach rows whose off-diagonal plane weights are zero.  Covers the 3D
# configurations that previously always fell back to the plain-XLA path
# (variable kappa(x), screened Poisson, Galerkin RAP coarse operators —
# reference capability: dolfinx's general forms,
# Multigrid_prototype.py:88-91).
#
# Layout per z-block: v gets a (tz + 2)-slab double-buffered window
# (manual DMA, 1-deep halo); f and the K coefficient planes are read for
# the tz OUTPUT slabs only via BlockSpec streaming (coefficients of row
# p multiply neighbors OF row p — they need no halo).  Multicolor GS runs
# one kernel pass per color (the colors of ops.smoothers.
# multicolor_gs_smooth: sum-parity red-black for axis-only stencils, the
# 2^3 coordinate-parity classes for general radius-1).
# ----------------------------------------------------------------------

def _pick_tz_planes3(Mz, My, Mx, K, itemsize: int = 4, h: int = 1) -> int:
    import os

    slab = My * Mx * itemsize
    env = os.environ.get("MG_TZ_PLANES3")
    cand = (int(env),) if env else (4, 2, 1)
    budget = 88 * 1024 * 1024
    for tz in cand:
        # v windows 2(tz+2h) + pallas-pipelined f/planes/out blocks
        # 2(K+2)tz + ~6 slabs of kernel-body intermediates
        need = (2 * (tz + 2 * h) + 2 * (K + 2) * tz + 6) * slab
        if Mz % tz == 0 and Mz >= tz + 2 * h and need <= budget:
            return tz
    return 0


def _planes3_kernel(body):
    """Shared plumbing: double-buffered (tz+2)-slab v window + BlockSpec
    f/planes blocks; body emits the tz output slabs.

    The SMEM scalar block carries (z_base, color): the multicolor-GS
    color is a RUNTIME scalar, not a compile-time constant, so all 8
    coordinate-parity (or 2 sum-parity) color passes share ONE compiled
    Mosaic kernel instead of costing a separate large compile each."""

    def kernel(zb_ref, v_hbm, f_ref, p_ref, out_ref, vwin, sems, *,
               Mz, My, Mx, tz, h=1, **kw):
        i = pl.program_id(0)
        nprog = pl.num_programs(0)
        ws = tz + 2 * h
        zb = zb_ref[0, 0]
        cv = zb_ref[0, 1]

        def window_start(block):
            return jnp.clip(block * tz - h, 0, Mz - ws)

        def dma(block, slot):
            z0 = window_start(block)
            return pltpu.make_async_copy(
                v_hbm.at[pl.ds(z0, ws), :, :], vwin.at[slot], sems.at[slot])

        slot = jax.lax.rem(i, jnp.int32(2))

        @pl.when(i == 0)
        def _():
            dma(0, 0).start()

        @pl.when(i + 1 < nprog)
        def _():
            dma(i + 1, jax.lax.rem(i + 1, jnp.int32(2))).start()

        dma(i, slot).wait()
        v = vwin[slot]
        o = i * tz - window_start(i)            # 0..2h
        for oc in _branch_offsets(tz, h):
            @pl.when(o == oc)
            def _(oc=oc):
                outs = body(v, f_ref, p_ref, window_start(i) + zb, oc, tz,
                            ws, (My, Mx), cv=cv, **kw)
                for sl in range(tz):
                    out_ref[sl] = outs[sl]

    return kernel


def _p3_apply_row(v, p_sl, wrel, ws, offs, shape2, skip_center=None,
                  ci=None):
    """(A u) at window row wrel from the row's own coefficient planes:
    sum_k p_sl[k] * u[wrel + dz] rolled by (dy, dx).  Indexing is modulo
    the window (the wrap only reaches Dirichlet/padding rows whose
    off-diagonal planes are zero)."""
    acc = jnp.zeros(shape2, v.dtype)
    for k, (dz, dy, dx) in enumerate(offs):
        if skip_center is not None and k == skip_center:
            continue
        t = v[(wrel + dz) % ws]
        if dy:
            t = _roll(t, -dy, 0)
        if dx:
            t = _roll(t, -dx, 1)
        acc = acc + p_sl[k] * t
    return acc


def _p3_dinv(pc):
    return 1.0 / jnp.where(pc == 0.0, jnp.ones_like(pc), pc)


def _color_mask3(kind, cv, zg, shape2):
    """Color mask for global z slab `zg` from the RUNTIME color scalar cv.
    kind='sum' (axis-only stencils): (z+y+x) % 2 == cv.  kind='coord':
    cv = pz*4 + py*2 + px packs the per-axis parity class (the
    itertools.product order of ops.smoothers.multicolor_gs_smooth).
    kind='coord3' (radius-2/P2 stencils): per-axis residue mod 3,
    cv = (pz*3 + py)*3 + px — the 27 modulus-3 classes."""
    y = jax.lax.broadcasted_iota(jnp.int32, shape2, 0)
    x = jax.lax.broadcasted_iota(jnp.int32, shape2, 1)
    if kind == "sum":
        return ((y + x) % 2) == ((cv + zg) % 2)
    if kind == "coord3":
        gate = (zg % 3) == (cv // 9)
        return jnp.logical_and(
            gate, ((y % 3) == ((cv // 3) % 3)) & ((x % 3) == (cv % 3)))
    gate = (zg % 2) == (cv // 4)
    return jnp.logical_and(
        gate, ((y % 2) == ((cv // 2) % 2)) & ((x % 2) == (cv % 2)))


def _p3_gs_body(v, f_ref, p_ref, z0w, oc, tz, ws, shape2, *, cv, offs, ci,
                kind):
    outs = []
    for sl in range(tz):
        wrel = oc + sl
        p_sl = p_ref[:, sl]
        acc = _p3_apply_row(v, p_sl, wrel, ws, offs, shape2)
        cand = v[wrel] + _p3_dinv(p_sl[ci]) * (f_ref[sl] - acc)
        mask = _color_mask3(kind, cv, z0w + wrel, shape2)
        outs.append(jnp.where(mask, cand, v[wrel]))
    return outs


def _p3_jacobi_body(v, f_ref, p_ref, z0w, oc, tz, ws, shape2, *, cv,
                    offs, ci, w):
    outs = []
    for sl in range(tz):
        wrel = oc + sl
        p_sl = p_ref[:, sl]
        acc = _p3_apply_row(v, p_sl, wrel, ws, offs, shape2,
                            skip_center=ci)
        dinv = _p3_dinv(p_sl[ci])
        # reference jacobiRelaxation association (multigrid.py:223-228)
        outs.append((1.0 - w) * v[wrel] + w * (dinv * f_ref[sl]
                                               - dinv * acc))
    return outs


def _p3_residual_body(v, f_ref, p_ref, z0w, oc, tz, ws, shape2, *, cv,
                      offs):
    outs = []
    for sl in range(tz):
        wrel = oc + sl
        acc = _p3_apply_row(v, p_ref[:, sl], wrel, ws, offs, shape2)
        outs.append(f_ref[sl] - acc)
    return outs


def _call_planes3(body, v, f, planes, interpret, z_base=None,
                  color_val=0, h=1, **kw):
    Mz, My, Mx = v.shape
    K = planes.shape[0]
    tz = _pick_tz_planes3(Mz, My, Mx, K, h=h)
    if tz == 0:
        return None                      # caller falls back to jnp
    kernel = functools.partial(
        _planes3_kernel(body), Mz=Mz, My=My, Mx=Mx, tz=tz, h=h, **kw
    )
    zb = jnp.asarray(
        [[0 if z_base is None else z_base, 0]], jnp.int32
    ).at[0, 1].set(color_val)
    return pl.pallas_call(
        kernel,
        grid=(Mz // tz,),
        in_specs=[
            pl.BlockSpec((1, 2), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((tz, My, Mx), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, tz, My, Mx), lambda i: (0, i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tz, My, Mx), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(v.shape, v.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, tz + 2 * h, My, Mx), v.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=112 * 1024 * 1024,
        ),
        interpret=interpret,
    )(zb, v, f, planes)


def _stencil_radius(offsets) -> int:
    return max(max(abs(c) for c in off) for off in map(tuple, offsets))


def planes3_colors(offsets) -> tuple:
    """The color schedule of ops.smoothers.multicolor_gs_smooth for a 3D
    planes operator: ('sum', (0, 1)) sum-parity red-black when radius-1
    axis-only; ('coord', range(8)) — the 2^3 coordinate-parity classes —
    for general radius-1; ('coord3', range(27)) — the 3^3 modulus-3
    classes — for radius-2 (P2) stencils.  Packing follows
    itertools.product order."""
    offs = tuple(map(tuple, offsets))
    if _stencil_radius(offs) > 1:
        return ("coord3", tuple(range(27)))
    axis_only = all(sum(1 for d in off if d != 0) <= 1 for off in offs)
    if axis_only:
        return ("sum", (0, 1))
    return ("coord", tuple(range(8)))


def planes3_gs_sweep(v, f, planes, offsets, interpret=False, z_base=None):
    """One full multicolor GS sweep on a 3D radius-1 or radius-2 (P2)
    planes operator, one kernel pass per color (all passes share one
    compiled kernel — the color is a runtime SMEM scalar); None if the
    shape doesn't admit the kernel."""
    offs = tuple(map(tuple, offsets))
    ci = offs.index((0, 0, 0))
    kind, colors = planes3_colors(offs)
    h = _stencil_radius(offs)
    for cv in colors:
        out = _call_planes3(
            _p3_gs_body, v, f, planes, interpret, z_base=z_base,
            color_val=cv, h=h, offs=offs, ci=ci, kind=kind,
        )
        if out is None:
            return None
        v = out
    return v


def planes3_jacobi_sweep(v, f, planes, offsets, w, interpret=False,
                         z_base=None):
    """One weighted-Jacobi sweep on a 3D radius-1/radius-2 planes
    operator; None if the shape doesn't admit the kernel."""
    offs = tuple(map(tuple, offsets))
    ci = offs.index((0, 0, 0))
    return _call_planes3(
        _p3_jacobi_body, v, f, planes, interpret, z_base=z_base,
        h=_stencil_radius(offs), offs=offs, ci=ci, w=float(w),
    )


def planes3_residual(v, f, planes, offsets, interpret=False, z_base=None):
    """Fused r = f - A v on a 3D radius-1/radius-2 planes operator; None
    if the shape doesn't admit the kernel."""
    offs = tuple(map(tuple, offsets))
    return _call_planes3(
        _p3_residual_body, v, f, planes, interpret, z_base=z_base,
        h=_stencil_radius(offs), offs=offs,
    )


def planes3_admits(shape: Tuple[int, int, int], K: int,
                   radius: int = 1) -> bool:
    """Public admission gate for the 3D planes kernels: True iff the
    (padded) grid shape and plane count fit the kernels' VMEM/divisibility
    constraints (window halo = stencil radius).  The smoother pre-check
    (ops.smoothers._pallas_planes) and the kernel wrappers
    (_call_planes3) both route through the same _pick_tz_planes3, so the
    two can never drift and reject different shapes (a drift would
    surface as planes3_gs_sweep returning None mid-fori_loop — an opaque
    trace-time failure)."""
    return _pick_tz_planes3(*shape, K, h=radius) != 0
