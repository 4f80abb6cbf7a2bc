"""Pallas TPU kernels for the hot 2D multigrid ops (const-5-point path).

These are the speed-of-light implementations of the operations the
reference runs as scipy SpMVs and per-DOF Python loops (multigrid.py:223-268):

  * `jacobi_sweep`   — one fused weighted-Jacobi sweep:
                       out = (1-w) v + w df + (w/4) S(v~) on the interior
                       (reference jacobiRelaxation semantics, hoisted df)
  * `rb_sweep`       — one fused red-black Gauss-Seidel sweep: both colors
                       in a single kernel pass (black reads the red update
                       from VMEM, not HBM)
  * `residual`       — fused r = f - A v
  * `restrict_pt`    — variational P^T restriction (correction-equation BC
                       masking built in)
  * `prolong_linear` — bilinear prolongation via in-VMEM interleaving

Design: 1D grid over row blocks; each kernel manually DMAs a (TM + halo,
W)-row window of the operand from HBM into VMEM scratch (double-halo for
the fused red-black pass), computes with lane/sublane rolls and iota-based
interior masks (the Dirichlet/padding structure costs zero memory traffic),
and writes one (TM, W) output block.  Every kernel therefore moves each
array exactly once per sweep — the HBM-bandwidth lower bound.

Arrays must be storage-padded so rows are a multiple of 8 and columns a
multiple of 128 (f32 tile (8, 128)); solver.hierarchy's `pad_points` does
this when `CycleSpec.use_pallas` is on.  The logical grid is the leading
(lm, lm) corner; padding rows/cols are inert zeros (see
parallel/sharding.py's padding discipline).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pick_tm(M: int, target: int = 256) -> int:
    """Largest row-block size dividing M such that the (tm + 16)-row halo
    window fits inside M."""
    for tm in (target, 128, 64, 32, 16, 8):
        if M % tm == 0 and tm + 16 <= M:
            return tm
    raise ValueError(f"grid of {M} rows too small for the Pallas kernels")


def _masks(start, shape, lm: int):
    """(interior, in_logical_box) masks for a window whose global row of
    local row l is start + l."""
    gr = start + jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    gc = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    interior = (gr >= 1) & (gr <= lm - 2) & (gc >= 1) & (gc <= lm - 2)
    return gr, gc, interior


def _roll(x, shift: int, axis: int):
    """pltpu.roll with negative-shift support (it requires shift >= 0).

    Narrow dtypes (bfloat16, for the mixed-precision inner V-cycle) lower
    via static slice+concat instead: Mosaic's tpu.dynamic_rotate is
    32-bit-only ('Rotate with non-32-bit data')."""
    if shift < 0:
        shift += x.shape[axis]
    if x.dtype.itemsize >= 4:
        return pltpu.roll(x, shift, axis)
    if shift == 0:
        return x
    n = x.shape[axis]
    lead = jax.lax.slice_in_dim(x, n - shift, n, axis=axis)
    tail = jax.lax.slice_in_dim(x, 0, n - shift, axis=axis)
    return jax.lax.concatenate([lead, tail], dimension=axis)


def _neighbor_sum(x):
    """S(x)[i,j] = x[i-1,j] + x[i+1,j] + x[i,j-1] + x[i,j+1] with circular
    wrap (wrapped entries are masked out by interior logic at use sites)."""
    return (
        _roll(x, 1, 0) + _roll(x, -1, 0)
        + _roll(x, 1, 1) + _roll(x, -1, 1)
    )


# ----------------------------------------------------------------------
# Jacobi sweep
# ----------------------------------------------------------------------

def _win_start(r0, M, ws, halo: int = 8):
    return pl.multiple_of(jnp.clip(r0 - halo, 0, M - ws), 8)


def _db_window(hbm, win2, sems, i, nprog, M, ws, tm, halo: int = 8):
    """Double-buffered window DMA: prefetch block i+1's window while block
    i computes; returns block i's window slot values."""
    slot = jax.lax.rem(i, jnp.int32(2))

    def dma(block, sl):
        return pltpu.make_async_copy(
            hbm.at[pl.ds(_win_start(block * tm, M, ws, halo), ws), :],
            win2.at[sl], sems.at[sl],
        )

    @pl.when(i == 0)
    def _():
        dma(0, 0).start()

    @pl.when(i + 1 < nprog)
    def _():
        dma(i + 1, jax.lax.rem(i + 1, jnp.int32(2))).start()

    dma(i, slot).wait()
    return win2[slot]


def _jacobi_kernel(v_hbm, df_ref, out_ref, vwin, stage, sems, *, tm, M, W, lm, w):
    # Window = block + 8-row halo on each side: every dynamic offset stays
    # a multiple of 8 (Mosaic's sublane alignment requirement).
    i = pl.program_id(0)
    r0 = i * tm
    ws = tm + 16
    start = _win_start(r0, M, ws)
    v = _db_window(v_hbm, vwin, sems, i, pl.num_programs(0), M, ws, tm)
    _, _, interior = _masks(start, (ws, W), lm)
    vt = jnp.where(interior, v, jnp.zeros_like(v))
    s = jnp.where(interior, _neighbor_sum(vt), jnp.zeros_like(v))
    # Mosaic has no dynamic_slice on values: stage the window result in
    # VMEM and read back the (dynamic-offset) center rows through the ref.
    stage[:] = (1.0 - w) * v + (w * 0.25) * s
    o = pl.multiple_of(r0 - start, 8)
    out_ref[:] = stage[pl.ds(o, tm), :] + w * df_ref[:]


def jacobi_sweep(v, df, lm: int, w: float, interpret: bool = False):
    """One reference-semantics weighted-Jacobi sweep (const-5 operator)."""
    M, W = v.shape
    tm = _pick_tm(M)
    kernel = functools.partial(
        _jacobi_kernel, tm=tm, M=M, W=W, lm=lm, w=float(w)
    )
    return pl.pallas_call(
        kernel,
        grid=(M // tm,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((tm, W), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tm, W), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(v.shape, v.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, tm + 16, W), v.dtype),
            pltpu.VMEM((tm + 16, W), v.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(v, df)


# ----------------------------------------------------------------------
# Fused red-black Gauss-Seidel sweep (both colors, one HBM pass)
# ----------------------------------------------------------------------

def _rb_kernel(v_hbm, f_hbm, out_ref, vwin, fwin, stage, sems, *, tm, M, W, lm):
    i = pl.program_id(0)
    r0 = i * tm
    ws = tm + 16
    start = _win_start(r0, M, ws)
    nprog = pl.num_programs(0)
    v = _db_window(v_hbm, vwin, sems.at[0], i, nprog, M, ws, tm)
    f = _db_window(f_hbm, fwin, sems.at[1], i, nprog, M, ws, tm)
    gr, gc, interior = _masks(start, (ws, W), lm)
    red = ((gr + gc) % 2) == 0

    def gs_stage(vcur, color):
        vt = jnp.where(interior, vcur, jnp.zeros_like(vcur))
        cand = jnp.where(interior, (f + _neighbor_sum(vt)) * 0.25, f)
        return jnp.where(color, cand, vcur)

    v1 = gs_stage(v, red)           # red half-sweep
    v2 = gs_stage(v1, ~red)         # black half-sweep, reads red from VMEM
    stage[:] = v2
    o = pl.multiple_of(r0 - start, 8)
    out_ref[:] = stage[pl.ds(o, tm), :]


def rb_sweep(v, f, lm: int, interpret: bool = False):
    """One full red-black GS sweep (red then black) in a single kernel."""
    M, W = v.shape
    tm = _pick_tm(M)
    kernel = functools.partial(_rb_kernel, tm=tm, M=M, W=W, lm=lm)
    return pl.pallas_call(
        kernel,
        grid=(M // tm,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((tm, W), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(v.shape, v.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, tm + 16, W), v.dtype),
            pltpu.VMEM((2, tm + 16, W), v.dtype),
            pltpu.VMEM((tm + 16, W), v.dtype),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        interpret=interpret,
    )(v, f)


# ----------------------------------------------------------------------
# Residual r = f - A v  (const-5 A with identity bc rows)
# ----------------------------------------------------------------------

def _residual_kernel(v_hbm, f_ref, out_ref, vwin, stage, sems, *, tm, M, W, lm):
    i = pl.program_id(0)
    r0 = i * tm
    ws = tm + 16
    start = _win_start(r0, M, ws)
    v = _db_window(v_hbm, vwin, sems, i, pl.num_programs(0), M, ws, tm)
    _, _, interior = _masks(start, (ws, W), lm)
    vt = jnp.where(interior, v, jnp.zeros_like(v))
    stage[:] = jnp.where(interior, 4.0 * vt - _neighbor_sum(vt), v)
    o = pl.multiple_of(r0 - start, 8)
    out_ref[:] = f_ref[:] - stage[pl.ds(o, tm), :]


def residual(v, f, lm: int, interpret: bool = False):
    M, W = v.shape
    tm = _pick_tm(M)
    kernel = functools.partial(_residual_kernel, tm=tm, M=M, W=W, lm=lm)
    return pl.pallas_call(
        kernel,
        grid=(M // tm,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((tm, W), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tm, W), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(v.shape, v.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, tm + 16, W), v.dtype),
            pltpu.VMEM((tm + 16, W), v.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(v, f)


# ----------------------------------------------------------------------
# Variational restriction (P^T, correction-equation BC masking built in)
# ----------------------------------------------------------------------

def _restrict_kernel(r_hbm, out_ref, rwin, stage, sem, *, tc, Mf, Wf, Mc, Wc,
                     lmf, lmc):
    i = pl.program_id(0)
    c0 = i * tc
    ws = 2 * tc + 16
    start = pl.multiple_of(jnp.clip(2 * c0 - 16, 0, Mf - ws), 16)
    cp = pltpu.make_async_copy(r_hbm.at[pl.ds(start, ws), :], rwin, sem)
    cp.start()
    cp.wait()
    r = rwin[:]
    _, _, interior_f = _masks(start, (ws, Wf), lmf)
    rt = jnp.where(interior_f, r, jnp.zeros_like(r))
    rows = _roll(rt, 1, 0) + 2.0 * rt + _roll(rt, -1, 0)
    full = _roll(rows, 1, 1) + 2.0 * rows + _roll(rows, -1, 1)
    # sample even rows / even cols: fine (2c - start, 2j)
    stage[:] = full.reshape(ws // 2, 2, Wf)[:, 0, :]
    o2 = pl.multiple_of(c0 - start // 2, 8)
    picked = stage[pl.ds(o2, tc), :]
    # even-lane extraction: Mosaic has no lane-strided ops, but transposes
    # and sublane reshapes are native — route the lane dim through sublanes.
    pt = picked.T                                    # (Wf, tc)
    even_cols = pt.reshape(Wf // 2, 2, tc)[:, 0, :].T   # (tc, Wf//2)
    # scale: P^T = 2^d * FW = 4 * kernel/16 -> /4 total
    res = even_cols * 0.25
    # coarse interior mask (zero bc + padding)
    grc = c0 + jax.lax.broadcasted_iota(jnp.int32, (tc, Wf // 2), 0)
    gcc = jax.lax.broadcasted_iota(jnp.int32, (tc, Wf // 2), 1)
    mask_c = (grc >= 1) & (grc <= lmc - 2) & (gcc >= 1) & (gcc <= lmc - 2)
    res = jnp.where(mask_c, res, jnp.zeros_like(res))
    if Wf // 2 >= Wc:
        out_ref[:] = res[:, :Wc]
    else:
        out_ref[:, : Wf // 2] = res
        out_ref[:, Wf // 2:] = jnp.zeros((tc, Wc - Wf // 2), res.dtype)


def restrict_pt(r_fine, coarse_shape: Tuple[int, int], lmf: int, lmc: int,
                interpret: bool = False):
    """P^T restriction of the (interior-masked) fine residual onto the
    padded coarse grid."""
    Mf, Wf = r_fine.shape
    Mc, Wc = coarse_shape
    # coarse row block whose fine window (2*tc + 16 rows) fits in Mf
    tc = next(t for t in (128, 64, 32, 16, 8)
              if Mc % t == 0 and 2 * t + 16 <= Mf)
    kernel = functools.partial(
        _restrict_kernel, tc=tc, Mf=Mf, Wf=Wf, Mc=Mc, Wc=Wc, lmf=lmf, lmc=lmc
    )
    return pl.pallas_call(
        kernel,
        grid=(Mc // tc,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((tc, Wc), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Mc, Wc), r_fine.dtype),
        scratch_shapes=[
            pltpu.VMEM((2 * tc + 16, Wf), r_fine.dtype),
            pltpu.VMEM((tc + 8, Wf), r_fine.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(r_fine)


# ----------------------------------------------------------------------
# Bilinear prolongation
# ----------------------------------------------------------------------

def _prolong_kernel(c_hbm, out_ref, cwin, stage, sem, *, tm, Mf, Wf, Mc, Wc, lmf):
    i = pl.program_id(0)
    r0 = i * tm
    tcw = tm // 2 + 16
    start = pl.multiple_of(jnp.clip(r0 // 2 - 8, 0, Mc - tcw), 8)
    cp = pltpu.make_async_copy(c_hbm.at[pl.ds(start, tcw), :], cwin, sem)
    cp.start()
    cp.wait()
    c = cwin[:]                                   # (tcw, Wc)
    # column interleave: fine col 2j = c[:, j], 2j+1 = avg(c[:, j], c[:, j+1]).
    # Lane interleave is done in transposed (sublane) space — Mosaic has no
    # lane-strided ops but transposes and sublane reshapes are native.
    cshift = _roll(c, -1, 1)                      # c[:, j+1] (wrap masked later)
    codd = 0.5 * (c + cshift)
    inter = jnp.stack([c.T, codd.T], axis=1).reshape(2 * Wc, tcw)
    wide = inter.T                                # (tcw, 2*Wc)
    # row interleave: fine row 2a = wide[a], 2a+1 = avg(wide[a], wide[a+1])
    wshift = _roll(wide, -1, 0)
    wodd = 0.5 * (wide + wshift)
    stage[:] = jnp.stack([wide, wodd], axis=1).reshape(2 * tcw, 2 * Wc)
    o = pl.multiple_of(r0 - 2 * start, 8)
    res = stage[pl.ds(o, tm), : Wf]
    grf = r0 + jax.lax.broadcasted_iota(jnp.int32, (tm, Wf), 0)
    gcf = jax.lax.broadcasted_iota(jnp.int32, (tm, Wf), 1)
    inbox = (grf <= lmf - 1) & (gcf <= lmf - 1)
    out_ref[:] = jnp.where(inbox, res, jnp.zeros_like(res))


# ----------------------------------------------------------------------
# Variable-coefficient (planes) kernels: Galerkin / kappa(x) / screened
# operators run at kernel speed instead of the jnp fallback.  No iota
# masks needed: the eliminated planes carry the Dirichlet/padding
# structure in their data (off-center bc rows are zero, bc diag is 1,
# padding rows are all-zero), so the update formulas are mask-free except
# for the color classes.
# ----------------------------------------------------------------------

def _pick_tm_planes(M: int, W: int, K: int, itemsize: int = 4,
                    halo: int = 8) -> int:
    """Row block such that the double-buffered v/f/planes windows fit the
    VMEM budget; 0 when no block size admits (caller falls back).  `halo`
    is the per-side window overhang: 8 covers radius-2 neighbor reads of
    a single-stage kernel; the radius-2 GS kernel needs 24 (9 mod-3 color
    stages x radius 2 = 18 rows of edge invalidation, rounded up to the
    8-row DMA alignment)."""
    budget = 72 * 1024 * 1024
    for tm in (256, 128, 64, 32, 16, 8):
        ws = tm + 2 * halo
        need = (2 * (K + 2) * ws + 2 * ws + tm) * W * itemsize
        if M % tm == 0 and ws <= M and need <= budget:
            return tm
    return 0


def planes2_admits(shape, K: int, radius: int) -> bool:
    """Can the 2D planes kernels run this (M, W) grid?  One shared gate
    for the smoother pre-check and the sweep wrappers (the 3D twin is
    stencil3d.planes3_admits)."""
    if len(shape) != 2 or radius > 2:
        return False
    M, W = shape
    halo = 24 if radius == 2 else 8
    return _pick_tm_planes(M, W, K, halo=halo) != 0


def _planes_window(p_hbm, pwin, sems, i, nprog, M, ws, tm, halo: int = 8):
    """Double-buffered (K, ws, W) window of the stencil planes."""
    slot = jax.lax.rem(i, jnp.int32(2))

    def dma(block, sl):
        return pltpu.make_async_copy(
            p_hbm.at[:, pl.ds(_win_start(block * tm, M, ws, halo), ws), :],
            pwin.at[sl], sems.at[sl],
        )

    @pl.when(i == 0)
    def _():
        dma(0, 0).start()

    @pl.when(i + 1 < nprog)
    def _():
        dma(i + 1, jax.lax.rem(i + 1, jnp.int32(2))).start()

    dma(i, slot).wait()
    return pwin[slot]


def _planes_apply(p, v, offs, skip_center=None):
    """sum_k p[k] * v[. + off_k] via rolls (wrapped entries only reach
    rows whose plane values are zero / that are never emitted)."""
    acc = None
    for k, (oi, oj) in enumerate(offs):
        if skip_center is not None and k == skip_center:
            continue
        t = v
        if oi != 0:
            t = _roll(t, -oi, 0)
        if oj != 0:
            t = _roll(t, -oj, 1)
        t = p[k] * t
        acc = t if acc is None else acc + t
    if acc is None:
        acc = jnp.zeros_like(v)
    return acc


def _color_mask_of(gr, gc, color):
    kind, par = color
    if kind == "sum":
        return ((gr + gc) % 2) == par
    if kind == "mod":
        mod, p0, p1 = par
        return ((gr % mod) == p0) & ((gc % mod) == p1)
    return ((gr % 2) == par[0]) & ((gc % 2) == par[1])


def _planes_gs_kernel(v_hbm, f_hbm, p_hbm, out_ref, vwin, fwin, pwin, stage,
                      sems, *, tm, M, W, offs, ci, colors, halo):
    i = pl.program_id(0)
    r0 = i * tm
    ws = tm + 2 * halo
    start = _win_start(r0, M, ws, halo)
    nprog = pl.num_programs(0)
    v = _db_window(v_hbm, vwin, sems.at[0], i, nprog, M, ws, tm, halo)
    f = _db_window(f_hbm, fwin, sems.at[1], i, nprog, M, ws, tm, halo)
    p = _planes_window(p_hbm, pwin, sems.at[2], i, nprog, M, ws, tm, halo)
    gr = start + jax.lax.broadcasted_iota(jnp.int32, (ws, W), 0)
    gc = jax.lax.broadcasted_iota(jnp.int32, (ws, W), 1)
    pc = p[ci]
    dinv = 1.0 / jnp.where(pc == 0.0, jnp.ones_like(pc), pc)
    cur = v
    # same per-color update as ops.smoothers.multicolor_gs_smooth:
    # v[c] <- v[c] + dinv * (f - A v)[c]
    for color in colors:
        acc = _planes_apply(p, cur, offs)
        cand = cur + dinv * (f - acc)
        cur = jnp.where(_color_mask_of(gr, gc, color), cand, cur)
    stage[:] = cur
    o = pl.multiple_of(r0 - start, 8)
    out_ref[:] = stage[pl.ds(o, tm), :]


def planes_gs_sweep(v, f, planes, offsets, axis_only: bool,
                    interpret: bool = False):
    """One full multicolor GS sweep on an eliminated planes operator —
    kernel version of ops.smoothers.multicolor_gs_smooth (same color
    order: sum-parity red-black for axis-only stencils, the 2^d
    coordinate-parity classes for general radius 1, and the 3^2 mod-3
    classes for radius 2 / P2).  All color stages run inside ONE window
    pass: each stage invalidates `radius` rows of window edge, so the
    radius-2 halo is 24 rows (9 stages x 2 = 18, aligned up to 8)."""
    offs = tuple(map(tuple, offsets))
    ci = offs.index((0, 0))
    radius = max(max(abs(c) for c in o) for o in offs)
    if radius == 2:
        colors = tuple(("mod", (3, p0, p1))
                       for p0 in (0, 1, 2) for p1 in (0, 1, 2))
        halo = 24
    elif axis_only:
        colors = (("sum", 0), ("sum", 1))
        halo = 8
    else:
        colors = tuple(("quad", (p0, p1))
                       for p0 in (0, 1) for p1 in (0, 1))
        halo = 8
    M, W = v.shape
    K = planes.shape[0]
    tm = _pick_tm_planes(M, W, K, halo=halo)
    if tm == 0:
        raise ValueError(
            f"planes_gs_sweep: {M}x{W} (K={K}, radius={radius}) does not "
            "admit the kernel — gate callers on planes2_admits")
    ws = tm + 2 * halo
    kernel = functools.partial(
        _planes_gs_kernel, tm=tm, M=M, W=W, offs=offs, ci=ci,
        colors=colors, halo=halo,
    )
    return pl.pallas_call(
        kernel,
        grid=(M // tm,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 3,
        out_specs=pl.BlockSpec((tm, W), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(v.shape, v.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, ws, W), v.dtype),
            pltpu.VMEM((2, ws, W), v.dtype),
            pltpu.VMEM((2, K, ws, W), v.dtype),
            pltpu.VMEM((ws, W), v.dtype),
            pltpu.SemaphoreType.DMA((3, 2)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(v, f, planes)


def _planes_jacobi_kernel(v_hbm, f_hbm, p_hbm, out_ref, vwin, fwin, pwin,
                          stage, sems, *, tm, M, W, offs, ci, w):
    i = pl.program_id(0)
    r0 = i * tm
    ws = tm + 16
    start = _win_start(r0, M, ws)
    nprog = pl.num_programs(0)
    v = _db_window(v_hbm, vwin, sems.at[0], i, nprog, M, ws, tm)
    f = _db_window(f_hbm, fwin, sems.at[1], i, nprog, M, ws, tm)
    p = _planes_window(p_hbm, pwin, sems.at[2], i, nprog, M, ws, tm)
    pc = p[ci]
    dinv = 1.0 / jnp.where(pc == 0.0, jnp.ones_like(pc), pc)
    # (1-w) v + w (dinv f - dinv (A - D) v): reference jacobiRelaxation
    # association (multigrid.py:223-228) with the planes R_omega formed in
    # VMEM (off-center planes scaled by dinv).
    acc = _planes_apply(p, v, offs, skip_center=ci)
    stage[:] = (1.0 - w) * v + w * (dinv * f - dinv * acc)
    o = pl.multiple_of(r0 - start, 8)
    out_ref[:] = stage[pl.ds(o, tm), :]


def planes_jacobi_sweep(v, f, planes, offsets, w: float,
                        interpret: bool = False):
    """One weighted-Jacobi sweep on an eliminated planes operator."""
    offs = tuple(map(tuple, offsets))
    ci = offs.index((0, 0))
    M, W = v.shape
    K = planes.shape[0]
    tm = _pick_tm_planes(M, W, K)
    if tm == 0:
        raise ValueError(
            f"planes_jacobi_sweep: {M}x{W} (K={K}) does not admit the "
            "kernel — gate callers on planes2_admits")
    ws = tm + 16
    kernel = functools.partial(
        _planes_jacobi_kernel, tm=tm, M=M, W=W, offs=offs, ci=ci,
        w=float(w),
    )
    return pl.pallas_call(
        kernel,
        grid=(M // tm,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 3,
        out_specs=pl.BlockSpec((tm, W), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(v.shape, v.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, ws, W), v.dtype),
            pltpu.VMEM((2, ws, W), v.dtype),
            pltpu.VMEM((2, K, ws, W), v.dtype),
            pltpu.VMEM((ws, W), v.dtype),
            pltpu.SemaphoreType.DMA((3, 2)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(v, f, planes)


def _planes_residual_kernel(v_hbm, f_ref, p_hbm, out_ref, vwin, pwin, stage,
                            sems, *, tm, M, W, offs):
    i = pl.program_id(0)
    r0 = i * tm
    ws = tm + 16
    start = _win_start(r0, M, ws)
    nprog = pl.num_programs(0)
    v = _db_window(v_hbm, vwin, sems.at[0], i, nprog, M, ws, tm)
    p = _planes_window(p_hbm, pwin, sems.at[1], i, nprog, M, ws, tm)
    stage[:] = _planes_apply(p, v, offs)
    o = pl.multiple_of(r0 - start, 8)
    out_ref[:] = f_ref[:] - stage[pl.ds(o, tm), :]


def planes_residual(v, f, planes, offsets, interpret: bool = False):
    """Fused r = f - A v for an eliminated planes operator."""
    offs = tuple(map(tuple, offsets))
    M, W = v.shape
    K = planes.shape[0]
    tm = _pick_tm_planes(M, W, K)
    if tm == 0:
        raise ValueError(
            f"planes_residual: {M}x{W} (K={K}) does not admit the "
            "kernel — gate callers on planes2_admits")
    ws = tm + 16
    kernel = functools.partial(
        _planes_residual_kernel, tm=tm, M=M, W=W, offs=offs
    )
    return pl.pallas_call(
        kernel,
        grid=(M // tm,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((tm, W), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((tm, W), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(v.shape, v.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, ws, W), v.dtype),
            pltpu.VMEM((2, K, ws, W), v.dtype),
            pltpu.VMEM((ws, W), v.dtype),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(v, f, planes)


def prolong_linear(c_coarse, fine_shape: Tuple[int, int], lmf: int,
                   interpret: bool = False):
    """Bilinear prolongation onto the padded fine grid (zero outside the
    logical box)."""
    Mc, Wc = c_coarse.shape
    Mf, Wf = fine_shape
    # fine row block (multiple of 16 so start stays 8-aligned) whose coarse
    # window (tm//2 + 16 rows) fits in Mc
    tm = next(t for t in (256, 128, 64, 32, 16)
              if Mf % t == 0 and t // 2 + 16 <= Mc)
    kernel = functools.partial(
        _prolong_kernel, tm=tm, Mf=Mf, Wf=Wf, Mc=Mc, Wc=Wc, lmf=lmf
    )
    return pl.pallas_call(
        kernel,
        grid=(Mf // tm,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((tm, Wf), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Mf, Wf), c_coarse.dtype),
        scratch_shapes=[
            pltpu.VMEM((tm // 2 + 16, Wc), c_coarse.dtype),
            pltpu.VMEM((tm + 32, 2 * Wc), c_coarse.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(c_coarse)
