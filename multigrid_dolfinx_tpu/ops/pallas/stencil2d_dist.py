"""Distributed (row-sharded) 2D Pallas kernels: halo strips as inputs.

The 2D analogue of stencil3d_dist: the explicit shard_map 2D path
(parallel/halo.py) on a ('gx', 'gy'=1) row-decomposed mesh exchanges
row-strip halos with its two gx neighbors via `jax.lax.ppermute`.
Concatenating those strips onto the local block per op would cost two
extra full HBM passes per array per sweep; the kernels here take the
strips as SEPARATE small inputs and splice them into each block's
DMA-assembled row window, so local arrays cross HBM exactly once per
sweep — per-shard throughput matches the single-chip 2D kernels
(ops/pallas/stencil2d.py).

Window layout: every block's window is [head HP | core tm | tail HP]
rows of the VIRTUAL array [-HP, M + HP) (local rows extended by the halo
strips).  Unlike the single-device kernels there is NO window clamping —
the halos pad both ends, so the output always sits at the static offset
HP and each kernel has a single emit branch.  Global-row boundary masks
and red-black parity stay consistent across shards via the `row_base`
SMEM scalar (= the global row of local row 0); edge ranks pass zero
strips — exactly the zero extension the interior masks expect.

Value parity: each output element evaluates the same expression as the
single-device kernels (masked candidates, 4-neighbor sums, [1,2,1]^2
restriction, bilinear interleave), so a row-decomposed sweep equals the
single-chip sweep on the same global data (bitwise for power-of-two
operator weights).

Reference substrate being replaced: PETSc ghostUpdate FORWARD scatters
under dolfinx (Multigrid_prototype.py:79-80,106-107).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .stencil2d import _masks, _neighbor_sum, _roll

HP = 8          # head/tail rows for radius-1 ops (sublane-aligned)
HPR = 16        # for the restriction window (even coarse/fine alignment)


def _dist_window(hbm, lo_hbm, hi_hbm, win2, sems, semh, bi, nprog,
                 M, tm, hp):
    """Double-buffered [head hp | core tm | tail hp]-row window of the
    virtual array: head/tail come from the local array except at the
    first/last block, where the halo strip overwrites them (the clamped
    head/tail DMA keeps every copy fixed-shape).  All row offsets are
    multiples of 8 (tm, hp, M are)."""
    slot = jax.lax.rem(bi, jnp.int32(2))

    def dmas(block, sl):
        # pl.multiple_of: tm, hp, M are all multiples of 8, so every row
        # start is too — but Mosaic cannot prove it through the clip on
        # real TPU ("Failed to prove that a tile index in dimension 0 is
        # divisible by the tiling (8)"); the 2D leading axis is the
        # sublane axis, so the proof is required here (unlike the 3D
        # kernels' untiled leading-z starts).
        head = pl.multiple_of(jnp.clip(block * tm - hp, 0, M - hp), 8)
        core = pl.multiple_of(block * tm, 8)
        tail = pl.multiple_of(jnp.clip(block * tm + tm, 0, M - hp), 8)
        return (
            pltpu.make_async_copy(
                hbm.at[pl.ds(head, hp), :],
                win2.at[sl, pl.ds(0, hp)], sems.at[sl, 0]),
            pltpu.make_async_copy(
                hbm.at[pl.ds(core, tm), :],
                win2.at[sl, pl.ds(hp, tm)], sems.at[sl, 1]),
            pltpu.make_async_copy(
                hbm.at[pl.ds(tail, hp), :],
                win2.at[sl, pl.ds(hp + tm, hp)], sems.at[sl, 2]),
        )

    @pl.when(bi == 0)
    def _():
        for c in dmas(0, 0):
            c.start()

    @pl.when(bi + 1 < nprog)
    def _():
        for c in dmas(bi + 1, jax.lax.rem(bi + 1, jnp.int32(2))):
            c.start()

    for c in dmas(bi, slot):
        c.wait()

    # halo splices: bi == 0 => slot 0 and bi == nprog-1 => (nprog-1) % 2
    # are both STATIC slots, so the overwriting DMAs stay static-indexed.
    @pl.when(bi == 0)
    def _():
        c = pltpu.make_async_copy(lo_hbm, win2.at[0, pl.ds(0, hp)],
                                  semh.at[0])
        c.start()
        c.wait()

    @pl.when(bi == nprog - 1)
    def _():
        sl = (nprog - 1) % 2
        c = pltpu.make_async_copy(hi_hbm, win2.at[sl, pl.ds(hp + tm, hp)],
                                  semh.at[1])
        c.start()
        c.wait()

    return win2[slot]


def _pick_tm_dist(M: int, hp: int = HP, target: int = 256) -> int:
    """Row block for the dist windows: divides M; M itself must cover one
    head/tail strip.  Returns 0 when the shape does not admit the kernels
    (caller falls back to the jnp local ops)."""
    if M < hp or M % 8 != 0:
        return 0
    for tm in (target, 128, 64, 32, 16, 8):
        if M % tm == 0:
            return tm
    return 0


# ----------------------------------------------------------------------
# Fused red-black GS sweep on a row shard
# ----------------------------------------------------------------------

def _rb_dist_kernel(rb_ref, v_hbm, vlo, vhi, f_hbm, flo, fhi, out_ref,
                    vwin, fwin, sems, semh, *, tm, M, W, lm, wc, woff):
    bi = pl.program_id(0)
    nprog = pl.num_programs(0)
    ws = tm + 2 * HP
    v = _dist_window(v_hbm, vlo, vhi, vwin, sems.at[0], semh.at[0],
                     bi, nprog, M, tm, HP)
    f = _dist_window(f_hbm, flo, fhi, fwin, sems.at[1], semh.at[1],
                     bi, nprog, M, tm, HP)
    start = bi * tm - HP + rb_ref[0, 0]
    gr, gc, interior = _masks(start, (ws, W), lm)
    red = ((gr + gc) % 2) == 0
    inv = 1.0 / wc

    def gs_stage(vcur, color):
        vt = jnp.where(interior, vcur, jnp.zeros_like(vcur))
        cand = jnp.where(interior,
                         (f - woff * _neighbor_sum(vt)) * inv, f)
        return jnp.where(color, cand, vcur)

    v1 = gs_stage(v, red)
    v2 = gs_stage(v1, ~red)
    out_ref[:] = v2[HP:HP + tm]


def rb_sweep_dist(v, f, vlo, vhi, flo, fhi, lm: int, wc: float, woff: float,
                  row_base, interpret: bool = False):
    """One full red-black GS sweep on a row shard: local (M, W) block plus
    HP-row halo strips from the gx neighbors.  The strip depth lets the
    black stage consume locally recomputed red values at the shard edge —
    one kernel pass per sweep, like the single-chip fused sweep."""
    M, W = v.shape
    tm = _pick_tm_dist(M)
    assert tm, (M, W)
    kernel = functools.partial(
        _rb_dist_kernel, tm=tm, M=M, W=W, lm=lm,
        wc=float(wc), woff=float(woff),
    )
    rb = jnp.full((1, 2), 0, jnp.int32).at[0, 0].set(row_base)
    ws = tm + 2 * HP
    return pl.pallas_call(
        kernel,
        grid=(M // tm,),
        in_specs=[
            pl.BlockSpec((1, 2), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((tm, W), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(v.shape, v.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, ws, W), v.dtype),
            pltpu.VMEM((2, ws, W), v.dtype),
            pltpu.SemaphoreType.DMA((2, 2, 3)),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        interpret=interpret,
    )(rb, v, vlo, vhi, f, flo, fhi)


# ----------------------------------------------------------------------
# Weighted-Jacobi sweep on a row shard (v needs halos; f is row-local)
# ----------------------------------------------------------------------

def _jacobi_dist_kernel(rb_ref, v_hbm, vlo, vhi, f_ref, out_ref,
                        vwin, sems, semh, *, tm, M, W, lm, wc, woff, omega):
    bi = pl.program_id(0)
    nprog = pl.num_programs(0)
    ws = tm + 2 * HP
    v = _dist_window(v_hbm, vlo, vhi, vwin, sems, semh, bi, nprog, M,
                     tm, HP)
    start = bi * tm - HP + rb_ref[0, 0]
    _, _, interior = _masks(start, (ws, W), lm)
    vt = jnp.where(interior, v, jnp.zeros_like(v))
    s = _neighbor_sum(vt)[HP:HP + tm]
    f = f_ref[:]
    cand = jnp.where(interior[HP:HP + tm], (f - woff * s) * (1.0 / wc), f)
    out_ref[:] = (1.0 - omega) * v[HP:HP + tm] + omega * cand


def jacobi_sweep_dist(v, f, vlo, vhi, lm: int, wc: float, woff: float,
                      omega: float, row_base, interpret: bool = False):
    """One weighted-Jacobi sweep on a row shard (halo strips on v only)."""
    M, W = v.shape
    tm = _pick_tm_dist(M)
    assert tm, (M, W)
    kernel = functools.partial(
        _jacobi_dist_kernel, tm=tm, M=M, W=W, lm=lm,
        wc=float(wc), woff=float(woff), omega=float(omega),
    )
    rb = jnp.full((1, 2), 0, jnp.int32).at[0, 0].set(row_base)
    ws = tm + 2 * HP
    return pl.pallas_call(
        kernel,
        grid=(M // tm,),
        in_specs=[
            pl.BlockSpec((1, 2), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((tm, W), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tm, W), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(v.shape, v.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, ws, W), v.dtype),
            pltpu.SemaphoreType.DMA((2, 3)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(rb, v, vlo, vhi, f)


# ----------------------------------------------------------------------
# Residual on a row shard
# ----------------------------------------------------------------------

def _residual_dist_kernel(rb_ref, v_hbm, vlo, vhi, f_ref, out_ref,
                          vwin, sems, semh, *, tm, M, W, lm, wc, woff):
    bi = pl.program_id(0)
    nprog = pl.num_programs(0)
    ws = tm + 2 * HP
    v = _dist_window(v_hbm, vlo, vhi, vwin, sems, semh, bi, nprog, M,
                     tm, HP)
    start = bi * tm - HP + rb_ref[0, 0]
    _, _, interior = _masks(start, (ws, W), lm)
    vt = jnp.where(interior, v, jnp.zeros_like(v))
    av = jnp.where(interior, wc * vt + woff * _neighbor_sum(vt), v)
    out_ref[:] = f_ref[:] - av[HP:HP + tm]


def residual_dist(v, f, vlo, vhi, lm: int, wc: float, woff: float,
                  row_base, interpret: bool = False):
    """Fused r = f - A v on a row shard (halo strips on v only)."""
    M, W = v.shape
    tm = _pick_tm_dist(M)
    assert tm, (M, W)
    kernel = functools.partial(
        _residual_dist_kernel, tm=tm, M=M, W=W, lm=lm,
        wc=float(wc), woff=float(woff),
    )
    rb = jnp.full((1, 2), 0, jnp.int32).at[0, 0].set(row_base)
    ws = tm + 2 * HP
    return pl.pallas_call(
        kernel,
        grid=(M // tm,),
        in_specs=[
            pl.BlockSpec((1, 2), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((tm, W), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tm, W), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(v.shape, v.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, ws, W), v.dtype),
            pltpu.SemaphoreType.DMA((2, 3)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(rb, v, vlo, vhi, f)


# ----------------------------------------------------------------------
# P^T restriction on a row shard (fine residual -> coarse shard)
# ----------------------------------------------------------------------

def _restrict_dist_kernel(rb_ref, r_hbm, rlo, rhi, out_ref, rwin, stage,
                          sems, semh, *, tc, Mf, Wf, Mc, Wc, lmf, lmc):
    bi = pl.program_id(0)
    nprog = pl.num_programs(0)
    ws = 2 * tc + 2 * HPR
    r = _dist_window(r_hbm, rlo, rhi, rwin, sems, semh, bi, nprog, Mf,
                     2 * tc, HPR)
    rbf = rb_ref[0, 0]                 # global fine row of local row 0
    start = 2 * (bi * tc) - HPR + rbf  # global fine row of window row 0
    _, _, interior_f = _masks(start, (ws, Wf), lmf)
    rt = jnp.where(interior_f, r, jnp.zeros_like(r))
    rows = _roll(rt, 1, 0) + 2.0 * rt + _roll(rt, -1, 0)
    full = _roll(rows, 1, 1) + 2.0 * rows + _roll(rows, -1, 1)
    # even window rows (window row 0 is globally even: start is even)
    stage[:] = full.reshape(ws // 2, 2, Wf)[:, 0, :]
    picked = stage[HPR // 2:HPR // 2 + tc, :]
    pt = picked.T
    even_cols = pt.reshape(Wf // 2, 2, tc)[:, 0, :].T
    res = even_cols * 0.25             # P^T = 4 * kernel/16
    grc = (bi * tc + rbf // 2
           + jax.lax.broadcasted_iota(jnp.int32, (tc, Wf // 2), 0))
    gcc = jax.lax.broadcasted_iota(jnp.int32, (tc, Wf // 2), 1)
    mask_c = (grc >= 1) & (grc <= lmc - 2) & (gcc >= 1) & (gcc <= lmc - 2)
    res = jnp.where(mask_c, res, jnp.zeros_like(res))
    if Wf // 2 >= Wc:
        out_ref[:] = res[:, :Wc]
    else:
        out_ref[:, : Wf // 2] = res
        out_ref[:, Wf // 2:] = jnp.zeros((tc, Wc - Wf // 2), res.dtype)


def restrict_pt_dist(r, rlo, rhi, coarse_shape: Tuple[int, int],
                     lmf: int, lmc: int, row_base,
                     interpret: bool = False):
    """P^T restriction of the interior-masked fine residual row shard onto
    the local coarse row shard (fine shards are aligned 2x coarse shards,
    parallel/halo.py:pick_shard_pad_plan).  rlo/rhi: HPR-row fine strips.
    row_base = global fine row of local fine row 0 (even)."""
    Mf, Wf = r.shape
    Mc, Wc = coarse_shape
    assert Mc == Mf // 2, (Mc, Mf)
    tc = _pick_tm_dist(Mc, hp=HPR, target=128)
    if tc and Mf < HPR:
        tc = 0
    assert tc, (Mf, Mc)
    kernel = functools.partial(
        _restrict_dist_kernel, tc=tc, Mf=Mf, Wf=Wf, Mc=Mc, Wc=Wc,
        lmf=lmf, lmc=lmc,
    )
    rb = jnp.full((1, 2), 0, jnp.int32).at[0, 0].set(row_base)
    ws = 2 * tc + 2 * HPR
    return pl.pallas_call(
        kernel,
        grid=(Mc // tc,),
        in_specs=[
            pl.BlockSpec((1, 2), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((tc, Wc), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Mc, Wc), r.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, ws, Wf), r.dtype),
            pltpu.VMEM((ws // 2, Wf), r.dtype),
            pltpu.SemaphoreType.DMA((2, 3)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(rb, r, rlo, rhi)


# ----------------------------------------------------------------------
# Bilinear prolongation + fused correction add on a row shard
# ----------------------------------------------------------------------

def _prolong_dist_kernel(rb_ref, c_hbm, clo, chi, v_ref, out_ref, cwin,
                         stage, sems, semh, *, tm, Mf, Wf, Mc, Wc, lmf):
    bi = pl.program_id(0)
    nprog = pl.num_programs(0)
    tcw = tm // 2 + 2 * HP
    c = _dist_window(c_hbm, clo, chi, cwin, sems, semh, bi, nprog, Mc,
                     tm // 2, HP)
    # column interleave in transposed (sublane) space, as single-device
    cshift = _roll(c, -1, 1)
    codd = 0.5 * (c + cshift)
    inter = jnp.stack([c.T, codd.T], axis=1).reshape(2 * Wc, tcw)
    wide = inter.T                                # (tcw, 2*Wc)
    wshift = _roll(wide, -1, 0)
    wodd = 0.5 * (wide + wshift)
    stage[:] = jnp.stack([wide, wodd], axis=1).reshape(2 * tcw, 2 * Wc)
    # fine row r0+k sits at stage row (r0 + k) - 2*(r0//2 - HP) = k + 2*HP
    res = stage[2 * HP:2 * HP + tm, :Wf]
    r0 = bi * tm
    grf = (r0 + rb_ref[0, 0]
           + jax.lax.broadcasted_iota(jnp.int32, (tm, Wf), 0))
    gcf = jax.lax.broadcasted_iota(jnp.int32, (tm, Wf), 1)
    inbox = (grf <= lmf - 1) & (gcf <= lmf - 1)
    out_ref[:] = v_ref[:] + jnp.where(inbox, res, jnp.zeros_like(res))


def prolong_add_dist(c, clo, chi, v_fine, lmf: int, row_base,
                     interpret: bool = False):
    """Bilinear prolongation of the local coarse row shard onto the local
    fine shard, fused with the V-cycle correction add (pass zeros for a
    plain prolongation).  clo/chi: HP-row coarse strips from the gx
    neighbors.  row_base = global fine row of local fine row 0 (even)."""
    Mc, Wc = c.shape
    Mf, Wf = v_fine.shape
    assert Mf == 2 * Mc, (Mf, Mc)
    tm = _pick_tm_dist(Mf)
    if tm < 16 or Mc < HP:
        tm = 0
    assert tm, (Mf, Mc)
    kernel = functools.partial(
        _prolong_dist_kernel, tm=tm, Mf=Mf, Wf=Wf, Mc=Mc, Wc=Wc, lmf=lmf,
    )
    rb = jnp.full((1, 2), 0, jnp.int32).at[0, 0].set(row_base)
    tcw = tm // 2 + 2 * HP
    return pl.pallas_call(
        kernel,
        grid=(Mf // tm,),
        in_specs=[
            pl.BlockSpec((1, 2), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((tm, Wf), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tm, Wf), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Mf, Wf), v_fine.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, tcw, Wc), c.dtype),
            pltpu.VMEM((2 * tcw, 2 * Wc), c.dtype),
            pltpu.SemaphoreType.DMA((2, 3)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(rb, c, clo, chi, v_fine)
