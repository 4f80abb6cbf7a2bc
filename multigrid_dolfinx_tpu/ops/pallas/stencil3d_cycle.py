"""Cycle-step fusion kernels: collapse the V-cycle's per-level kernel
chain around the level transition into single rolling passes.

Measured at 512^3 (scripts/trace3d.py, round 3): the fine level costs
per cycle 4 x 3.0 ms fused RB sweeps (at the ~692 GB/s HBM roofline)
plus 2.6 ms fused residual+restrict plus 2.4 ms prolong+correct — the
latter two re-read v and f that the adjacent smoother sweep just
touched.  Fusing them INTO those sweeps removes two full fine-grid
read-modify passes per cycle:

  * `rb_residual_restrict_fused` — the LAST pre-smooth sweep, the masked
    residual r = f - A v, and the variational P^T restriction in one
    rolling pass.  v and f cross HBM once; outputs are the smoothed v
    and the coarse RHS.  Window halo h = 4: black needs red at +-1, the
    residual needs black at +-1, and each block's coarse rows need the
    residual one fine row outside its output range — so every coarse row
    is computed self-contained in exactly one block (no cross-block row
    cache).
  * `prolong_correct_rb_fused` — the trilinear prolongation+correction
    and the FIRST post-smooth sweep in one rolling pass (halo h = 2; the
    coarse correction is recomputed locally wherever a neighbor needs
    it, so no halo growth from the correction stage).

Both kernels restrict every stage to its dependency range (the pyramid
style of stencil3d._rb2_emit) instead of sweeping the whole window, so
the extra compute per output slab stays bounded as the traffic halves.

Math identical to the ops they replace: stencil3d's _gs_candidate
masks, 'pt' correction-equation masking, [1,2,1]^3 restriction and
trilinear prolongation via the shared in-plane helpers.  Reference
substrate: V_cycle_scheme's smooth/residual/restrict/prolong/correct
sequence (multigrid.py:243-261).
"""
from __future__ import annotations

import functools
import os
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .stencil2d import _roll
from .stencil3d import (
    _branch_offsets,
    _gs_candidate,
    _plane_prolong,
    _plane_restrict,
)


def _inplane_masks(My, Mx, lm):
    y = jax.lax.broadcasted_iota(jnp.int32, (My, Mx), 0)
    x = jax.lax.broadcasted_iota(jnp.int32, (My, Mx), 1)
    inplane = (y >= 1) & (y <= lm - 2) & (x >= 1) & (x <= lm - 2)
    return inplane, (y + x) % 2


# ----------------------------------------------------------------------
# Kernel A: last pre-smooth sweep + masked residual + P^T restriction
# ----------------------------------------------------------------------

def _pick_tz_a(Mz, My, Mx, Myc, Mxc, itemsize: int = 4) -> int:
    slab = My * Mx * itemsize
    cslab = Myc * Mxc * itemsize
    budget = 121 * 1024 * 1024
    env = os.environ.get("MG_TZ_CYC")
    cand = (int(env),) if env else (4, 2)
    for tz in cand:
        ws = tz + 8
        # v/f windows (2 ws each: rolling + staging approximated as the
        # generic rolling footprint) + out block + coarse staging +
        # ~2.5 ws of Mosaic stack for the stage pyramid
        need = (2 * ws + 4 * tz + 8 + tz) * slab + 2 * tz * cslab \
            + int(2.5 * ws) * slab
        if tz % 2 == 0 and Mz % tz == 0 and ws <= Mz and need <= budget:
            return tz
    return 0


def _a_kernel(zb_ref, v_hbm, f_hbm, out_v_ref, out_c_hbm, vwin, fwin,
              vnew, fnew, ttmp, cstage, sems, csem, *,
              Mz, My, Mx, Mzc, Myc, Mxc, lm, lmc, tz, wc, woff):
    h = 4
    i = pl.program_id(0)
    nprog = pl.num_programs(0)
    ws = tz + 2 * h
    tzc = tz // 2
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
    inplane, ypx = _inplane_masks(My, Mx, lm)
    zero = jnp.zeros((My, Mx), v.dtype)

    def interior_at(s):
        zg = z0 + s
        return jnp.logical_and(inplane, (zg >= 1) & (zg <= lm - 2))

    o = i * tz - start(i)
    cslot = jax.lax.rem(i, jnp.int32(2))

    for oc in _branch_offsets(tz, h):
        @pl.when(o == oc)
        def _(oc=oc):
            # stage pyramid: red -> black -> masked residual, each on its
            # dependency range only
            cur = {s: v[s] for s in range(ws)}
            for parity, lo, hi in ((0, oc - 3, oc + tz + 3),
                                   (1, oc - 2, oc + tz + 2)):
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
                    cand = _gs_candidate(f[s], ssum, interior_at(s),
                                         wc, woff)
                    target = (parity + z0 + s) % 2
                    new[s] = jnp.where(ypx == target, cand, cur[s])
                cur.update(new)

            for sl in range(tz):
                out_v_ref[sl] = cur[oc + sl]

            # masked residual on [oc-1, oc+tz+1)
            lo, hi = max(oc - 1, 0), min(oc + tz + 1, ws)
            vt = {
                s: jnp.where(interior_at(s), cur[s], zero)
                for s in range(max(lo - 1, 0), min(hi + 1, ws))
            }
            res = {}
            for s in range(lo, hi):
                c = vt[s]
                ssum = (
                    vt.get(s - 1, zero) + vt.get(s + 1, zero)
                    + _roll(c, 1, 0) + _roll(c, -1, 0)
                    + _roll(c, 1, 1) + _roll(c, -1, 1)
                )
                av = wc * c + woff * ssum
                res[s] = jnp.where(interior_at(s), f[s] - av, zero)

            # coarse rows zc in [i*tzc, i*tzc + tzc): fine rows
            # 2 zc - 1 .. 2 zc + 1, all inside the residual range
            yc = jax.lax.broadcasted_iota(jnp.int32, (Myc, Mxc), 0)
            xc = jax.lax.broadcasted_iota(jnp.int32, (Myc, Mxc), 1)
            cmask = (yc >= 1) & (yc <= lmc - 2) & (xc >= 1) \
                & (xc <= lmc - 2)
            zeroc = jnp.zeros((Myc, Mxc), v.dtype)
            for cl in range(tzc):
                # window row of fine z = 2 zc is 2(i*tzc + cl) - start(i)
                sfz = 2 * cl + oc    # i*tz - start(i) + 2*cl == oc + 2*cl
                gzc = z0 + sfz       # global fine row == 2 * global zc
                g3 = (res.get(sfz - 1, zero) + 2.0 * res[sfz]
                      + res.get(sfz + 1, zero))
                plane = _plane_restrict(g3, lm, lmc, Mxc) * 0.125
                if plane.shape[0] >= Myc:
                    plane = plane[:Myc]
                else:
                    plane = jnp.concatenate(
                        [plane, jnp.zeros((Myc - plane.shape[0], Mxc),
                                          plane.dtype)], axis=0)
                zok = (gzc >= 2) & (gzc <= 2 * (lmc - 2))
                cstage[cslot, cl] = jnp.where(cmask & zok, plane, zeroc)
            pltpu.make_async_copy(
                cstage.at[cslot],
                out_c_hbm.at[pl.ds(i * tzc, tzc), :, :],
                csem.at[cslot],
            ).start()

    # drain this block's coarse write before its staging slot is reused
    # two blocks later (and before the kernel retires on the last block)
    pltpu.make_async_copy(
        cstage.at[cslot],
        out_c_hbm.at[pl.ds(i * tzc, tzc), :, :],
        csem.at[cslot],
    ).wait()

    @pl.when(i == nprog - 1)
    def _():
        # zero any coarse storage rows beyond the grid's coverage
        rem = Mzc - (Mz // tz) * tzc
        if rem > 0:
            for cl in range(rem):
                cstage[0, 0] = jnp.zeros((Myc, Mxc), v.dtype)
                cp = pltpu.make_async_copy(
                    cstage.at[0, pl.ds(0, 1)],
                    out_c_hbm.at[pl.ds((Mz // tz) * tzc + cl, 1), :, :],
                    csem.at[0],
                )
                cp.start()
                cp.wait()


def rb_residual_restrict_fused(v, f, coarse_shape, lm_f: int, lm_c: int,
                               wc, woff, interpret: bool = False):
    """One full RB sweep + masked residual + P^T restriction in a single
    rolling HBM pass.  Returns (v_swept, f_coarse) or None when the
    shape doesn't admit the kernel."""
    if os.environ.get("MG_CYCLE_FUSE", "1") != "1":
        return None
    Mz, My, Mx = v.shape
    Mzc, Myc, Mxc = coarse_shape
    if lm_c - 1 != (lm_f - 1) // 2 or Myc % 8 or Mxc % 128:
        return None
    tz = _pick_tz_a(Mz, My, Mx, Myc, Mxc)
    if tz == 0 or Mz // tz < 2 or Mzc < (Mz // tz) * (tz // 2):
        return None
    ws = tz + 8
    kernel = functools.partial(
        _a_kernel, Mz=Mz, My=My, Mx=Mx, Mzc=Mzc, Myc=Myc, Mxc=Mxc,
        lm=lm_f, lmc=lm_c, tz=tz, wc=float(wc), woff=float(woff),
    )
    zb = jnp.zeros((1, 1), jnp.int32)
    return pl.pallas_call(
        kernel,
        grid=(Mz // tz,),
        in_specs=[
            pl.BlockSpec((1, 1), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec((tz, My, Mx), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(v.shape, v.dtype),
            jax.ShapeDtypeStruct(coarse_shape, v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((ws, My, Mx), v.dtype),
            pltpu.VMEM((ws, My, Mx), v.dtype),
            pltpu.VMEM((2, tz, My, Mx), v.dtype),
            pltpu.VMEM((2, tz, My, Mx), v.dtype),
            pltpu.VMEM((8, My, Mx), v.dtype),
            pltpu.VMEM((2, tz // 2, Myc, Mxc), v.dtype),
            pltpu.SemaphoreType.DMA((3, 2)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=127 * 1024 * 1024,
        ),
        interpret=interpret,
    )(zb, v, f)


# ----------------------------------------------------------------------
# Kernel B: prolongation + correction + first post-smooth sweep
# ----------------------------------------------------------------------

def _pick_tz_b(Mz, My, Mx, Myc, Mxc, itemsize: int = 4) -> int:
    slab = My * Mx * itemsize
    cslab = Myc * Mxc * itemsize
    budget = 121 * 1024 * 1024
    # tz = 4 ONLY: the static per-branch coarse-window offset j = d//2 +
    # {0, 2} requires that exactly block 0 bottom-clamps the coarse
    # window; at tz = 2, block 1 clamps differently within the same
    # branch (measured wrong in interpret mode), so smaller tz falls
    # back to the separate kernels instead.
    env = os.environ.get("MG_TZ_CYC")
    cand = (int(env),) if env else (4,)
    for tz in cand:
        if tz != 4:
            continue
        ws = tz + 4
        czw = tz // 2 + 4
        # v/f windows + new-slab staging + ttmp + out block + coarse
        # windows + prolonged planes + ~2.5 ws Mosaic stack
        need = (2 * ws + 4 * tz + 4 + tz) * slab \
            + 2 * czw * cslab + czw * slab + int(2.5 * ws) * slab
        if Mz % tz == 0 and ws <= Mz and need <= budget:
            return tz
    return 0


def _b_kernel(zb_ref, c_hbm, v_hbm, f_hbm, out_ref, vwin, fwin, vnew,
              fnew, ttmp, cwin, sems, csems, *,
              Mz, My, Mx, Mzc, Myc, Mxc, lm, tz, wc, woff):
    h = 2
    i = pl.program_id(0)
    nprog = pl.num_programs(0)
    ws = tz + 2 * h
    czw = tz // 2 + 4
    zb = zb_ref[0, 0]
    h2 = 2 * h

    def start(block):
        return jnp.clip(block * tz - h, 0, Mz - ws)

    def cstart(block):
        # coarse rows feeding fine rows [block*tz - 2, block*tz + tz + 2):
        # iz in [block*tz/2 - 2, block*tz/2 + tz/2 + 1].  The wrapper
        # guarantees Mzc >= Mz//2 + 2, so only block 0 bottom-clamps —
        # every branch's window index is then j = d//2 + (0 if o == 0
        # else 2), a STATIC offset per branch.
        return jnp.clip(block * tz // 2 - 2, 0, Mzc - czw)

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

    def c_copy(block, slot):
        return pltpu.make_async_copy(
            c_hbm.at[pl.ds(cstart(block), czw), :, :], cwin.at[slot],
            csems.at[slot],
        )

    @pl.when(i == 0)
    def _():
        cv = pltpu.make_async_copy(
            v_hbm.at[pl.ds(start(0), ws), :, :], vwin, sems.at[2, 0])
        cf = pltpu.make_async_copy(
            f_hbm.at[pl.ds(start(0), ws), :, :], fwin, sems.at[2, 1])
        cc = c_copy(0, 0)
        cv.start()
        cf.start()
        cc.start()
        if nprog > 1:
            for c in new_copies(1, 1):
                c.start()
            c_copy(1, 1).start()
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
                c_copy(i + 1, jax.lax.rem(i + 1, jnp.int32(2))).start()

    cslot = jax.lax.rem(i, jnp.int32(2))
    c_copy(i, cslot).wait()

    v = vwin[:]
    f = fwin[:]
    cw = cwin[cslot]
    z0 = start(i) + zb
    inplane, ypx = _inplane_masks(My, Mx, lm)
    zero = jnp.zeros((My, Mx), v.dtype)

    def interior_at(s):
        zg = z0 + s
        return jnp.logical_and(inplane, (zg >= 1) & (zg <= lm - 2))

    o = i * tz - start(i)

    # prolonged coarse planes, each computed once per block
    pl_planes = [
        _plane_prolong(cw[j], Mx)[:My] for j in range(czw)
    ]
    yx = jax.lax.broadcasted_iota(jnp.int32, (My, Mx), 0)
    xx = jax.lax.broadcasted_iota(jnp.int32, (My, Mx), 1)
    pmask = (yx <= lm - 1) & (xx <= lm - 1)

    for oc in _branch_offsets(tz, h):
        @pl.when(o == oc)
        def _(oc=oc):
            # corrected v on [oc-2, oc+tz+2): v + P(c).  Fine row s has
            # global z = i*tz + d with d = s - oc; i*tz is even (tz is),
            # so the z parity is d's parity (STATIC) and the coarse
            # window row is j = d//2 + cofs with cofs = i*tz//2 -
            # cstart(i) — 0 on the bottom-clamped block (o == 0), else 2
            # (the wrapper's Mzc >= Mz//2 + 2 guard rules out a top
            # clamp).
            cofs = 0 if oc == 0 else 2
            lo, hi = max(oc - 2, 0), min(oc + tz + 2, ws)
            cur = {s: v[s] for s in range(ws)}
            for s in range(lo, hi):
                d = s - oc
                j = d // 2 + cofs        # python floor division
                if d % 2 == 0:
                    e = pl_planes[j]
                else:
                    e = 0.5 * (pl_planes[j] + pl_planes[j + 1])
                cur[s] = v[s] + jnp.where(pmask, e, zero)
            for parity, lo2, hi2 in ((0, oc - 1, oc + tz + 1),
                                     (1, oc, oc + tz)):
                lo2, hi2 = max(lo2, 0), min(hi2, ws)
                vt = {
                    s: jnp.where(interior_at(s), cur[s], zero)
                    for s in range(max(lo2 - 1, 0), min(hi2 + 1, ws))
                }
                new = {}
                for s in range(lo2, hi2):
                    c = vt[s]
                    ssum = (
                        vt.get(s - 1, zero) + vt.get(s + 1, zero)
                        + _roll(c, 1, 0) + _roll(c, -1, 0)
                        + _roll(c, 1, 1) + _roll(c, -1, 1)
                    )
                    cand = _gs_candidate(f[s], ssum, interior_at(s),
                                         wc, woff)
                    target = (parity + z0 + s) % 2
                    new[s] = jnp.where(ypx == target, cand, cur[s])
                cur.update(new)
            for sl in range(tz):
                out_ref[sl] = cur[oc + sl]


def prolong_correct_rb_fused(c, v, f, lm_f: int, wc, woff,
                             interpret: bool = False):
    """Trilinear prolongation + correction + one full RB sweep in a
    single rolling HBM pass over v/f.  Returns the smoothed corrected v,
    or None when the shape doesn't admit the kernel."""
    if os.environ.get("MG_CYCLE_FUSE", "1") != "1":
        return None
    Mz, My, Mx = v.shape
    Mzc, Myc, Mxc = c.shape
    tz = _pick_tz_b(Mz, My, Mx, Myc, Mxc)
    if tz == 0 or Mz // tz < 2:
        return None
    if Mz % 2 or Mzc < Mz // 2 + 2:
        # the static coarse-window index j = d//2 + {0, 2} relies on the
        # coarse window never top-clamping (see _b_kernel.cstart)
        return None
    ws = tz + 4
    czw = tz // 2 + 4
    kernel = functools.partial(
        _b_kernel, Mz=Mz, My=My, Mx=Mx, Mzc=Mzc, Myc=Myc, Mxc=Mxc,
        lm=lm_f, tz=tz, wc=float(wc), woff=float(woff),
    )
    zb = jnp.zeros((1, 1), jnp.int32)
    return pl.pallas_call(
        kernel,
        grid=(Mz // tz,),
        in_specs=[
            pl.BlockSpec((1, 1), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
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
            pltpu.VMEM((4, My, Mx), v.dtype),
            pltpu.VMEM((2, czw, Myc, Mxc), v.dtype),
            pltpu.SemaphoreType.DMA((3, 2)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=127 * 1024 * 1024,
        ),
        interpret=interpret,
    )(zb, c, v, f)
