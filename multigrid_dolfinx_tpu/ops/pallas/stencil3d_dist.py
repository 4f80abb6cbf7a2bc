"""Distributed (z-sharded) Pallas kernels: halo slabs as separate inputs.

The shard_map 3D path (parallel/halo3d.py) exchanges 1- or 2-deep z-slab
halos with its mesh neighbors via `jax.lax.ppermute`.  Concatenating those
halos onto the local block and slicing them back off after the kernel
(`halo_extend_z` -> kernel -> `out[h:-h]`) costs ~6 extra full HBM passes
per fused sweep — the sweep itself is only 3 passes (read v, read f, write
out), so the concat/slice pattern would triple the distributed smoothing
cost relative to the single-chip kernels (ops/pallas/stencil3d.py).

The kernels here instead take the halo slabs as SEPARATE small inputs and
assemble each block's z-window from up to three sources (lo-halo, the
local array, hi-halo) inside the kernel's rolling-window DMA plumbing: a
"virtual" array of Mz + 2h slabs that is never materialized in HBM.  The
local arrays cross HBM exactly once per sweep — multi-chip per-shard
throughput matches the single-chip rolling kernels.

Because every window is full (the halos supply the edge slabs), output
blocks sit at a FIXED window offset h: there is a single emit branch (the
single-device rolling kernels compile 3+ offset branches) and no window
clamping.  Global-z boundary masks and red-black parity stay consistent
across shards via the `z_base` SMEM scalar (= the global z index of local
slab 0); edge ranks pass zero halos, which is exactly the zero extension
the masks expect at the domain boundary.

Value parity: each output element evaluates the same fixed-association
expression as the single-device kernels (elementwise candidates, the
6-neighbor sum, [1,2,1]^3 restriction, trilinear prolongation), so a
z-decomposed sweep is bitwise-equal to the single-chip sweep on the same
global data.

Reference substrate being replaced: PETSc ghostUpdate FORWARD/ADD-REVERSE
scatters under dolfinx (Multigrid_prototype.py:79-80,106-107).
"""
from __future__ import annotations

import functools
import os
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .stencil3d import (
    _jacobi_emit,
    _masks3,
    _nbr_sum,
    _plane_prolong,
    _plane_restrict,
    _pw_prelude,
    _rb_emit,
    _rb_prelude,
    _residual_emit,
)


def _pick_tz_halo(Mz: int, My: int, Mx: int, h: int,
                  itemsize: int = 4) -> int:
    """Output slabs per block for the halo-rolling plumbing.  Constraints:
    Mz % tz == 0, tz >= h (the last block's fresh rows are the tz-h top
    physical slabs plus the h hi-halo slabs; tz < h would spread the halo
    over several blocks), and the windows + staging + body intermediates
    within the VMEM budget."""
    slab = My * Mx * itemsize
    budget = 100 * 1024 * 1024
    env = os.environ.get("MG_TZ")
    cand = (int(env),) if env else (4, 2, 1)
    for tz in cand:
        ws = tz + 2 * h
        # 2 windows (ws) + 2x2 staging (tz) + ttmp (2h) + hi stage (2h)
        # + out (tz) + ~3*ws body intermediates
        need = (2 * ws + 4 * tz + 4 * h + tz + 3 * ws) * slab
        if Mz % tz == 0 and tz >= h and need <= budget:
            return tz
    return 0


def _halo_rolling_kernel(prelude, emit):
    """Rolling z-window over the virtual [ -h, Mz + h ) array assembled
    from (lo, local, hi): block i emits local slabs [i*tz, i*tz + tz) from
    a window at fixed offset h.  Local v/f slabs are DMA'd exactly once;
    halos land in the window edges (lo at block 0, hi staged for the last
    block).  prelude/emit have the stencil3d rolling-kernel signature."""

    def kernel(zb_ref, v_hbm, vlo, vhi, f_hbm, flo, fhi, out_ref,
               vwin, fwin, vnew, fnew, vhis, fhis, ttmp, sems, semh, *,
               Mz, My, Mx, lm, tz, h, **kw):
        i = pl.program_id(0)
        nprog = Mz // tz                     # static
        ws = tz + 2 * h
        h2 = 2 * h
        zb = zb_ref[0, 0]

        def new_copies(block, slot):
            # fresh rows for block `block`: virtual [b*tz + h, b*tz+h+tz).
            # The last block's top h rows come from the hi halo; its DMA
            # start clamps so the copy shape stays fixed at tz rows (the
            # staged block then reads offset h).
            z0 = jnp.minimum(block * tz + h, Mz - tz)
            return (
                pltpu.make_async_copy(
                    v_hbm.at[pl.ds(z0, tz), :, :], vnew.at[slot],
                    sems.at[slot, 0]),
                pltpu.make_async_copy(
                    f_hbm.at[pl.ds(z0, tz), :, :], fnew.at[slot],
                    sems.at[slot, 1]),
            )

        def hi_copies():
            return (
                pltpu.make_async_copy(vhi, vhis, semh.at[0]),
                pltpu.make_async_copy(fhi, fhis, semh.at[1]),
            )

        @pl.when(i == 0)
        def _():
            first = min(tz + h, Mz)          # static
            cs = [
                pltpu.make_async_copy(
                    v_hbm.at[pl.ds(0, first), :, :],
                    vwin.at[pl.ds(h, first)], sems.at[2, 0]),
                pltpu.make_async_copy(
                    f_hbm.at[pl.ds(0, first), :, :],
                    fwin.at[pl.ds(h, first)], sems.at[2, 1]),
                pltpu.make_async_copy(vlo, vwin.at[pl.ds(0, h)],
                                      sems.at[3, 0]),
                pltpu.make_async_copy(flo, fwin.at[pl.ds(0, h)],
                                      sems.at[3, 1]),
            ]
            for c in cs:
                c.start()
            if nprog > 1:
                for c in new_copies(1, 1):
                    c.start()
            for c in hi_copies():
                c.start()
            for c in cs:
                c.wait()
            if nprog == 1:
                # whole array in one window: top h rows are the hi halo
                for c in hi_copies():
                    c.wait()
                vwin[pl.ds(ws - h, h)] = vhis[:]
                fwin[pl.ds(ws - h, h)] = fhis[:]

        @pl.when(i > 0)
        def _():
            # inherit the window tail (shift is always tz: no clamping)
            ttmp[:] = vwin[pl.ds(tz, h2)]
            vwin[:h2] = ttmp[:]
            ttmp[:] = fwin[pl.ds(tz, h2)]
            fwin[:h2] = ttmp[:]
            slot = jax.lax.rem(i, jnp.int32(2))
            for c in new_copies(i, slot):
                c.wait()

            @pl.when(i < nprog - 1)
            def _():
                vwin[h2:] = vnew[slot]
                fwin[h2:] = fnew[slot]

            @pl.when(i == nprog - 1)
            def _():
                if tz > h:
                    vwin[pl.ds(h2, tz - h)] = vnew[slot, pl.ds(h, tz - h)]
                    fwin[pl.ds(h2, tz - h)] = fnew[slot, pl.ds(h, tz - h)]
                for c in hi_copies():
                    c.wait()
                vwin[pl.ds(ws - h, h)] = vhis[:]
                fwin[pl.ds(ws - h, h)] = fhis[:]

            if nprog > 2:
                @pl.when(i + 1 < nprog)
                def _():
                    for c in new_copies(
                            i + 1, jax.lax.rem(i + 1, jnp.int32(2))):
                        c.start()

        v = vwin[:]
        f = fwin[:]
        z0g = i * tz - h + zb               # global z of window slab 0
        shape3 = (ws, My, Mx)
        aux = prelude(v, f, z0g, shape3, lm, **kw)
        outs = emit(aux, v, f, z0g, shape3, lm, h, tz, **kw)
        for sl in range(tz):
            out_ref[sl] = outs[sl]

    return kernel


def _call_halo_rolling(prelude, emit, v, f, vlo, vhi, flo, fhi, lm, h,
                       z_base, interpret, **kw):
    """Halo-rolling pallas_call; returns None when the shape doesn't admit
    it (caller falls back to the ext-concat + windowed-kernel path)."""
    if os.environ.get("MG_ROLLING", "1") != "1":
        return None
    Mz, My, Mx = v.shape
    tz = _pick_tz_halo(Mz, My, Mx, h)
    if tz == 0:
        return None
    ws = tz + 2 * h
    kernel = functools.partial(
        _halo_rolling_kernel(prelude, emit),
        Mz=Mz, My=My, Mx=Mx, lm=lm, tz=tz, h=h, **kw
    )
    zb = jnp.full((1, 2), 0, jnp.int32).at[0, 0].set(z_base)
    return pl.pallas_call(
        kernel,
        grid=(Mz // tz,),
        in_specs=[
            pl.BlockSpec((1, 2), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
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
            pltpu.VMEM((h, My, Mx), v.dtype),
            pltpu.VMEM((h, My, Mx), v.dtype),
            pltpu.VMEM((2 * h, My, Mx), v.dtype),
            pltpu.SemaphoreType.DMA((4, 2)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=112 * 1024 * 1024,
        ),
        interpret=interpret,
    )(zb, v, vlo, vhi, f, flo, fhi)


# ----------------------------------------------------------------------
# Sweeps / residual (reuse the single-device prelude/emit bodies)
# ----------------------------------------------------------------------

def _ext_fallback(kernel_fn, v, f, vlo, vhi, flo, fhi, z_base, h, *args,
                  **kw):
    """Correctness fallback when the halo-rolling shape check fails:
    materialize the halo-extended block and run the plain windowed
    single-device kernel with z_base (slower: extra concat/slice passes)."""
    vext = jnp.concatenate([vlo, v, vhi], axis=0)
    fext = jnp.concatenate([flo, f, fhi], axis=0)
    out = kernel_fn(vext, fext, *args, z_base=z_base - h, **kw)
    return out[h:-h]


def rb_sweep_fused_dist(v, f, vlo, vhi, flo, fhi, lm, wc, woff, z_base,
                        interpret=False):
    """One full red-black GS sweep on a z-shard: local (Mz, My, Mx) block
    plus 2-deep z halos (vlo/vhi/flo/fhi, each (2, My, Mx)) from the mesh
    neighbors.  The 2-deep halo lets the black stage consume locally
    computed red values at the shard edge — one kernel pass per sweep,
    same as the single-chip fused sweep."""
    out = _call_halo_rolling(
        _rb_prelude, _rb_emit, v, f, vlo, vhi, flo, fhi, lm, 2, z_base,
        interpret, wc=float(wc), woff=float(woff),
    )
    if out is not None:
        return out
    from . import stencil3d

    return _ext_fallback(stencil3d.rb_sweep_fused, v, f, vlo, vhi, flo,
                         fhi, z_base, 2, lm, wc, woff, interpret=interpret)


def jacobi_sweep_dist(v, f, vlo, vhi, flo, fhi, lm, wc, woff, omega,
                      z_base, interpret=False):
    """One weighted-Jacobi sweep on a z-shard (1-deep halos)."""
    out = _call_halo_rolling(
        _pw_prelude, _jacobi_emit, v, f, vlo, vhi, flo, fhi, lm, 1,
        z_base, interpret, wc=float(wc), woff=float(woff),
        omega=float(omega),
    )
    if out is not None:
        return out
    from . import stencil3d

    return _ext_fallback(stencil3d.jacobi_sweep, v, f, vlo, vhi, flo, fhi,
                         z_base, 1, lm, wc, woff, omega,
                         interpret=interpret)


def residual_dist(v, f, vlo, vhi, flo, fhi, lm, wc, woff, z_base,
                  interpret=False):
    """Fused r = f - A v on a z-shard (1-deep halos)."""
    out = _call_halo_rolling(
        _pw_prelude, _residual_emit, v, f, vlo, vhi, flo, fhi, lm, 1,
        z_base, interpret, wc=float(wc), woff=float(woff),
    )
    if out is not None:
        return out
    from . import stencil3d

    return _ext_fallback(stencil3d.residual, v, f, vlo, vhi, flo, fhi,
                         z_base, 1, lm, wc, woff, interpret=interpret)


# ----------------------------------------------------------------------
# Fused residual + P^T restriction on a z-shard
# ----------------------------------------------------------------------

def _make_rr_dist_kernel(wc, woff):
    """Builds the fused dist restrict-residual kernel with the operator
    weights closed over (compile-time immediates)."""

    def kernel(zb_ref, v_hbm, vlo, vhi, f_hbm, flo, fhi, out_ref,
               vwin, fwin, vnew, fnew, vhis, fhis, ttmp, rcache,
               sems, semh, *, Mzf, Myf, Mxf, Myc, Mxc, lmf, lmc):
        i = pl.program_id(0)
        nprog = Mzf // 2
        zb = zb_ref[0, 0]
        zcb = zb_ref[0, 1]
        WS = 5

        def new_copies(block, slot):
            z0 = jnp.minimum(2 * block + 1, Mzf - 2)
            return (
                pltpu.make_async_copy(
                    v_hbm.at[pl.ds(z0, 2), :, :], vnew.at[slot],
                    sems.at[slot, 0]),
                pltpu.make_async_copy(
                    f_hbm.at[pl.ds(z0, 2), :, :], fnew.at[slot],
                    sems.at[slot, 1]),
            )

        def hi_copies():
            return (
                pltpu.make_async_copy(vhi, vhis, semh.at[0]),
                pltpu.make_async_copy(fhi, fhis, semh.at[1]),
            )

        @pl.when(i == 0)
        def _():
            first = min(3, Mzf)
            cs = [
                pltpu.make_async_copy(
                    v_hbm.at[pl.ds(0, first), :, :],
                    vwin.at[pl.ds(2, first)], sems.at[2, 0]),
                pltpu.make_async_copy(
                    f_hbm.at[pl.ds(0, first), :, :],
                    fwin.at[pl.ds(2, first)], sems.at[2, 1]),
                pltpu.make_async_copy(vlo, vwin.at[pl.ds(0, 2)],
                                      sems.at[3, 0]),
                pltpu.make_async_copy(flo, fwin.at[pl.ds(0, 2)],
                                      sems.at[3, 1]),
            ]
            for c in cs:
                c.start()
            if nprog > 1:
                for c in new_copies(1, 1):
                    c.start()
            for c in hi_copies():
                c.start()
            for c in cs:
                c.wait()
            if nprog == 1:
                for c in hi_copies():
                    c.wait()
                vwin[pl.ds(4, 1)] = vhis[:1]
                fwin[pl.ds(4, 1)] = fhis[:1]

        @pl.when(i > 0)
        def _():
            ttmp[:] = vwin[pl.ds(2, 3)]
            vwin[:3] = ttmp[:]
            ttmp[:] = fwin[pl.ds(2, 3)]
            fwin[:3] = ttmp[:]
            slot = jax.lax.rem(i, jnp.int32(2))
            for c in new_copies(i, slot):
                c.wait()

            @pl.when(i < nprog - 1)
            def _():
                vwin[3:] = vnew[slot]
                fwin[3:] = fnew[slot]

            @pl.when(i == nprog - 1)
            def _():
                vwin[pl.ds(3, 1)] = vnew[slot, pl.ds(1, 1)]
                fwin[pl.ds(3, 1)] = fnew[slot, pl.ds(1, 1)]
                for c in hi_copies():
                    c.wait()
                vwin[pl.ds(4, 1)] = vhis[:1]
                fwin[pl.ds(4, 1)] = fhis[:1]

            if nprog > 2:
                @pl.when(i + 1 < nprog)
                def _():
                    for c in new_copies(
                            i + 1, jax.lax.rem(i + 1, jnp.int32(2))):
                        c.start()

        v = vwin[:]
        f = fwin[:]
        z0 = 2 * i - 2 + zb
        shape3 = (WS, Myf, Mxf)
        _, _, _, interior = _masks3(z0, shape3, lmf)
        vt = jnp.where(interior, v, jnp.zeros_like(v))

        def resid_row(s):
            av = wc * vt[s] + woff * _nbr_sum(vt, s, WS)
            return jnp.where(interior[s], f[s] - av,
                             jnp.zeros((Myf, Mxf), v.dtype))

        # consecutive windows overlap by one residual row (this block's
        # top row, global fine z = 2*zc+1, is the next block's bottom);
        # block 0 has no predecessor and seeds the cache itself.
        @pl.when(i == 0)
        def _():
            rcache[:] = resid_row(1)

        r_top = resid_row(3)
        g = rcache[:] + 2.0 * resid_row(2) + r_top
        rcache[:] = r_top
        res = _plane_restrict(g, lmf, lmc, Mxc) * 0.125
        yc = jax.lax.broadcasted_iota(jnp.int32, res.shape, 0)
        xc = jax.lax.broadcasted_iota(jnp.int32, res.shape, 1)
        zc = zcb + i
        mask = (
            (zc >= 1) & (zc <= lmc - 2)
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

    return kernel


def restrict_residual_pt_dist(v, f, vlo, vhi, flo, fhi,
                              coarse_shape: Tuple[int, int, int],
                              lmf: int, lmc: int, wc: float, woff: float,
                              z_base, zc_base, interpret=False):
    """Fused (f - A v) -> P^T restriction on a z-shard: local fine block
    (Mzf, Myf, Mxf) with 2-deep z halos -> local coarse block
    (Mzf//2, Myc, Mxc).  z_base = global fine z of local slab 0 (even);
    zc_base = z_base // 2.  Interior-masks the residual and the coarse
    output like the single-device restrict_residual_pt."""
    Mzf, Myf, Mxf = v.shape
    Mzc, Myc, Mxc = coarse_shape
    assert Mzc == Mzf // 2, (Mzc, Mzf)
    kernel = functools.partial(
        _make_rr_dist_kernel(float(wc), float(woff)),
        Mzf=Mzf, Myf=Myf, Mxf=Mxf, Myc=Myc, Mxc=Mxc, lmf=lmf, lmc=lmc,
    )
    zb = (jnp.full((1, 2), 0, jnp.int32)
          .at[0, 0].set(z_base).at[0, 1].set(zc_base))
    return pl.pallas_call(
        kernel,
        grid=(Mzc,),
        in_specs=[
            pl.BlockSpec((1, 2), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
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
            pltpu.VMEM((2, Myf, Mxf), v.dtype),
            pltpu.VMEM((2, Myf, Mxf), v.dtype),
            pltpu.VMEM((3, Myf, Mxf), v.dtype),
            pltpu.VMEM((Myf, Mxf), v.dtype),
            pltpu.SemaphoreType.DMA((4, 2)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=112 * 1024 * 1024,
        ),
        interpret=interpret,
    )(zb, v, vlo, vhi, f, flo, fhi)


# ----------------------------------------------------------------------
# Trilinear prolongation (+ fused correction add) on a z-shard
# ----------------------------------------------------------------------

def _make_prolong_dist_kernel(fused_add):
    def kernel(zb_ref, c_hbm, chi, *rest, Mzf, Myf, Mxf, Mzc, Myc, Mxc,
               lmf):
        if fused_add:
            v_ref, out_ref, cwin, chis, pcache, sem, semh = rest
        else:
            out_ref, cwin, chis, pcache, sem, semh = rest
            v_ref = None
        i = pl.program_id(0)              # fine slab pair: fine z 2i, 2i+1
        nprog = Mzc                       # static (== Mzf // 2)
        zb = zb_ref[0, 0]                 # global fine z of local slab 0
        slot = jax.lax.rem(i, jnp.int32(2))

        def dma(block, sl):
            # 2-row coarse window [b, b+2); the last block's top row is
            # hi-halo row 0 (clamped fixed-shape DMA)
            z0 = jnp.minimum(block, Mzc - 2) if Mzc > 1 else 0
            rows = min(2, Mzc)
            return pltpu.make_async_copy(
                c_hbm.at[pl.ds(z0, rows), :, :], cwin.at[sl, pl.ds(0, rows)],
                sem.at[sl])

        @pl.when(i == 0)
        def _():
            dma(0, 0).start()
            pltpu.make_async_copy(chi, chis, semh.at[0]).start()

        @pl.when(i + 1 < nprog)
        def _():
            dma(i + 1, jax.lax.rem(i + 1, jnp.int32(2))).start()

        dma(i, slot).wait()
        c = cwin[slot]

        # Block i's even fine plane is the in-plane prolongation of coarse
        # slab i == block i-1's odd-partner plane: cached in pcache so each
        # block runs ONE in-plane prolongation (the two lane<->sublane
        # transposes dominate).  The last block's odd partner is the
        # hi-halo coarse slab (its DMA is waited exactly once, by the last
        # block — which is block 0 itself when Mzc == 1).
        @pl.when(i == 0)
        def _():
            pcache[:] = _plane_prolong(c[0], Mxf)[:Myf]

        @pl.when(i == nprog - 1)
        def _():
            pltpu.make_async_copy(chi, chis, semh.at[0]).wait()

        p0 = pcache[:]

        def emit(p1):
            even = p0
            odd = 0.5 * (p0 + p1)
            zf0 = 2 * i
            for sl, plane in ((0, even), (1, odd)):
                zf = zb + zf0 + sl
                yf = jax.lax.broadcasted_iota(jnp.int32, plane.shape, 0)
                xf = jax.lax.broadcasted_iota(jnp.int32, plane.shape, 1)
                mask = (zf <= lmf - 1) & (yf <= lmf - 1) & (xf <= lmf - 1)
                e = jnp.where(mask, plane, jnp.zeros_like(plane))
                out_ref[sl] = (v_ref[sl] + e) if fused_add else e
            pcache[:] = p1

        @pl.when(i < nprog - 1)
        def _():
            emit(_plane_prolong(c[1], Mxf)[:Myf])

        @pl.when(i == nprog - 1)
        def _():
            emit(_plane_prolong(chis[0], Mxf)[:Myf])

    return kernel


def prolong_linear_add_dist(c, chi, v_fine, lmf: int, z_base,
                            interpret=False):
    """Trilinear prolongation of a local coarse z-shard (Mzc, Myc, Mxc)
    onto the local fine shard (2*Mzc, Myf, Mxf), fused with the V-cycle
    correction add when v_fine is given (else plain prolongation).  chi =
    the +z neighbor's first coarse slab ((1, Myc, Mxc); zeros at the top
    rank).  z_base = global fine z of local fine slab 0."""
    Mzc, Myc, Mxc = c.shape
    fused_add = v_fine is not None
    if fused_add:
        fine_shape = v_fine.shape
    else:
        raise ValueError("pass v_fine (use zeros for plain prolongation)")
    Mzf, Myf, Mxf = fine_shape
    assert Mzf == 2 * Mzc, (Mzf, Mzc)
    kernel = functools.partial(
        _make_prolong_dist_kernel(True),
        Mzf=Mzf, Myf=Myf, Mxf=Mxf, Mzc=Mzc, Myc=Myc, Mxc=Mxc, lmf=lmf,
    )
    zb = jnp.full((1, 2), 0, jnp.int32).at[0, 0].set(z_base)
    return pl.pallas_call(
        kernel,
        grid=(Mzf // 2,),
        in_specs=[
            pl.BlockSpec((1, 2), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((2, Myf, Mxf), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((2, Myf, Mxf), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(fine_shape, v_fine.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, 2, Myc, Mxc), c.dtype),
            pltpu.VMEM((1, Myc, Mxc), c.dtype),
            pltpu.VMEM((Myf, Mxf), c.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((1,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=112 * 1024 * 1024,
        ),
        interpret=interpret,
    )(zb, c, chi, v_fine)
