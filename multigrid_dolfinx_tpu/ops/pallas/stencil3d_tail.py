"""Fused coarse-tail V-cycle: the whole sub-hierarchy below a size
threshold as TWO Pallas kernels resident in VMEM.

Motivation (measured, scripts/trace3d.py): at 512^3 the six coarser
levels cost ~3.6 ms of the 22.4 ms V-cycle — each holds <= 1/8 of the
data of the next, so by level 65^3 the per-op windowed kernels are pure
launch/DMA/XLA-glue overhead (~0.5 ms/level for ~1 MB of data).  The
TPU-native fix is to stop paying per-op costs at all: every level at or
below the threshold fits in VMEM simultaneously (72*72*128 f32 = 2.6 MB
per array), so one kernel runs the entire DOWN leg (pre-smooth ->
residual -> P^T restrict, level by level), the tiny coarsest solve stays
in XLA between the kernels (dense Cholesky/inverse — not a kernel job),
and a second kernel runs the UP leg (prolong+correct -> post-smooth).
~6 kernel launches per level collapse into 2 launches for the whole
tail.

Math is identical to the per-level kernels: same red-black candidate
expressions, interior masks, 'pt' correction-equation masking of the
residual, [1,2,1]^3 restriction with even-index sampling via
stencil3d's in-plane helpers, trilinear prolongation.  The sweeps here
use full-3D vector ops (z neighbors by static shift-concat, in-plane
neighbors by pltpu.roll) instead of per-slab unrolls — the arrays are
VMEM-resident, so there is no window structure to exploit and the
3D-op form keeps the Mosaic program small.

Reference substrate: the recursion body of V_cycle_scheme
(multigrid.py:231-268) below the threshold level.
"""
from __future__ import annotations

import functools
import os
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .stencil2d import _roll
from .stencil3d import _plane_prolong, _plane_restrict


def _masks3d(shape, lm):
    z = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    y = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    x = jax.lax.broadcasted_iota(jnp.int32, shape, 2)
    interior = (
        (z >= 1) & (z <= lm - 2)
        & (y >= 1) & (y <= lm - 2)
        & (x >= 1) & (x <= lm - 2)
    )
    parity = (z + y + x) % 2
    return interior, parity


def _zshift(x, up: bool):
    zrow = jnp.zeros_like(x[:1])
    if up:                       # neighbor at z-1
        return jnp.concatenate([zrow, x[:-1]], axis=0)
    return jnp.concatenate([x[1:], zrow], axis=0)


def _nbr3d(vt):
    return (
        _zshift(vt, True) + _zshift(vt, False)
        + _roll(vt, 1, 1) + _roll(vt, -1, 1)
        + _roll(vt, 1, 2) + _roll(vt, -1, 2)
    )


def _rb3d(v, f, interior, parity, wc, woff, nsweeps):
    inv_wc = 1.0 / wc
    zero = jnp.zeros_like(v)
    for _ in range(nsweeps):
        for p in (0, 1):
            vt = jnp.where(interior, v, zero)
            cand = jnp.where(
                interior, (f + (-woff) * _nbr3d(vt)) * inv_wc, f)
            v = jnp.where(parity == p, cand, v)
    return v


def _residual3d(v, f, interior, wc, woff, masked: bool):
    """r = f - A v; masked=True additionally zeroes non-interior rows
    (the 'pt' correction-equation masking before restriction)."""
    zero = jnp.zeros_like(v)
    vt = jnp.where(interior, v, zero)
    av = wc * vt + woff * _nbr3d(vt)
    if masked:
        return jnp.where(interior, f - av, zero)
    return jnp.where(interior, f - av, f - v)


def _restrict3d(r_masked, lmf, lmc, cshape):
    """P^T restriction of the interior-masked fine residual to the
    (Mzc, Myc, Mxc) coarse storage: [1,2,1] z-combination by shifts, then
    stencil3d's in-plane restrict per coarse slab (python loop — the
    slab count is the coarse logical extent, <= 33 at the tail sizes)."""
    Mzc, Myc, Mxc = cshape
    g3 = _zshift(r_masked, True) + 2.0 * r_masked + _zshift(r_masked, False)
    zero_plane = jnp.zeros((Myc, Mxc), r_masked.dtype)
    planes = []
    for j in range(Mzc):
        if j < 1 or j > lmc - 2:
            planes.append(zero_plane)
            continue
        res = _plane_restrict(g3[2 * j], lmf, lmc, Mxc) * 0.125
        yc = jax.lax.broadcasted_iota(jnp.int32, res.shape, 0)
        xc = jax.lax.broadcasted_iota(jnp.int32, res.shape, 1)
        mask = (yc >= 1) & (yc <= lmc - 2) & (xc >= 1) & (xc <= lmc - 2)
        res = jnp.where(mask, res, jnp.zeros_like(res))
        if res.shape[0] >= Myc:
            planes.append(res[:Myc])
        else:
            planes.append(jnp.concatenate(
                [res, jnp.zeros((Myc - res.shape[0], Mxc), res.dtype)],
                axis=0))
    return jnp.stack(planes, axis=0)


def _prolong3d(c, lmf, fshape):
    """Trilinear prolongation of the coarse correction onto the (Mzf,
    Myf, Mxf) fine storage: stencil3d's in-plane prolongation per coarse
    slab (each computed once, shared by its even plane and both adjacent
    odd planes), even/odd z-interleave by stacking."""
    Mzf, Myf, Mxf = fshape
    nc = (lmf + 1) // 2          # coarse slabs with nonzero support
    ps = [_plane_prolong(c[i], Mxf)[:Myf] for i in range(nc)]
    zero_plane = jnp.zeros((Myf, Mxf), c.dtype)
    planes = []
    for zf in range(Mzf):
        if zf > lmf - 1:
            planes.append(zero_plane)
            continue
        i, odd = divmod(zf, 2)
        if not odd:
            planes.append(ps[i])
        elif i + 1 < nc:
            planes.append(0.5 * (ps[i] + ps[i + 1]))
        else:
            planes.append(0.5 * ps[i])
    e = jnp.stack(planes, axis=0)
    y = jax.lax.broadcasted_iota(jnp.int32, (Myf, Mxf), 0)
    x = jax.lax.broadcasted_iota(jnp.int32, (Myf, Mxf), 1)
    inplane = (y <= lmf - 1) & (x <= lmf - 1)
    return jnp.where(inplane[None], e, jnp.zeros_like(e))


def _tail_down_kernel(f_ref, *out_refs, levels, nu1):
    # levels: coarsest..top as (lm, shape, wc, woff); out_refs =
    # (v_top..v_1, f_{top-1}..f_0)
    t = len(levels) - 1
    vouts = out_refs[:t]
    fouts = out_refs[t:]
    f = f_ref[...]
    for ell in range(t, 0, -1):
        lm, shape, wc, woff = levels[ell]
        interior, parity = _masks3d(shape, lm)
        v = _rb3d(jnp.zeros(shape, f.dtype), f, interior, parity,
                  wc, woff, nu1)
        vouts[t - ell][...] = v
        r = _residual3d(v, f, interior, wc, woff, masked=True)
        lmc, cshape = levels[ell - 1][0], levels[ell - 1][1]
        f = _restrict3d(r, lm, lmc, cshape)
        fouts[t - ell][...] = f


def _tail_up_kernel(v0_ref, f_top_ref, *in_out_refs, levels, nu2):
    # in_out_refs = (v_top..v_1, f_{top-1}..f_1, out)
    t = len(levels) - 1
    vins = in_out_refs[:t]
    fins = in_out_refs[t:t + t - 1]
    out_ref = in_out_refs[-1]
    v = v0_ref[...]
    for ell in range(1, t + 1):
        lm, shape, wc, woff = levels[ell]
        vf = vins[t - ell][...]
        f = f_top_ref[...] if ell == t else fins[t - 1 - ell][...]
        v = vf + _prolong3d(v, lm, shape)
        interior, parity = _masks3d(shape, lm)
        v = _rb3d(v, f, interior, parity, wc, woff, nu2)
    out_ref[...] = v


def _vmem_ok(levels, itemsize: int = 4) -> bool:
    # all levels' (v, f) + ~6 live temporaries of the largest level
    total = sum(int(np.prod(sh)) * 2 for _, sh, _, _ in levels)
    top = int(np.prod(levels[-1][1])) * 6
    return (total + top) * itemsize <= 64 * 1024 * 1024


def tail_max_lm() -> int:
    return int(os.environ.get("MG_TAIL_LM", "65"))


def tail_eligible(levels: Sequence[Tuple[int, Tuple[int, int, int],
                                         float, float]]) -> bool:
    """levels = (lm, storage_shape, wc, woff), coarsest..top.  True when
    the fused tail kernels can run this sub-hierarchy."""
    if len(levels) < 2:
        return False
    if levels[-1][0] > tail_max_lm():
        return False
    for lm, sh, _, _ in levels:
        if sh[-1] % 128 != 0 or sh[-2] % 8 != 0:
            return False
        if sh[0] < lm or sh[1] < lm or sh[2] < lm:
            return False
    return _vmem_ok(levels)


def tail_down(f_top, levels, nu1: int, interpret: bool = False):
    """DOWN leg of the fused tail: returns (v_top..v_1, f_{top-1}..f_0)."""
    t = len(levels) - 1
    out_shapes = (
        [jax.ShapeDtypeStruct(levels[ell][1], f_top.dtype)
         for ell in range(t, 0, -1)]
        + [jax.ShapeDtypeStruct(levels[ell][1], f_top.dtype)
           for ell in range(t - 1, -1, -1)]
    )
    kernel = functools.partial(_tail_down_kernel, levels=tuple(levels),
                               nu1=nu1)
    return pl.pallas_call(
        kernel,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)
                   for _ in out_shapes],
        out_shape=out_shapes,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=112 * 1024 * 1024,
        ),
        interpret=interpret,
    )(f_top)


def tail_up(v0, f_top, vs, fs, levels, nu2: int, interpret: bool = False):
    """UP leg: v0 = coarse solve output; vs/fs from tail_down (fs without
    its last element f_0).  Returns the corrected, post-smoothed v_top."""
    kernel = functools.partial(_tail_up_kernel, levels=tuple(levels),
                               nu2=nu2)
    n_in = 2 + len(vs) + len(fs)
    return pl.pallas_call(
        kernel,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * n_in,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(levels[-1][1], v0.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=112 * 1024 * 1024,
        ),
        interpret=interpret,
    )(v0, f_top, *vs, *fs)


def fused_tail_vcycle(levels, f_top, coarse_solve, nu1: int, nu2: int,
                      interpret: bool = False):
    """One V-cycle over the tail sub-hierarchy (zero initial guess at the
    top, as the parent level's recursion provides): DOWN kernel -> XLA
    dense coarse solve -> UP kernel."""
    t = len(levels) - 1
    outs = tail_down(f_top, levels, nu1, interpret=interpret)
    vs = outs[:t]
    fs = outs[t:]
    v0 = coarse_solve(fs[-1])
    return tail_up(v0, f_top, vs, fs[:-1], levels, nu2,
                   interpret=interpret)
