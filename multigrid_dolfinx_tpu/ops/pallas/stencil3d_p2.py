"""Fused 3D kernels for the plane-free constant-coefficient P2 operator.

The parity-class-table identification (ops.operators.StencilOperator.
parity_tables / fem.fast_p2): interior rows of the constant-kappa P2
operator on the half-step DOF lattice are exactly period-2 — the weight
of offset k at row p is w[(z%2, y%2, x%2), k], a compile-time constant.
So a sweep needs NO operator planes in HBM at all: one rolling-window
pass over (v, f) with the 51 stencil weights baked as immediates and the
in-plane parity selected by two iota masks.  That is what makes P2 at
the production lattice (256^3 cells = 513^3 = 135M DOFs, BASELINE
config 4) bandwidth-comparable to the P1 headline: the planes kernels
would read K = 51 coefficient grids per color pass (27 passes per GS
sweep); here v and f cross HBM once per sweep, same as the P1 const
kernels, and the extra cost is pure VPU arithmetic.

Static-parity trick: the window z-size tz is restricted to EVEN values,
so every window start (clip(i*tz - h, 0, Mz - ws) with h = 2 and Mz
even) is even and the global z-parity of window slab s is s % 2 — a
compile-time constant.  With it, the per-slab weight set (and the
diagonal reciprocal) is fully static; rows whose z-parity is odd skip
the |dz| = 2 offsets entirely (a z-odd node couples only within its one
cell layer, so those weights are exactly zero — cell geometry, verified
by the template extraction).

Reference capability: P2 function space + relaxation/residual
(Multigrid_prototype.py:88-110, multigrid.py:223-228/203-208).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .stencil2d import _roll
from .stencil3d import _masks3, _rolling_kernel


def _wsel(w4, ym, xm, dtype):
    """Weight plane for one offset at fixed row z-parity: w4 = (w[yp=0,
    xp=0], w[0,1], w[1,0], w[1,1]).  Collapses to None (all zero), a
    scalar (parity-independent), or 1-2 selects (y-only / x-only /
    full)."""
    w00, w01, w10, w11 = (dtype.type(w) for w in w4)
    if all(w == 0.0 for w in w4):
        return None
    if w4[0] == w4[1] == w4[2] == w4[3]:
        return w00
    if w4[0] == w4[1] and w4[2] == w4[3]:
        return jnp.where(ym, w10, w00)
    if w4[0] == w4[2] and w4[1] == w4[3]:
        return jnp.where(xm, w01, w00)
    return jnp.where(ym, jnp.where(xm, w11, w10),
                     jnp.where(xm, w01, w00))


def _p2_prelude(v, f, z0, shape3, lm, **kw):
    _, _, _, interior = _masks3(z0, shape3, lm)
    vt = jnp.where(interior, v, jnp.zeros_like(v))
    plane_shape = shape3[1:]
    ym = (jax.lax.broadcasted_iota(jnp.int32, plane_shape, 0) % 2) == 1
    xm = (jax.lax.broadcasted_iota(jnp.int32, plane_shape, 1) % 2) == 1
    return interior, vt, ym, xm


def _p2_slab_acc(vt, ym, xm, ws, wrel, zp, offs, wz, skip_center):
    """Sum_k w[class(row), k] * vt[row + o_k] for one output slab.  Reads
    are fresh per slab (no cross-slab roll cache — the cache would hold
    up to 50 live planes of Mosaic stack); offsets whose weight plane
    collapses to zero for this z-parity cost nothing."""
    dtype = vt.dtype
    acc = None
    for k, (dz, dy, dx) in enumerate(offs):
        if skip_center and (dz, dy, dx) == (0, 0, 0):
            continue
        wp = _wsel(wz[zp][k], ym, xm, dtype)
        if wp is None:
            continue
        # clamp keeps bottom-block |dz|=2 reads of even rows in-window;
        # the clamped cases are exactly rows whose output is bc-masked
        # (z in {0,1}: z=0 is a face row; z=1 is odd, whose |dz|=2
        # weights are zero so this term was skipped above).
        j = min(max(wrel + dz, 0), ws - 1)
        c = vt[j]
        if dy:
            c = _roll(c, -dy, 0)
        if dx:
            c = _roll(c, -dx, 1)
        term = wp * c
        acc = term if acc is None else acc + term
    return acc


def _p2_residual_emit(aux, v, f, z0, shape3, lm, oc, tz, *, offs, wz,
                      rdz):
    interior, vt, ym, xm = aux
    ws = shape3[0]
    outs = []
    for sl in range(tz):
        wrel = oc + sl
        zp = wrel % 2                     # static: window starts are even
        acc = _p2_slab_acc(vt, ym, xm, ws, wrel, zp, offs, wz, False)
        av = jnp.where(interior[wrel], acc, v[wrel])
        outs.append(f[wrel] - av)
    return outs


def _p2_jacobi_emit(aux, v, f, z0, shape3, lm, oc, tz, *, offs, wz, rdz,
                    omega):
    interior, vt, ym, xm = aux
    ws = shape3[0]
    outs = []
    for sl in range(tz):
        wrel = oc + sl
        zp = wrel % 2
        acc = _p2_slab_acc(vt, ym, xm, ws, wrel, zp, offs, wz, True)
        dp = _wsel(rdz[zp], ym, xm, vt.dtype)
        cand = jnp.where(interior[wrel], dp * (f[wrel] - acc), f[wrel])
        outs.append((1.0 - omega) * v[wrel] + omega * cand)
    return outs


def _pick_tz_p2(Mz: int, My: int, Mx: int, itemsize: int = 4) -> int:
    """EVEN tz only (the static-parity trick needs even window starts).
    VMEM budget mirrors stencil3d._pick_tz_rolling with a larger stack
    allowance for the per-slab roll temporaries."""
    slab = My * Mx * itemsize
    # Measured at the 513^3 production lattice (slab = 1.33 MB): tz=4
    # compiles to a 127.78M scoped allocation — 0.8M past the 127M VMEM
    # limit — so the effective per-tz footprint is ~96 slabs at tz=4.
    # Budget accordingly (Mosaic stack ~5 slabs/output slab during emit
    # plus the windows/staging), so big slabs fall to tz=2 (~74 slabs,
    # fits) instead of failing at compile time.
    budget = 100 * 1024 * 1024
    for tz in (4, 2):
        ws = tz + 4
        need = (2 * ws + 4 * tz + 4 + tz + 4 * ws + 12) * slab
        if Mz % tz == 0 and ws <= Mz and need <= budget:
            return tz
    return 0


def p2_admits(shape, dtype=jnp.float32) -> bool:
    Mz, My, Mx = shape
    if Mz % 2 or My % 8 or Mx % 128:
        return False
    return _pick_tz_p2(Mz, My, Mx, jnp.dtype(dtype).itemsize) != 0


def _weights_static(parity_weights, offsets):
    """wz[zp][k] = (w[yp=0,xp=0], w[0,1], w[1,0], w[1,1]) at row z-parity
    zp, from the (K, 4^3) flat tables (per-axis classes {0: low face,
    1: even, 2: odd, 3: high face}; interior parity classes are 1/2)."""
    wz = []
    for zp in (0, 1):
        per_k = []
        for k in range(len(offsets)):
            row = parity_weights[k]
            per_k.append(tuple(
                float(row[((1 + zp) * 4 + (1 + yp)) * 4 + (1 + xp)])
                for yp in (0, 1) for xp in (0, 1)
            ))
        wz.append(tuple(per_k))
    return tuple(wz)


def _rdinv_static(wz, offsets):
    ci = tuple(map(tuple, offsets)).index((0, 0, 0))
    out = []
    for zp in (0, 1):
        out.append(tuple(
            (1.0 / w if w != 0.0 else 1.0) for w in wz[zp][ci]
        ))
    return tuple(out)


def _call_p2(emit, v, f, lm, parity_weights, offsets, interpret,
             **extra):
    Mz, My, Mx = v.shape
    tz = _pick_tz_p2(Mz, My, Mx, v.dtype.itemsize)
    if tz == 0 or Mz // tz < 2:
        return None
    ws = tz + 4
    offs = tuple(map(tuple, offsets))
    wz = _weights_static(parity_weights, offs)
    kernel = functools.partial(
        _rolling_kernel(_p2_prelude, emit, pad=Mz - lm),
        Mz=Mz, My=My, Mx=Mx, lm=lm, tz=tz, h=2,
        offs=offs, wz=wz, rdz=_rdinv_static(wz, offs), **extra,
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
        out_specs=pl.BlockSpec((tz, My, Mx), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(v.shape, v.dtype),
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


def p2_residual(v, f, lm, parity_weights, offsets, interpret=False):
    """Fused r = f - A v on the parity-table P2 operator (one rolling
    pass over v and f, zero operator bytes); None off the fast path."""
    return _call_p2(_p2_residual_emit, v, f, lm, parity_weights, offsets,
                    interpret)


def p2_jacobi_sweep(v, f, lm, parity_weights, offsets, omega,
                    interpret=False):
    """One weighted-Jacobi sweep v' = (1-w) v + w Dinv (f - (A - D) v)
    on the parity-table P2 operator; None off the fast path."""
    return _call_p2(_p2_jacobi_emit, v, f, lm, parity_weights, offsets,
                    interpret, omega=float(omega))
