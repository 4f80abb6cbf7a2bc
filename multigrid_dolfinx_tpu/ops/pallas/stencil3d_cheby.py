"""Fused Chebyshev smoothing step for the 3D const-7 operator.

Why a dedicated kernel: the Pallas Chebyshev path previously ran each
matvec step as residual-kernel (3 HBM passes) + XLA elementwise updates
of (z, p, v) (~5 more passes) — ~8 array passes per step, which benched
the V(2,2) chebyshev cycle at 1.63x rbgs even after the equal-matvec
degree convention.  This kernel computes one whole step in 4 passes via
the three-term (momentum) form of the recurrence,

    v_{k+1} = v_k + a_k (v_k - v_{k-1}) + b_k D^{-1}(f - A v_k),

which is algebraically identical to the p-state form in
ops.smoothers.chebyshev_smooth (p_k == v_k - v_{k-1} by induction, so
a_k = rho_k rho_{k-1}, b_k = 2 rho_k / delta; step 0 is a_0 = 0,
b_0 = 1/theta) but needs no separate p array in HBM: read v, v_prev, f,
write v_new.  Boundary rows (identity rows of the Dirichlet-eliminated
operator, dinv = 1) and zero padding behave exactly as the jnp path:
r = f - v there, and all-zero padding stays zero.

(a, b) arrive as a (1, 2) SMEM scalar input because the Chebyshev window
constants derive from the traced lmax in SmootherData — they are device
scalars, not compile-time floats.

Reference semantics: the Chebyshev smoother is this framework's
production parallel smoother (BASELINE.json config 3); the reference
itself smooths with weighted Jacobi only (multigrid.py:223-228).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .stencil3d import _branch_offsets, _masks3, _nbr_sum


def _cheby_kernel(zb_ref, ab_ref, v_hbm, vp_hbm, f_hbm, out_ref,
                  vwin, pwin, fwin, vnew, pnew, fnew, ttmp, sems, *,
                  Mz, My, Mx, lm, tz, wc, woff):
    h = 1
    i = pl.program_id(0)
    nprog = pl.num_programs(0)
    ws = tz + 2 * h
    zb = zb_ref[0, 0]
    a = ab_ref[0, 0]
    b = ab_ref[0, 1]
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
                vp_hbm.at[pl.ds(z0, tz), :, :], pnew.at[slot],
                sems.at[slot, 1]),
            pltpu.make_async_copy(
                f_hbm.at[pl.ds(z0, tz), :, :], fnew.at[slot],
                sems.at[slot, 2]),
        )

    @pl.when(i == 0)
    def _():
        cv = pltpu.make_async_copy(
            v_hbm.at[pl.ds(start(0), ws), :, :], vwin, sems.at[2, 0])
        cp = pltpu.make_async_copy(
            vp_hbm.at[pl.ds(start(0), ws), :, :], pwin, sems.at[2, 1])
        cf = pltpu.make_async_copy(
            f_hbm.at[pl.ds(start(0), ws), :, :], fwin, sems.at[2, 2])
        cv.start()
        cp.start()
        cf.start()
        if nprog > 1:
            for c in new_copies(1, 1):
                c.start()
        cv.wait()
        cp.wait()
        cf.wait()

    @pl.when(i > 0)
    def _():
        shift = start(i) - start(i - 1)
        ttmp[:] = vwin[pl.ds(shift, h2)]
        vwin[:h2] = ttmp[:]
        ttmp[:] = pwin[pl.ds(shift, h2)]
        pwin[:h2] = ttmp[:]
        ttmp[:] = fwin[pl.ds(shift, h2)]
        fwin[:h2] = ttmp[:]
        slot = jax.lax.rem(i, jnp.int32(2))
        for c in new_copies(i, slot):
            c.wait()
        vwin[h2:] = vnew[slot]
        pwin[h2:] = pnew[slot]
        fwin[h2:] = fnew[slot]
        if nprog > 2:
            @pl.when(i + 1 < nprog)
            def _():
                for c in new_copies(
                        i + 1, jax.lax.rem(i + 1, jnp.int32(2))):
                    c.start()

    v = vwin[:]
    vp = pwin[:]
    f = fwin[:]
    z0g = start(i) + zb
    shape3 = (ws, My, Mx)
    _, _, _, interior = _masks3(z0g, shape3, lm)
    vt = jnp.where(interior, v, jnp.zeros_like(v))
    o = i * tz - start(i)
    inv_wc = 1.0 / wc
    pad = Mz - lm

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
            for sl in range(tz):
                s = oc + sl
                av = jnp.where(
                    interior[s],
                    wc * vt[s] + woff * _nbr_sum(vt, s, ws), v[s])
                r = f[s] - av
                z = jnp.where(interior[s], r * inv_wc, r)
                out_ref[sl] = v[s] + a * (v[s] - vp[s]) + b * z


def _pick_tz_cheby(Mz, My, Mx, itemsize: int = 4) -> int:
    slab = My * Mx * itemsize
    budget = 124 * 1024 * 1024
    for tz in (4, 2, 1):
        ws = tz + 2
        # 3 windows + 3 double-buffered staging slots + ttmp + out block
        # + ~3*ws Mosaic-stack intermediates
        need = (3 * ws + 6 * tz + 2 + tz + 3 * ws) * slab
        if Mz % tz == 0 and ws <= Mz and need <= budget:
            return tz
    return 0


def cheby_admits(shape, dtype, lm) -> bool:
    """Pure admission check shared by cheby_step and the phase driver —
    one gate, so the pre-check and the kernel call cannot drift
    (ADVICE r2: avoid duplicated admission logic)."""
    Mz, My, Mx = shape
    if My % 8 or Mx % 128 or lm > min(Mz, My, Mx) or Mz - lm < 1:
        return False
    if dtype != jnp.float32:
        return False
    tz = _pick_tz_cheby(Mz, My, Mx)
    return tz != 0 and Mz // tz >= 2


def cheby_step(v, vp, f, lm, wc, woff, a, b, interpret: bool = False):
    """One Chebyshev step v + a (v - vp) + b D^{-1}(f - A v) on the
    const-7 operator, one rolling pass (read v, vp, f / write v_new).
    `a`, `b` are device scalars.  Returns None when the shape doesn't
    admit the kernel (caller falls back to the residual-kernel path)."""
    Mz, My, Mx = v.shape
    if not cheby_admits(v.shape, v.dtype, lm):
        return None
    tz = _pick_tz_cheby(Mz, My, Mx)
    ws = tz + 2
    kernel = functools.partial(
        _cheby_kernel, Mz=Mz, My=My, Mx=Mx, lm=lm, tz=tz,
        wc=float(wc), woff=float(woff),
    )
    zb = jnp.zeros((1, 1), jnp.int32)
    ab = jnp.stack([jnp.asarray(a, jnp.float32),
                    jnp.asarray(b, jnp.float32)]).reshape(1, 2)
    return pl.pallas_call(
        kernel,
        grid=(Mz // tz,),
        in_specs=[
            pl.BlockSpec((1, 1), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 2), memory_space=pltpu.SMEM),
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
            pltpu.VMEM((ws, My, Mx), v.dtype),
            pltpu.VMEM((2, tz, My, Mx), v.dtype),
            pltpu.VMEM((2, tz, My, Mx), v.dtype),
            pltpu.VMEM((2, tz, My, Mx), v.dtype),
            pltpu.VMEM((2, My, Mx), v.dtype),
            pltpu.SemaphoreType.DMA((3, 3)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=127 * 1024 * 1024,
        ),
        interpret=interpret,
    )(zb, ab, v, vp, f)


def chebyshev_phase_fused(sm, A, v, f, nsweeps, interpret: bool = False):
    """Full Chebyshev smoothing phase on the fused step kernel; the
    (rounds, degree) mapping and window constants match
    ops.smoothers.chebyshev_smooth exactly (momentum form of the same
    recurrence).  Returns None when the kernel doesn't admit the
    shape/dtype."""
    from .. import dispatch
    from ..smoothers import cheby_phase

    w = dispatch.const7_weights(A)
    if w is None or v.ndim != 3:
        return None
    wc, woff = w
    lm = A.logical_m
    rounds, degree = cheby_phase(nsweeps, sm.cheby_degree)
    if rounds == 0:
        return v
    if not cheby_admits(v.shape, v.dtype, lm):
        return None

    lmax = jnp.asarray(sm.lmax, v.dtype) * 1.05
    lmin = lmax / sm.cheby_eig_ratio
    theta = 0.5 * (lmax + lmin)
    delta = 0.5 * (lmax - lmin)
    sigma = theta / delta

    def one_round(_, v):
        vp = v
        vn = cheby_step(v, v, f, lm, wc, woff, jnp.float32(0.0),
                        1.0 / theta, interpret=interpret)
        rho_prev = 1.0 / sigma
        for _k in range(1, degree):
            rho = 1.0 / (2.0 * sigma - rho_prev)
            vn2 = cheby_step(vn, vp, f, lm, wc, woff,
                             rho * rho_prev, 2.0 * rho / delta,
                             interpret=interpret)
            vp, vn = vn, vn2
            rho_prev = rho
        return vn

    if rounds <= 2:
        for k in range(rounds):
            v = one_round(k, v)
        return v
    return jax.lax.fori_loop(0, rounds, one_round, v)
