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
from .stencil3d import _branch_offsets, _masks3, _rolling_kernel


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


def _p2_slab_acc(vt, ym, xm, ws, wrel, zp, offs, wz, skip_center,
                 oob="clamp"):
    """Sum_k w[class(row), k] * vt[row + o_k] for one output slab.  Reads
    are fresh per slab (no cross-slab roll cache — the cache would hold
    up to 50 live planes of Mosaic stack); offsets whose weight plane
    collapses to zero for this z-parity cost nothing.  vt may be a
    window array or a list of per-slab planes (the quad kernel's
    pre-masked reads).

    oob='clamp': out-of-window |dz|=2 reads clamp to the window edge —
    correct for the residual/jacobi kernels, whose clamped rows are
    bc-masked in the output anyway.  oob='zero': those terms are dropped
    (read zero) — required by the quad kernel, whose z=0 FACE row is a
    live output row and whose dz=-2 read must be the zero extension, not
    the row itself."""
    dtype = vt[0].dtype if isinstance(vt, (list, tuple)) else vt.dtype
    acc = None
    for k, (dz, dy, dx) in enumerate(offs):
        if skip_center and (dz, dy, dx) == (0, 0, 0):
            continue
        wp = _wsel(wz[zp][k], ym, xm, dtype)
        if wp is None:
            continue
        if oob == "zero" and not (0 <= wrel + dz <= ws - 1):
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
        # Dirichlet rows SNAP to f (GS-style) instead of the damped mixing
        # (1-w) v + w f: after one sweep boundary rows hold exactly f = uD
        # and every later sweep preserves that bitwise.  Same fixed point,
        # and it is what makes cropped P2 storage exact — the residual on
        # (stored and missing) boundary planes is identically zero at
        # every post-sweep convergence check, so the cropped r^T M r
        # equals the full-layout value (solver/hierarchy._crop_points_p2).
        # The host twin (ops.smoothers.jacobi_smooth snap_bc) matches.
        upd = (1.0 - omega) * v[wrel] + omega * dp * (f[wrel] - acc)
        outs.append(jnp.where(interior[wrel], upd, f[wrel]))
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


# ----------------------------------------------------------------------
# Fused FEM-L2 mass quadratic form r^T M r for the parity-table P2 mass
# (the per-cycle convergence check of P2 tolerance solves / MG-CG; the
# plain _apply_parity matvec walks K = 51 shifted full-grid passes).
# Same split as stencil3d_norm.residual_mass_quad: the kernel computes
# the PARITY-EXTENDED form over all in-box rows (face rows get the
# weights their lattice parity would imply), and an O(surface) plain-jnp
# shell delta corrects the 6 face planes to their true raw-row tables —
# exact, because interior rows of the raw P2 mass are exactly periodic
# (fem.fast_p2) so weights differ from the parity extension only ON the
# faces, and reads are identical (in-box values) in both halves.
# ----------------------------------------------------------------------

def _p2_quad_kernel(zb_ref, r_hbm, out_ref, rwin, rnew, ttmp, sems, *,
                    Mz, My, Mx, lm, tz, offs, wz):
    """partial += sum_{rows in slab, in-box} r * (M_par r) over the
    sequential grid, single (1, 1) SMEM scalar output.  Single-input
    rolling window (h = 2, even tz -> static slab z-parity)."""
    h = 2
    i = pl.program_id(0)
    nprog = pl.num_programs(0)
    ws = tz + 2 * h
    zb = zb_ref[0, 0]
    h2 = 2 * h

    def start(block):
        return jnp.clip(block * tz - h, 0, Mz - ws)

    def new_copy(block, slot):
        z0 = start(block) + h2
        return pltpu.make_async_copy(
            r_hbm.at[pl.ds(z0, tz), :, :], rnew.at[slot],
            sems.at[slot])

    @pl.when(i == 0)
    def _():
        c = pltpu.make_async_copy(
            r_hbm.at[pl.ds(start(0), ws), :, :], rwin, sems.at[2])
        c.start()
        if nprog > 1:
            new_copy(1, 1).start()
        c.wait()

    @pl.when(i > 0)
    def _():
        shift = start(i) - start(i - 1)
        ttmp[:] = rwin[pl.ds(shift, h2)]
        rwin[:h2] = ttmp[:]
        slot = jax.lax.rem(i, jnp.int32(2))
        new_copy(i, slot).wait()
        rwin[h2:] = rnew[slot]
        if nprog > 2:
            @pl.when(i + 1 < nprog)
            def _():
                new_copy(i + 1, jax.lax.rem(i + 1, jnp.int32(2))).start()

    r = rwin[:]
    z0 = start(i) + zb
    plane_shape = (My, Mx)
    y = jax.lax.broadcasted_iota(jnp.int32, plane_shape, 0)
    x = jax.lax.broadcasted_iota(jnp.int32, plane_shape, 1)
    inplane_box = (y <= lm - 1) & (x <= lm - 1)
    ym = (y % 2) == 1
    xm = (x % 2) == 1
    zero = jnp.zeros(plane_shape, r.dtype)
    # in-box masked reads (raw-mode semantics: bc values kept, padding
    # rows zeroed)
    rt = [
        jnp.where(
            jnp.logical_and(inplane_box, z0 + t <= lm - 1), r[t], zero)
        for t in range(ws)
    ]
    o = i * tz - start(i)

    for oc in _branch_offsets(tz, 2):
        @pl.when(o == oc)
        def _(oc=oc):
            partial = jnp.float32(0.0)
            for sl in range(tz):
                wrel = oc + sl
                zp = wrel % 2            # static: window starts are even
                acc = _p2_slab_acc(rt, ym, xm, ws, wrel, zp, offs, wz,
                                   False, oob="zero")
                if acc is None:
                    continue
                partial = partial + jnp.sum(rt[wrel] * acc,
                                            dtype=jnp.float32)
            @pl.when(i == 0)
            def _():
                out_ref[0, 0] = partial

            @pl.when(i > 0)
            def _():
                out_ref[0, 0] = out_ref[0, 0] + partial


def _pick_tz_p2_quad(Mz: int, My: int, Mx: int, itemsize: int = 4) -> int:
    """Even tz; single-input window + the ws in-box-masked read planes
    held live through the branch body."""
    slab = My * Mx * itemsize
    budget = 100 * 1024 * 1024
    for tz in (4, 2):
        ws = tz + 4
        need = (ws + 2 * tz + 4 + 3 * ws + 10) * slab
        if Mz % tz == 0 and ws <= Mz and need <= budget:
            return tz
    return 0


def _p2_parity_class_flats(ii, lm):
    """(true, parity-extended) flat 4^3 class indices from global index
    iotas — per axis {0: low face, 1: even, 2: odd, 3: high face} vs the
    parity extension {even -> 1, odd -> 2} everywhere."""
    ct = None
    cp = None
    for a in range(3):
        par = jnp.where(ii[a] % 2 == 0, 1, 2)
        t = jnp.where(ii[a] == 0, 0, jnp.where(ii[a] == lm - 1, 3, par))
        ct = t if ct is None else ct * 4 + t
        cp = par if cp is None else cp * 4 + par
    return ct, cp


def _p2_shell_delta_quad(r, tables, offsets, lm):
    """sum_{p on the 6 face planes, in-box} r(p) * sum_k (T_k[true cls]
    - T_k[parity cls]) r(p + off_k) — the exact correction from the
    kernel's parity-extended form to the raw-row tables.  O(surface):
    face strips of 5 rows (radius-2 context); reads wrap into the >= 2
    zero padding rows of the storage (r is zero outside the box)."""
    t64 = tables.astype(jnp.float32)
    acc = jnp.float32(0.0)
    shape = r.shape

    def strip_term(axis, face_lo):
        lo = 0 if face_lo else lm - 1
        lo0 = max(lo - 2, 0)
        hi0 = min(lo + 3, shape[axis])
        sl = [slice(None)] * 3
        sl[axis] = slice(lo0, hi0)
        rr = r[tuple(sl)]
        pads = [(0, 0)] * 3
        pads[axis] = (lo0 - (lo - 2), (lo + 3) - hi0)
        if any(p != (0, 0) for p in pads):
            rr = jnp.pad(rr, pads)
        starts = [0, 0, 0]
        starts[axis] = lo - 2
        ii = [
            jax.lax.broadcasted_iota(jnp.int32, rr.shape, a) + starts[a]
            for a in range(3)
        ]
        inbox = None
        for a in range(3):
            b = (ii[a] >= 0) & (ii[a] <= lm - 1)
            inbox = b if inbox is None else inbox & b
        rz = jnp.where(inbox, rr, 0.0)
        ct, cp = _p2_parity_class_flats(ii, lm)
        tmask = ii[axis] == lo
        for a in range(axis):
            tmask = tmask & (ii[a] >= 1) & (ii[a] <= lm - 2)
        tmask = tmask & inbox
        out = jnp.float32(0.0)
        for k, off in enumerate(offsets):
            dw = t64[k][ct] - t64[k][cp]
            src = jnp.roll(rz, tuple(-o for o in off), axis=(0, 1, 2))
            out = out + jnp.sum(jnp.where(tmask, rz * dw * src, 0.0),
                                dtype=jnp.float32)
        return out

    for axis in range(3):
        for face_lo in (True, False):
            acc = acc + strip_term(axis, face_lo)
    return acc


def p2_mass_quad(r, lm, mass_parity_weights, m_offsets, m_tables,
                 interpret=False, include_shell=True):
    """q = r^T M r for the raw parity-table P2 mass operator (semantics
    of StencilOperator._apply_parity in 'raw' mode + dot): one rolling
    kernel pass over r plus the O(surface) shell delta.  Returns the
    scalar, or None when the shape doesn't admit the kernel."""
    Mz, My, Mx = r.shape
    if Mz % 2 or My % 8 or Mx % 128 or Mz - lm < 4:
        return None
    # Cropped lean storage (solver/hierarchy: in-plane extent lm-1, the
    # high-boundary plane dropped).  Contract: callers pass a residual
    # that VANISHES on every boundary row (the snap-jacobi P2 sweeps
    # guarantee it post-sweep) — then the shell delta is identically
    # zero (it is a sum over face rows weighted by r(face)) and the main
    # kernel's circular in-plane wraps land on the zero r of the
    # opposite boundary rows, so the cropped value equals the
    # full-layout r^T M r exactly.  Full layouts keep the shell delta
    # (rn_ref's r = b has nonzero Dirichlet rows).
    cropped = My == lm - 1 or Mx == lm - 1
    if not all(s == lm - 1 or s - lm >= 2 for s in (My, Mx)):
        return None          # shell rolls rely on >= 2 zero pad rows/cols
    tz = _pick_tz_p2_quad(Mz, My, Mx, r.dtype.itemsize)
    if tz == 0 or Mz // tz < 2:
        return None
    offs = tuple(map(tuple, m_offsets))
    wz = _weights_static(mass_parity_weights, offs)
    ws = tz + 4
    kernel = functools.partial(
        _p2_quad_kernel, Mz=Mz, My=My, Mx=Mx, lm=lm, tz=tz,
        offs=offs, wz=wz,
    )
    zb = jnp.zeros((1, 1), jnp.int32)
    parts = pl.pallas_call(
        kernel,
        grid=(Mz // tz,),
        in_specs=[
            pl.BlockSpec((1, 1), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((ws, My, Mx), r.dtype),
            pltpu.VMEM((2, tz, My, Mx), r.dtype),
            pltpu.VMEM((4, My, Mx), r.dtype),
            pltpu.SemaphoreType.DMA((3,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=127 * 1024 * 1024,
        ),
        interpret=interpret,
    )(zb, r)
    if cropped or not include_shell:
        # include_shell=False: caller certifies r vanishes on every
        # boundary row (the post-sweep snap-jacobi contract) — the
        # delta is then identically zero, and its ~90 small unfused
        # strip ops measured 4.1 s/call at the full 513^3 layout
        # (vs 44-86 ms for the kernel itself).
        return parts[0, 0]
    q_shell = _p2_shell_delta_quad(r, m_tables, offs, lm)
    return parts[0, 0] + q_shell


def p2_residual_mass_quad(v, f, lm, a_parity_weights, a_offsets,
                          m_parity_weights, m_offsets, m_tables,
                          interpret=False, include_shell=True):
    """q = r^T M r with r = f - A v on the parity-table P2 operator —
    the fused per-cycle FEM-L2 convergence check of P2 tolerance solves
    (two kernel passes: residual, then the mass quadratic form).  None
    off the fast path (caller falls back to the plain matvec).
    include_shell=False under the post-sweep snap contract (see
    p2_mass_quad)."""
    r = p2_residual(v, f, lm, a_parity_weights, a_offsets,
                    interpret=interpret)
    if r is None:
        return None
    return p2_mass_quad(r, lm, m_parity_weights, m_offsets, m_tables,
                        interpret=interpret, include_shell=include_shell)
