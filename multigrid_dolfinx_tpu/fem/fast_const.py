"""O(1)-host-memory hierarchy construction for constant-coefficient P1.

The general assembler (fem.assembly) materializes K numpy planes per level
— at 100M+ DOFs that is tens of GB of host work for operators whose
interior rows are all identical.  For constant-coefficient P1 Poisson the
entire level is determined by translation-invariant data:

  * the interior stencil weights (5-point 2D / 7-point 3D),
  * the raw (pre-elimination) weights used for lifting,
  * a tiny per-boundary-class table T for the raw load vector: the value
    of \\int phi_i f depends only on which domain faces clip the node's
    support, i.e. on the per-axis class (low edge / interior / high edge),

all extracted once from a small assembled prototype grid (n=4) and applied
ON DEVICE with iota masks:

    b_raw[p] = f * h^d * T[class(p)]
    b       = where(bc, g, b_raw - A_raw g),   g = u*(x_p) on bc

so a 512^3 level is built without any host-side O(N) array.  The resulting
Level uses plane-free const operators (ops.operators.StencilOperator with
planes=None): the 7-point operator on a 100M-point grid costs zero HBM.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ProblemSpec
from ..mesh import GridLevel
from ..ops.operators import box_interior_mask, detect_const_stencil
from . import assembly as fa


@dataclasses.dataclass(frozen=True)
class ConstTemplate:
    """Translation-invariant level data extracted from a prototype grid.

    Weights are those of the prototype spacing h0 = 1/proto_n; stiffness
    entries scale with h^(d-2), so levels rescale by (h/h0)^(d-2)."""

    ndim: int
    proto_n: int
    offsets: Tuple[Tuple[int, ...], ...]
    weights: Tuple[float, ...]        # eliminated interior weights (at h0)
    raw_weights: Tuple[float, ...]    # pre-elimination weights (at h0)
    load_table: np.ndarray            # (3,)*ndim class table: b_raw/(f h^d)
    rhs_const: float


def build_const_template(problem: ProblemSpec) -> ConstTemplate:
    """Assemble a small prototype grid and extract the invariant data."""
    if problem.degree != 1 or problem.kappa is not None:
        raise ValueError("const template requires constant-coefficient P1")
    if problem.rhs_const is None:
        raise ValueError("const template requires a constant RHS")
    n0 = 4
    grid = GridLevel(level=0, ndim=problem.ndim, n=n0)
    asm = fa.assemble_level(grid, problem)
    w = detect_const_stencil(asm.offsets, asm.A_planes, asm.interior,
                             boundary_mode="identity")
    if w is None:
        raise ValueError("prototype stiffness is not interior-constant")
    # raw weights: sample a deep-interior row of the raw planes
    center = tuple(n0 // 2 for _ in range(problem.ndim))
    raw_w = tuple(float(asm.A_raw_planes[k][center])
                  for k in range(len(asm.offsets)))
    # load class table from the raw (no-BC) load of the prototype:
    # b_raw/(f h^d) depends only on which domain faces clip the node's
    # support -> per-axis class in {low edge, interior, high edge}
    h = grid.h
    scale = problem.rhs_const * h ** problem.ndim
    b_pure = _raw_load(grid, problem)
    table = np.zeros((3,) * problem.ndim)
    idx_of_class = {0: 0, 1: 1, 2: n0}   # low edge, interior, high edge
    for cls in np.ndindex(*(3,) * problem.ndim):
        p = tuple(idx_of_class[c] for c in cls)
        table[cls] = b_pure[p] / scale
    return ConstTemplate(
        ndim=problem.ndim,
        proto_n=n0,
        offsets=asm.offsets,
        weights=w,
        raw_weights=raw_w,
        load_table=table,
        rhs_const=problem.rhs_const,
    )


def _raw_load(grid: GridLevel, problem: ProblemSpec) -> np.ndarray:
    """Raw (no-BC) load vector of the prototype grid."""
    from . import elements

    ndim, n, h = grid.ndim, grid.n, grid.h
    simplices = fa.simplex_vertex_offsets(ndim, problem.diagonal)
    qbary, qw = (
        elements.triangle_quadrature() if ndim == 2
        else elements.tet_quadrature()
    )
    b = np.zeros(grid.shape)
    f = problem.rhs_const
    for voffs in simplices:
        verts = np.asarray([[c * h for c in v] for v in voffs])
        vol = (elements.triangle_area(*verts) if ndim == 2
               else elements.tet_volume(*verts))
        for q in range(len(qw)):
            for a in range(ndim + 1):
                slab = tuple(slice(r, r + n) for r in voffs[a])
                b[slab] += vol * qw[q] * qbary[q, a] * f
    return b


def mass_class_tables(problem: ProblemSpec, n0: int = 4):
    """Extract the consistent-mass boundary-class tables from a prototype
    grid: M[p, p+off] depends only on which domain faces clip the support
    of the edge (p, p+off), i.e. on p's per-axis class.  Verified exactly
    against the assembled prototype.  Returns (offsets, tables (K, 3^d))
    at prototype spacing h0 = 1/n0; mass scales as h^d."""
    grid = GridLevel(level=0, ndim=problem.ndim, n=n0)
    asm = fa.assemble_level(grid, problem)
    ndim = problem.ndim
    idx_of_class = {0: 0, 1: 1, 2: n0}
    K = len(asm.M_offsets)
    tables = np.zeros((K, 3 ** ndim))
    for k in range(K):
        plane = asm.M_planes[k]
        recon = np.zeros_like(plane)
        for flat, cls in enumerate(np.ndindex(*(3,) * ndim)):
            p = tuple(idx_of_class[c] for c in cls)
            tables[k, flat] = plane[p]
        # verify class-constancy: reconstruct and compare
        axes_cls = []
        for ax in range(ndim):
            i = np.arange(grid.points_per_dim)
            axes_cls.append(np.where(i == 0, 0, np.where(i == n0, 2, 1)))
        grids_cls = np.meshgrid(*axes_cls, indexing="ij")
        flat_cls = np.zeros(grid.shape, dtype=np.int64)
        for g in grids_cls:
            flat_cls = flat_cls * 3 + g
        recon = tables[k].reshape(-1)[flat_cls]
        if not np.allclose(recon, plane, atol=1e-15):
            raise ValueError("mass matrix is not boundary-class constant")
    return asm.M_offsets, tables


def _axis_class(shape, axis, lm, dtype=jnp.int32):
    """Per-axis boundary class: 0 at index 0, 2 at index lm-1, 1 inside;
    padding (index >= lm) classed 1 but masked out separately."""
    i = jax.lax.broadcasted_iota(jnp.int32, shape, axis)
    return jnp.where(i == 0, 0, jnp.where(i == lm - 1, 2, 1))


def device_level_arrays(
    template: ConstTemplate,
    grid: GridLevel,
    problem: ProblemSpec,
    dtype,
    pad_points: Optional[Tuple[int, ...]] = None,
):
    """Build (b, g) for a level entirely on device (no host O(N) arrays).

    Requires a jnp-traceable manufactured solution (the built-in
    polynomial defaults are)."""
    ndim = grid.ndim
    lm = grid.points_per_dim
    shape = tuple(pad_points) if pad_points is not None else grid.shape
    h = grid.h
    exact_fn = problem.resolved_exact()

    def build():
        coords = [
            jax.lax.broadcasted_iota(jnp.int32, shape, ax).astype(dtype) * h
            for ax in range(ndim)
        ]
        inbox = None
        for ax in range(ndim):
            i = jax.lax.broadcasted_iota(jnp.int32, shape, ax)
            g_ax = i <= lm - 1
            inbox = g_ax if inbox is None else inbox & g_ax
        interior = box_interior_mask(shape, lm)
        bc = inbox & (~interior)

        uD = exact_fn(*coords).astype(dtype)
        g = jnp.where(bc, uD, jnp.zeros(shape, dtype))

        # raw load from the class table
        table = jnp.asarray(template.load_table, dtype=dtype)
        cls = None
        for ax in range(ndim):
            c = _axis_class(shape, ax, lm)
            cls = c if cls is None else cls * 3 + c
        b_raw = (template.rhs_const * h ** ndim) * table.reshape(-1)[cls]
        b_raw = jnp.where(inbox, b_raw, jnp.zeros(shape, dtype))

        # lifting: b <- b_raw - A_raw g  (raw stencil, no masking — g is
        # zero away from bc so only near-boundary rows change).  Raw
        # stiffness weights scale with h^(d-2) relative to the prototype.
        # gp is built from the LOGICAL grid's boundary values, not by
        # zero-padding the stored g: with cropped storage (pad_points
        # smaller than the logical grid — solver/hierarchy.py
        # crop_storage) the high-boundary node planes are not stored, yet
        # their Dirichlet values must still be lifted into the adjacent
        # interior rows.  For full storage this reproduces pad(g, r)
        # exactly.
        wscale = (h * template.proto_n) ** (ndim - 2)
        r = max(max(abs(c) for c in off) for off in template.offsets)
        gp_shape = tuple(max(s + 2 * r, lm + 2 * r) for s in shape)
        gp_coords = [
            (jax.lax.broadcasted_iota(jnp.int32, gp_shape, ax) - r)
            .astype(dtype) * h
            for ax in range(ndim)
        ]
        gp_inbox = None
        gp_interior = None
        for ax in range(ndim):
            i = jax.lax.broadcasted_iota(jnp.int32, gp_shape, ax) - r
            inb = (i >= 0) & (i <= lm - 1)
            intr = (i >= 1) & (i <= lm - 2)
            gp_inbox = inb if gp_inbox is None else gp_inbox & inb
            gp_interior = intr if gp_interior is None else gp_interior & intr
        gp_bc = gp_inbox & (~gp_interior)
        gp = jnp.where(gp_bc, exact_fn(*gp_coords).astype(dtype),
                       jnp.zeros(gp_shape, dtype))
        ag = None
        for k, off in enumerate(template.offsets):
            w = template.raw_weights[k] * wscale
            if w == 0.0:
                continue
            sl = tuple(slice(r + o, r + o + s) for o, s in zip(off, shape))
            term = w * gp[sl]
            ag = term if ag is None else ag + term
        b = b_raw - ag
        b = jnp.where(bc, uD, b)
        b = jnp.where(inbox, b, jnp.zeros(shape, dtype))
        return b, g

    return jax.jit(build)()
