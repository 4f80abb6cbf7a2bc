"""Ahead-of-time FEM assembly on structured simplicial grids -> stencil planes.

Replaces the reference's dolfinx/PETSc assembly pipeline
(Multigrid_prototype.py:88-110: `assemble_matrix(a, bcs)`, CSR export,
`assemble_vector` + `apply_lifting` + `set_bc`) with direct numpy assembly
into *stencil-plane* form: the operator at grid node p is

    (A u)[p] = sum_k  planes[k][p] * u[p + offsets[k]]

i.e. a variable-coefficient compact stencil.  On a structured simplicial
grid every P1 operator (stiffness, mass, Galerkin-coarsened stiffness) fits
this form with |offsets| <= 9 (2D) / <= 15 (3D Kuhn) — which is exactly the
padded-ELL layout a TPU wants: K dense coefficient planes, unit-stride
access, no indices, no gather.

All of this runs once at setup time (the analogue of the reference's
hierarchy-construction loop, Multigrid_prototype.py:62-118) and the planes
are then shipped to the device.
"""
from __future__ import annotations

import dataclasses
import itertools
from typing import Dict, List, Sequence, Tuple

import numpy as np

from ..config import ProblemSpec
from ..mesh import GridLevel
from . import elements


Offset = Tuple[int, ...]


# ----------------------------------------------------------------------
# Cell -> simplex decompositions
# ----------------------------------------------------------------------

def simplex_vertex_offsets(ndim: int, diagonal: str = "right") -> List[List[Offset]]:
    """Vertex offsets (integer corner coordinates of the unit cell) of each
    simplex in the decomposition of one grid cell.

    2D: two triangles per square.  `diagonal='right'` splits along the
    (0,0)-(1,1) diagonal (the convention dolfinx's UnitSquareMesh uses for
    its default 'right' diagonal, cf. reference Multigrid_prototype.py:65-66);
    'left' splits along (1,0)-(0,1).

    3D: Kuhn/Freudenthal decomposition into 6 tetrahedra all sharing a
    main diagonal: (0,0,0)-(1,1,1) for `diagonal='right'`, the x-mirrored
    (1,0,0)-(0,1,1) for 'left' (the uniform mirrored Kuhn mesh — the
    analogue of dolfinx's alternative cube diagonal directions; conforming
    because every cell uses the same affine relabeling).
    """
    if ndim == 2:
        if diagonal == "right":
            return [
                [(0, 0), (1, 0), (1, 1)],
                [(0, 0), (1, 1), (0, 1)],
            ]
        elif diagonal == "left":
            return [
                [(0, 0), (1, 0), (0, 1)],
                [(1, 0), (1, 1), (0, 1)],
            ]
        raise ValueError(f"bad diagonal {diagonal!r}")
    if ndim == 3:
        simplices = []
        for perm in itertools.permutations(range(3)):
            v = [(0, 0, 0)]
            cur = [0, 0, 0]
            for axis in perm:
                cur = list(cur)
                cur[axis] = 1
                v.append(tuple(cur))
            simplices.append(v)
        if diagonal == "left":
            simplices = [
                [(1 - vx, vy, vz) for (vx, vy, vz) in s] for s in simplices
            ]
        elif diagonal != "right":
            raise ValueError(f"bad diagonal {diagonal!r}")
        return simplices
    raise ValueError(f"ndim must be 2 or 3, got {ndim}")


def _element_matrices(ndim: int, h: float, voffs: List[Offset],
                      degree: int = 1):
    """(stiffness, mass, volume) element matrices for one simplex of the
    scaled cell (closed-form for P1, quadrature — still exact — for P2)."""
    pts = [tuple(c * h for c in v) for v in voffs]
    if degree == 1:
        if ndim == 2:
            K = elements.p1_triangle_stiffness(*pts)
            M = elements.p1_triangle_mass(*pts)
            vol = elements.triangle_area(*pts)
        else:
            K = elements.p1_tet_stiffness(*pts)
            M = elements.p1_tet_mass(*pts)
            vol = elements.tet_volume(*pts)
        return K, M, vol
    K, M, vol = elements.simplex_element_matrices(
        np.asarray(pts, dtype=np.float64), degree
    )
    return K, M, vol


# ----------------------------------------------------------------------
# Stencil-plane accumulation
# ----------------------------------------------------------------------

class PlaneAccumulator:
    """Accumulates element-matrix entries into {offset: plane} numpy arrays.

    `stride` is the lattice spacing of element cells: 1 for P1 (nodes =
    grid points), `degree` for higher order (nodes live on the refined
    lattice; cell (i, j) anchors at lattice point (stride*i, stride*j))."""

    def __init__(self, shape: Tuple[int, ...], stride: int = 1):
        self.shape = shape
        self.stride = stride
        self.planes: Dict[Offset, np.ndarray] = {}

    def _plane(self, off: Offset) -> np.ndarray:
        if off not in self.planes:
            self.planes[off] = np.zeros(self.shape, dtype=np.float64)
        return self.planes[off]

    def add(self, row_voff: Offset, col_voff: Offset, value, n: int):
        """Add `value` (scalar or (n,..,n) per-cell array) to the stencil
        entry (node = stride*cell + row_voff) ->
        (node + (col_voff - row_voff)), for every cell of the n^d cell
        grid.  Offsets are in lattice units."""
        off = tuple(c - r for r, c in zip(row_voff, col_voff))
        st = self.stride
        slab = tuple(slice(r, r + st * (n - 1) + 1, st) for r in row_voff)
        self._plane(off)[slab] += value

    def finalize(self) -> Tuple[Tuple[Offset, ...], np.ndarray]:
        """Sorted (offsets, planes-array) with (numerically) zero planes
        dropped and the center offset guaranteed present.  The prune uses a
        relative threshold: couplings that cancel exactly in exact
        arithmetic (e.g. the diagonal couplings of the isotropic Kuhn-tet
        Laplacian) leave ~1e-17 summation dust that must not survive as
        spurious stencil legs."""
        zero = (0,) * len(self.shape)
        self._plane(zero)
        # ONE max-magnitude scan per plane via the (min, max) pair —
        # np.abs(p).max() materializes a full-plane temp, and with P2's
        # 125 offsets these scans dominated the whole build (21 of 23 s
        # of assemble_level at 32^3 cells P2).
        amax = {
            o: max(float(p.max(initial=0.0)), -float(p.min(initial=0.0)))
            for o, p in self.planes.items()
        }
        scale = max(amax.values(), default=1.0)
        tol = 1e-13 * max(scale, 1e-300)
        offs = [
            o for o in sorted(self.planes.keys())
            if o == zero or amax[o] > tol
        ]
        planes = np.stack([self.planes[o] for o in offs], axis=0)
        # zero out the dust inside kept planes as well (plane-at-a-time:
        # the stacked-array boolean temp was another full-size pass)
        for k in range(planes.shape[0]):
            pk = planes[k]
            pk[np.abs(pk) <= tol] = 0.0
        return tuple(offs), planes


def stencil_apply_np(offsets: Sequence[Offset], planes: np.ndarray,
                     u: np.ndarray) -> np.ndarray:
    """Numpy reference implementation of the stencil matvec (used at setup
    time and as the oracle for the JAX/Pallas kernels)."""
    ndim = u.ndim
    r = max(max(abs(c) for c in off) for off in offsets)
    up = np.pad(u, r)
    out = np.zeros_like(u)
    for k, off in enumerate(offsets):
        sl = tuple(slice(r + o, r + o + s) for o, s in zip(off, u.shape))
        out += planes[k] * up[sl]
    return out


def stencil_to_csr(offsets: Sequence[Offset], planes: np.ndarray):
    """Stencil planes -> scipy CSR (setup/oracle/coarse-solve use only)."""
    import scipy.sparse as sp

    shape = planes.shape[1:]
    size = int(np.prod(shape))
    flat_index = np.arange(size).reshape(shape)
    rows, cols, vals = [], [], []
    for k, off in enumerate(offsets):
        src = tuple(
            slice(max(0, -o), min(s, s - o)) for o, s in zip(off, shape)
        )
        dst = tuple(
            slice(max(0, o), min(s, s + o)) for o, s in zip(off, shape)
        )
        v = planes[k][src]
        nz = v != 0.0
        rows.append(flat_index[src][nz])
        cols.append(flat_index[dst][nz])
        vals.append(v[nz])
    rows = np.concatenate(rows)
    cols = np.concatenate(cols)
    vals = np.concatenate(vals)
    return sp.csr_matrix((vals, (rows, cols)), shape=(size, size))


# ----------------------------------------------------------------------
# Level assembly
# ----------------------------------------------------------------------

@dataclasses.dataclass
class AssembledLevel:
    """Everything the solver needs for one grid level, as numpy arrays.

    The analogue of one iteration of the reference's hierarchy loop
    (Multigrid_prototype.py:62-118): A (BC-eliminated), raw A, full mass M,
    lifted RHS b, Dirichlet values g, and masks — but in stencil-plane grid
    form instead of PETSc CSR + coordinate dicts.

    For degree > 1, `grid` is the DOF *lattice* (degree*n cells per dim):
    P2 unknowns (vertices + edge midpoints) all live on the half-step
    lattice, so downstream machinery (masks, transfers, coarse solve) is
    degree-agnostic.
    """

    grid: GridLevel
    offsets: Tuple[Offset, ...]
    A_planes: np.ndarray          # BC-eliminated stiffness (symmetric)
    A_raw_planes: np.ndarray      # pre-elimination stiffness (for lifting/RAP)
    M_offsets: Tuple[Offset, ...]
    M_planes: np.ndarray          # full (no-BC) consistent mass matrix
    b: np.ndarray                 # RHS grid: assembled + lifting + set_bc
    g: np.ndarray                 # Dirichlet values at bc nodes, 0 elsewhere
    interior: np.ndarray          # bool mask
    diag: np.ndarray              # diagonal of eliminated A

    @property
    def shape(self) -> Tuple[int, ...]:
        return self.grid.shape


def assemble_level(grid: GridLevel, problem: ProblemSpec,
                   need_mass: bool = True) -> AssembledLevel:
    """Assemble stiffness/mass/load for one level with Dirichlet handling
    matching dolfinx semantics exactly:

      * `assemble_matrix(a, bcs=[bc])`: symmetric elimination — bc rows AND
        columns zeroed, bc diagonal set to 1 (Multigrid_prototype.py:92).
      * `apply_lifting`: b <- b - A_raw * g  (g = uD at bc nodes, 0 inside)
        (Multigrid_prototype.py:105).
      * `set_bc`: b <- uD at bc nodes (Multigrid_prototype.py:108).

    need_mass=False skips pruning/returning the consistent-mass planes
    (callers that use the boundary-class-table mass form instead — e.g.
    P1 hierarchies without a reaction term — save K full-grid passes and
    K planes of host memory per level; M_planes is then a single zero
    center plane).
    """
    ndim, n, h = grid.ndim, grid.n, grid.h
    degree = problem.degree
    # DOF lattice: P1 -> the grid itself; P2 -> half-step lattice.
    lat_grid = grid if degree == 1 else GridLevel(
        level=grid.level, ndim=ndim, n=degree * n
    )
    shape = lat_grid.shape
    simplices = simplex_vertex_offsets(ndim, problem.diagonal)
    node_fn = elements.simplex_nodes(ndim, degree)

    # Per-cell variable coefficient (evaluated at simplex centroids).
    kappa_fn = problem.kappa

    # Native (C++) fast path for P1 with constant RHS — the equivalent of
    # the reference's dolfinx/C++ assembly core (see csrc/assembler.cpp);
    # falls back to the vectorized numpy path below.
    if (degree == 1 and problem.rhs is None
            and problem.rhs_const is not None and problem.reaction == 0.0):
        from . import native

        kappa_cells = None
        if kappa_fn is not None:
            cell_axes_k = [np.arange(n) * h for _ in range(ndim)]
            orig = np.meshgrid(*cell_axes_k, indexing="ij")
            per_simplex = []
            for voffs in simplices:
                centroid = np.asarray(
                    [[c * h for c in v] for v in voffs]
                ).mean(axis=0)
                per_simplex.append(
                    kappa_fn(*[o + cc for o, cc in zip(orig, centroid)])
                    + np.zeros((n,) * ndim)
                )
            kappa_cells = np.stack(per_simplex, axis=0)
        out = native.native_assemble_p1(
            ndim, n, h, problem.diagonal, kappa_cells, problem.rhs_const
        )
        if out is not None:
            planes_full, massp_full, b = out
            full_offsets = sorted(
                itertools.product((-1, 0, 1), repeat=ndim)
            )
            zero_off = (0,) * ndim

            def _prune(planes, denoise=True):
                # one abs+max pass per plane (reused for keep AND scale),
                # in-place denoise on the kept planes only — the previous
                # whole-array abs temporaries dominated assembly time at
                # 128^3+ (~30 s of the 50 s build)
                amax = np.array([np.abs(p).max() for p in planes])
                scale = max(float(amax.max()), 1e-300)
                tol = 1e-13 * scale
                keep = [
                    k for k, off in enumerate(full_offsets)
                    if off == zero_off or amax[k] > tol
                ]
                kept = planes[keep]
                if denoise:
                    for p in kept:
                        np.copyto(p, 0.0, where=np.abs(p) <= tol)
                return tuple(full_offsets[k] for k in keep), kept

            # in-plane summation dust only matters when exact cancellation
            # makes whole couplings vanish (const coefficients); a truly
            # variable-coefficient operator never const-detects, so the
            # two extra full passes per plane are skipped
            A_offsets, A_raw_planes = _prune(
                planes_full, denoise=kappa_cells is None)
            if need_mass:
                M_offsets, M_planes = _prune(massp_full)
            else:
                M_offsets = (zero_off,)
                M_planes = np.zeros((1,) + planes_full.shape[1:])
            return _finish_level(
                lat_grid, problem, A_offsets, A_raw_planes,
                M_offsets, M_planes, b,
            )

    accA = PlaneAccumulator(shape, stride=degree)
    accM = PlaneAccumulator(shape, stride=degree)
    b = np.zeros(shape, dtype=np.float64)

    rhs_fn = problem.resolved_rhs()
    qbary, qw = (
        elements.triangle_quadrature() if ndim == 2 else elements.tet_quadrature()
    )

    cell_axes = [np.arange(n, dtype=np.float64) * h for _ in range(ndim)]
    cell_origin = np.meshgrid(*cell_axes, indexing="ij")   # each (n,..,n)

    for voffs in simplices:
        K, M, vol = _element_matrices(ndim, h, voffs, degree)
        verts_phys = np.asarray([[c * h for c in v] for v in voffs])  # (d+1, d)
        noffs = node_fn(voffs)                    # lattice offsets, nb nodes
        nb = len(noffs)
        phi_q = elements.nodal_basis_at(qbary, degree)     # (Q, nb)

        if kappa_fn is not None:
            centroid = verts_phys.mean(axis=0)
            kcell = kappa_fn(*[co + cc for co, cc in zip(cell_origin, centroid)])
        else:
            kcell = 1.0

        for a in range(nb):
            for bb in range(nb):
                accA.add(noffs[a], noffs[bb], K[a, bb] * kcell, n)
                accM.add(noffs[a], noffs[bb], M[a, bb], n)

        # Load vector via quadrature (exact for the reference's constant f,
        # general enough for arbitrary smooth f).
        st = degree
        for q in range(len(qw)):
            xq_local = qbary[q] @ verts_phys                 # (d,)
            xq = [co + xo for co, xo in zip(cell_origin, xq_local)]
            fq = rhs_fn(*xq)                                  # (n,..,n)
            for a in range(nb):
                slab = tuple(
                    slice(r, r + st * (n - 1) + 1, st) for r in noffs[a]
                )
                b[slab] += vol * qw[q] * phi_q[q, a] * fq

    A_offsets, A_raw_planes = accA.finalize()
    M_offsets, M_planes = accM.finalize()
    if problem.reaction != 0.0:
        # screened Poisson / reaction term: A <- A + c M (UFL form
        # kappa*grad(u).grad(v)*dx + c*u*v*dx)
        A_offsets, A_raw_planes = _merge_planes(
            A_offsets, A_raw_planes, M_offsets,
            problem.reaction * M_planes, lat_grid.shape,
        )
    return _finish_level(
        lat_grid, problem, A_offsets, A_raw_planes, M_offsets, M_planes, b
    )


def _shell_slabs(shape, r: int):
    """Disjoint slab decomposition of the boundary shell {p : some axis
    has p_a <= r or p_a >= s_a-1-r}: axis a contributes its two edge
    slabs restricted to the strict interior of all earlier axes, so every
    shell point lies in exactly one slab.  Requires min(shape) > 2r+1."""
    ndim = len(shape)
    mid = [slice(r + 1, s - 1 - r) for s in shape]
    slabs = []
    for a in range(ndim):
        for lo in (True, False):
            sl = []
            for b in range(ndim):
                if b < a:
                    sl.append(mid[b])
                elif b == a:
                    sl.append(slice(0, r + 1) if lo
                              else slice(shape[b] - 1 - r, shape[b]))
                else:
                    sl.append(slice(0, shape[b]))
            slabs.append(tuple(sl))
    return slabs


def apply_lifting_np(offsets, planes, g: np.ndarray,
                     b: np.ndarray) -> np.ndarray:
    """b <- b - A_raw g for boundary-supported g (dolfinx apply_lifting,
    Multigrid_prototype.py:105).  The update's support lies within the
    stencil radius of the boundary, so it runs on O(surface) shell slabs
    instead of the K full-grid passes of a dense matvec — at 256^3 that
    is the difference between ~20 s and milliseconds per level."""
    shape = g.shape
    r = max(max(abs(c) for c in off) for off in offsets)
    if min(shape) <= 2 * r + 1:
        return b - stencil_apply_np(offsets, planes, g)
    gp = np.pad(g, r)
    b = b.copy()
    for sl in _shell_slabs(shape, r):
        acc = None
        for k, off in enumerate(offsets):
            gsl = tuple(
                slice(s.start + r + o, s.stop + r + o)
                for s, o in zip(sl, off)
            )
            term = planes[k][sl] * gp[gsl]
            acc = term if acc is None else acc + term
        b[sl] -= acc
    return b


def eliminate_dirichlet_np(offsets, raw_planes: np.ndarray,
                           interior: np.ndarray) -> np.ndarray:
    """Symmetric Dirichlet elimination on stencil planes (zero bc rows and
    columns, unit diagonal — dolfinx assemble_matrix(bcs=...) semantics,
    Multigrid_prototype.py:92).  Elimination only changes entries within
    the stencil radius of the boundary, so beyond the one unavoidable
    copy it touches O(surface) shell slabs only."""
    shape = interior.shape
    ndim = len(shape)
    zero_off = (0,) * ndim
    offsets = tuple(map(tuple, offsets))
    center = offsets.index(zero_off)
    r = max(max(abs(c) for c in off) for off in offsets)
    planes = raw_planes.copy()
    if min(shape) <= 2 * r + 1:
        ipad = np.pad(interior, r, constant_values=False)
        for k, off in enumerate(offsets):
            planes[k] *= interior
            sl = tuple(slice(r + o, r + o + s)
                       for o, s in zip(off, shape))
            planes[k] *= ipad[sl]
        planes[center] = np.where(interior, planes[center], 1.0)
        return planes
    ipad = np.pad(interior, r, constant_values=False)
    for sl in _shell_slabs(shape, r):
        isl = interior[sl]
        for k, off in enumerate(offsets):
            nsl = tuple(
                slice(s.start + r + o, s.stop + r + o)
                for s, o in zip(sl, off)
            )
            planes[k][sl] *= isl & ipad[nsl]
        planes[center][sl] = np.where(isl, planes[center][sl], 1.0)
    return planes


def _merge_planes(offs_a, planes_a, offs_b, planes_b, shape):
    """Sum two stencil operators with (possibly) different offset sets."""
    acc = {}
    for k, off in enumerate(offs_a):
        acc[off] = planes_a[k].copy()
    for k, off in enumerate(offs_b):
        if off in acc:
            acc[off] = acc[off] + planes_b[k]
        else:
            acc[off] = planes_b[k].copy()
    offs = sorted(acc.keys())
    return tuple(offs), np.stack([acc[o] for o in offs], axis=0)


def _finish_level(
    lat_grid: GridLevel,
    problem: ProblemSpec,
    A_offsets,
    A_raw_planes: np.ndarray,
    M_offsets,
    M_planes: np.ndarray,
    b: np.ndarray,
) -> AssembledLevel:
    """Shared tail of assembly: Dirichlet values, lifting, set_bc, and
    symmetric elimination (dolfinx semantics, see assemble_level).
    Lifting/elimination touch only the boundary shell; the manufactured
    Dirichlet values evaluate on broadcast (sparse-meshgrid) coordinate
    axes — the dense per-node meshgrids and full-grid matvec the previous
    version used dominated 128^3+ build time."""
    ndim = lat_grid.ndim
    shape = lat_grid.shape
    interior = lat_grid.interior_mask()
    boundary = ~interior

    # Dirichlet values from the manufactured solution
    # (reference Multigrid_prototype.py:77-78).
    exact_fn = problem.resolved_exact()
    axes = [np.linspace(0.0, 1.0, s) for s in shape]
    try:
        vals = np.broadcast_to(
            exact_fn(*np.meshgrid(*axes, indexing="ij", sparse=True)),
            shape)
    except Exception:  # non-broadcasting user callable
        vals = exact_fn(*lat_grid.coords())
    g = np.where(boundary, vals, 0.0)

    # apply_lifting + set_bc.
    b = apply_lifting_np(A_offsets, A_raw_planes, g, b)
    b = np.where(boundary, g, b)

    # Symmetric elimination of bc rows/columns; identity on bc diagonal.
    A_planes = eliminate_dirichlet_np(A_offsets, A_raw_planes, interior)
    zero_off = (0,) * ndim
    center = A_offsets.index(zero_off)

    return AssembledLevel(
        grid=lat_grid,
        offsets=A_offsets,
        A_planes=A_planes,
        A_raw_planes=A_raw_planes,
        M_offsets=M_offsets,
        M_planes=M_planes,
        b=b,
        g=g,
        interior=interior,
        diag=A_planes[center].copy(),
    )


def assemble_hierarchy(grids: Sequence[GridLevel],
                       problem: ProblemSpec,
                       need_mass: bool = True) -> List[AssembledLevel]:
    """Assemble every level (the reference re-discretizes each level rather
    than Galerkin-coarsening — Multigrid_prototype.py:62; Galerkin RAP is the
    alternative path in fem.galerkin)."""
    return [assemble_level(g, problem, need_mass=need_mass) for g in grids]
