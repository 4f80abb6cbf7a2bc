"""FEM L2 norms as device-resident reductions.

The reference computes its convergence-critical norms by round-tripping
vectors through dolfinx Functions and C++ quadrature every V-cycle
(multigrid.py:203-218: res_calculator / err_calculator).  Both are exactly
quadratic functionals of the nodal vector, so the TPU build precomputes
their coefficients once and evaluates them on device:

  * residual norm:  ||r||_{L2}^2 = r^T M r          (M = consistent P1 mass)
  * error norm:     ||u_h - u*||_{L2}^2 = u^T M u - 2 c^T u + d
        with  c_i = \\int phi_i u* dx,   d = \\int (u*)^2 dx,
    where u* is the manufactured solution (the reference's "CG2 exact"
    interpolant, Multigrid_prototype.py:126-130 — exact for quadratics since
    u* itself is quadratic).

Matching these integral norms bit-for-bit in semantics is what makes the
V-cycle iteration counts reproducible (SURVEY.md §3.5).
"""
from __future__ import annotations

import dataclasses


import numpy as np

from ..config import ProblemSpec
from ..mesh import GridLevel
from . import elements
from .assembly import simplex_vertex_offsets


@dataclasses.dataclass
class ErrorFunctional:
    """Coefficients of ||u - u*||^2_{L2} = u^T M u - 2 c^T u + d.

    NOTE: this expanded form is exact but ill-conditioned when the error is
    small (terms O(||u*||^2) cancel down to O(err^2)); it is kept for golden
    tests.  The solver's error history uses ErrorQuadrature below, which
    squares the pointwise difference and has no cancellation."""

    c: np.ndarray   # grid-shaped
    d: float


@dataclasses.dataclass
class ErrorQuadrature:
    """Per-quadrature-point data for  ||u_h - u*||^2_{L2}
    = sum_{simplices} vol * sum_q w_q (u_h(x_q) - u*(x_q))^2.

    In exact arithmetic identical to the reference's
    assemble_scalar(inner(u - u_exact, u - u_exact)*dx)
    (multigrid.py:216-217) — the rule here is exact for quadratic u* — but
    numerically well-conditioned: the small pointwise error is formed
    first, then squared.

    Everything here is O(1) static metadata (tuples, jit-cache friendly);
    u*(x_q) is evaluated *on the fly* at norm time from `exact_fn` and the
    static quad-point coordinates — no (S, Q, n, .., n) ustar buffer (which
    would cost 66 extra grid copies in 3D and forced lean mode to drop the
    error norm entirely in round 1):
      voffs[s][a]     : integer *lattice* offsets of node a of simplex s
      lambdas[s][q][a]: basis value phi_a at quad point q (P1: barycentric)
      vw[s][q]        : vol_s * w_q
      xq_local[s][q]  : physical offset of quad point q inside the cell
      h               : element size (cell origin = index * h)
      ncells          : logical element cells per dim
      exact_fn        : manufactured solution; traceable (plain arithmetic),
                        so it evaluates on device under jit
      stride          : lattice step between element cells (= degree)
    """

    voffs: tuple
    lambdas: tuple
    vw: tuple
    xq_local: tuple
    h: float
    ncells: int
    exact_fn: object
    stride: int = 1


def error_functional(grid: GridLevel, problem: ProblemSpec) -> ErrorFunctional:
    """Precompute c and d by per-simplex quadrature (degree-5 rule in 2D /
    degree-4 in 3D — exact for the reference's quadratic u*)."""
    ndim, n, h = grid.ndim, grid.n, grid.h
    exact_fn = problem.resolved_exact()
    simplices = simplex_vertex_offsets(ndim, problem.diagonal)
    qbary, qw = (
        elements.triangle_quadrature() if ndim == 2 else elements.tet_quadrature()
    )

    cell_axes = [np.arange(n, dtype=np.float64) * h for _ in range(ndim)]
    cell_origin = np.meshgrid(*cell_axes, indexing="ij")

    c = np.zeros(grid.shape, dtype=np.float64)
    d = 0.0
    nv = ndim + 1
    for voffs in simplices:
        verts_phys = np.asarray([[cc * h for cc in v] for v in voffs])
        vol = (
            elements.triangle_area(*verts_phys)
            if ndim == 2
            else elements.tet_volume(*verts_phys)
        )
        for q in range(len(qw)):
            xq_local = qbary[q] @ verts_phys
            xq = [co + xo for co, xo in zip(cell_origin, xq_local)]
            uq = exact_fn(*xq)                       # (n,..,n)
            d += vol * qw[q] * float(np.sum(uq * uq))
            for a in range(nv):
                slab = tuple(slice(r, r + n) for r in voffs[a])
                c[slab] += vol * qw[q] * qbary[q, a] * uq
    return ErrorFunctional(c=c, d=d)


def error_quadrature(grid: GridLevel, problem: ProblemSpec) -> ErrorQuadrature:
    """Precompute the per-quadrature-point error-norm data (see
    ErrorQuadrature).  `grid` is the *element* grid (n cells per dim); for
    degree 2 the nodal slabs are strided over the DOF lattice."""
    ndim, n, h = grid.ndim, grid.n, grid.h
    degree = problem.degree
    exact_fn = problem.resolved_exact()
    simplices = simplex_vertex_offsets(ndim, problem.diagonal)
    node_fn = elements.simplex_nodes(ndim, degree)
    qbary, qw = (
        elements.triangle_quadrature() if ndim == 2 else elements.tet_quadrature()
    )
    phi_q_all = elements.nodal_basis_at(qbary, degree)     # (Q, nb)

    S, Q = len(simplices), len(qw)
    vws = []
    lambdas = []
    noffs_all = []
    xq_locals = []
    for s, voffs in enumerate(simplices):
        verts_phys = np.asarray([[cc * h for cc in v] for v in voffs])
        vol = (
            elements.triangle_area(*verts_phys)
            if ndim == 2
            else elements.tet_volume(*verts_phys)
        )
        noffs = node_fn(voffs)
        nb = len(noffs)
        noffs_all.append(tuple(tuple(v) for v in noffs))
        vws.append(tuple(float(vol * qw[q]) for q in range(Q)))
        lambdas.append(
            tuple(tuple(float(phi_q_all[q, a]) for a in range(nb))
                  for q in range(Q))
        )
        xq_locals.append(
            tuple(tuple(float(x) for x in (qbary[q] @ verts_phys))
                  for q in range(Q))
        )
    return ErrorQuadrature(
        voffs=tuple(noffs_all),
        lambdas=tuple(lambdas),
        vw=tuple(vws),
        xq_local=tuple(xq_locals),
        h=float(h),
        ncells=int(n),
        exact_fn=exact_fn,
        stride=degree,
    )
