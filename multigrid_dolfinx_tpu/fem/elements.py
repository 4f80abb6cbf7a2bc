"""Reference-element matrices and quadrature for simplicial P1/P2 FEM.

This module replaces the UFL/FFCx form-compiler + generated-C kernels the
reference leans on (Multigrid_prototype.py:88-110): instead of compiling
symbolic forms at runtime, the handful of element integrals a structured
Poisson hierarchy needs are computed directly from vertex coordinates with
numpy, ahead of time.  Everything here is setup-path code (never traced by
JAX); exactness is what matters.
"""
from __future__ import annotations

from typing import Tuple

import numpy as np


# ----------------------------------------------------------------------
# Triangles (2D)
# ----------------------------------------------------------------------

def triangle_area(p0, p1, p2) -> float:
    return 0.5 * abs(
        (p1[0] - p0[0]) * (p2[1] - p0[1]) - (p2[0] - p0[0]) * (p1[1] - p0[1])
    )


def p1_triangle_stiffness(p0, p1, p2, kappa: float = 1.0) -> np.ndarray:
    """3x3 P1 stiffness matrix  K_ab = kappa * \\int_T grad(phi_a).grad(phi_b).

    Same integral UFL assembles for `dot(grad(u), grad(v))*dx`
    (reference Multigrid_prototype.py:91), evaluated in closed form:
    grad(lambda_a) is constant on T.
    """
    p = np.asarray([p0, p1, p2], dtype=np.float64)
    # Edge vectors opposite each vertex: e_a = p_{a+2} - p_{a+1} (mod 3).
    e = np.asarray([p[(a + 2) % 3] - p[(a + 1) % 3] for a in range(3)])
    area = triangle_area(p0, p1, p2)
    # grad(lambda_a) = rot90(e_a) / (2*area) with rot90 (x,y)->(-y,x);
    # K_ab = area * grad_a . grad_b = (e_a . e_b) / (4*area).
    grads = np.stack([[-e[:, 1], e[:, 0]]], axis=0)[0].T / (2.0 * area)
    return kappa * area * (grads @ grads.T)


def p1_triangle_mass(p0, p1, p2) -> np.ndarray:
    """3x3 consistent P1 mass matrix  M_ab = \\int_T phi_a phi_b
    = area/12 * (1 + delta_ab)."""
    area = triangle_area(p0, p1, p2)
    return (area / 12.0) * (np.ones((3, 3)) + np.eye(3))


def p1_triangle_load_const(p0, p1, p2, f: float) -> np.ndarray:
    """Length-3 load vector for a constant source:  b_a = f * area / 3
    (the integral UFL assembles for `f*v*dx`, Multigrid_prototype.py:100)."""
    area = triangle_area(p0, p1, p2)
    return np.full(3, f * area / 3.0)


# Dunavant 7-point rule, exact through polynomial degree 5 on the triangle.
# Barycentric coordinates (l0, l1, l2) and weights summing to 1.
_DUNAVANT7_BARY = np.array(
    [
        [1.0 / 3.0, 1.0 / 3.0, 1.0 / 3.0],
        [0.797426985353087, 0.101286507323456, 0.101286507323456],
        [0.101286507323456, 0.797426985353087, 0.101286507323456],
        [0.101286507323456, 0.101286507323456, 0.797426985353087],
        [0.059715871789770, 0.470142064105115, 0.470142064105115],
        [0.470142064105115, 0.059715871789770, 0.470142064105115],
        [0.470142064105115, 0.470142064105115, 0.059715871789770],
    ]
)
_DUNAVANT7_W = np.array(
    [
        0.225,
        0.125939180544827,
        0.125939180544827,
        0.125939180544827,
        0.132394152788506,
        0.132394152788506,
        0.132394152788506,
    ]
)


def triangle_quadrature(degree5: bool = True) -> Tuple[np.ndarray, np.ndarray]:
    """(barycentric points (Q,3), weights (Q,)) — weights sum to 1; multiply
    by the triangle area for physical integrals."""
    return _DUNAVANT7_BARY, _DUNAVANT7_W


# ----------------------------------------------------------------------
# Tetrahedra (3D)
# ----------------------------------------------------------------------

def tet_volume(p0, p1, p2, p3) -> float:
    p = np.asarray([p0, p1, p2, p3], dtype=np.float64)
    return abs(np.linalg.det(p[1:] - p[0])) / 6.0


def p1_tet_stiffness(p0, p1, p2, p3, kappa: float = 1.0) -> np.ndarray:
    """4x4 P1 stiffness on a tetrahedron (closed form via barycentric
    gradients)."""
    p = np.asarray([p0, p1, p2, p3], dtype=np.float64)
    vol = tet_volume(p0, p1, p2, p3)
    # Solve for gradients: [1 x y z] basis -> lambda_a affine with
    # lambda_a(p_b) = delta_ab.
    Amat = np.hstack([np.ones((4, 1)), p])          # (4, 4)
    coeffs = np.linalg.inv(Amat)                    # rows: [c, gx, gy, gz] per basis? columns
    grads = coeffs[1:, :].T                         # (4, 3): grad of lambda_a
    return kappa * vol * (grads @ grads.T)


def p1_tet_mass(p0, p1, p2, p3) -> np.ndarray:
    """4x4 consistent P1 mass matrix = vol/20 * (1 + delta_ab)."""
    vol = tet_volume(p0, p1, p2, p3)
    return (vol / 20.0) * (np.ones((4, 4)) + np.eye(4))


def p1_tet_load_const(p0, p1, p2, p3, f: float) -> np.ndarray:
    vol = tet_volume(p0, p1, p2, p3)
    return np.full(4, f * vol / 4.0)


# Keast 11-point rule on the tetrahedron, exact through degree 4.
_KEAST11_BARY = None
_KEAST11_W = None


def _build_keast11():
    global _KEAST11_BARY, _KEAST11_W
    pts, ws = [], []
    # centroid
    pts.append([0.25, 0.25, 0.25, 0.25])
    ws.append(-0.078933333333333)
    # 4 points (a, b, b, b), a = 0.785714285714286, b = 0.071428571428571
    a, b = 0.785714285714286, 0.071428571428571
    for i in range(4):
        q = [b] * 4
        q[i] = a
        pts.append(q)
        ws.append(0.045733333333333)
    # 6 points (c, c, d, d) permutations, c = 0.399403576166799,
    # d = 0.100596423833201
    c, d = 0.399403576166799, 0.100596423833201
    import itertools

    seen = set()
    for perm in itertools.permutations([c, c, d, d]):
        if perm in seen:
            continue
        seen.add(perm)
        pts.append(list(perm))
        ws.append(0.149333333333333 / 1.0)
    _KEAST11_BARY = np.array(pts)
    _KEAST11_W = np.array(ws)
    # Normalize: Keast weights are w.r.t. reference tet volume 1/6; we store
    # weights that sum to 1 (multiply by physical volume at use sites).
    _KEAST11_W = _KEAST11_W / _KEAST11_W.sum()


_build_keast11()


def tet_quadrature() -> Tuple[np.ndarray, np.ndarray]:
    """(barycentric points (Q,4), weights (Q,) summing to 1)."""
    return _KEAST11_BARY, _KEAST11_W


# ----------------------------------------------------------------------
# Generic nodal simplex elements (P1 / P2) via quadrature
# ----------------------------------------------------------------------

def simplex_nodes(ndim: int, degree: int):
    """Element node positions in *lattice units* (vertices scaled by
    `degree`) for a simplex given by vertex offsets — returned as a
    function of the vertex-offset list."""
    if degree == 1:
        return lambda voffs: [tuple(degree * c for c in v) for v in voffs]

    def nodes(voffs):
        vs = [tuple(degree * c for c in v) for v in voffs]
        out = list(vs)
        nv = len(vs)
        for i in range(nv):
            for j in range(i + 1, nv):
                out.append(tuple((a + b) // 2 for a, b in zip(vs[i], vs[j])))
        return out

    return nodes


def _edge_pairs(nv: int):
    return [(i, j) for i in range(nv) for j in range(i + 1, nv)]


def nodal_basis_at(bary: np.ndarray, degree: int) -> np.ndarray:
    """Values of the nodal basis at barycentric points.

    bary: (Q, d+1).  Returns (Q, nb) with node order [vertices...,
    midpoints(i<j)...] matching simplex_nodes."""
    Q, nv = bary.shape
    if degree == 1:
        return bary.copy()
    cols = [bary[:, i] * (2.0 * bary[:, i] - 1.0) for i in range(nv)]
    for (i, j) in _edge_pairs(nv):
        cols.append(4.0 * bary[:, i] * bary[:, j])
    return np.stack(cols, axis=1)


def nodal_basis_grad_bary(bary: np.ndarray, degree: int) -> np.ndarray:
    """d(phi_a)/d(lambda_k) at barycentric points: (Q, nb, d+1)."""
    Q, nv = bary.shape
    if degree == 1:
        out = np.zeros((Q, nv, nv))
        for i in range(nv):
            out[:, i, i] = 1.0
        return out
    nb = nv + len(_edge_pairs(nv))
    out = np.zeros((Q, nb, nv))
    for i in range(nv):
        out[:, i, i] = 4.0 * bary[:, i] - 1.0
    for a, (i, j) in enumerate(_edge_pairs(nv)):
        out[:, nv + a, i] = 4.0 * bary[:, j]
        out[:, nv + a, j] = 4.0 * bary[:, i]
    return out


def barycentric_gradients(verts: np.ndarray) -> np.ndarray:
    """grad(lambda_k) for a simplex with vertex rows `verts` ((d+1, d))."""
    d = verts.shape[1]
    A = np.hstack([np.ones((d + 1, 1)), verts])
    C = np.linalg.inv(A)
    return C[1:, :].T        # (d+1, d)


def simplex_element_matrices(verts: np.ndarray, degree: int,
                             kappa: float = 1.0):
    """(stiffness, mass, volume) for a P`degree` simplex via quadrature
    (exact: integrands are degree <= 4 and the rules are degree 4/5)."""
    d = verts.shape[1]
    if d == 2:
        qb, qw = triangle_quadrature()
        vol = triangle_area(*verts)
    else:
        qb, qw = tet_quadrature()
        vol = tet_volume(*verts)
    gl = barycentric_gradients(verts)            # (d+1, d)
    phi = nodal_basis_at(qb, degree)             # (Q, nb)
    dphi = nodal_basis_grad_bary(qb, degree)     # (Q, nb, d+1)
    grads = dphi @ gl                            # (Q, nb, d)
    K = vol * np.einsum("q,qad,qbd->ab", qw, grads, grads)
    M = vol * np.einsum("q,qa,qb->ab", qw, phi, phi)
    return kappa * K, M, vol
