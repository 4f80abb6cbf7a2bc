"""Entry-by-entry golden validation of the assembled operators against an
EXACT-ARITHMETIC independent assembler (SURVEY §7 hard part (a)).

dolfinx itself cannot run in this container, so the golden is produced by
a from-scratch rational-arithmetic (fractions.Fraction) assembler below:
per-element dict-of-dict assembly over explicitly enumerated simplices,
exact barycentric gradients via rational Gaussian elimination — sharing
no code or data layout with multigrid_dolfinx_tpu.fem (which is
vectorized float64 numpy into stencil planes).  Every stiffness / mass /
load entry must agree to float64 roundoff, including the Dirichlet
elimination, lifting, and set_bc semantics of
reference Multigrid_prototype.py:88-110.

The one dolfinx convention that remains an assumption (documented in
fem/assembly.py) is which diagonal UnitSquareMesh('right') uses; both
conventions are implemented and exposed via ProblemSpec.diagonal.
"""
from fractions import Fraction

import numpy as np
import pytest

from multigrid_dolfinx_tpu.config import ProblemSpec
from multigrid_dolfinx_tpu.fem.assembly import (
    assemble_level,
    simplex_vertex_offsets,
    stencil_to_csr,
)
from multigrid_dolfinx_tpu.mesh import GridLevel


# ---------------------------------------------------------------------
# Exact rational linear algebra (tiny, only what the golden needs)
# ---------------------------------------------------------------------

def _rat_inv(mat):
    """Inverse of a small square Fraction matrix by Gauss-Jordan."""
    n = len(mat)
    a = [row[:] + [Fraction(int(i == j)) for j in range(n)]
         for i, row in enumerate(mat)]
    for col in range(n):
        piv = next(r for r in range(col, n) if a[r][col] != 0)
        a[col], a[piv] = a[piv], a[col]
        inv = Fraction(1, 1) / a[col][col]
        a[col] = [x * inv for x in a[col]]
        for r in range(n):
            if r != col and a[r][col] != 0:
                fac = a[r][col]
                a[r] = [x - fac * y for x, y in zip(a[r], a[col])]
    return [row[n:] for row in a]


def _simplex_exact_matrices(verts):
    """(stiffness, mass, volume) of a P1 simplex, all Fractions.

    grads come from inverting [1 | x] exactly; vol from the same matrix's
    determinant (via product of pivots is overkill — use the standard
    formulas per dimension)."""
    d = len(verts[0])
    nv = d + 1
    A = [[Fraction(1)] + list(v) for v in verts]
    Ainv = _rat_inv(A)
    # grad(lambda_a) = column a of Ainv, rows 1..d
    grads = [[Ainv[k][a] for k in range(1, d + 1)] for a in range(nv)]
    if d == 2:
        (x0, y0), (x1, y1), (x2, y2) = verts
        two_area = (x1 - x0) * (y2 - y0) - (x2 - x0) * (y1 - y0)
        vol = abs(two_area) / 2
    else:
        p = verts
        u = [p[1][k] - p[0][k] for k in range(3)]
        v = [p[2][k] - p[0][k] for k in range(3)]
        w = [p[3][k] - p[0][k] for k in range(3)]
        det = (
            u[0] * (v[1] * w[2] - v[2] * w[1])
            - u[1] * (v[0] * w[2] - v[2] * w[0])
            + u[2] * (v[0] * w[1] - v[1] * w[0])
        )
        vol = abs(det) / 6
    K = [[vol * sum(grads[a][k] * grads[b][k] for k in range(d))
          for b in range(nv)] for a in range(nv)]
    denom = 12 if d == 2 else 20
    M = [[vol * Fraction(1 + int(a == b), denom) for b in range(nv)]
         for a in range(nv)]
    return K, M, vol


def _exact_uD(coord):
    """u* = 1 + x^2 + 2y^2 (+ 3z^2), exact at rational coords."""
    x = coord[0]
    out = 1 + x * x + 2 * coord[1] * coord[1]
    if len(coord) == 3:
        out += 3 * coord[2] * coord[2]
    return out


def golden_assemble(ndim, n, diagonal, f_const):
    """Exact-rational P1 assembly of the reference problem on the
    (n+1)^ndim node grid: returns (A dict, b dict, node list) with
    dolfinx Dirichlet semantics (symmetric elimination, apply_lifting,
    set_bc)."""
    h = Fraction(1, n)
    nodes = list(np.ndindex(*(n + 1,) * ndim))
    A = {}
    b = {node: Fraction(0) for node in nodes}

    def add(r, c, val):
        A[(r, c)] = A.get((r, c), Fraction(0)) + val

    f = Fraction(f_const)
    for cell in np.ndindex(*(n,) * ndim):
        for voffs in simplex_vertex_offsets(ndim, diagonal):
            gnodes = [tuple(int(ci) + vi for ci, vi in zip(cell, v))
                      for v in voffs]
            verts = [[h * gi for gi in gn] for gn in gnodes]
            K, M, vol = _simplex_exact_matrices(verts)
            nv = ndim + 1
            for a in range(nv):
                b[gnodes[a]] += f * vol / nv
                for bb in range(nv):
                    add(gnodes[a], gnodes[bb], K[a][bb])

    def is_bc(node):
        return any(c == 0 or c == n for c in node)

    # apply_lifting: b <- b - A_raw g ; then set_bc
    g = {node: (_exact_uD([h * c for c in node]) if is_bc(node)
                else Fraction(0)) for node in nodes}
    for (r, c), val in A.items():
        if g[c] != 0:
            b[r] -= val * g[c]
    for node in nodes:
        if is_bc(node):
            b[node] = g[node]
    # symmetric elimination
    A_el = {}
    for (r, c), val in A.items():
        if is_bc(r) or is_bc(c):
            continue
        A_el[(r, c)] = val
    for node in nodes:
        if is_bc(node):
            A_el[(node, node)] = Fraction(1)
    return A_el, b, nodes


@pytest.mark.parametrize("ndim,n,diagonal,f", [
    (2, 8, "right", -6),      # the reference's own coarsest level
    (2, 4, "left", -6),
    (3, 4, "right", -12),
    (3, 3, "left", -12),
])
def test_assembly_matches_exact_rational_golden(ndim, n, diagonal, f):
    prob = ProblemSpec(ndim=ndim, rhs_const=float(f), diagonal=diagonal)
    asm = assemble_level(GridLevel(level=0, ndim=ndim, n=n), prob)
    A_csr = stencil_to_csr(asm.offsets, asm.A_planes).todok()

    A_gold, b_gold, nodes = golden_assemble(ndim, n, diagonal, f)
    strides = tuple((n + 1) ** (ndim - 1 - k) for k in range(ndim))

    def flat(node):
        return sum(c * s for c, s in zip(node, strides))

    # entry-by-entry: every golden entry present and equal; no extra
    # structurally-nonzero entries in the assembled operator
    gold_flat = {(flat(r), flat(c)): v for (r, c), v in A_gold.items()
                 if v != 0}
    got = {k: v for k, v in dict(A_csr).items() if v != 0.0}
    assert set(got.keys()) == set(gold_flat.keys())
    for key, val in gold_flat.items():
        assert abs(got[key] - float(val)) <= 1e-14 * max(1.0, abs(float(val))), (
            key, got[key], float(val))

    b_got = asm.b.reshape(-1)
    for node in nodes:
        want = float(b_gold[node])
        assert abs(b_got[flat(node)] - want) <= 1e-13 * max(1.0, abs(want)), (
            node, b_got[flat(node)], want)
