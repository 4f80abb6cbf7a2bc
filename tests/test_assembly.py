"""Golden tests for the AOT FEM assembly (the dolfinx replacement).

Pins the analytically-known properties of P1 assembly on the structured
right-triangle unit-square mesh, which the reference gets from dolfinx
(Multigrid_prototype.py:88-110):

  * interior stiffness rows are the 5-point stencil [4; -1 E/W/N/S; 0 diag]
    (the classic P1-on-right-triangles identity — h-independent in 2D),
  * Dirichlet rows/columns eliminated symmetrically with unit diagonal,
  * the load vector is -6*h^2 at interior nodes,
  * lifting adds +uD for each eliminated boundary neighbor,
  * the mass matrix integrates exactly (row sums = nodal support area/3,
    total = domain area),
  * energy norms of linear fields are exact.
"""
import numpy as np
import pytest

from multigrid_dolfinx_tpu.config import ProblemSpec
from multigrid_dolfinx_tpu.mesh import GridLevel
from multigrid_dolfinx_tpu.fem import assembly as fa
from multigrid_dolfinx_tpu.fem.norms import error_functional


@pytest.fixture(scope="module", params=["right", "left"])
def asm(request):
    grid = GridLevel(level=0, ndim=2, n=8)
    problem = ProblemSpec(ndim=2, diagonal=request.param)
    return fa.assemble_level(grid, problem)


def test_interior_stiffness_is_five_point(asm):
    A = fa.stencil_to_csr(asm.offsets, asm.A_planes).toarray()
    n = asm.grid.n
    m = n + 1
    # pick a node well inside: (4, 4)
    row = A[4 * m + 4]
    assert row[4 * m + 4] == pytest.approx(4.0)
    for j, val in [
        (3 * m + 4, -1.0),
        (5 * m + 4, -1.0),
        (4 * m + 3, -1.0),
        (4 * m + 5, -1.0),
    ]:
        assert row[j] == pytest.approx(val)
    # diagonal-connected neighbors must cancel exactly
    for j in (3 * m + 3, 3 * m + 5, 5 * m + 3, 5 * m + 5):
        assert row[j] == pytest.approx(0.0, abs=1e-14)
    assert np.sum(row != 0.0) == 5


def test_stiffness_symmetric_spd(asm):
    A = fa.stencil_to_csr(asm.offsets, asm.A_planes)
    diff = abs(A - A.T)
    assert diff.max() < 1e-14
    evals = np.linalg.eigvalsh(A.toarray())
    assert evals.min() > 0.0


def test_bc_rows_identity(asm):
    A = fa.stencil_to_csr(asm.offsets, asm.A_planes).toarray()
    bmask = asm.grid.boundary_mask().reshape(-1)
    for i in np.where(bmask)[0]:
        row = A[i]
        assert row[i] == pytest.approx(1.0)
        assert np.sum(row != 0.0) == 1
        # columns eliminated too (symmetric elimination)
        col = A[:, i]
        assert np.sum(col != 0.0) == 1


def test_raw_stiffness_row_sums_zero(asm):
    """Constants are in the kernel of the (un-eliminated) stiffness."""
    Araw = fa.stencil_to_csr(asm.offsets, asm.A_raw_planes)
    ones = np.ones(Araw.shape[0])
    assert np.abs(Araw @ ones).max() < 1e-12


def test_energy_of_linear_field_exact(asm):
    """u = x (P1-exact): integral of |grad u|^2 over the unit square is 1."""
    Araw = fa.stencil_to_csr(asm.offsets, asm.A_raw_planes)
    x, y = asm.grid.coords()
    for u, expected in [(x, 1.0), (y, 1.0), (x + 2 * y, 5.0)]:
        uf = u.reshape(-1)
        assert uf @ (Araw @ uf) == pytest.approx(expected, rel=1e-12)


def test_load_vector_interior(asm):
    """b_i = -6 h^2 at interior nodes not adjacent to the boundary."""
    h = asm.grid.h
    inner = asm.b[2:-2, 2:-2]
    assert np.allclose(inner, -6.0 * h * h, rtol=1e-12)


def test_load_vector_bc_and_lifting(asm):
    """set_bc: b = uD on the boundary; apply_lifting: each interior node
    adjacent to k eliminated boundary neighbors gains +sum(uD_j)."""
    grid = asm.grid
    h = grid.h
    x, y = grid.coords()
    uD = 1.0 + x ** 2 + 2.0 * y ** 2
    bmask = grid.boundary_mask()
    assert np.allclose(asm.b[bmask], uD[bmask], rtol=1e-13)

    # Node (1, j) for interior j away from corners: west neighbor (0, j) is
    # a bc node with raw coupling -1 -> lifting adds +uD(0, j).
    j = grid.n // 2
    expected = -6.0 * h * h + uD[0, j]
    assert asm.b[1, j] == pytest.approx(expected, rel=1e-12)


def test_mass_matrix_integrates_exactly(asm):
    M = fa.stencil_to_csr(asm.M_offsets, asm.M_planes)
    ones = np.ones(M.shape[0])
    # total mass = domain area
    assert ones @ (M @ ones) == pytest.approx(1.0, rel=1e-13)
    # interior row sum = h^2 (nodal support area / 3 = 6*(h^2/2)/3)
    h = asm.grid.h
    m = asm.grid.n + 1
    rowsums = np.asarray(M.sum(axis=1)).reshape(m, m)
    assert np.allclose(rowsums[1:-1, 1:-1], h * h, rtol=1e-12)
    # L2 norm of linear field: int x^2 = 1/3 ... for nodal x (P1-exact)
    x, _ = asm.grid.coords()
    xf = x.reshape(-1)
    assert xf @ (M @ xf) == pytest.approx(1.0 / 3.0, rel=1e-12)


def test_error_functional_constants():
    grid = GridLevel(level=0, ndim=2, n=8)
    problem = ProblemSpec(ndim=2)
    ef = error_functional(grid, problem)
    # d = int (1 + x^2 + 2 y^2)^2 = 40/9
    assert ef.d == pytest.approx(40.0 / 9.0, rel=1e-12)
    # sum(c) = int u* = 1 + 1/3 + 2/3 = 2
    assert ef.c.sum() == pytest.approx(2.0, rel=1e-12)


def test_error_functional_zero_for_exact_quadratic_in_mass_norm():
    """||u_h - u*|| with u_h = P1 interpolant of u* equals the known P1
    interpolation error (> 0) and decreases ~h^2."""
    problem = ProblemSpec(ndim=2)
    errs = []
    for n in (8, 16):
        grid = GridLevel(level=0, ndim=2, n=n)
        asm = fa.assemble_level(grid, problem)
        ef = error_functional(grid, problem)
        x, y = grid.coords()
        u = (1.0 + x ** 2 + 2.0 * y ** 2).reshape(-1)
        M = fa.stencil_to_csr(asm.M_offsets, asm.M_planes)
        q = u @ (M @ u) - 2.0 * ef.c.reshape(-1) @ u + ef.d
        errs.append(np.sqrt(max(q, 0.0)))
    # O(h^2) convergence of the interpolation error
    assert errs[0] / errs[1] == pytest.approx(4.0, rel=0.05)


def test_3d_assembly_basics():
    grid = GridLevel(level=0, ndim=3, n=4)
    problem = ProblemSpec(ndim=3, rhs_const=-12.0)
    asm = fa.assemble_level(grid, problem)
    A = fa.stencil_to_csr(asm.offsets, asm.A_planes)
    assert abs(A - A.T).max() < 1e-13
    Araw = fa.stencil_to_csr(asm.offsets, asm.A_raw_planes)
    ones = np.ones(Araw.shape[0])
    assert np.abs(Araw @ ones).max() < 1e-12
    # energy of u = x over unit cube = 1
    x, y, z = grid.coords()
    xf = x.reshape(-1)
    assert xf @ (Araw @ xf) == pytest.approx(1.0, rel=1e-12)
    # mass integrates to the domain volume
    M = fa.stencil_to_csr(asm.M_offsets, asm.M_planes)
    assert ones @ (M @ ones) == pytest.approx(1.0, rel=1e-12)
