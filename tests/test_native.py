"""Native (C++) assembly core vs the numpy assembler."""
import os

import numpy as np
import pytest

from multigrid_dolfinx_tpu.config import ProblemSpec
from multigrid_dolfinx_tpu.fem import assembly as fa
from multigrid_dolfinx_tpu.fem import native
from multigrid_dolfinx_tpu.mesh import GridLevel


pytestmark = pytest.mark.skipif(
    native.load_library() is None,
    reason="native assembler unavailable (no g++/make)",
)


def _numpy_assembled(grid, prob):
    os.environ["MG_DISABLE_NATIVE"] = "1"
    native._tried, native._lib = False, None
    try:
        return fa.assemble_level(grid, prob)
    finally:
        del os.environ["MG_DISABLE_NATIVE"]
        native._tried, native._lib = False, None


@pytest.mark.parametrize("ndim,n", [(2, 16), (3, 6)])
@pytest.mark.parametrize("variable", [False, True])
def test_native_matches_numpy(ndim, n, variable):
    kappa = (lambda *xs: 1.0 + sum(x * x for x in xs)) if variable else None
    prob = ProblemSpec(
        ndim=ndim, rhs_const=-6.0 if ndim == 2 else -12.0, kappa=kappa
    )
    grid = GridLevel(level=0, ndim=ndim, n=n)
    a_nat = fa.assemble_level(grid, prob)
    a_np = _numpy_assembled(grid, prob)
    assert a_nat.offsets == a_np.offsets
    np.testing.assert_allclose(a_nat.A_planes, a_np.A_planes,
                               rtol=1e-12, atol=1e-13)
    np.testing.assert_allclose(a_nat.M_planes, a_np.M_planes,
                               rtol=1e-12, atol=1e-16)
    np.testing.assert_allclose(a_nat.b, a_np.b, rtol=1e-12, atol=1e-14)


def test_native_diagonal_left():
    prob = ProblemSpec(ndim=2, rhs_const=-6.0, diagonal="left")
    grid = GridLevel(level=0, ndim=2, n=8)
    a_nat = fa.assemble_level(grid, prob)
    a_np = _numpy_assembled(grid, prob)
    assert a_nat.offsets == a_np.offsets
    np.testing.assert_allclose(a_nat.A_planes, a_np.A_planes, atol=1e-13)


def test_native_diagonal_left_3d():
    """Regression: the native 3D assembler used to IGNORE diagonal='left'
    and silently return the 'right' matrices (caught when the exact
    per-tet norm kernel disagreed with the 'golden' it was checked
    against).  Offsets must be the component-0-mirrored set and all
    arrays must match the numpy path."""
    prob = ProblemSpec(ndim=3, rhs_const=-12.0, diagonal="left")
    grid = GridLevel(level=0, ndim=3, n=4)
    a_nat = fa.assemble_level(grid, prob)
    a_np = _numpy_assembled(grid, prob)
    assert a_nat.offsets == a_np.offsets
    assert a_nat.M_offsets == a_np.M_offsets
    assert (1, -1, -1) in a_nat.M_offsets      # mirrored Kuhn coupling
    assert (1, 1, 1) not in a_nat.M_offsets
    np.testing.assert_allclose(a_nat.A_planes, a_np.A_planes, atol=1e-13)
    np.testing.assert_allclose(a_nat.M_planes, a_np.M_planes, atol=1e-16)
    np.testing.assert_allclose(a_nat.b, a_np.b, atol=1e-14)
