"""Grid-transfer tests.

The reference's own transfer test asserts injected/interpolated *assembled
RHS* vectors match across levels, which is dimensionally wrong (load values
scale with h^2 — SURVEY.md §4).  Following the survey's recommendation, the
transfers are tested here on nodal fields of known polynomials (P1/linear
interpolation is exact on linear fields).
"""
import numpy as np
import jax.numpy as jnp
import pytest

from multigrid_dolfinx_tpu.ops import transfer
from multigrid_dolfinx_tpu.mesh import GridLevel


def _coords(n, ndim):
    return GridLevel(level=0, ndim=ndim, n=n).coords()


@pytest.mark.parametrize("ndim", [2, 3])
def test_injection_then_prolong_roundtrip(ndim):
    rng = np.random.default_rng(0)
    c = rng.standard_normal((9,) * ndim)
    f = transfer.prolong_linear(jnp.asarray(c))
    back = transfer.restrict_inject(f)
    np.testing.assert_allclose(np.asarray(back), c, rtol=0, atol=1e-14)


@pytest.mark.parametrize("ndim", [2, 3])
def test_prolongation_exact_on_linear_fields(ndim):
    nc = 4
    coarse = _coords(nc, ndim)
    fine = _coords(2 * nc, ndim)
    coeffs = list(range(1, ndim + 1))
    u_c = sum(a * ax for a, ax in zip(coeffs, coarse)) + 0.5
    u_f = sum(a * ax for a, ax in zip(coeffs, fine)) + 0.5
    out = transfer.prolong_linear(jnp.asarray(u_c))
    np.testing.assert_allclose(np.asarray(out), u_f, rtol=1e-14)


def test_prolongation_matches_reference_parity_rules_2d():
    """Spot-check the four parity classes of reference Interpolation2D
    (multigrid.py:71-118)."""
    rng = np.random.default_rng(1)
    c = rng.standard_normal((5, 5))
    f = np.asarray(transfer.prolong_linear(jnp.asarray(c)))
    # coincident (even, even): injection (multigrid.py:73-75)
    assert f[2, 4] == pytest.approx(c[1, 2])
    # (odd, even): mean of x-neighbors (multigrid.py:83-91)
    assert f[3, 4] == pytest.approx(0.5 * (c[1, 2] + c[2, 2]))
    # (even, odd): mean of y-neighbors (multigrid.py:94-102)
    assert f[4, 5] == pytest.approx(0.5 * (c[2, 2] + c[2, 3]))
    # (odd, odd): mean of 4 corners (multigrid.py:105-118)
    assert f[3, 5] == pytest.approx(
        0.25 * (c[1, 2] + c[2, 2] + c[1, 3] + c[2, 3])
    )


def test_full_weighting_interior_stencil_2d():
    """Interior coarse node: [1 2 1; 2 4 2; 1 2 1]/16 (multigrid.py:135-198)."""
    rng = np.random.default_rng(2)
    rf = rng.standard_normal((9, 9))
    out = np.asarray(transfer.restrict_full_weighting(jnp.asarray(rf)))
    i, j = 2, 3  # coarse interior -> fine (4, 6)
    fi, fj = 2 * i, 2 * j
    manual = (
        4 * rf[fi, fj]
        + 2 * (rf[fi - 1, fj] + rf[fi + 1, fj] + rf[fi, fj - 1] + rf[fi, fj + 1])
        + (rf[fi - 1, fj - 1] + rf[fi - 1, fj + 1] + rf[fi + 1, fj - 1] + rf[fi + 1, fj + 1])
    ) / 16.0
    assert out[i, j] == pytest.approx(manual, rel=1e-14)


def test_full_weighting_boundary_convention():
    """Reference quirk preserved: missing neighbors contribute 0 and the
    scaling stays 1/16 (no renormalization) — multigrid.py:169-196."""
    rf = np.ones((9, 9))
    out = np.asarray(transfer.restrict_full_weighting(jnp.asarray(rf)))
    # corner coarse node (0,0): only center(4) + E(2) + N(2) + NE(1) exist
    assert out[0, 0] == pytest.approx((4 + 2 + 2 + 1) / 16.0)
    # edge coarse node (0, j): 4 + 2*3 + 1*2 = 12
    assert out[0, 2] == pytest.approx(12.0 / 16.0)
    # interior: full 16/16
    assert out[2, 2] == pytest.approx(1.0)


def test_injection_matches_reference_direct_2d():
    """Reference Restriction2D_direct: coarse value = fine value at the
    coincident coordinate (multigrid.py:123-132)."""
    rng = np.random.default_rng(3)
    rf = rng.standard_normal((9, 9))
    out = np.asarray(transfer.restrict_inject(jnp.asarray(rf)))
    assert out.shape == (5, 5)
    np.testing.assert_allclose(out, rf[::2, ::2], atol=0)


def _apply_planes(planes, offsets, u):
    """y[p] = sum_k planes[k][p] * u[p + offsets[k]] (zero-extended)."""
    y = np.zeros_like(u)
    pad = np.pad(u, 1)
    for k, off in enumerate(offsets):
        sl = tuple(slice(1 + o, 1 + o + s) for o, s in zip(off, u.shape))
        y += planes[k] * pad[sl]
    return y


@pytest.mark.parametrize("ndim", [2, 3])
@pytest.mark.parametrize("diagonal", ["right", "left"])
def test_p1_embedding_is_variational(ndim, diagonal):
    """The nested-space property that defines prolong_p1: for P the exact
    P1 embedding, a(Pu, Pw) on the fine mesh == a(u, w) on the coarse mesh
    (same function, refined triangulation), i.e. Galerkin P^T A_f P equals
    the rediscretized A_c exactly.  Checked matrix-free with random
    interior-supported coarse fields, both cell-diagonal conventions —
    this pins every edge-midpoint rule (axis, face-diagonal, main-diagonal)
    against the assembled Kuhn/triangle stencils."""
    from multigrid_dolfinx_tpu.config import ProblemSpec
    from multigrid_dolfinx_tpu.fem.assembly import assemble_level
    from multigrid_dolfinx_tpu.mesh import GridLevel

    p = ProblemSpec(ndim=ndim, rhs_const=-6.0, diagonal=diagonal)
    coarse = assemble_level(GridLevel(level=0, ndim=ndim, n=4), p,
                            need_mass=False)
    fine = assemble_level(GridLevel(level=1, ndim=ndim, n=8), p,
                          need_mass=False)
    rng = np.random.default_rng(7 + ndim)
    inner = (slice(1, -1),) * ndim
    for _ in range(3):
        u = np.zeros(coarse.shape)
        w = np.zeros(coarse.shape)
        u[inner] = rng.standard_normal(u[inner].shape)
        w[inner] = rng.standard_normal(w[inner].shape)
        pu = np.asarray(transfer.prolong_p1(jnp.asarray(u), diagonal))
        pw = np.asarray(transfer.prolong_p1(jnp.asarray(w), diagonal))
        a_c = float(u.ravel() @ _apply_planes(
            coarse.A_planes, coarse.offsets, w).ravel())
        a_f = float(pu.ravel() @ _apply_planes(
            fine.A_planes, fine.offsets, pw).ravel())
        np.testing.assert_allclose(a_f, a_c, rtol=1e-12)


@pytest.mark.parametrize("diagonal", ["right", "left"])
def test_p1_embedding_exact_on_linear_fields_3d(diagonal):
    nc = 4
    coarse = _coords(nc, 3)
    fine = _coords(2 * nc, 3)
    u_c = 1.0 + coarse[0] + 2.0 * coarse[1] + 3.0 * coarse[2]
    u_f = 1.0 + fine[0] + 2.0 * fine[1] + 3.0 * fine[2]
    out = transfer.prolong_p1(jnp.asarray(u_c), diagonal)
    np.testing.assert_allclose(np.asarray(out), u_f, rtol=1e-14)
