"""Grid-transfer operators (restriction / prolongation), dimension-generic.

The reference implements these as O(N) Python loops over coordinate dicts
(multigrid.py:59-198).  On an implicit structured grid they are parity-based
strided slicing — pure vector ops:

  * `restrict_inject`   == reference Restriction2D_direct (multigrid.py:123-132),
    the restriction actually used in its V-cycle (multigrid.py:251-252).
  * `prolong_linear`    == reference Interpolation2D (multigrid.py:59-120):
    coincident nodes injected, edge nodes = mean of 2 neighbors, cell-center
    (odd,odd) nodes = mean of 4 corners — i.e. bilinear (trilinear in 3D).
  * `restrict_full_weighting` == reference Restriction2D (multigrid.py:135-198):
    tensor-product [1 2 1]/4 kernel (9-point /16 in 2D, 27-point /64 in 3D),
    out-of-domain neighbors contribute zero with NO boundary renormalization
    — replicated exactly (the reference divides by 16 regardless of how many
    neighbors exist).
  * `restrict_pt` = 2^d * full weighting = P^T, the variational transpose of
    multilinear prolongation.  This is the *scaling-consistent* restriction
    for this framework's FEM operators: stiffness entries are h-independent
    while residuals (integrated quantities) scale with h^d-ish, so the
    coarse RHS must aggregate (row sums 2^d), not average.  The reference's
    injection (row sum 1) under-feeds the coarse grid by 4x — the root cause
    of its 50+50-sweep, 60+-cycle behavior; with `pt` the same hierarchy
    converges at the textbook ~0.15 two-grid factor.
  * `prolong_p1` = the exact nested-space P1 embedding on the triangulated
    grid: cell-center fine nodes lie on a coarse *diagonal edge*, so they
    average the 2 diagonal endpoints (direction set by the triangulation
    diagonal), not 4 corners.  With R = P^T this reproduces the Galerkin
    operator exactly for constant coefficients.

Fine level has 2n elements, coarse has n; node grids (2n+1)^d and (n+1)^d.
"""
from __future__ import annotations

import itertools
import jax
import jax.numpy as jnp


def restrict_inject(u_fine: jax.Array) -> jax.Array:
    """Coarse[p] = Fine[2p] (pure injection)."""
    return u_fine[(slice(None, None, 2),) * u_fine.ndim]


def prolong_linear(u_coarse: jax.Array) -> jax.Array:
    """Multilinear interpolation coarse -> fine.

    For each fine-node parity class (one of 2^d), the value is the mean of
    the 2^(#odd axes) surrounding coarse nodes.
    """
    d = u_coarse.ndim
    fine_shape = tuple(2 * (s - 1) + 1 for s in u_coarse.shape)
    out = jnp.zeros(fine_shape, dtype=u_coarse.dtype)
    for parity in itertools.product((0, 1), repeat=d):
        corners = []
        choice_ranges = [range(2) if p else range(1) for p in parity]
        for corner in itertools.product(*choice_ranges):
            sl = tuple(
                slice(None)
                if p == 0
                else (slice(0, -1) if c == 0 else slice(1, None))
                for p, c in zip(parity, corner)
            )
            corners.append(u_coarse[sl])
        avg = corners[0]
        for t in corners[1:]:
            avg = avg + t
        avg = avg / len(corners)
        out = out.at[tuple(slice(p, None, 2) for p in parity)].set(avg)
    return out


def restrict_full_weighting(u_fine: jax.Array) -> jax.Array:
    """Tensor-product full weighting with the reference's boundary
    convention: missing neighbors count as zero, constant 1/4^d scaling."""
    d = u_fine.ndim
    up = jnp.pad(u_fine, 1)
    acc = None
    for off in itertools.product((-1, 0, 1), repeat=d):
        w = 1.0
        for o in off:
            w *= 2.0 if o == 0 else 1.0
        sl = tuple(slice(1 + o, 1 + o + s) for o, s in zip(off, u_fine.shape))
        term = w * up[sl]
        acc = term if acc is None else acc + term
    acc = acc / (4.0 ** d)
    return acc[(slice(None, None, 2),) * d]


def restrict_pt(u_fine: jax.Array) -> jax.Array:
    """Variational restriction P^T (transpose of multilinear prolongation)
    = 2^d * full weighting."""
    return (2.0 ** u_fine.ndim) * restrict_full_weighting(u_fine)


def prolong_p1(u_coarse: jax.Array, diagonal: str = "right") -> jax.Array:
    """Exact P1 nested-space embedding: every fine node lies on a coarse
    mesh EDGE (uniform/red refinement of the triangulation is nested), so
    each takes the mean of that edge's 2 endpoints — coincident nodes
    inject, axis-edge midpoints average the 2 axis neighbors, and the
    diagonal classes average along the cell/face diagonal whose direction
    matches the assembled mesh (fem.assembly.simplex_vertex_offsets).

    2D: the (odd, odd) cell center sits on the triangle diagonal.
    3D (Kuhn/Freudenthal): (1,1,0)/(1,0,1)/(0,1,1)-parity nodes sit on the
    increasing face diagonals and the (1,1,1) node on the main cube
    diagonal ((0,0,0)-(1,1,1) for 'right'; x-mirrored for 'left').
    Because the spaces nest, this P makes Galerkin == rediscretized
    coarse operators exactly (tested in test_transfers.py)."""
    c = u_coarse
    m = c.shape[0]
    if u_coarse.ndim == 2:
        out = jnp.zeros((2 * m - 1, 2 * m - 1), dtype=c.dtype)
        out = out.at[::2, ::2].set(c)
        out = out.at[1::2, ::2].set(0.5 * (c[:-1, :] + c[1:, :]))
        out = out.at[::2, 1::2].set(0.5 * (c[:, :-1] + c[:, 1:]))
        if diagonal == "right":
            center = 0.5 * (c[:-1, :-1] + c[1:, 1:])
        else:
            center = 0.5 * (c[1:, :-1] + c[:-1, 1:])
        out = out.at[1::2, 1::2].set(center)
        return out
    if u_coarse.ndim != 3:
        raise NotImplementedError("p1 prolongation implemented for 2D/3D")
    out = jnp.zeros((2 * m - 1,) * 3, dtype=c.dtype)
    out = out.at[::2, ::2, ::2].set(c)
    # axis-edge midpoints
    out = out.at[1::2, ::2, ::2].set(0.5 * (c[:-1, :, :] + c[1:, :, :]))
    out = out.at[::2, 1::2, ::2].set(0.5 * (c[:, :-1, :] + c[:, 1:, :]))
    out = out.at[::2, ::2, 1::2].set(0.5 * (c[:, :, :-1] + c[:, :, 1:]))
    if diagonal == "right":
        # increasing face diagonals + the (0,0,0)-(1,1,1) main diagonal
        xy = 0.5 * (c[:-1, :-1, :] + c[1:, 1:, :])
        xz = 0.5 * (c[:-1, :, :-1] + c[1:, :, 1:])
        yz = 0.5 * (c[:, :-1, :-1] + c[:, 1:, 1:])
        ctr = 0.5 * (c[:-1, :-1, :-1] + c[1:, 1:, 1:])
    else:
        # x-mirrored Kuhn: x-containing diagonals flip, yz is unchanged
        xy = 0.5 * (c[1:, :-1, :] + c[:-1, 1:, :])
        xz = 0.5 * (c[1:, :, :-1] + c[:-1, :, 1:])
        yz = 0.5 * (c[:, :-1, :-1] + c[:, 1:, 1:])
        ctr = 0.5 * (c[1:, :-1, :-1] + c[:-1, 1:, 1:])
    out = out.at[1::2, 1::2, ::2].set(xy)
    out = out.at[1::2, ::2, 1::2].set(xz)
    out = out.at[::2, 1::2, 1::2].set(yz)
    out = out.at[1::2, 1::2, 1::2].set(ctr)
    return out


def prolong(u_coarse: jax.Array, kind: str, diagonal: str = "right") -> jax.Array:
    if kind == "bilinear":
        return prolong_linear(u_coarse)
    if kind == "p1":
        return prolong_p1(u_coarse, diagonal)
    raise ValueError(f"unknown prolongation {kind!r}")


def restrict(u_fine: jax.Array, kind: str) -> jax.Array:
    if kind == "injection":
        return restrict_inject(u_fine)
    if kind == "full_weighting":
        return restrict_full_weighting(u_fine)
    if kind == "pt":
        return restrict_pt(u_fine)
    raise ValueError(f"unknown restriction {kind!r}")
