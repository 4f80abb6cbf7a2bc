"""Coarsest-grid direct solve.

The reference calls SuperLU's `spsolve` on the coarsest CSR matrix on every
visit (multigrid.py:238-241,274-277) — a host-side factorization each time.
Here the coarsest operator is factorized *once* ahead of time (it is tiny:
(n0+1)^d rows) and the factors live on device, so each coarse solve inside
the jitted cycle is two dense triangular solves (or one MXU matmul in
'inverse' mode) with no host round-trip.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["factor", "piv"],
    meta_fields=["kind", "grid_shape"],
)
@dataclasses.dataclass(frozen=True)
class CoarseSolver:
    """Factorized dense solver for the coarsest level.

    kind='cholesky': factor = lower Cholesky factor of A0 (A0 is SPD: the
    symmetric Dirichlet elimination keeps symmetry and the identity rows
    positive). kind='lu': factor/piv from LAPACK getrf. kind='inverse':
    factor = A0^{-1} (coarse solve becomes a single matmul on the MXU).
    """

    factor: jax.Array
    piv: Optional[jax.Array]
    kind: str
    grid_shape: Tuple[int, ...]

    def solve(self, f_grid: jax.Array) -> jax.Array:
        # The factorization covers the *logical* grid; slice off any
        # sharding/tile padding and zero-pad the solution back.
        sl = tuple(slice(0, s) for s in self.grid_shape)
        # Solve in the factor's dtype and cast back: lets a bfloat16
        # hierarchy (mixed-precision inner cycle) carry a float32-factored
        # coarse solve — the coarsest grid is tiny, the casts are free.
        f = f_grid[sl].reshape(-1).astype(self.factor.dtype)
        if self.kind == "cholesky":
            u = jax.scipy.linalg.cho_solve((self.factor, True), f)
        elif self.kind == "lu":
            u = jax.scipy.linalg.lu_solve((self.factor, self.piv), f)
        elif self.kind == "inverse":
            u = self.factor @ f
        else:
            raise ValueError(f"unknown coarse solver kind {self.kind!r}")
        u = u.reshape(self.grid_shape)
        pads = tuple(
            (0, t - s) for s, t in zip(self.grid_shape, f_grid.shape)
        )
        if any(p != (0, 0) for p in pads):
            u = jnp.pad(u, pads)
        return u.astype(f_grid.dtype)


def build_coarse_solver(
    offsets: Sequence[Tuple[int, ...]],
    planes: np.ndarray,
    kind: str = "cholesky",
    dtype=jnp.float32,
) -> CoarseSolver:
    """AOT factorization of the coarsest stencil operator (numpy/scipy —
    setup path only)."""
    from ..fem.assembly import stencil_to_csr
    import scipy.linalg

    A = stencil_to_csr(offsets, planes).toarray()
    grid_shape = tuple(planes.shape[1:])
    piv = None
    if kind == "cholesky":
        factor = scipy.linalg.cholesky(A, lower=True)
    elif kind == "lu":
        factor, piv = scipy.linalg.lu_factor(A)
    elif kind == "inverse":
        factor = np.linalg.inv(A)
    else:
        raise ValueError(f"unknown coarse solver kind {kind!r}")
    return CoarseSolver(
        factor=jnp.asarray(factor, dtype=dtype),
        piv=None if piv is None else jnp.asarray(piv, dtype=jnp.int32),
        kind=kind,
        grid_shape=grid_shape,
    )
