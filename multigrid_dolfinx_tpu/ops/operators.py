"""Device-resident linear operators in stencil-plane form.

The reference keeps every operator as a scipy CSR matrix and multiplies with
SuperLU-era sparse kernels (multigrid.py:48-56, SpMV at :226,:244).  CSR is a
gather-heavy layout that maps poorly to a TPU's vector unit; a structured-grid
FEM operator is instead stored here as K dense coefficient planes over the
node grid:

    (A u)[p] = sum_k planes[k][p] * u[p + offsets[k]]

which XLA compiles to K fused shifted elementwise multiply-adds — unit-stride
VPU work with no index traffic.  Boundary conditions are *baked into the
planes* at assembly time (rows/columns eliminated, identity diagonal), so
`apply` needs no masking and is branch-free.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


Offset = Tuple[int, ...]


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["planes"],
    meta_fields=["offsets"],
)
@dataclasses.dataclass(frozen=True)
class StencilOperator:
    """Compact-stencil linear operator on a structured node grid.

    planes: (K, *grid_shape) array; offsets: K static integer offsets.
    Rows are grid points; entry k couples p -> p + offsets[k].
    """

    planes: jax.Array
    offsets: Tuple[Offset, ...]

    @property
    def ndim(self) -> int:
        return len(self.offsets[0])

    @property
    def shape(self) -> Tuple[int, ...]:
        return tuple(self.planes.shape[1:])

    @property
    def radius(self) -> int:
        return max(max(abs(c) for c in off) for off in self.offsets)

    def center_index(self) -> int:
        return self.offsets.index((0,) * self.ndim)

    def diag(self) -> jax.Array:
        return self.planes[self.center_index()]

    def apply(self, u: jax.Array) -> jax.Array:
        """Matvec.  K shifted multiply-adds; XLA fuses these into a single
        HBM pass over u and the planes."""
        r = self.radius
        pad = [(r, r)] * u.ndim
        up = jnp.pad(u, pad)
        out = None
        for k, off in enumerate(self.offsets):
            sl = tuple(
                slice(r + o, r + o + s) for o, s in zip(off, u.shape)
            )
            term = self.planes[k] * up[sl]
            out = term if out is None else out + term
        return out

    def __call__(self, u: jax.Array) -> jax.Array:
        return self.apply(u)

    def scale_rows(self, s: jax.Array) -> "StencilOperator":
        return StencilOperator(planes=self.planes * s[None], offsets=self.offsets)

    def drop_center(self) -> "StencilOperator":
        c = self.center_index()
        planes = self.planes.at[c].set(jnp.zeros_like(self.planes[c]))
        return StencilOperator(planes=planes, offsets=self.offsets)

    def astype(self, dtype) -> "StencilOperator":
        return StencilOperator(planes=self.planes.astype(dtype), offsets=self.offsets)

    @staticmethod
    def from_numpy(offsets, planes: np.ndarray, dtype=jnp.float32) -> "StencilOperator":
        return StencilOperator(
            planes=jnp.asarray(planes, dtype=dtype), offsets=tuple(map(tuple, offsets))
        )


def quadratic_form(op: StencilOperator, u: jax.Array, v: jax.Array) -> jax.Array:
    """u^T A v as an on-device reduction (used for mass-weighted norms —
    the replacement for the reference's dolfinx assemble_scalar round trip,
    multigrid.py:203-218)."""
    return jnp.sum(u * op.apply(v))


def mass_norm(M: StencilOperator, r: jax.Array) -> jax.Array:
    """FEM L2 norm sqrt(r^T M r) — semantics of reference res_calculator
    (multigrid.py:203-208)."""
    q = quadratic_form(M, r, r)
    return jnp.sqrt(jnp.maximum(q, 0.0))
