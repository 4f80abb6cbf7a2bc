"""Dispatch between the portable jnp ops and the fused Pallas TPU kernels.

The Pallas path activates per-operation when the operator/layout admits it
(2D const-5-point stencil, float32, (8,128)-tile-aligned padded storage);
anything else silently falls back to the jnp implementations, so Galerkin /
variable-coefficient / 3D / float64 / unpadded configurations always work.
On non-TPU backends the kernels run in interpreter mode (used by the CPU
test suite; on TPU they compile via Mosaic).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from .operators import StencilOperator

POISSON5_2D_OFFSETS = ((-1, 0), (0, -1), (0, 0), (0, 1), (1, 0))
POISSON5_2D_WEIGHTS = (-1.0, -1.0, 4.0, -1.0, -1.0)
POISSON7_3D_OFFSETS = (
    (-1, 0, 0), (0, -1, 0), (0, 0, -1), (0, 0, 0),
    (0, 0, 1), (0, 1, 0), (1, 0, 0),
)


def interpret_mode() -> bool:
    return jax.default_backend() != "tpu"


def layout_aligned(shape: Tuple[int, ...]) -> bool:
    """Last two dims on (8, 128) tile boundaries (leading dims are free)."""
    if len(shape) < 2:
        return False
    return shape[-2] % 8 == 0 and shape[-1] % 128 == 0


def dtype_layout_ok(shape: Tuple[int, ...], dtype) -> bool:
    """Tile alignment for the kernel dtype: float32 packs (8,128) tiles,
    bfloat16 (16,128) — the second-minor dim must land on the sublane
    count or Mosaic's masked partial tiles erase the bandwidth win.
    bfloat16 admission exists for the mixed-precision inner V-cycle
    (solver/mixed.py): the kernels themselves are dtype-generic."""
    dt = jnp.dtype(dtype)
    if dt == jnp.float32:
        return layout_aligned(shape)
    if dt == jnp.dtype(jnp.bfloat16):
        return (len(shape) >= 2 and shape[-2] % 16 == 0
                and shape[-1] % 128 == 0)
    return False


def const7_weights(A: StencilOperator):
    """(wc, woff) of an isotropic const-7-point operator, or None."""
    if A.offsets != POISSON7_3D_OFFSETS or A.const_weights is None:
        return None
    w = A.const_weights
    center = A.center_index()
    offs = [w[k] for k in range(7) if k != center]
    if not all(abs(o - offs[0]) < 1e-12 * abs(w[center]) for o in offs):
        return None
    return float(w[center]), float(offs[0])


def pallas_planes_eligible(A: StencilOperator, shape: Tuple[int, ...],
                           dtype) -> bool:
    """Can the variable-coefficient (planes) kernels handle this operator?
    Any eliminated radius-1 planes operator in 2D or 3D qualifies:
    Galerkin, kappa(x), screened Poisson — the configurations that
    previously always fell back to the much slower plain-XLA path
    (reference capability: dolfinx's general forms,
    Multigrid_prototype.py:88-91).  Radius-2 (P2) operators are admitted
    in both dimensions: in 3D the per-color-pass GS and single-stage
    Jacobi/residual kernels take the radius as their window halo; in 2D
    the GS kernel runs all 9 mod-3 color stages inside one window with a
    24-row halo (stencil2d.planes_gs_sweep)."""
    if A.planes is None or len(shape) not in (2, 3):
        return False
    if A.radius > 2:
        return False
    if len(shape) == 3 and shape[0] < 2 * A.radius + 1:
        return False
    if len(shape) == 2:
        from .pallas.stencil2d import planes2_admits

        if not planes2_admits(shape, A.planes.shape[0], A.radius):
            return False
    return jnp.dtype(dtype) == jnp.float32 and layout_aligned(shape)


def pallas_parity_eligible(A: StencilOperator, shape: Tuple[int, ...],
                           dtype) -> bool:
    """Can the plane-free parity-table P2 kernels (stencil3d_p2) handle
    this operator/layout?  Constant-coefficient P2 on the half-step
    lattice (fem.fast_p2 / build_p2_hierarchy); 3D, f32, tile-aligned,
    even z extent with >= 4 z-padding slabs (the static-parity rolling
    window)."""
    if A.parity_weights is None or len(shape) != 3:
        return False
    if A.radius != 2 or A.logical_m is None:
        return False
    if shape[0] - A.logical_m < 4:
        return False
    if jnp.dtype(dtype) != jnp.float32 or not layout_aligned(shape):
        return False
    from .pallas.stencil3d_p2 import p2_admits

    return p2_admits(shape, dtype)


def pallas_eligible(A: StencilOperator, shape: Tuple[int, ...], dtype) -> bool:
    """Can the fused const-stencil kernels handle this operator/layout?"""
    if not (A.is_const and A.logical_m is not None):
        return False
    if not dtype_layout_ok(shape, dtype):
        return False
    if len(shape) == 2:
        return (
            A.offsets == POISSON5_2D_OFFSETS
            and tuple(A.const_weights) == POISSON5_2D_WEIGHTS
        )
    if len(shape) == 3:
        return shape[0] >= 3 and const7_weights(A) is not None
    return False
