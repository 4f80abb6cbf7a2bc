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


def interpret_mode() -> bool:
    return jax.default_backend() != "tpu"


def layout_aligned(shape: Tuple[int, ...]) -> bool:
    return len(shape) == 2 and shape[0] % 8 == 0 and shape[1] % 128 == 0


def pallas_eligible(A: StencilOperator, shape: Tuple[int, ...], dtype) -> bool:
    """Can the fused const-5 2D kernels handle this operator/layout?"""
    return (
        A.is_const
        and A.logical_m is not None
        and A.offsets == POISSON5_2D_OFFSETS
        and tuple(A.const_weights) == POISSON5_2D_WEIGHTS
        and layout_aligned(shape)
        and jnp.dtype(dtype) == jnp.float32
    )
