"""Implicit structured mesh hierarchy.

The reference builds each level with dolfinx's C++ mesh generator and then a
bidirectional DOF<->coordinate *dict* with coordinates rounded to 9 decimals
(Multigrid_prototype.py:65-75); every grid-transfer operator then does O(N)
Python dict lookups (multigrid.py:59-198).

TPU-native replacement: a level is an *implicit* tensor-product grid — node
(i, j) sits at (i*h, j*h), unknowns live in a dense (n+1, n+1) array (2D) or
(n+1, n+1, n+1) array (3D) — so neighbor/parity relations that the reference
recovers through coordinate dicts are plain index arithmetic, and the
boundary is an index mask.  Nothing here is a runtime data structure; it is
static metadata plus numpy setup arrays consumed by the AOT assembler.
"""
from __future__ import annotations

import dataclasses
from typing import List, Tuple

import numpy as np

from .config import HierarchySpec


@dataclasses.dataclass(frozen=True)
class GridLevel:
    """One level of the structured hierarchy (static metadata only).

    `n` elements per dimension, spacing h = 1/n, `n + 1` nodes per dimension.
    Mirrors the per-level bookkeeping of reference
    Multigrid_prototype.py:62-64 (num_elems_i, element_size[i]).
    """

    level: int
    ndim: int
    n: int

    @property
    def h(self) -> float:
        return 1.0 / self.n

    @property
    def points_per_dim(self) -> int:
        return self.n + 1

    @property
    def shape(self) -> Tuple[int, ...]:
        return (self.n + 1,) * self.ndim

    @property
    def num_points(self) -> int:
        return (self.n + 1) ** self.ndim

    # ---- numpy setup helpers (used ahead-of-time by fem.assembly) ----

    def coords(self) -> Tuple[np.ndarray, ...]:
        """Nodal coordinate arrays, each of shape `self.shape`.

        Axis 0 is x, axis 1 is y (axis 2 is z in 3D): node [i, j] is at
        (i*h, j*h).  Replaces V.tabulate_dof_coordinates() + the coordinate
        dict of the reference (Multigrid_prototype.py:68-75).
        """
        axes = [np.linspace(0.0, 1.0, self.n + 1) for _ in range(self.ndim)]
        return tuple(np.meshgrid(*axes, indexing="ij"))

    def boundary_mask(self) -> np.ndarray:
        """Boolean mask of boundary nodes (the whole boundary is Dirichlet,
        as in reference Multigrid_prototype.py:81-87)."""
        mask = np.zeros(self.shape, dtype=bool)
        for axis in range(self.ndim):
            idx_lo = [slice(None)] * self.ndim
            idx_hi = [slice(None)] * self.ndim
            idx_lo[axis] = 0
            idx_hi[axis] = -1
            mask[tuple(idx_lo)] = True
            mask[tuple(idx_hi)] = True
        return mask

    def interior_mask(self) -> np.ndarray:
        return ~self.boundary_mask()


def factor_levels(n_elems: int, min_coarsest: int = 8) -> tuple:
    """Factor a finest-grid size into `(coarsest_elements, finest_level)`
    with `coarsest_elements * 2**finest_level == n_elems`, halving while
    even and above `min_coarsest` — supports non-power-of-two sizes like
    768 = 6 * 2**7.  The shared sizing rule for every benchmark/demo
    script (a CLI size N becomes a full hierarchy spec)."""
    level, base = 0, int(n_elems)
    while base % 2 == 0 and base > min_coarsest:
        base //= 2
        level += 1
    return base, level


def build_grid_hierarchy(spec: HierarchySpec, ndim: int = 2) -> List[GridLevel]:
    """Levels ordered coarsest -> finest, level i having
    `spec.coarsest_elements * 2**i` elements per dim
    (reference Multigrid_prototype.py:62-64)."""
    return [
        GridLevel(level=lvl, ndim=ndim, n=spec.elements_at(lvl))
        for lvl in spec.levels()
    ]


def lexicographic_index(level: GridLevel) -> np.ndarray:
    """Flat index array: node (i, j[, k]) -> row in the flattened vector.

    The framework's canonical ordering is C-order raveling of the grid
    array.  (The reference instead inherits dolfinx's topology-driven dof
    order and bridges it with coordinate dicts; every solver quantity here
    is permutation-equivariant, so orderings only need to be *consistent*.)
    """
    return np.arange(level.num_points, dtype=np.int64).reshape(level.shape)
