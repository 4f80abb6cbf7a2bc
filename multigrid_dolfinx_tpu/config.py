"""Configuration dataclasses for the TPU-native multigrid framework.

The reference (nikhilTkur/Multigrid_dolfinx) has no config system: every
parameter is a hardcoded literal (Multigrid_prototype.py:35-46, tolerance
inline at multigrid.py:296).  Here all of those knobs — plus the ones the
TPU build adds (smoother family, cycle type, dtype, sharding mesh) — are
first-class, immutable dataclasses.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Callable, Optional, Sequence, Tuple


def _default_exact_2d(x, y):
    """Manufactured solution of the reference: u = 1 + x^2 + 2 y^2.

    (reference Multigrid_prototype.py:78; its -Laplacian is -6, the RHS
    constant at Multigrid_prototype.py:90.)
    """
    return 1.0 + x * x + 2.0 * y * y


def _default_exact_3d(x, y, z):
    """3D analogue: u = 1 + x^2 + 2 y^2 + 3 z^2, -Laplacian = -12."""
    return 1.0 + x * x + 2.0 * y * y + 3.0 * z * z


def _kappa_linear(*xs):
    """kappa = 1 + x + 2y (+ z): the coefficient of the variable-kappa
    benches (scripts/bench_planes3.py); smooth, bounded away from 0."""
    out = 1.0 + xs[0]
    for i, c in enumerate(xs[1:], start=1):
        out = out + float(((2, 1, 1)[i - 1])) * c
    return out


def _kappa_peak(*xs):
    """kappa = 1 + 8 exp(-|x - 1/2|^2 / 0.05): a smooth inclusion with
    ~9:1 contrast — the standard 'does the smoother see the coefficient'
    stress for variable-coefficient GMG."""
    import jax.numpy as jnp

    r2 = sum((c - 0.5) ** 2 for c in xs)
    return 1.0 + 8.0 * jnp.exp(-r2 / 0.05)


def _kappa_layers(*xs):
    """kappa = 5.5 + 4.5 tanh(20 (y - 1/2)): a smoothed two-layer medium
    (contrast 10:1 across the mid-plane), jnp-traceable so the device
    builder (fem.fast_var) can evaluate it from iota coordinates."""
    import jax.numpy as jnp

    y = xs[1] if len(xs) > 1 else xs[0]
    return 5.5 + 4.5 * jnp.tanh(20.0 * (y - 0.5))


#: Named variable-coefficient presets for the CLI (--kappa <name>) and
#: benches.  All jnp-traceable (the device builder evaluates them from
#: broadcast iota coordinates) and strictly positive on the unit box.
KAPPA_PRESETS = {
    "linear": _kappa_linear,
    "peak": _kappa_peak,
    "layers": _kappa_layers,
}


@dataclasses.dataclass(frozen=True)
class ProblemSpec:
    """What PDE to solve: -div(kappa grad u) = f on the unit square/cube,
    Dirichlet BC taken from the manufactured solution on the whole boundary.

    Mirrors the problem hardcoded at reference Multigrid_prototype.py:77-91.
    """

    ndim: int = 2
    degree: int = 1                   # FEM polynomial degree (P1 / P2)
    rhs_const: Optional[float] = -6.0  # constant f; None -> use `rhs` callable
    rhs: Optional[Callable] = None     # f(x, y[, z]) vectorized over numpy arrays
    exact: Optional[Callable] = None   # manufactured solution (BC + error norm)
    kappa: Optional[Callable] = None   # variable coefficient kappa(x, y[, z]); None = 1
    reaction: float = 0.0              # c in -div(kappa grad u) + c u = f
    diagonal: str = "right"            # structured-triangulation diagonal direction

    def resolved_exact(self) -> Callable:
        if self.exact is not None:
            return self.exact
        return _default_exact_2d if self.ndim == 2 else _default_exact_3d

    def resolved_rhs(self) -> Callable:
        if self.rhs is not None:
            return self.rhs
        c = self.rhs_const
        if c is None:
            raise ValueError("either rhs_const or rhs must be set")
        if self.ndim == 2:
            return lambda x, y: c + 0.0 * x
        return lambda x, y, z: c + 0.0 * x

    def __post_init__(self):
        if self.ndim not in (2, 3):
            raise ValueError(f"ndim must be 2 or 3, got {self.ndim}")
        if self.degree not in (1, 2):
            raise ValueError(f"degree must be 1 or 2, got {self.degree}")
        if self.diagonal not in ("right", "left"):
            raise ValueError(f"diagonal must be 'right' or 'left', got {self.diagonal}")


@dataclasses.dataclass(frozen=True)
class HierarchySpec:
    """Grid-hierarchy shape.

    Matches the reference's level bookkeeping: levels run from
    `coarsest_level` to `finest_level` and level i has
    `coarsest_elements * 2**i` elements per dimension
    (Multigrid_prototype.py:35-37,62-64).
    """

    coarsest_elements: int = 8
    coarsest_level: int = 1
    finest_level: int = 3
    coarse_operator: str = "rediscretize"  # 'rediscretize' (reference) | 'galerkin' (RAP)

    @property
    def num_levels(self) -> int:
        return self.finest_level - self.coarsest_level + 1

    def elements_at(self, level: int) -> int:
        return self.coarsest_elements * (2 ** level)

    def levels(self) -> Sequence[int]:
        return tuple(range(self.coarsest_level, self.finest_level + 1))

    def __post_init__(self):
        if self.finest_level < self.coarsest_level:
            raise ValueError("finest_level must be >= coarsest_level")
        if self.coarsest_elements < 2:
            raise ValueError("coarsest_elements must be >= 2")
        if self.coarse_operator not in ("rediscretize", "galerkin"):
            raise ValueError(f"bad coarse_operator {self.coarse_operator}")


@dataclasses.dataclass(frozen=True)
class CycleSpec:
    """Multigrid-cycle parameters.

    Defaults reproduce the reference exactly: mu0=2 V-cycles per FMG level,
    V(50,50) weighted Jacobi with omega=2/3, injection restriction, bilinear
    prolongation, direct coarse solve, tol 1e-11 on the FEM-L2 residual norm
    (Multigrid_prototype.py:42-46; multigrid.py:223-268,296).
    """

    mu0: int = 2          # V-cycles per FMG level (reference mu0)
    nu1: int = 50         # pre-smoothing sweeps   (reference mu1)
    nu2: int = 50         # post-smoothing sweeps  (reference mu2)
    omega: float = 2.0 / 3.0
    smoother: str = "jacobi"       # 'jacobi' | 'rbgs' | 'chebyshev'
    # Chebyshev smoothing degree.  0 (default) = the PETSc/production
    # convention: a smoothing phase of nu sweeps applies ONE Chebyshev
    # polynomial of degree nu — the same matvec budget as nu Jacobi/GS
    # sweeps, so smoother choices bench at equal work.  d > 0 = explicit
    # degree: each phase applies nu rounds of a degree-d polynomial
    # (nu * d matvecs).
    cheby_degree: int = 0
    cycle: str = "V"               # 'V' | 'W' | 'F'
    # 'injection' (reference parity) | 'full_weighting' (reference's unused
    # Restriction2D) | 'pt' (variational P^T — the scaling-consistent choice
    # for production configs; see ops/transfer.py)
    restriction: str = "injection"
    prolongation: str = "bilinear"       # 'bilinear' (reference) | 'p1' (nested embedding)
    coarse_solver: str = "cholesky"      # 'cholesky' | 'inverse' | 'lu'
    tol: float = 1e-11             # on the mass-weighted (FEM-L2) residual norm
    rtol: float = 0.0              # also stop at rtol * (first-cycle residual)
    max_cycles: int = 100          # guard the reference's unbounded while-True
    check_every: int = 1
    # Fused Pallas TPU kernels for the hot ops (requires/implies padded
    # (8,128)-aligned level storage; falls back per-op when ineligible).
    use_pallas: bool = False
    # Record the FEM-L2 error-vs-exact norm every finest cycle (reference
    # err_calculator, multigrid.py:292-295).  True matches the reference;
    # at 100M+ DOF the on-the-fly quadrature costs S*Q (= 66 in 3D)
    # compute passes per cycle, so production solves can turn it off
    # (err_hist is then NaN; convergence checks use the residual only).
    track_error: bool = True

    def __post_init__(self):
        if self.smoother not in ("jacobi", "rbgs", "chebyshev"):
            raise ValueError(f"bad smoother {self.smoother}")
        if self.cycle not in ("V", "W", "F"):
            raise ValueError(f"bad cycle {self.cycle}")
        if self.restriction not in ("injection", "full_weighting", "pt"):
            raise ValueError(f"bad restriction {self.restriction}")
        if self.prolongation not in ("bilinear", "p1"):
            raise ValueError(f"bad prolongation {self.prolongation}")
        if self.coarse_solver not in ("cholesky", "inverse", "lu"):
            raise ValueError(f"bad coarse_solver {self.coarse_solver}")


@dataclasses.dataclass(frozen=True)
class ShardingSpec:
    """How grid levels are laid out over the TPU device mesh.

    Levels whose per-device tile would drop below `min_points_per_device`
    points are fully replicated (the multigrid analogue of switching off
    sequence parallelism once the axis is short): coarse-level halo traffic
    would otherwise dominate.
    """

    mesh_shape: Tuple[int, ...] = ()       # () = single device / no sharding
    axis_names: Tuple[str, ...] = ("gx", "gy")
    min_points_per_device: int = 64 * 64

    @property
    def enabled(self) -> bool:
        return len(self.mesh_shape) > 0 and math.prod(self.mesh_shape) > 1


@dataclasses.dataclass(frozen=True)
class SolverConfig:
    """Top-level bundle: everything needed to build and run a solve."""

    problem: ProblemSpec = dataclasses.field(default_factory=ProblemSpec)
    hierarchy: HierarchySpec = dataclasses.field(default_factory=HierarchySpec)
    cycle: CycleSpec = dataclasses.field(default_factory=CycleSpec)
    sharding: ShardingSpec = dataclasses.field(default_factory=ShardingSpec)
    dtype: str = "float64"     # 'float32' for TPU speed, 'float64' for parity
    use_pallas: bool = False   # fused Pallas kernels for the hot ops

    def replace(self, **kw) -> "SolverConfig":
        return dataclasses.replace(self, **kw)


def reference_parity_config() -> SolverConfig:
    """The exact configuration of the reference driver
    (Multigrid_prototype.py:35-46): 3 levels, 8 elements/dim coarsest,
    V(50,50), omega=2/3, FMG mu0=2, tol 1e-11."""
    return SolverConfig()
