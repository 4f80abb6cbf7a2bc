"""Problem families: Poisson and variable-coefficient diffusion setups.

The reference hardwires exactly one problem — 2D Poisson, -Laplace(u) = -6
on the unit square with Dirichlet data from u* = 1 + x^2 + 2y^2
(Multigrid_prototype.py:78,90-91).  These constructors make that problem
(and its 3D / variable-coefficient generalizations) first-class configs.
"""
from __future__ import annotations

from typing import Callable, Optional

from ..config import (
    CycleSpec,
    HierarchySpec,
    ProblemSpec,
    SolverConfig,
)


def poisson2d(
    finest_level: int = 3,
    coarsest_level: int = 1,
    coarsest_elements: int = 8,
    dtype: str = "float64",
    cycle: Optional[CycleSpec] = None,
    diagonal: str = "right",
) -> SolverConfig:
    """The reference problem (Multigrid_prototype.py:35-46 defaults):
    u* = 1 + x^2 + 2y^2, f = -6."""
    return SolverConfig(
        problem=ProblemSpec(ndim=2, rhs_const=-6.0, diagonal=diagonal),
        hierarchy=HierarchySpec(
            coarsest_elements=coarsest_elements,
            coarsest_level=coarsest_level,
            finest_level=finest_level,
        ),
        cycle=cycle if cycle is not None else CycleSpec(),
        dtype=dtype,
    )


def poisson3d(
    finest_level: int = 2,
    coarsest_level: int = 0,
    coarsest_elements: int = 8,
    dtype: str = "float32",
    cycle: Optional[CycleSpec] = None,
) -> SolverConfig:
    """3D Poisson on the unit cube: u* = 1 + x^2 + 2y^2 + 3z^2, f = -12
    (BASELINE.json config 3)."""
    return SolverConfig(
        problem=ProblemSpec(ndim=3, rhs_const=-12.0),
        hierarchy=HierarchySpec(
            coarsest_elements=coarsest_elements,
            coarsest_level=coarsest_level,
            finest_level=finest_level,
        ),
        cycle=cycle if cycle is not None else CycleSpec(nu1=2, nu2=2),
        dtype=dtype,
    )


def poisson2d_p2(
    finest_level: int = 3,
    coarsest_level: int = 1,
    coarsest_elements: int = 8,
    dtype: str = "float64",
    cycle: Optional[CycleSpec] = None,
    kappa: Optional[Callable] = None,
) -> SolverConfig:
    """P2 elements on the same triangulated square (BASELINE.json config 4:
    'P2 with Galerkin RAR').  DOFs (vertices + edge midpoints) live on the
    half-step lattice; coarse operators are Galerkin products.  The
    reference's quadratic manufactured solution lies IN the P2 space, so
    the discrete solution is exact up to solver tolerance."""
    return SolverConfig(
        problem=ProblemSpec(ndim=2, degree=2, rhs_const=-6.0, kappa=kappa),
        hierarchy=HierarchySpec(
            coarsest_elements=coarsest_elements,
            coarsest_level=coarsest_level,
            finest_level=finest_level,
            coarse_operator="galerkin",
        ),
        cycle=cycle if cycle is not None else CycleSpec(
            nu1=2, nu2=2, smoother="rbgs", restriction="pt",
        ),
        dtype=dtype,
    )


def poisson3d_p2(
    finest_level: int = 1,
    coarsest_level: int = 0,
    coarsest_elements: int = 4,
    dtype: str = "float32",
    cycle: Optional[CycleSpec] = None,
    coarse_operator: str = "rediscretize",
) -> SolverConfig:
    """3D P2 on the tetrahedralized cube (BASELINE.json config 4's 3D
    form): u* = 1 + x^2 + 2y^2 + 3z^2 lies IN the P2 space, f = -12.
    DOFs live on the half-step lattice ((2n+1)^3 points at n^3 elements).
    coarse_operator='rediscretize' keeps every level a plane-free
    parity-table operator (solver.hierarchy.build_p2_hierarchy — the
    production scale path); 'galerkin' matches the host planes build."""
    return SolverConfig(
        problem=ProblemSpec(ndim=3, degree=2, rhs_const=-12.0),
        hierarchy=HierarchySpec(
            coarsest_elements=coarsest_elements,
            coarsest_level=coarsest_level,
            finest_level=finest_level,
            coarse_operator=coarse_operator,
        ),
        cycle=cycle if cycle is not None else CycleSpec(
            nu1=2, nu2=2, smoother="jacobi", restriction="pt",
        ),
        dtype=dtype,
    )


def screened_poisson2d(
    c: float = 10.0,
    finest_level: int = 3,
    coarsest_level: int = 1,
    coarsest_elements: int = 8,
    dtype: str = "float64",
    cycle: Optional[CycleSpec] = None,
) -> SolverConfig:
    """Screened Poisson / reaction-diffusion: -Laplace(u) + c u = f, with
    the manufactured u* = 1 + x^2 + 2y^2 (so f = -6 + c u*).  The reaction
    term adds c*M to the stiffness — mass-matrix machinery reused."""
    exact = lambda x, y: 1.0 + x * x + 2.0 * y * y
    rhs = lambda x, y: -6.0 + c * (1.0 + x * x + 2.0 * y * y)
    return SolverConfig(
        problem=ProblemSpec(ndim=2, rhs=rhs, rhs_const=None, exact=exact,
                            reaction=c),
        hierarchy=HierarchySpec(
            coarsest_elements=coarsest_elements,
            coarsest_level=coarsest_level,
            finest_level=finest_level,
        ),
        cycle=cycle if cycle is not None else CycleSpec(
            nu1=2, nu2=2, smoother="rbgs", restriction="pt",
        ),
        dtype=dtype,
    )


def variable_coefficient_2d(
    kappa: Callable,
    finest_level: int = 3,
    coarsest_level: int = 1,
    coarsest_elements: int = 8,
    dtype: str = "float64",
    cycle: Optional[CycleSpec] = None,
    exact: Optional[Callable] = None,
    rhs: Optional[Callable] = None,
) -> SolverConfig:
    """-div(kappa grad u) = f with piecewise-constant-per-cell kappa
    (BASELINE.json config 4); defaults to Galerkin (RAP) coarse operators,
    which is the correct variational choice for non-constant coefficients."""
    return SolverConfig(
        problem=ProblemSpec(
            ndim=2, kappa=kappa, exact=exact, rhs=rhs,
            rhs_const=None if rhs is not None else -6.0,
        ),
        hierarchy=HierarchySpec(
            coarsest_elements=coarsest_elements,
            coarsest_level=coarsest_level,
            finest_level=finest_level,
            coarse_operator="galerkin",
        ),
        cycle=cycle if cycle is not None else CycleSpec(nu1=2, nu2=2),
        dtype=dtype,
    )


def variable_coefficient_3d(
    kappa: Callable,
    finest_level: int = 2,
    coarsest_level: int = 0,
    coarsest_elements: int = 8,
    dtype: str = "float64",
    cycle: Optional[CycleSpec] = None,
    exact: Optional[Callable] = None,
    rhs: Optional[Callable] = None,
) -> SolverConfig:
    """3D -div(kappa grad u) = f with piecewise-constant-per-cell kappa
    and Galerkin (RAP) coarse operators — the 3D generalization of
    variable_coefficient_2d.  With dtype float32 the radius-1 planes
    operators ride the 3D Pallas planes kernels (ops/pallas/stencil3d)."""
    return SolverConfig(
        problem=ProblemSpec(
            ndim=3, kappa=kappa, exact=exact, rhs=rhs,
            rhs_const=None if rhs is not None else -12.0,
        ),
        hierarchy=HierarchySpec(
            coarsest_elements=coarsest_elements,
            coarsest_level=coarsest_level,
            finest_level=finest_level,
            coarse_operator="galerkin",
        ),
        cycle=cycle if cycle is not None else CycleSpec(nu1=2, nu2=2),
        dtype=dtype,
    )


def screened_poisson3d(
    c: float = 10.0,
    finest_level: int = 2,
    coarsest_level: int = 0,
    coarsest_elements: int = 8,
    dtype: str = "float32",
    cycle: Optional[CycleSpec] = None,
) -> SolverConfig:
    """3D screened Poisson: -Laplace(u) + c u = f with the manufactured
    u* = 1 + x^2 + 2y^2 + 3z^2 (f = -12 + c u*).  The reaction term adds
    c*M (15-point consistent mass on Kuhn tetrahedra), so the operator is
    a radius-1 box stencil — with dtype float32 it rides the 3D Pallas
    planes kernels (2^3-color GS)."""
    exact = lambda x, y, z: 1.0 + x * x + 2.0 * y * y + 3.0 * z * z
    rhs = lambda x, y, z: -12.0 + c * (1.0 + x * x + 2.0 * y * y
                                       + 3.0 * z * z)
    return SolverConfig(
        problem=ProblemSpec(ndim=3, rhs=rhs, rhs_const=None, exact=exact,
                            reaction=c),
        hierarchy=HierarchySpec(
            coarsest_elements=coarsest_elements,
            coarsest_level=coarsest_level,
            finest_level=finest_level,
        ),
        cycle=cycle if cycle is not None else CycleSpec(
            nu1=2, nu2=2, smoother="rbgs", restriction="pt",
        ),
        dtype=dtype,
    )
