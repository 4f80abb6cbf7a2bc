"""multigrid_dolfinx_tpu — a TPU-native geometric multigrid framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of the
nikhilTkur/Multigrid_dolfinx reference prototype (geometric multigrid for
Poisson problems): structured mesh hierarchies, P1 FEM assembly with
dolfinx-compatible Dirichlet handling, stencil-plane operators, weighted
Jacobi / multicolor Gauss-Seidel / Chebyshev smoothers, V/W/F cycles, Full
Multigrid, FEM-L2 convergence norms, MG-preconditioned CG, and multi-chip
sharding of grid levels over a TPU device mesh.

Quick start::

    from multigrid_dolfinx_tpu import models, build_hierarchy, solve
    cfg = models.poisson2d()           # the reference's exact problem
    hier = build_hierarchy(cfg)
    result = solve(hier, cfg.cycle)    # jitted FMG + V-cycles to tol
"""

from .config import (
    CycleSpec,
    HierarchySpec,
    ProblemSpec,
    ShardingSpec,
    SolverConfig,
    reference_parity_config,
)
from .mesh import GridLevel, build_grid_hierarchy
from .solver.hierarchy import (
    Hierarchy,
    Level,
    build_hierarchy,
    build_lean_hierarchy,
    build_p2_hierarchy,
    build_var_hierarchy,
)
from .solver.fmg import (
    SolveResult,
    fmg_solve,
    resume_solve,
    solve,
    residual_norm,
    error_norm,
)
from .solver.krylov import CGResult, solve_mgcg
from .solver.mixed import MixedHierarchy, build_mixed, solve_mixed
from .solver.batched import solve_batched
from .solver.vcycle import vcycle
from .utils.compile_cache import enable_compilation_cache
from . import models

__version__ = "0.1.0"

__all__ = [
    "CycleSpec",
    "HierarchySpec",
    "ProblemSpec",
    "ShardingSpec",
    "SolverConfig",
    "reference_parity_config",
    "GridLevel",
    "build_grid_hierarchy",
    "Hierarchy",
    "Level",
    "build_hierarchy",
    "SolveResult",
    "CGResult",
    "fmg_solve",
    "solve",
    "solve_mgcg",
    "solve_batched",
    "MixedHierarchy",
    "build_mixed",
    "solve_mixed",
    "resume_solve",
    "build_lean_hierarchy",
    "build_p2_hierarchy",
    "build_var_hierarchy",
    "vcycle",
    "residual_norm",
    "error_norm",
    "enable_compilation_cache",
    "models",
    "__version__",
]
