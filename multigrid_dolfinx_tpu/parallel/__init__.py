"""Multi-chip sharding: device meshes, level shardings, halo exchange.

Three domain-decomposition paths (the TPU-native replacement for the
reference's latent MPI substrate, SURVEY.md §2c):

  * GSPMD (`build_sharded_hierarchy`): sharding annotations, compiler-
    inserted halo collectives; composes with lean plane-free hierarchies.
  * Explicit 2D (`build_halo_solver`): hand-scheduled shard_map V-cycle
    (ppermute halos, psum norms, redundant coarse solve).
  * Explicit 3D (`build_halo_solver3d`): full distributed FMG+V-cycle
    under z-decomposition, running the fused halo-aware Pallas kernels
    per shard (plus standalone distributed smoothers and a norm-free
    bench cycler `build_halo_cycler3d`).

`multihost` adds the multi-process launch substrate
(jax.distributed.initialize wiring + global meshes) so the same solvers
run across hosts/slices — the analogue of the reference's mpirun ranks.
"""
from .sharding import (
    build_sharded_hierarchy,
    grid_pspec,
    level_padding_plan,
    make_device_mesh,
)
from .halo import build_halo_solver
from .halo3d import (
    build_halo_cycler3d,
    build_halo_mgcg3d,
    build_halo_solver3d,
    make_distributed_jacobi_smoother,
    make_distributed_rb_smoother,
)
from . import multihost

__all__ = [
    "build_sharded_hierarchy",
    "grid_pspec",
    "level_padding_plan",
    "make_device_mesh",
    "build_halo_solver",
    "build_halo_cycler3d",
    "build_halo_mgcg3d",
    "build_halo_solver3d",
    "make_distributed_jacobi_smoother",
    "make_distributed_rb_smoother",
    "multihost",
]
