"""Multi-chip sharding of the grid hierarchy over a TPU device mesh.

The reference's distribution story is MPI domain decomposition latent in
dolfinx/PETSc (ghostUpdate scatters, Multigrid_prototype.py:79-80,106-107)
— never exercised, and its dict-based transfers would break multi-rank
(SURVEY.md §2c).  The TPU-native design makes domain decomposition
first-class and *compiler-managed*:

  * each level's node grid is block-sharded over a 2D ('gx','gy') device
    mesh (3D grids shard their first two axes), so every stencil apply,
    smoother sweep, transfer, and norm is an SPMD program;
  * the XLA SPMD partitioner turns the shifted-slice stencil reads into
    1-deep halo exchanges (collective-permute over ICI) and the norm
    reductions into psums — the exact ghostUpdate(FORWARD)/allreduce
    pattern PETSc implements by hand, but derived from sharding
    annotations instead of explicit messaging;
  * levels smaller than `min_points_per_device` are fully replicated: at
    the coarse end of the hierarchy halo traffic would dominate compute
    (communication shrinks 4x per level — the multigrid analogue of
    switching sequence parallelism off for short axes). Transfers between
    a sharded fine level and a replicated coarse level compile to an
    all-gather / slice pair on ICI.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import ShardingSpec, SolverConfig
from ..mesh import build_grid_hierarchy
from ..ops.operators import StencilOperator
from ..solver.hierarchy import Hierarchy, Level, build_hierarchy


def make_device_mesh(
    n_devices: Optional[int] = None,
    mesh_shape: Optional[Tuple[int, ...]] = None,
    axis_names: Tuple[str, str] = ("gx", "gy"),
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a 2D logical device mesh for grid-axis sharding.

    With only `n_devices` given, factor it as close to square as possible
    (a square mesh minimizes halo perimeter per device)."""
    devices = list(devices if devices is not None else jax.devices())
    if mesh_shape is None:
        n = n_devices if n_devices is not None else len(devices)
        px = int(math.sqrt(n))
        while n % px != 0:
            px -= 1
        mesh_shape = (px, n // px)
    n_used = math.prod(mesh_shape)
    if n_used == len(devices):
        # On real hardware, let mesh_utils place devices so neighboring
        # mesh coordinates are ICI neighbors (halo ppermutes then ride
        # single-hop links); trivial/virtual topologies fall through to
        # the order-preserving reshape.
        try:
            from jax.experimental import mesh_utils

            arr = mesh_utils.create_device_mesh(
                mesh_shape, devices=devices
            )
            return Mesh(arr, axis_names)
        except Exception:
            pass
    arr = np.array(devices[:n_used]).reshape(mesh_shape)
    return Mesh(arr, axis_names)


def grid_pspec(ndim: int, axis_names: Tuple[str, str]) -> P:
    """PartitionSpec for a grid-shaped array: shard the first two grid axes
    over the mesh (3D grids keep z local — stencil halos then ride only two
    ICI dimensions and the z-contiguous axis vectorizes)."""
    if ndim == 2:
        return P(axis_names[0], axis_names[1])
    return P(axis_names[0], axis_names[1], None)


def planes_pspec(ndim: int, axis_names: Tuple[str, str]) -> P:
    """Stencil planes have a leading K axis that is never sharded."""
    if ndim == 2:
        return P(None, axis_names[0], axis_names[1])
    return P(None, axis_names[0], axis_names[1], None)


def _put(x, sharding):
    return jax.device_put(x, sharding)


def _shard_stencil(op: StencilOperator, mesh, axis_names, replicate: bool):
    """Lay an operator's device data out over the mesh, preserving ALL of
    its static structure (const_weights / logical_m / boundary_mode /
    grid_shape / class_tables).  A plane-free const operator is trivially
    shardable — it has no data; its iota masks partition under GSPMD.
    Class tables are O(3^d) scalars and stay replicated."""
    planes = None
    if op.planes is not None:
        spec = P() if replicate else planes_pspec(op.ndim, axis_names)
        planes = _put(op.planes, NamedSharding(mesh, spec))
    class_tables = None
    if op.class_tables is not None:
        class_tables = _put(op.class_tables, NamedSharding(mesh, P()))
    return dataclasses.replace(op, planes=planes, class_tables=class_tables)


def shard_level(level: Level, mesh: Mesh, axis_names, replicate: bool) -> Level:
    ndim = level.A.ndim
    gspec = P() if replicate else grid_pspec(ndim, axis_names)
    gshard = NamedSharding(mesh, gspec)
    sm = level.sm
    sm = dataclasses.replace(
        sm,
        r_omega=_shard_stencil(sm.r_omega, mesh, axis_names, replicate),
        dinv=None if sm.dinv is None else _put(sm.dinv, gshard),
        lmax=_put(sm.lmax, NamedSharding(mesh, P())),
    )
    return dataclasses.replace(
        level,
        A=_shard_stencil(level.A, mesh, axis_names, replicate),
        sm=sm,
        b=_put(level.b, gshard),
        g=None if level.g is None else _put(level.g, gshard),
    )


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def level_padding_plan(config: SolverConfig, mesh: Mesh,
                       spec: ShardingSpec) -> list:
    """Per-level padded points-per-axis (None = level stays replicated and
    unpadded).  Grid point counts are n+1 (odd), so sharded levels are
    stored zero-padded up to the next mesh-divisible size; the padding
    discipline (zero operator rows, unit diagonal) keeps it inert."""
    grids = build_grid_hierarchy(config.hierarchy, ndim=config.problem.ndim)
    mesh_dims = tuple(int(d) for d in mesh.devices.shape)
    plan = []
    for g in grids:
        if g.num_points < spec.min_points_per_device * mesh.size:
            plan.append(None)
            continue
        m = g.points_per_dim
        tgt = [
            _round_up(m, mesh_dims[ax]) if ax < 2 else m
            for ax in range(g.ndim)
        ]
        plan.append(tuple(tgt))
    return plan


def build_sharded_hierarchy(
    config: SolverConfig,
    mesh: Mesh,
    spec: Optional[ShardingSpec] = None,
    lean: bool = False,
) -> Hierarchy:
    """Assemble the hierarchy with mesh-divisible padded storage on the
    sharded levels and lay it out over the device mesh: fine levels
    block-sharded, coarse levels (and the dense coarse factor) replicated.

    `lean=True` builds the O(1)-host plane-free hierarchy
    (solver.hierarchy.build_lean_hierarchy) — its const operators carry no
    device data, so sharding touches only b/g/lmax and the tiny class/
    coarse tables; this is the 100M+-DOF multi-chip configuration."""
    spec = spec or config.sharding
    plan = level_padding_plan(config, mesh, spec)
    if lean:
        from ..solver.hierarchy import build_lean_hierarchy

        hier = build_lean_hierarchy(config, pad_points=plan)
    else:
        hier = build_hierarchy(config, pad_points=plan)

    axis_names = tuple(mesh.axis_names)
    repl = NamedSharding(mesh, P())

    levels = []
    for lv, pp in zip(hier.levels, plan):
        levels.append(shard_level(lv, mesh, axis_names, replicate=pp is None))

    coarse = dataclasses.replace(
        hier.coarse,
        factor=_put(hier.coarse.factor, repl),
        piv=None if hier.coarse.piv is None else _put(hier.coarse.piv, repl),
    )
    fine_replicated = plan[-1] is None
    M_fine = _shard_stencil(hier.M_fine, mesh, axis_names, fine_replicated)
    # err_quad is all-static metadata (u* evaluated on the fly) — nothing
    # to lay out; GSPMD partitions its iota/slice graph with the grid.
    return Hierarchy(
        levels=tuple(levels),
        coarse=coarse,
        M_fine=M_fine,
        err_quad=hier.err_quad,
    )
