"""Distributed 3D smoothing at Pallas-kernel speed: z-decomposition under
shard_map with explicit slab halo exchange.

The 2D halo path (parallel/halo.py) uses jnp ops per shard.  In 3D the
grid's leading z axis carries no TPU tiling constraints, so a 1D
z-decomposition composes *directly* with the fused Pallas kernels
(ops/pallas/stencil3d): each device

  1. exchanges 1- or 2-deep z-slab halos with its mesh neighbors via
     `jax.lax.ppermute` (RDMA over ICI on real hardware),
  2. runs the fused kernel on its halo-extended local block with the
     global z origin threaded in (the kernels' `z_base` SMEM scalar keeps
     boundary masks and red-black parity globally consistent),
  3. drops the halo slabs from the output.

This is the multi-chip production pattern for the north-star problem: a
v5e-8 holds 8 z-slabs of a 1024^3 grid, each smoothing sweep moving only
two (My, Mx) faces per neighbor over ICI.  (Full distributed V-cycles this
way — transfers included — are the next step; see PARITY.md gaps.)
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.pallas import stencil3d
from ..ops import dispatch

try:
    from jax import shard_map as _sm
    shard_map = _sm.shard_map if hasattr(_sm, "shard_map") else _sm
except Exception:  # pragma: no cover
    from jax.experimental.shard_map import shard_map  # type: ignore


def _shift_slabs(x, axis_name: str, forward: bool):
    n = jax.lax.axis_size(axis_name)
    if n == 1:
        return jnp.zeros_like(x)
    perm = (
        [(i, i + 1) for i in range(n - 1)]
        if forward else [(i + 1, i) for i in range(n - 1)]
    )
    return jax.lax.ppermute(x, axis_name, perm)


def halo_extend_z(u: jax.Array, depth: int, axis_name: str) -> jax.Array:
    """(mz, My, Mx) local block -> (mz + 2*depth, ...) with z-slab halos
    from the two z-neighbors (edge ranks get zeros — the zero extension
    the kernels' global boundary masks expect)."""
    top = _shift_slabs(u[-depth:], axis_name, forward=True)
    bot = _shift_slabs(u[:depth], axis_name, forward=False)
    return jnp.concatenate([top, u, bot], axis=0)


def make_distributed_rb_smoother(
    mesh: Mesh,
    lm: int,
    wc: float,
    woff: float,
    nsweeps: int,
    axis_name: str = "gz",
    interpret: bool | None = None,
):
    """Returns a jitted fn(v_global, f_global) -> v_global applying
    `nsweeps` fused red-black GS sweeps on the z-sharded 7-point system.

    v/f are globally-shaped arrays sharded P(axis_name) on z; the local
    blocks must satisfy the Pallas layout (y % 8 == 0, x % 128 == 0,
    local z even and >= 2)."""
    if interpret is None:
        interpret = dispatch.interpret_mode()

    def local(v, f):
        mz = v.shape[0]
        z_base = jax.lax.axis_index(axis_name) * mz - 2

        def sweep(_, vv):
            vext = halo_extend_z(vv, 2, axis_name)
            fext = halo_extend_z(f, 2, axis_name)
            out = stencil3d.rb_sweep_fused(
                vext, fext, lm, wc, woff, interpret=interpret,
                z_base=z_base,
            )
            return out[2:-2]

        if nsweeps <= 2:
            for k in range(nsweeps):
                v = sweep(k, v)
            return v
        return jax.lax.fori_loop(0, nsweeps, sweep, v)

    fn = shard_map(
        local, mesh=mesh,
        in_specs=(P(axis_name), P(axis_name)),
        out_specs=P(axis_name),
        check_vma=False,
    )
    return jax.jit(fn)


def make_distributed_jacobi_smoother(
    mesh: Mesh,
    lm: int,
    wc: float,
    woff: float,
    omega: float,
    nsweeps: int,
    axis_name: str = "gz",
    interpret: bool | None = None,
):
    """As make_distributed_rb_smoother, for weighted Jacobi (1-deep halo)."""
    if interpret is None:
        interpret = dispatch.interpret_mode()

    def local(v, f):
        mz = v.shape[0]
        z_base = jax.lax.axis_index(axis_name) * mz - 1

        def sweep(_, vv):
            vext = halo_extend_z(vv, 1, axis_name)
            fext = halo_extend_z(f, 1, axis_name)
            out = stencil3d.jacobi_sweep(
                vext, fext, lm, wc, woff, omega, interpret=interpret,
                z_base=z_base,
            )
            return out[1:-1]

        if nsweeps <= 2:
            for k in range(nsweeps):
                v = sweep(k, v)
            return v
        return jax.lax.fori_loop(0, nsweeps, sweep, v)

    fn = shard_map(
        local, mesh=mesh,
        in_specs=(P(axis_name), P(axis_name)),
        out_specs=P(axis_name),
        check_vma=False,
    )
    return jax.jit(fn)
