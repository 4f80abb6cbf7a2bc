"""Batched multi-RHS solves on the TPU: kernel-speed lax.map vs jnp vmap.

solve_batched routes Pallas-eligible batches through lax.map over the
fused-kernel solve (Pallas kernels don't vmap); VERDICT round 2 #7 asks
that this beat the vmapped jnp-path batch by >= 3x at scale.  Each batch
element is a full FMG + tolerance solve sharing one hierarchy (the
reference solves exactly one RHS, SURVEY §2c: DP absent).

Usage: python scripts/bench_batched.py [N] [B]
Prints one JSON line.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import dataclasses
import json
import time

import jax
import jax.numpy as jnp

from multigrid_dolfinx_tpu.utils.compile_cache import enable_compilation_cache
enable_compilation_cache()

from multigrid_dolfinx_tpu import build_lean_hierarchy, models
from multigrid_dolfinx_tpu.config import CycleSpec
from multigrid_dolfinx_tpu.solver.batched import solve_batched
from multigrid_dolfinx_tpu.mesh import factor_levels

N = int(sys.argv[1]) if len(sys.argv) > 1 else 256
B = int(sys.argv[2]) if len(sys.argv) > 2 else 4


base, finest = factor_levels(N)
cyc = CycleSpec(nu1=2, nu2=2, smoother="rbgs", restriction="pt",
                tol=0.0, rtol=1e-6, max_cycles=30, use_pallas=True,
                track_error=False)
cfg = models.poisson3d(finest_level=finest, coarsest_level=max(0, finest - 5),
                       coarsest_elements=base, dtype="float32", cycle=cyc)
print(f"building lean hierarchy ({N}^3, batch {B})...", file=sys.stderr,
      flush=True)
hier = build_lean_hierarchy(cfg)
jax.block_until_ready(hier.finest.b)

# Batch of scaled copies of the assembled RHS: distinct solves, one A.
scales = jnp.linspace(0.5, 2.0, B, dtype=jnp.float32)
rhs = scales[:, None, None, None] * hier.finest.b[None]
jax.block_until_ready(rhs)


def timed(spec, tag):
    t0 = time.time()
    res = solve_batched(hier, spec, rhs)
    # scalar readback — the remote-exec layer is fully async and
    # block_until_ready returns at dispatch, not completion
    float(res.u[0, 1, 1, 1])
    print(f"  {tag}: compile+warmup {time.time() - t0:.1f}s "
          f"(cycles {[int(c) for c in res.num_cycles]})",
          file=sys.stderr, flush=True)
    assert bool(res.converged.all()), f"{tag} batch did not converge"
    cycles = int(res.num_cycles.sum())
    del res
    t0 = time.perf_counter()
    res = solve_batched(hier, spec, rhs * 1.0000001)
    float(res.u[0, 1, 1, 1])
    dt = time.perf_counter() - t0
    del res
    return dt, cycles


dt_k, cyc_k = timed(cyc, "pallas lax.map")
dt_j, cyc_j = timed(dataclasses.replace(cyc, use_pallas=False), "jnp vmap")

ndofs = (N + 1) ** 3
print(json.dumps({
    "metric": "batched_solve_3d",
    "n": N, "batch": B, "ndofs": ndofs,
    "seconds_pallas_map": round(dt_k, 2),
    "seconds_jnp_vmap": round(dt_j, 2),
    "speedup": round(dt_j / dt_k, 2),
    "total_cycles": cyc_k,
    "platform": jax.devices()[0].platform,
}), flush=True)
