"""Distributed (z-decomposed shard_map) 3D V-cycle throughput.

On a 1-device ('gz',) mesh this measures the per-shard overhead of the
distributed machinery against bench.py's single-chip number — the
multi-chip perf story only holds if the shard_map path stays in the same
class (BENCHMARKS.md records the result).  On a real multi-chip mesh the
same script measures scaling.

Usage: python scripts/bench_dist3d.py [N] [cycles] [ndev]
Prints one JSON line.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import json
import time

from multigrid_dolfinx_tpu.utils.compile_cache import enable_compilation_cache
enable_compilation_cache()

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from multigrid_dolfinx_tpu import models
from multigrid_dolfinx_tpu.config import CycleSpec
from multigrid_dolfinx_tpu.mesh import factor_levels
from multigrid_dolfinx_tpu.parallel.halo3d import (
    build_halo_cycler3d,
    pick_z_shard_plan,
)


N = int(sys.argv[1]) if len(sys.argv) > 1 else 512
K = int(sys.argv[2]) if len(sys.argv) > 2 else 20
NDEV = int(sys.argv[3]) if len(sys.argv) > 3 else 1

base, finest = factor_levels(N)
cyc = CycleSpec(nu1=2, nu2=2, smoother="rbgs", restriction="pt",
                tol=0.0, rtol=1e-8, max_cycles=40, use_pallas=True,
                track_error=False)
cfg = models.poisson3d(finest_level=finest, coarsest_level=max(0, finest - 6),
                       coarsest_elements=base, dtype="float32", cycle=cyc)
mesh = Mesh(np.array(jax.devices()[:NDEV]), ("gz",))
plan, s = pick_z_shard_plan(cfg, mesh, align=True)
print(f"plan: {plan} shard_from: {s}", file=sys.stderr, flush=True)

t0 = time.time()
hier, cycle_fn = build_halo_cycler3d(cfg, mesh, K)
v0 = jnp.zeros_like(hier.finest.b)
out = cycle_fn(hier, v0)
float(out[1, 1, 1])
print(f"build+compile {time.time() - t0:.1f}s", file=sys.stderr, flush=True)

reps = 3
vs = [jnp.full_like(v0, 1e-6 * (i + 1)) for i in range(reps)]
for vv in vs:
    vv.block_until_ready()
t0 = time.perf_counter()
for vv in vs:
    o = cycle_fn(hier, vv)
    float(o[1, 1, 1])
dt = (time.perf_counter() - t0) / reps / K

ndofs = (N + 1) ** 3
print(json.dumps({
    "metric": "distributed_vcycle_3d",
    "n": N,
    "devices": NDEV,
    "ndofs": ndofs,
    "ms_per_vcycle": round(dt * 1e3, 2),
    "gdof_per_s": round(ndofs / dt / 1e9, 2),
    "platform": jax.devices()[0].platform,
}), flush=True)
