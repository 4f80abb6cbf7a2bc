"""Distributed (row-decomposed shard_map) 2D V-cycle throughput.

On a 1-device ('gx', 1) mesh this measures the per-shard overhead of the
2D halo-strip kernel path (stencil2d_dist) against the single-chip 2D
bench; on a real multi-chip mesh the same script measures scaling.

Usage: python scripts/bench_dist2d.py [N] [cycles] [ndev]
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
from multigrid_dolfinx_tpu.parallel.halo import build_halo_cycler

N = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
K = int(sys.argv[2]) if len(sys.argv) > 2 else 20
NDEV = int(sys.argv[3]) if len(sys.argv) > 3 else 1

base, finest = factor_levels(N)
cyc = CycleSpec(nu1=2, nu2=2, smoother="rbgs", restriction="pt",
                tol=0.0, rtol=1e-6, max_cycles=K, use_pallas=True,
                track_error=False)
cfg = models.poisson2d(finest_level=finest,
                       coarsest_level=max(0, finest - 6),
                       coarsest_elements=base, dtype="float32", cycle=cyc)
mesh = Mesh(np.array(jax.devices()[:NDEV]).reshape(NDEV, 1), ("gx", "gy"))

t0 = time.time()
hier, cycle_fn = build_halo_cycler(cfg, mesh, K)
v0 = jnp.zeros_like(hier.finest.b)
out = cycle_fn(hier, v0)
float(out[1, 1])
print(f"build+compile {time.time() - t0:.1f}s", file=sys.stderr, flush=True)
del out, v0

reps = 3
t0 = time.perf_counter()
for i in range(reps):
    vv = jnp.full_like(hier.finest.b, 1e-6 * (i + 1))
    o = cycle_fn(hier, vv)
    float(o[1, 1])
    del vv, o
dt = (time.perf_counter() - t0) / reps / K

ndofs = (N + 1) ** 2
print(json.dumps({
    "metric": "distributed_vcycle_2d",
    "n": N,
    "devices": NDEV,
    "ndofs": ndofs,
    "ms_per_vcycle": round(dt * 1e3, 2),
    "gdof_per_s": round(ndofs / dt / 1e9, 2),
    "platform": jax.devices()[0].platform,
}), flush=True)
