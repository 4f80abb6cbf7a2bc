"""Measure the 3D variable-coefficient (planes) kernels on the TPU.

Variable kappa(x) diffusion at N^3, f32, V(2,2) multicolor GS + pt:
times K V-cycles through the planes Pallas kernels and through the plain
jnp path on the same hierarchy.  The hierarchy builds DEVICE-SIDE
(build_var_hierarchy: kappa from iota coordinates, Galerkin RAP as one
strided convolution) — the build time is reported; VERDICT round 2 #2
asks for a 256^3 variable-kappa build under 60 s.  MG_HOST_BUILD=1
falls back to the host assembler for comparison.  Usage:
    python scripts/bench_planes3.py [N] [K]
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

from multigrid_dolfinx_tpu import build_hierarchy, build_var_hierarchy, models
from multigrid_dolfinx_tpu.config import CycleSpec
from multigrid_dolfinx_tpu.solver.vcycle import vcycle
from multigrid_dolfinx_tpu.mesh import factor_levels

N = int(sys.argv[1]) if len(sys.argv) > 1 else 256
K = int(sys.argv[2]) if len(sys.argv) > 2 else 10


base, finest = factor_levels(N)
cyc = CycleSpec(nu1=2, nu2=2, smoother="rbgs", restriction="pt",
                tol=0.0, rtol=1e-6, max_cycles=40, use_pallas=True,
                track_error=False)
cfg = models.variable_coefficient_3d(
    lambda x, y, z: 1.0 + x + 2.0 * y + z,
    finest_level=finest, coarsest_level=max(0, finest - 4),
    coarsest_elements=base, dtype="float32", cycle=cyc)
host_build = os.environ.get("MG_HOST_BUILD") == "1"
builder = build_hierarchy if host_build else build_var_hierarchy
print(f"building variable-kappa hierarchy ({N}^3, "
      f"{'host' if host_build else 'device'}-side)...", file=sys.stderr)
t_build0 = time.time()
hier = builder(cfg)
jax.block_until_ready(hier.finest.b)
build_seconds = time.time() - t_build0
print(f"  build {build_seconds:.1f}s", file=sys.stderr, flush=True)
L = hier.num_levels - 1
ndofs = (N + 1) ** 3


def timed(spec, k):
    @jax.jit
    def run(h, v):
        f = h.finest.b
        return jax.lax.fori_loop(0, k, lambda i, vv: vcycle(h, spec, L, vv, f), v)

    v = jnp.zeros_like(hier.finest.b)
    t0 = time.time()
    v = run(hier, v)
    float(v[1, 1, 1])
    print(f"  compile+warmup {time.time() - t0:.1f}s", file=sys.stderr)
    t0 = time.perf_counter()
    v = run(hier, v)
    float(v[1, 1, 1])
    return (time.perf_counter() - t0) / k


dt_pallas = timed(cyc, K)
dt_jnp = timed(dataclasses.replace(cyc, use_pallas=False), max(2, K // 5))
print(json.dumps({
    "metric": "vcycle_variable_kappa_3d",
    "n": N, "ndofs": ndofs,
    "build_seconds": round(build_seconds, 1),
    "build_path": "host" if host_build else "device",
    "ms_per_vcycle_pallas": round(dt_pallas * 1e3, 2),
    "ms_per_vcycle_jnp": round(dt_jnp * 1e3, 2),
    "speedup": round(dt_jnp / dt_pallas, 1),
    "gdof_per_s_pallas": round(ndofs / dt_pallas / 1e9, 2),
    "platform": jax.devices()[0].platform,
}))
