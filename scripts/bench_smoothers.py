"""Smoother comparison on the TPU: rbgs vs chebyshev vs jacobi.

Times K V(2,2) cycles at N^3 (const-7 lean hierarchy, f32, Pallas) per
smoother — VERDICT round 2 #6 asks for Chebyshev within 1.5x of rbgs.
Chebyshev is matvec-only, so its sweeps ride the residual kernel; its
lmax comes from the exact closed-form Dirichlet spectrum
(solver/hierarchy.py:const_lmax_dirichlet).

Usage: python scripts/bench_smoothers.py [N] [K]
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
from multigrid_dolfinx_tpu.solver.vcycle import vcycle
from multigrid_dolfinx_tpu.mesh import factor_levels

N = int(sys.argv[1]) if len(sys.argv) > 1 else 512
K = int(sys.argv[2]) if len(sys.argv) > 2 else 10


base, finest = factor_levels(N)
ndofs = (N + 1) ** 3
out = {"metric": "vcycle_by_smoother_3d", "n": N, "ndofs": ndofs}

for sm in ("rbgs", "chebyshev", "jacobi"):
    cyc = CycleSpec(nu1=2, nu2=2, smoother=sm, restriction="pt",
                    tol=0.0, rtol=1e-8, max_cycles=40, use_pallas=True,
                    track_error=False)
    cfg = models.poisson3d(finest_level=finest,
                           coarsest_level=max(0, finest - 6),
                           coarsest_elements=base, dtype="float32",
                           cycle=cyc)
    hier = build_lean_hierarchy(cfg)
    jax.block_until_ready(hier.finest.b)
    L = hier.num_levels - 1

    @jax.jit
    def run(h, v, spec=cyc):
        f = h.finest.b
        return jax.lax.fori_loop(
            0, K, lambda i, vv: vcycle(h, spec, L, vv, f), v)

    t0 = time.time()
    v = run(hier, jnp.zeros_like(hier.finest.b))
    float(v[1, 1, 1])
    print(f"  {sm}: compile+warmup {time.time() - t0:.1f}s",
          file=sys.stderr, flush=True)
    del v
    reps = 2
    t0 = time.perf_counter()
    for i in range(reps):
        vv = jnp.full(hier.finest.b.shape, 1e-6 * (i + 1), jnp.float32)
        o = run(hier, vv)
        float(o[1, 1, 1])
        del vv, o
    dt = (time.perf_counter() - t0) / reps / K
    out[f"ms_per_vcycle_{sm}"] = round(dt * 1e3, 2)
    del hier

out["cheby_vs_rbgs"] = round(
    out["ms_per_vcycle_chebyshev"] / out["ms_per_vcycle_rbgs"], 2)
out["platform"] = jax.devices()[0].platform
print(json.dumps(out), flush=True)
