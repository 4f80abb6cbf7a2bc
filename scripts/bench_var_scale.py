"""Variable-kappa at its single-chip cap: staged device build + V-cycle +
tolerance solve at N^3 on the real TPU (VERDICT r4 #1 — the guard's cap
claim must cite measured rows, and before this script none existed above
256^3).

Measures, at N^3 (default 384):
  * staged `build_var_hierarchy` wall time (cold vs warm distinguished by
    the persistent compilation cache — run twice to get both),
  * V(2,2) multicolor-GS planes-kernel cycle time (K cycles, fori_loop in
    one device call so the ~30 ms tunnel RPC amortizes),
  * a from-zero tolerance solve to rtol 1e-6 (the var-kappa analogue of
    the P1 tolerance solve row), timed with compile included and excluded.

MG_BIG_BUILD=1 is passed through to override the HBM guard when probing
past the estimated cap.  Prints one JSON line.

Usage: python scripts/bench_var_scale.py [N] [K]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp

from multigrid_dolfinx_tpu.utils.compile_cache import enable_compilation_cache
enable_compilation_cache()

from multigrid_dolfinx_tpu import build_var_hierarchy, models
from multigrid_dolfinx_tpu.config import CycleSpec
from multigrid_dolfinx_tpu.mesh import factor_levels
from multigrid_dolfinx_tpu.solver.fmg import solve
from multigrid_dolfinx_tpu.solver.vcycle import vcycle

N = int(sys.argv[1]) if len(sys.argv) > 1 else 384
K = int(sys.argv[2]) if len(sys.argv) > 2 else 10

base, finest = factor_levels(N)
cyc = CycleSpec(nu1=2, nu2=2, smoother="rbgs", restriction="pt",
                tol=0.0, rtol=1e-6, max_cycles=40, use_pallas=True,
                track_error=False)
cfg = models.variable_coefficient_3d(
    lambda x, y, z: 1.0 + x + 2.0 * y + z,
    finest_level=finest, coarsest_level=max(0, finest - 4),
    coarsest_elements=base, dtype="float32", cycle=cyc)
ndofs = (N + 1) ** 3

print(f"building variable-kappa hierarchy ({N}^3, staged device build)...",
      file=sys.stderr, flush=True)
t0 = time.time()
hier = build_var_hierarchy(cfg)
jax.block_until_ready(hier.finest.b)
build_seconds = time.time() - t0
print(f"  build {build_seconds:.1f}s", file=sys.stderr, flush=True)
L = hier.num_levels - 1


@jax.jit
def run_cycles(h, v):
    f = h.finest.b
    return jax.lax.fori_loop(0, K, lambda i, vv: vcycle(h, cyc, L, vv, f), v)


v = jnp.zeros_like(hier.finest.b)
t0 = time.time()
v = run_cycles(hier, v)
float(v[1, 1, 1])
cycle_compile_s = time.time() - t0
print(f"  cycle compile+warmup {cycle_compile_s:.1f}s",
      file=sys.stderr, flush=True)
t0 = time.perf_counter()
v = run_cycles(hier, v)
float(v[1, 1, 1])
ms_per_cycle = (time.perf_counter() - t0) / K * 1e3
print(f"  {ms_per_cycle:.1f} ms/V-cycle", file=sys.stderr, flush=True)
del v

skip_solve = "--no-solve" in sys.argv
if skip_solve:
    # cap probes: the FMG tolerance-solve program costs ~27 min of XLA
    # compile at 384^3 (and does NOT hit the persistent cache, unlike
    # the build/cycle programs — measured twice); the cycle-time row is
    # what the probe is after.
    cycles = converged = final_rn = None
    solve_with_compile_s = solve_warm_s = None
else:
    t0 = time.time()
    res = solve(hier, cyc, mode="tol")
    cycles = int(res.num_cycles)
    converged = bool(res.converged)
    solve_with_compile_s = round(time.time() - t0, 1)
    final_rn = float(res.res_hist[cycles - 1]) if cycles else None
    del res
    t0 = time.perf_counter()
    res = solve(hier, cyc, mode="tol")
    float(res.u[1, 1, 1])
    solve_warm_s = round(time.perf_counter() - t0, 2)

print(json.dumps({
    "metric": "var_kappa_scale_3d",
    "n": N, "ndofs": ndofs,
    "build_seconds": round(build_seconds, 1),
    "cycle_compile_seconds": round(cycle_compile_s, 1),
    "ms_per_vcycle": round(ms_per_cycle, 2),
    "gdof_per_s": round(ndofs / ms_per_cycle / 1e6, 2),
    "solve_cycles": cycles,
    "solve_converged": converged,
    "solve_final_residual": final_rn,
    "solve_seconds_incl_compile": solve_with_compile_s,
    "solve_seconds_warm": solve_warm_s,
    "big_build_override": os.environ.get("MG_BIG_BUILD", "0") == "1",
    "platform": jax.devices()[0].platform,
}), flush=True)
