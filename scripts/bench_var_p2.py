"""BASELINE config 4 COMPOSED: variable-kappa P2 with Galerkin (RAP)
coarse operators, at the host assembler's feasible size (VERDICT r4 #4).

The two scale paths are disjoint by design — fem.fast_p2 requires
constant kappa (parity periodicity breaks under kappa(x)) and
fem.fast_var is P1-only — so variable-kappa P2 runs through the EXACT
host assembler: K ~ 51 materialized planes per level, host-minutes of
assembly, practical to ~64^3-128^3 elements (129^3-257^3 lattice).
This script measures that honestly: host build time, V-cycle time
(planes Pallas kernels at f32), tolerance solve, at N^3 elements.

Usage: python scripts/bench_var_p2.py [N] [K]   (default 64 -> 2.1M DOFs)
Prints one JSON line.
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

from multigrid_dolfinx_tpu import build_hierarchy
from multigrid_dolfinx_tpu.config import (
    CycleSpec, HierarchySpec, ProblemSpec, SolverConfig,
)
from multigrid_dolfinx_tpu.mesh import factor_levels
from multigrid_dolfinx_tpu.solver.fmg import solve
from multigrid_dolfinx_tpu.solver.vcycle import vcycle

N = int(sys.argv[1]) if len(sys.argv) > 1 else 64
K = int(sys.argv[2]) if len(sys.argv) > 2 else 10
base, finest = factor_levels(N)
cyc = CycleSpec(nu1=3, nu2=3, smoother="rbgs", restriction="pt",
                tol=0.0, rtol=float(os.environ.get("MG_VP2_RTOL", "1e-8")),
                max_cycles=60, use_pallas=True,
                track_error=False)
cfg = SolverConfig(
    problem=ProblemSpec(ndim=3, degree=2, rhs_const=-12.0,
                        kappa=lambda x, y, z: 1.0 + x + 2.0 * y + z),
    hierarchy=HierarchySpec(coarsest_elements=base,
                            coarsest_level=max(0, finest - 3),
                            finest_level=finest,
                            coarse_operator="galerkin"),
    cycle=cyc, dtype="float32",
)
ndofs = (2 * N + 1) ** 3

print(f"host-assembling var-kappa P2 ({N}^3 el, {ndofs / 1e6:.1f}M DOFs)",
      file=sys.stderr, flush=True)
t0 = time.time()
hier = build_hierarchy(cfg)
jax.block_until_ready(hier.finest.b)
build_s = time.time() - t0
print(f"  host build {build_s:.1f}s", file=sys.stderr, flush=True)
L = hier.num_levels - 1


@jax.jit
def run_cycles(h, v):
    f = h.finest.b
    return jax.lax.fori_loop(0, K, lambda i, vv: vcycle(h, cyc, L, vv, f), v)


v = jnp.zeros_like(hier.finest.b)
t0 = time.time()
v = run_cycles(hier, v)
float(v[1, 1, 1])
compile_s = time.time() - t0
t0 = time.perf_counter()
v = run_cycles(hier, v)
float(v[1, 1, 1])
ms_cycle = (time.perf_counter() - t0) / K * 1e3
del v

t0 = time.time()
res = solve(hier, cyc, mode="tol")
cycles = int(res.num_cycles)
conv = bool(res.converged)
solve_s = time.time() - t0
final_rn = float(res.res_hist[cycles - 1]) if cycles else None
rn_ref = float(res.res_hist[0]) if cycles else None

print(json.dumps({
    "metric": "var_kappa_p2_galerkin_3d",
    "n_elements": N, "ndofs": ndofs,
    "host_build_seconds": round(build_s, 1),
    "cycle_compile_seconds": round(compile_s, 1),
    "ms_per_vcycle": round(ms_cycle, 2),
    "solve_cycles": cycles,
    "solve_converged": conv,
    "solve_final_residual": final_rn,
    "rtol": cyc.rtol,
    "solve_seconds_incl_compile": round(solve_s, 1),
    "platform": jax.devices()[0].platform,
}), flush=True)
