"""P2 END-TO-END at the production lattice: tolerance solve + MG-CG at
N^3 elements ((2N+1)^3 DOFs), with the per-cycle FEM-L2 check cost broken
out (VERDICT r4 #3: the 92.5 ms/cycle row existed but no P2 solve-to-1e-8
was ever timed, and the check used to pay the plain K=51 parity matvec).

Measures on the chip:
  * fused check (stencil3d_p2.p2_residual_mass_quad via
    solver.fmg._fused_residual_norm) vs the plain parity-matvec check,
  * FMG tolerance solve to rtol 1e-8 (cold incl. compile, then warm),
  * MG-CG iterations/time for the same tolerance.

Usage: python scripts/bench_p2_solve.py [N] (default 256 -> 513^3 = 135M
DOFs, the BASELINE config 4 production lattice).  Prints one JSON line.
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

from multigrid_dolfinx_tpu import build_p2_hierarchy
from multigrid_dolfinx_tpu.config import (
    CycleSpec, HierarchySpec, ProblemSpec, SolverConfig,
)
from multigrid_dolfinx_tpu.mesh import factor_levels
from multigrid_dolfinx_tpu.solver.fmg import (
    _fused_residual_norm, residual_norm, solve,
)
from multigrid_dolfinx_tpu.solver.krylov import solve_mgcg
from multigrid_dolfinx_tpu.solver.vcycle import compute_residual

N = int(sys.argv[1]) if len(sys.argv) > 1 else 256
CROP = "--crop" in sys.argv
base, finest = factor_levels(N)
cyc = CycleSpec(nu1=2, nu2=2,
                smoother=os.environ.get("MG_P2_SMOOTHER", "jacobi"),
                restriction="pt", tol=0.0,
                rtol=float(os.environ.get("MG_P2_RTOL", "1e-8")),
                max_cycles=40, use_pallas=True, track_error=False)
cfg = SolverConfig(
    problem=ProblemSpec(ndim=3, degree=2, rhs_const=-12.0),
    hierarchy=HierarchySpec(coarsest_elements=base,
                            coarsest_level=max(0, finest - 5),
                            finest_level=finest,
                            coarse_operator="rediscretize"),
    cycle=cyc, dtype="float32",
)
ndofs = (2 * N + 1) ** 3

print(f"building P2 parity hierarchy ({N}^3 el, {ndofs / 1e6:.0f}M DOFs)",
      file=sys.stderr, flush=True)
t0 = time.time()
hier = build_p2_hierarchy(cfg, crop_storage=CROP)
jax.block_until_ready(hier.finest.b)
build_s = time.time() - t0
print(f"  build {build_s:.1f}s", file=sys.stderr, flush=True)
lv = hier.finest
f = lv.b


def timeit(fn, *args):
    out = fn(*args)                       # compile + warm
    float(jnp.asarray(out).ravel()[0])
    reps = 5
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
        float(jnp.asarray(out).ravel()[0])
    return (time.perf_counter() - t0) / reps * 1e3


# POST-SWEEP iterate: the convergence check always runs after smoothing,
# where snap-jacobi leaves boundary rows holding exactly f — the contract
# the cropped fused norm is exact under.  (A raw constant iterate has
# nonzero boundary residual, where the cropped kernel by design drops
# the missing plane's contribution — comparing there is meaningless.)
from multigrid_dolfinx_tpu.ops.smoothers import smooth

v = jnp.full(lv.shape, 1e-3, f.dtype)
v = jax.jit(lambda vv, ff: smooth(lv.sm, lv.A, vv, ff, 1, cyc.smoother,
                                  use_pallas=True))(v, f)

fused = jax.jit(lambda vv, ff: _fused_residual_norm(hier, cyc, vv, ff))
rn_fused = float(fused(v, f))
ms_fused = timeit(fused, v, f)

plain = jax.jit(lambda vv, ff: residual_norm(
    hier, compute_residual(lv, vv, ff, use_pallas=True)))
rn_plain = float(plain(v, f))
ms_plain = timeit(plain, v, f)
rel = abs(rn_fused - rn_plain) / max(rn_plain, 1e-30)
print(f"  check: fused {ms_fused:.1f} ms vs plain {ms_plain:.1f} ms "
      f"(rel diff {rel:.2e})", file=sys.stderr, flush=True)

# V-cycle throughput on this storage layout (round-4's 92.5 ms row was
# full layout; --crop drops ~21% of the lanes)
from multigrid_dolfinx_tpu.solver.vcycle import vcycle

KCYC = 10
L = hier.num_levels - 1


@jax.jit
def run_cycles(h, vv):
    return jax.lax.fori_loop(
        0, KCYC, lambda i, u: vcycle(h, cyc, L, u, h.finest.b), vv)


vw = run_cycles(hier, v)
float(vw[1, 1, 1])
t0 = time.perf_counter()
vw = run_cycles(hier, vw)
float(vw[1, 1, 1])
ms_cycle = (time.perf_counter() - t0) / KCYC * 1e3
print(f"  {ms_cycle:.1f} ms/V-cycle ({'crop' if CROP else 'full'})",
      file=sys.stderr, flush=True)
del vw, v

t0 = time.time()
res = solve(hier, cyc, mode="tol")
cycles = int(res.num_cycles)
conv = bool(res.converged)
solve_cold = time.time() - t0
final_rn = float(res.res_hist[cycles - 1]) if cycles else None
del res
t0 = time.perf_counter()
res = solve(hier, cyc, mode="tol")
float(res.u[1, 1, 1])
solve_warm = time.perf_counter() - t0
del res
print(f"  tolerance solve: {cycles} cycles, warm {solve_warm:.2f}s",
      file=sys.stderr, flush=True)

t0 = time.time()
cg = solve_mgcg(hier, cyc)
iters = int(cg.num_iters)
cg_conv = bool(cg.converged)
mgcg_cold = time.time() - t0
del cg
t0 = time.perf_counter()
cg = solve_mgcg(hier, cyc)
float(cg.u[1, 1, 1])
mgcg_warm = time.perf_counter() - t0

print(json.dumps({
    "metric": "p2_solve_3d",
    "n_elements": N, "ndofs": ndofs,
    "crop": CROP,
    "ms_per_vcycle": round(ms_cycle, 2),
    "gdof_per_s": round(ndofs / ms_cycle / 1e6, 2),
    "build_seconds": round(build_s, 1),
    "check_ms_fused": round(ms_fused, 2),
    "check_ms_plain": round(ms_plain, 2),
    "check_rel_diff": rel,
    "solve_cycles": cycles,
    "solve_converged": conv,
    "solve_final_residual": final_rn,
    "solve_seconds_incl_compile": round(solve_cold, 1),
    "solve_seconds_warm": round(solve_warm, 2),
    "mgcg_iters": iters,
    "mgcg_converged": cg_conv,
    "mgcg_seconds_incl_compile": round(mgcg_cold, 1),
    "mgcg_seconds_warm": round(mgcg_warm, 2),
    "smoother": cyc.smoother,
    "platform": jax.devices()[0].platform,
}), flush=True)
