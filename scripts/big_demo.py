"""Single-chip scale demo: V-cycle throughput at 768^3 (default).

1024^3 elements = 1.077e9 DOFs; one padded f32 fine array is 4.9 GB.
MG_ALIAS=1 (in-place rolling sweeps, smoother output aliases its input)
plus the lean hierarchy's store_g=False are necessary for 1024^3 to
COMPILE within a v5e's ~16 GB HBM, but measured on real hardware the
run still OOMs at execution (BENCHMARKS.md: out of reach by ~2x on a
single chip — it needs the z-decomposed multi-chip path).  768^3 (454M
DOFs) is the largest single-chip size that runs.

Usage: python scripts/big_demo.py [N] [cycles] [--solve]
Prints one JSON line like bench.py.

--solve at >512^3 is refused by solve()'s big-TPU guard (the round-3
driver-level worker crash, BENCHMARKS.md "Scale headroom"); set
MG_BIG_SOLVE=1 to attempt it anyway, accepting the ~2 h wedge risk.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import json
import time

os.environ.setdefault("MG_ALIAS", "1")

import jax
import jax.numpy as jnp

from multigrid_dolfinx_tpu.utils.compile_cache import enable_compilation_cache
enable_compilation_cache()

from multigrid_dolfinx_tpu import models
from multigrid_dolfinx_tpu.config import CycleSpec
from multigrid_dolfinx_tpu.solver.hierarchy import build_lean_hierarchy
from multigrid_dolfinx_tpu.solver.vcycle import vcycle
from multigrid_dolfinx_tpu.mesh import factor_levels


N = int(sys.argv[1]) if len(sys.argv) > 1 else 768
K = int(sys.argv[2]) if len(sys.argv) > 2 else 10
DO_SOLVE = "--solve" in sys.argv
CROP = "--crop" in sys.argv          # 768 % 128 == 0 -> crop-eligible

base, finest = factor_levels(N)
cyc = CycleSpec(nu1=2, nu2=2, smoother="rbgs", restriction="pt",
                tol=0.0, rtol=1e-8, max_cycles=40, use_pallas=True,
                track_error=False)
cfg = models.poisson3d(finest_level=finest, coarsest_level=max(0, finest - 6),
                       coarsest_elements=base, dtype="float32", cycle=cyc)
print(f"building lean hierarchy ({N}^3)...", file=sys.stderr)
hier = build_lean_hierarchy(cfg, store_g=False, crop_storage=CROP)
jax.block_until_ready(hier.finest.b)
L = hier.num_levels - 1


@jax.jit
def k_cycles(h, v):
    f = h.finest.b
    return jax.lax.fori_loop(0, K, lambda i, vv: vcycle(h, cyc, L, vv, f), v)


v0 = jnp.zeros_like(hier.finest.b)
print("compiling V-cycle loop...", file=sys.stderr)
t0 = time.time()
v = k_cycles(hier, v0)
float(v[1, 1, 1])
print(f"compile+warmup {time.time() - t0:.1f}s; timing...", file=sys.stderr)

reps = 2
t0 = time.perf_counter()
for _ in range(reps):
    v = k_cycles(hier, v)
    float(v[1, 1, 1])
dt = (time.perf_counter() - t0) / reps / K

ndofs = (N + 1) ** 3
out = {
    "metric": "vcycle_throughput_3d_poisson_biggrid",
    "n": N,
    "ndofs": ndofs,
    "crop": CROP,
    "ms_per_vcycle": round(dt * 1e3, 2),
    "gdof_per_s": round(ndofs / dt / 1e9, 2),
    "platform": jax.devices()[0].platform,
}

print(json.dumps(out), flush=True)

if DO_SOLVE:
    # full tolerance solve (FMG start + V-cycles to 1e-8 relative
    # residual), timed end-to-end; frees the throughput buffers first.
    # Printed as a SECOND json line so an OOM here doesn't lose the
    # throughput result above.
    from multigrid_dolfinx_tpu import solve

    del v, v0
    print("solving to rtol 1e-8...", file=sys.stderr)
    t0 = time.time()
    res = solve(hier, cyc, mode="tol")
    float(res.u[1, 1, 1])
    print(json.dumps({
        "metric": "solve_3d_poisson_biggrid",
        "n": N,
        "ndofs": ndofs,
        "solve_seconds_incl_compile": round(time.time() - t0, 1),
        "solve_cycles": int(res.num_cycles),
        "converged": bool(res.converged),
    }))
