"""P2 vs P1 V-cycle cost at EQUAL DOF counts, on the TPU.

P2 at N elements and P1 at 2N elements both have (2N+1)^d DOFs; VERDICT
round 2 #9 asks for the P2 cycle within 3x of the P1 cycle at equal
DOFs (the radius-2 planes kernels + mod-3 GS colors are what make that
possible — before, P2 ran plain-XLA with 27 masked color passes).

Usage: python scripts/bench_p2.py [N] [K] [ndim]
Prints one JSON line.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import json
import time

import jax
import jax.numpy as jnp

from multigrid_dolfinx_tpu.utils.compile_cache import enable_compilation_cache
enable_compilation_cache()

from multigrid_dolfinx_tpu import build_hierarchy, build_lean_hierarchy, models
from multigrid_dolfinx_tpu.config import (
    CycleSpec, HierarchySpec, ProblemSpec, SolverConfig,
)
from multigrid_dolfinx_tpu.solver.vcycle import vcycle
from multigrid_dolfinx_tpu.mesh import factor_levels

N = int(sys.argv[1]) if len(sys.argv) > 1 else 64
K = int(sys.argv[2]) if len(sys.argv) > 2 else 10
NDIM = int(sys.argv[3]) if len(sys.argv) > 3 else 3


def timed(hier, cyc, k):
    L = hier.num_levels - 1

    @jax.jit
    def run(h, v):
        f = h.finest.b
        return jax.lax.fori_loop(
            0, k, lambda i, vv: vcycle(h, cyc, L, vv, f), v)

    t0 = time.time()
    v = run(hier, jnp.zeros_like(hier.finest.b))
    # scalar readback, not block_until_ready: the remote-exec layer is
    # fully asynchronous — block_until_ready returns once the call is
    # *dispatched*, and this script's first numbers (P1 at 2048^2 =
    # "0.02 ms/cycle") were pure dispatch time.
    float(v[(1,) * v.ndim])
    print(f"  compile+warmup {time.time() - t0:.1f}s", file=sys.stderr,
          flush=True)
    del v
    reps = 2
    t0 = time.perf_counter()
    for i in range(reps):
        vv = jnp.full(hier.finest.b.shape, 1e-6 * (i + 1),
                      hier.finest.b.dtype)
        o = run(hier, vv)
        float(o[(1,) * o.ndim])
        del vv, o
    return (time.perf_counter() - t0) / reps / k


# MG_P2_SMOOTHER picks the P2 smoother (default jacobi — the plane-free
# parity kernels' single-pass production smoother; rbgs = 27 mod-3 color
# classes, only kernel-fast through the planes path); P1 stays rbgs.
P2_SMOOTH = os.environ.get("MG_P2_SMOOTHER", "jacobi")
cyc = CycleSpec(nu1=2, nu2=2, smoother="rbgs", restriction="pt",
                tol=0.0, rtol=1e-8, max_cycles=40, use_pallas=True,
                track_error=False)
cyc_p2 = CycleSpec(nu1=2, nu2=2, smoother=P2_SMOOTH, restriction="pt",
                   tol=0.0, rtol=1e-8, max_cycles=40, use_pallas=True,
                   track_error=False)

# P2 at N elements: DOFs on the half-step lattice = (2N+1)^d.
base2, finest2 = factor_levels(N)
rhs = -6.0 if NDIM == 2 else -12.0
# MG_P2_DEVICE_BUILD=1 (default for 3D constant kappa): the plane-free
# parity-table hierarchy (build_p2_hierarchy) — the ONLY P2 path that
# fits the 513^3 production lattice (materialized planes are 51 x
# 0.69 GB there); rediscretized coarse ops, measured same cycle count
# as Galerkin.  0 = the host planes build (Galerkin), the pre-round-4
# path, for comparison at small N.
DEVICE_BUILD = os.environ.get(
    "MG_P2_DEVICE_BUILD", "1" if NDIM == 3 else "0") == "1"
cfg_p2 = SolverConfig(
    problem=ProblemSpec(ndim=NDIM, degree=2, rhs_const=rhs),
    # depth -5: the dense coarse factorization is O(m^3) — at N=1024 a
    # finest-3 coarsest is a 257^2-DOF dense Cholesky (hours on this
    # host); one more coarsening level costs ~nothing per cycle and
    # keeps the setup in seconds.
    hierarchy=HierarchySpec(coarsest_elements=base2,
                            coarsest_level=max(0, finest2 - 5),
                            finest_level=finest2,
                            coarse_operator=(
                                "rediscretize" if DEVICE_BUILD
                                else "galerkin")),
    cycle=cyc_p2, dtype="float32",
)
print(f"building P2 hierarchy ({N}^{NDIM} elements, "
      f"{'device parity-table' if DEVICE_BUILD else 'host planes'})...",
      file=sys.stderr, flush=True)
t0 = time.time()
if DEVICE_BUILD:
    from multigrid_dolfinx_tpu import build_p2_hierarchy

    hier_p2 = build_p2_hierarchy(cfg_p2)
else:
    hier_p2 = build_hierarchy(cfg_p2)
jax.block_until_ready(hier_p2.finest.b)
build_p2 = time.time() - t0
dt_p2 = timed(hier_p2, cyc_p2, K)
del hier_p2

# P1 at 2N elements: same DOF count.  Depth -6 matches the headline
# bench.py hierarchy (a -4 coarsest at 512 leaves a 33^3-point dense
# coarse apply that inflates the P1 cycle ~2.4x and flatters the ratio).
base1, finest1 = factor_levels(2 * N)
model = models.poisson3d if NDIM == 3 else models.poisson2d
cfg_p1 = model(finest_level=finest1, coarsest_level=max(0, finest1 - 6),
               coarsest_elements=base1, dtype="float32", cycle=cyc)
hier_p1 = build_lean_hierarchy(cfg_p1)
jax.block_until_ready(hier_p1.finest.b)
dt_p1 = timed(hier_p1, cyc, K)

ndofs = (2 * N + 1) ** NDIM
print(json.dumps({
    "metric": f"vcycle_p2_vs_p1_{NDIM}d",
    "ndofs": ndofs,
    "ms_per_vcycle_p2": round(dt_p2 * 1e3, 2),
    "ms_per_vcycle_p1": round(dt_p1 * 1e3, 2),
    "p2_vs_p1": round(dt_p2 / dt_p1, 2),
    "p2_build_seconds": round(build_p2, 1),
    "platform": jax.devices()[0].platform,
}), flush=True)
