"""Per-op timing breakdown of the 3D V-cycle at 512^3 on the TPU.

All device arrays are passed as jit ARGUMENTS (closing over them inlines
them as giant program constants -> remote-compile payload blowup).  Each
op is timed as K chained applications inside one jitted fori_loop with a
single scalar readback; the measured cost of an EMPTY chain (same loop,
identity body) is subtracted so the ~30 ms tunnel RPC latency and loop
overhead cancel instead of inflating every op by 30/K ms.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import numpy as np
import jax, jax.numpy as jnp

from multigrid_dolfinx_tpu.utils.compile_cache import enable_compilation_cache
enable_compilation_cache()

from multigrid_dolfinx_tpu import models
from multigrid_dolfinx_tpu.config import CycleSpec
from multigrid_dolfinx_tpu.solver.hierarchy import build_lean_hierarchy
from multigrid_dolfinx_tpu.solver.vcycle import vcycle
from multigrid_dolfinx_tpu.ops.pallas import stencil3d as s3
from multigrid_dolfinx_tpu.ops.dispatch import const7_weights
from multigrid_dolfinx_tpu.mesh import factor_levels


N = int(sys.argv[1]) if len(sys.argv) > 1 else 512
cyc = CycleSpec(nu1=2, nu2=2, smoother="rbgs", restriction="pt",
                tol=0.0, rtol=1e-8, max_cycles=40, use_pallas=True,
                track_error=False)
_base, _finest = factor_levels(N)
cfg = models.poisson3d(finest_level=_finest,
                       coarsest_level=max(0, _finest - 6),
                       coarsest_elements=_base,
                       dtype="float32", cycle=cyc)
hier = build_lean_hierarchy(cfg)
L = hier.num_levels - 1
lev = hier.levels[L]
lm = lev.A.logical_m
wc, woff = const7_weights(lev.A)
v0 = jnp.zeros_like(lev.b)
coarse = hier.levels[L - 1]
cshape = coarse.b.shape
lmc = coarse.A.logical_m
print("fine padded shape:", v0.shape, "lm:", lm, file=sys.stderr)

GB = v0.size * v0.dtype.itemsize / 1e9     # one array pass over HBM


def measure(body, K, v_init, f_init, reps):
    @jax.jit
    def run(v, f):
        return jax.lax.fori_loop(0, K, lambda i, vv: body(vv, f), v)

    out = run(v_init, f_init)
    float(out[(1,) * out.ndim])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = run(out, f_init)       # chained across reps (distinct inputs)
        float(out[(1,) * out.ndim])
    return (time.perf_counter() - t0) / reps / K * 1e3


BASE = None


def chain(name, body, v_init, f_init, K=40, reps=3, passes=None):
    """body(v, f) -> v'; prints per-op ms with the empty-chain baseline
    removed, plus effective HBM bandwidth if `passes` (array passes per
    op) is given."""
    global BASE
    if BASE is None:
        BASE = measure(lambda v, f: v, 200, v_init, f_init, 2)
    dt = measure(body, K, v_init, f_init, reps) - BASE
    bw = f"  {passes * GB / dt * 1e3:7.0f} GB/s eff" if passes else ""
    print(f"{name:44s} {dt:8.3f} ms/op{bw}")


chain("rb_sweep_fused", lambda v, f: s3.rb_sweep_fused(v, f, lm, wc, woff),
      v0, lev.b, passes=3)
chain("rb_sweep2_fused (per PAIR)",
      lambda v, f: s3.rb_sweep2_fused(v, f, lm, wc, woff),
      v0, lev.b, K=20, passes=3)
chain("jacobi_sweep",
      lambda v, f: s3.jacobi_sweep(v, f, lm, wc, woff, 2.0 / 3.0),
      v0, lev.b, passes=3)
chain("residual", lambda v, f: s3.residual(v, f, lm, wc, woff),
      v0, lev.b, passes=3)
chain("restrict_residual_pt + prolong_add",
      lambda v, f: s3.prolong_linear_add(
          s3.restrict_residual_pt(v, f, cshape, lm, lmc, wc, woff), v, lm),
      v0, lev.b, passes=4.375)


def vchain(name, lidx, K=10, reps=3):
    @jax.jit
    def run(h, v):
        f = h.levels[lidx].b
        return jax.lax.fori_loop(
            0, K, lambda i, vv: vcycle(h, cyc, lidx, vv, f), v)

    vi = jnp.zeros_like(hier.levels[lidx].b)
    out = run(hier, vi)
    float(out[(1,) * out.ndim])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = run(hier, out)
        float(out[(1,) * out.ndim])
    dt = (time.perf_counter() - t0) / reps / K * 1e3 - BASE
    print(f"{name:44s} {dt:8.3f} ms/op")


vchain("full V-cycle", L)
vchain("V-cycle from L-1 (coarse tail)", L - 1, K=20)
