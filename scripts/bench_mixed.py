"""Mixed-precision (bfloat16 inner V-cycle) vs float32 at 512^3 on TPU.

Times, inside single jitted fori_loops (RPC amortized):
  * the float32 V-cycle alone           (the bench.py headline unit)
  * the float32 tol-loop body           (vcycle + residual + FEM-L2 norm)
  * the IR iteration                    (bf16 V-cycle + f32 residual+norm)
and runs both tolerance solves to rtol for the cycle-count comparison.

Usage: python scripts/bench_mixed.py [N] [K]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import jax
import jax.numpy as jnp

from multigrid_dolfinx_tpu.utils.compile_cache import enable_compilation_cache
enable_compilation_cache()

from multigrid_dolfinx_tpu import models, build_lean_hierarchy, solve
from multigrid_dolfinx_tpu.config import CycleSpec
from multigrid_dolfinx_tpu.solver.mixed import (
    build_mixed, ir_tolerance_solve, solve_mixed, _to16, _from16,
)
from multigrid_dolfinx_tpu.solver.fmg import residual_norm
from multigrid_dolfinx_tpu.solver.vcycle import compute_residual, vcycle
from multigrid_dolfinx_tpu.mesh import factor_levels

N = int(sys.argv[1]) if len(sys.argv) > 1 else 512
K = int(sys.argv[2]) if len(sys.argv) > 2 else 10


base, finest = factor_levels(N)
cyc = CycleSpec(nu1=2, nu2=2, smoother="rbgs", restriction="pt",
                tol=0.0, rtol=1e-8, max_cycles=40, use_pallas=True,
                track_error=False)
cfg = models.poisson3d(finest_level=finest, coarsest_level=0,
                       coarsest_elements=base, dtype="float32", cycle=cyc)

print(f"building mixed hierarchies at {N}^3 ...", flush=True)
mh = build_mixed(cfg)
h32, h16 = mh.h32, mh.h16
L = h32.num_levels - 1
lv32 = h32.finest
shape16 = tuple(h16.finest.shape)
shape32 = tuple(lv32.shape)
@jax.jit
def loop_v32(h, v):
    f = h.finest.b
    return jax.lax.fori_loop(0, K, lambda i, vv: vcycle(h, cyc, L, vv, f), v)


@jax.jit
def loop_tol32(h, v):
    f = h.finest.b

    def body(i, carry):
        v, acc = carry
        v = vcycle(h, cyc, L, v, f)
        r = compute_residual(h.finest, v, f, use_pallas=True)
        return v, acc + residual_norm(h, r)
    return jax.lax.fori_loop(0, K, body, (v, jnp.float32(0.0)))


@jax.jit
def loop_ir(m, v):
    f = m.h32.finest.b
    f16_zero = jnp.zeros(shape16, jnp.bfloat16)

    def body(i, carry):
        v, r, acc = carry
        e16 = vcycle(m.h16, cyc, L, f16_zero, _to16(r, shape16))
        v = v + _from16(e16, shape32)
        r = compute_residual(m.h32.finest, v, f, use_pallas=True)
        return v, r, acc + residual_norm(m.h32, r)
    r0 = compute_residual(m.h32.finest, v, f, use_pallas=True)
    out = jax.lax.fori_loop(0, K, body, (v, r0, jnp.float32(0.0)))
    return out[0], out[2]


def _first(out):
    return out[0] if isinstance(out, tuple) else out


def timed(tag, fn, harg):
    """Scalar-readback timing with DISTINCT inputs per rep: the tunnel's
    remote-exec layer is fully async (block_until_ready is a no-op) and
    caches identical execute calls."""
    shape, dt_ = shape32, jnp.float32
    out = fn(harg, jnp.zeros(shape, dt_))        # compile + warm
    float(_first(out)[1, 1, 1])
    del out
    reps = 2
    t0 = time.perf_counter()
    for i in range(reps):
        vv = jnp.full(shape, 1e-6 * (i + 1), dt_)
        out = fn(harg, vv)
        float(_first(out)[1, 1, 1])
        del vv, out
    dt = (time.perf_counter() - t0) / (reps * K) * 1e3
    print(f"{tag:34s} {dt:8.2f} ms/iter", flush=True)
    return dt


t_v32 = timed("f32 vcycle alone", loop_v32, h32)
t_tol = timed("f32 vcycle+residual+norm", loop_tol32, h32)
t_ir = timed("IR iter (bf16 vcycle + f32 r+n)", loop_ir, mh)
print(f"speedup vs f32 vcycle-alone unit: {t_v32 / t_ir:5.2f}x")
print(f"speedup vs f32 tol-loop body:     {t_tol / t_ir:5.2f}x")

print("tolerance solves (rtol 1e-8, FMG start):", flush=True)
res32 = solve(h32, cyc)
print("  f32   cycles:", int(res32.num_cycles),
      "converged:", bool(res32.converged))
res16 = solve_mixed(mh, cyc)
print("  mixed cycles:", int(res16.num_cycles),
      "converged:", bool(res16.converged))

print("from-zero V-cycling to rtol 1e-8 (no FMG):", flush=True)
from multigrid_dolfinx_tpu.solver.fmg import tolerance_solve


@jax.jit
def from0_32(h):
    return tolerance_solve(h, cyc, jnp.zeros(shape32, jnp.float32),
                           h.finest.b)


@jax.jit
def from0_ir(m):
    return ir_tolerance_solve(m, cyc, jnp.zeros(shape32, jnp.float32),
                              m.h32.finest.b)


r = from0_32(h32)
print("  f32   cycles:", int(r.num_cycles), "converged:",
      bool(r.converged))
r = from0_ir(mh)
print("  mixed cycles:", int(r.num_cycles), "converged:",
      bool(r.converged))
ndofs = (N + 1) ** 3
print(f"IR GDOF/s per iteration: {ndofs / t_ir / 1e6:.2f}")
