"""Fused residual+FEM-L2-norm kernel vs the plain-XLA check, on TPU.

Times, inside single jitted fori_loops (RPC amortized):
  * the V-cycle alone                   (the bench.py headline unit)
  * tol-loop body, plain check          (vcycle + compute_residual +
                                         quadratic_form mass norm)
  * tol-loop body, fused check          (vcycle + stencil3d_norm one-pass
                                         residual+norm over (v, f))
The delta of the last two is what every tolerance-mode V-cycle pays for
its convergence test (reference res_calculator, multigrid.py:292-296).

Usage: python scripts/bench_norm.py [N] [K]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import jax
import jax.numpy as jnp

from multigrid_dolfinx_tpu.utils.compile_cache import enable_compilation_cache
enable_compilation_cache()

from multigrid_dolfinx_tpu import models, build_lean_hierarchy
from multigrid_dolfinx_tpu.config import CycleSpec
from multigrid_dolfinx_tpu.ops import dispatch
from multigrid_dolfinx_tpu.ops.pallas import stencil3d_norm
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

print(f"building lean hierarchy at {N}^3 ...", flush=True)
hier = build_lean_hierarchy(cfg)
L = hier.num_levels - 1
lv = hier.finest
shape = tuple(lv.shape)
lm = lv.n + 1
wc, woff = dispatch.const7_weights(lv.A)
M = hier.M_fine


@jax.jit
def loop_v(h, v):
    f = h.finest.b
    return jax.lax.fori_loop(0, K, lambda i, vv: vcycle(h, cyc, L, vv, f), v)


@jax.jit
def loop_plain(h, v):
    f = h.finest.b

    def body(i, carry):
        v, acc = carry
        v = vcycle(h, cyc, L, v, f)
        r = compute_residual(h.finest, v, f, use_pallas=True)
        return v, acc + residual_norm(h, r)
    return jax.lax.fori_loop(0, K, body, (v, jnp.float32(0.0)))


@jax.jit
def loop_fused(h, v):
    # the production route: exact per-tetrahedron geometric form
    f = h.finest.b

    def body(i, carry):
        v, acc = carry
        v = vcycle(h, cyc, L, v, f)
        q = stencil3d_norm.residual_tet_quad(
            v, f, lm, wc, woff, h.M_fine.uniform_p1_mass)
        return v, acc + jnp.sqrt(jnp.maximum(q, 0.0))
    return jax.lax.fori_loop(0, K, body, (v, jnp.float32(0.0)))


@jax.jit
def loop_generic(h, v):
    # the generic table-correlation kernel (measured compute-bound on
    # v5e; kept as the fallback for non-certified mass operators)
    f = h.finest.b

    def body(i, carry):
        v, acc = carry
        v = vcycle(h, cyc, L, v, f)
        q = stencil3d_norm.residual_mass_quad(
            v, f, h.M_fine.class_tables, h.M_fine.offsets, lm, wc, woff)
        return v, acc + jnp.sqrt(jnp.maximum(q, 0.0))
    return jax.lax.fori_loop(0, K, body, (v, jnp.float32(0.0)))


def _first(out):
    return out[0] if isinstance(out, tuple) else out


def timed(tag, fn):
    out = fn(hier, jnp.zeros(shape, jnp.float32))   # compile + warm
    float(_first(out)[1, 1, 1])
    del out
    reps = 2
    t0 = time.perf_counter()
    for i in range(reps):
        vv = jnp.full(shape, 1e-6 * (i + 1), jnp.float32)
        out = fn(hier, vv)
        float(_first(out)[1, 1, 1])
        del vv, out
    dt = (time.perf_counter() - t0) / (reps * K) * 1e3
    print(f"{tag:34s} {dt:8.2f} ms/iter", flush=True)
    return dt


# numeric agreement first (one shot, off the clock)
v1 = jnp.full(shape, 1e-4, jnp.float32)
r = compute_residual(lv, v1, hier.finest.b, use_pallas=True)
from multigrid_dolfinx_tpu.ops.operators import quadratic_form
q_ref = float(quadratic_form(M, r, r))
q_tet = float(stencil3d_norm.residual_tet_quad(
    v1, hier.finest.b, lm, wc, woff, M.uniform_p1_mass))
q_gen = float(stencil3d_norm.residual_mass_quad(
    v1, hier.finest.b, M.class_tables, M.offsets, lm, wc, woff))
rel_t = abs(q_tet - q_ref) / abs(q_ref)
rel_g = abs(q_gen - q_ref) / abs(q_ref)
print(f"agreement: plain {q_ref:.8e} tet {q_tet:.8e} rel {rel_t:.2e} "
      f"generic {q_gen:.8e} rel {rel_g:.2e}", flush=True)
assert rel_t < 1e-5, rel_t
assert rel_g < 1e-5, rel_g

t_v = timed("vcycle alone", loop_v)
t_p = timed("vcycle + plain residual+norm", loop_plain)
t_f = timed("vcycle + TET residual+norm", loop_fused)
t_g = timed("vcycle + generic-table residual+norm", loop_generic)
print(f"check cost: plain {t_p - t_v:.2f} ms  tet {t_f - t_v:.2f} ms "
      f"generic {t_g - t_v:.2f} ms "
      f"(tet speedup over plain {(t_p - t_v) / max(t_f - t_v, 1e-9):.1f}x)")
