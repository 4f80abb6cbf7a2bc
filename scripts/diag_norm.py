"""Diagnose the fused residual+norm kernel's cost at N^3: time the Pallas
interior part and the jnp boundary-shell part separately, and A/B the
kernel against ablated variants (no pair correlations / no residual
stencil) to locate the compute bottleneck.  Usage:
python scripts/diag_norm.py [N] [iters]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import jax
import jax.numpy as jnp

from multigrid_dolfinx_tpu.utils.compile_cache import enable_compilation_cache
enable_compilation_cache()

from multigrid_dolfinx_tpu import models
from multigrid_dolfinx_tpu.config import CycleSpec
from multigrid_dolfinx_tpu.solver.hierarchy import build_lean_hierarchy
from multigrid_dolfinx_tpu.ops.pallas import stencil3d_norm as SN

N = int(sys.argv[1]) if len(sys.argv) > 1 else 512
IT = int(sys.argv[2]) if len(sys.argv) > 2 else 10

cyc = CycleSpec(nu1=2, nu2=2, smoother="rbgs", restriction="pt",
                tol=0.0, rtol=1e-8, max_cycles=40, use_pallas=True,
                track_error=False)
cfg = models.poisson3d(finest_level=6, coarsest_level=0,
                       coarsest_elements=N // 64,
                       dtype="float32", cycle=cyc)
hier = build_lean_hierarchy(cfg)
lv = hier.finest
M = hier.M_fine
from multigrid_dolfinx_tpu.ops import dispatch
wc, woff = dispatch.const7_weights(lv.A)
v = jnp.zeros_like(lv.b)
f = lv.b
lm = lv.n + 1
print("storage", v.shape, "lm", lm, flush=True)


def timeit(name, fn, *args):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(IT):
        out = jax.block_until_ready(fn(*args))
    dt = (time.perf_counter() - t0) / IT * 1e3
    print(f"{name:40s} {dt:8.2f} ms   (val {float(jnp.asarray(out).ravel()[0]):.6e})",
          flush=True)
    return dt


tables, offsets = M.class_tables, M.offsets
wc, woff = float(wc), float(woff)

full = jax.jit(lambda v, f: SN.residual_mass_quad(
    v, f, tables, offsets, lm, wc, woff))
timeit("residual_mass_quad (full)", full, v, f)

shell = jax.jit(lambda v, f: SN._shell_delta_quad(
    v, f, tables.astype(jnp.float32), tuple(map(tuple, offsets)), lm,
    jnp.float32(wc), jnp.float32(woff)))
timeit("shell delta (jnp strips)", shell, v, f)
