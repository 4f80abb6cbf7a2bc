"""Chase the cropped-norm regression (VERDICT r4 #9): residual_tet_quad
measured 10.2 ms on cropped 512^3 storage (520,512,512) vs 6.3 ms on the
full layout (520,520,640) — crop moves FEWER bytes, so the slowdown is
kernel-side (tz pick / crop-mask selects), not traffic.

Times the norm kernel alone (K calls in one jitted fori_loop, distinct
inputs per call) on both layouts, at each admissible tz (MG_TZ_TET
override), and prints a JSON line per (layout, tz).

Usage: python scripts/bench_crop_norm.py [N] [K]
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

from multigrid_dolfinx_tpu import models, build_lean_hierarchy
from multigrid_dolfinx_tpu.config import CycleSpec
from multigrid_dolfinx_tpu.ops import dispatch
from multigrid_dolfinx_tpu.mesh import factor_levels

N = int(sys.argv[1]) if len(sys.argv) > 1 else 512
K = int(sys.argv[2]) if len(sys.argv) > 2 else 20

base, finest = factor_levels(N)
cyc = CycleSpec(nu1=2, nu2=2, smoother="rbgs", restriction="pt",
                tol=0.0, rtol=1e-8, max_cycles=40, use_pallas=True,
                track_error=False)
cfg = models.poisson3d(finest_level=finest, coarsest_level=0,
                       coarsest_elements=base, dtype="float32", cycle=cyc)


def run(layout: str, tz: int | None):
    if tz is None:
        os.environ.pop("MG_TZ_TET", None)
    else:
        os.environ["MG_TZ_TET"] = str(tz)
    # fresh import path not needed: _pick_tz_tet reads env at trace time
    from multigrid_dolfinx_tpu.ops.pallas import stencil3d_norm

    hier = build_lean_hierarchy(cfg, crop_storage=(layout == "crop"))
    lv = hier.finest
    lm = lv.n + 1
    wc, woff = dispatch.const7_weights(lv.A)
    f = lv.b
    shape = tuple(lv.shape)
    eff_tz = stencil3d_norm._pick_tz_tet(*shape)
    if tz is not None and eff_tz != tz:
        print(f"# {layout} tz={tz}: shape {shape} inadmissible, skip",
              file=sys.stderr, flush=True)
        return

    @jax.jit
    def loop(f, v0):
        def body(i, carry):
            v, acc = carry
            v = v + 1e-7
            q = stencil3d_norm.residual_tet_quad(
                v, f, lm, wc, woff, hier.M_fine.uniform_p1_mass)
            return v, acc + q
        return jax.lax.fori_loop(0, K, body, (v0, jnp.float32(0.0)))

    v0 = jnp.full(shape, 1e-4, jnp.float32)
    out = loop(f, v0)
    float(out[1])
    t0 = time.perf_counter()
    out = loop(f, jnp.full(shape, 2e-4, jnp.float32))
    float(out[1])
    dt = (time.perf_counter() - t0) / K * 1e3
    print(json.dumps({
        "metric": "crop_norm_tz_sweep",
        "layout": layout, "shape": shape, "tz": eff_tz,
        "ms_per_norm": round(dt, 2),
    }), flush=True)
    del hier


for layout in ("full", "crop"):
    for tz in (None, 8, 4, 2):
        run(layout, tz)
