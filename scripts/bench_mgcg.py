"""BASELINE config 5 capstone: FMG + MG-CG at 512^3 = 135M DOFs, one chip.

Times the WARM full solve (FMG start + iteration loop to rtol) for
  (a) the plain V-cycle tolerance loop (solver.fmg.tolerance_solve), and
  (b) flexible MG-CG (solver.krylov.mgcg_solve, fused A*p + fused FEM-L2
      norm check),
on two configs: the headline V(2,2) rbgs (where MG alone already converges
in ~1 cycle post-FMG, so CG can only add overhead) and a deliberately
weakened V(1,1) jacobi cycle (where CG's acceleration should cut
iterations — the classic MG-CG win).  The warm timing uses a second
hierarchy whose RHS is scaled by (1 + 1e-6) — iteration counts of a linear
solver with relative tolerances are scale-invariant, and the distinct
input defeats the remote-exec layer's identical-call cache.

Usage: python scripts/bench_mgcg.py [N]   (default 512)
"""
from __future__ import annotations

import dataclasses
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from multigrid_dolfinx_tpu import models, solve
from multigrid_dolfinx_tpu.config import CycleSpec
from multigrid_dolfinx_tpu.mesh import factor_levels
from multigrid_dolfinx_tpu.solver.hierarchy import build_lean_hierarchy
from multigrid_dolfinx_tpu.solver.krylov import solve_mgcg
from multigrid_dolfinx_tpu.utils.compile_cache import enable_compilation_cache

N = int(sys.argv[1]) if len(sys.argv) > 1 else 512
enable_compilation_cache()
base, finest = factor_levels(N)


def scaled(hier, s):
    levels = tuple(
        dataclasses.replace(lv, b=lv.b * s) for lv in hier.levels
    )
    rn = None if hier.rn_ref is None else hier.rn_ref * s
    return dataclasses.replace(hier, levels=levels, rn_ref=rn)


def run(tag, cyc, use_cg, fmg=True):
    cfg = models.poisson3d(finest_level=finest,
                           coarsest_level=max(0, finest - 6),
                           coarsest_elements=base, dtype="float32",
                           cycle=cyc)
    hier = build_lean_hierarchy(cfg, crop_storage=True)
    jax.block_until_ready(hier.finest.b)

    def go(h):
        if use_cg:
            r = solve_mgcg(h, cyc, fmg_start=fmg)
            k, conv = int(r.num_iters), bool(r.converged)
        elif fmg:
            r = solve(h, cyc, mode="tol")
            k, conv = int(r.num_cycles), bool(r.converged)
        else:
            from multigrid_dolfinx_tpu.solver.fmg import resume_solve

            r = resume_solve(h, cyc, jnp.zeros_like(h.finest.b))
            k, conv = int(r.num_cycles), bool(r.converged)
        float(r.u[1, 1, 1])
        return k, conv

    t0 = time.time()
    k, conv = go(hier)
    t_cold = time.time() - t0
    h2 = scaled(hier, 1.0 + 1e-6)
    jax.block_until_ready(h2.finest.b)
    t0 = time.perf_counter()
    k2, conv2 = go(h2)
    t_warm = time.perf_counter() - t0
    assert conv and conv2 and k == k2, (tag, k, k2, conv, conv2)
    print(f"{tag:34s} iters={k:3d} warm={t_warm*1e3:8.1f} ms "
          f"(cold incl compile {t_cold:.1f} s)", flush=True)
    return k, t_warm


hdr = f"== MG-CG capstone, {N}^3 = {(N + 1) ** 3:,} DOFs, f32, cropped =="
print(hdr, flush=True)

# the reachable f32 relative-residual floor shrinks with problem size
# (rn_ref grows); small smoke sizes stagnate just above 1e-8 (bench.py).
RTOL = 1e-8 if N >= 256 else 1e-6
strong = CycleSpec(nu1=2, nu2=2, smoother="rbgs", restriction="pt",
                   tol=0.0, rtol=RTOL, max_cycles=40, use_pallas=True)
# the weakened cycle stagnates above 1e-8 at f32 (jacobi V(1,1) smooths
# less per cycle, so its reachable floor is higher) — stop it at 1e-6.
weak = CycleSpec(nu1=1, nu2=1, smoother="jacobi", restriction="pt",
                 tol=0.0, rtol=1e-6, max_cycles=60, use_pallas=True)

kv, tv = run("V(2,2) rbgs  FMG + V-cycle loop", strong, False)
kc, tc = run("V(2,2) rbgs  FMG + MG-CG", strong, True)
kwv, twv = run("V(1,1) jacobi FMG + V-cycle loop", weak, False)
kwc, twc = run("V(1,1) jacobi FMG + MG-CG", weak, True)
# from-zero start: no FMG masking — the raw iteration-count comparison
# where CG's acceleration of a weak cycle actually shows.
kzv, tzv = run("V(1,1) jacobi 0-start V-cycles", weak, False, fmg=False)
kzc, tzc = run("V(1,1) jacobi 0-start MG-CG", weak, True, fmg=False)
print(f"strong-cycle: CG {kc} it / {tc*1e3:.0f} ms vs "
      f"plain {kv} cyc / {tv*1e3:.0f} ms")
print(f"weak-cycle:   CG {kwc} it / {twc*1e3:.0f} ms vs "
      f"plain {kwv} cyc / {twv*1e3:.0f} ms")
print(f"zero-start:   CG {kzc} it / {tzc*1e3:.0f} ms vs "
      f"plain {kzv} cyc / {tzv*1e3:.0f} ms "
      f"({kzv / max(kzc, 1):.2f}x cycle cut)")
