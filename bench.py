"""Benchmark: V-cycle throughput (DOFs/s) on the target accelerator.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "DOF/s", "vs_baseline": N, ...}

The reference publishes no numbers (README is empty — BASELINE.md), so the
baseline is self-generated: the scipy/CSR oracle that re-executes the
reference solver's semantics (tests/oracle/reference_semantics.py) timed on
the same host CPU, per-DOF-per-cycle.  That baseline is *generous* to the
reference — the oracle's transfers are vectorized numpy, whereas the real
reference does per-DOF Python dict loops (multigrid.py:59-198), so
vs_baseline understates the true speedup.

Config: 2D Poisson, 5-level hierarchy, V(2,2) red-black Gauss-Seidel with
variational P^T restriction, float32 — BASELINE.json config-2 shape, sized
to exercise HBM (2049x2049 finest, 4.2M DOFs).
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def bench_tpu(n_elems: int, cycles: int):
    import jax
    from multigrid_dolfinx_tpu import build_hierarchy, models
    from multigrid_dolfinx_tpu.config import CycleSpec
    from multigrid_dolfinx_tpu.solver.vcycle import vcycle

    import math

    finest = int(math.log2(n_elems // 8))
    use_pallas = os.environ.get("MG_BENCH_PALLAS", "1") == "1"
    cyc = CycleSpec(nu1=2, nu2=2, smoother="rbgs", restriction="pt",
                    tol=1e-6, max_cycles=cycles, use_pallas=use_pallas)
    cfg = models.poisson2d(
        finest_level=finest, coarsest_level=max(0, finest - 6),
        dtype="float32", cycle=cyc,
    )
    print(f"building hierarchy ({n_elems}^2 finest)...", file=sys.stderr)
    hier = build_hierarchy(cfg)
    L = hier.num_levels - 1
    f = hier.finest.b

    import jax.numpy as jnp
    from functools import partial

    @jax.jit
    def k_cycles(hier, v):
        for _ in range(cycles):
            v = vcycle(hier, cyc, L, v, f)
        return v

    v0 = jnp.zeros_like(f)
    v = k_cycles(hier, v0)
    v.block_until_ready()           # compile + warm up
    t0 = time.perf_counter()
    v = k_cycles(hier, v0)
    v.block_until_ready()
    dt = time.perf_counter() - t0

    # correctness guard: the cycles must actually reduce the residual
    lm = hier.finest.n + 1
    r0 = float(jnp.linalg.norm((f - hier.finest.A.apply(v0))[:lm, :lm]))
    r1 = float(jnp.linalg.norm((f - hier.finest.A.apply(v))[:lm, :lm]))
    assert r1 < 1e-3 * r0, f"benchmark solve not converging: {r1} vs {r0}"

    ndofs = (n_elems + 1) ** 2
    return ndofs * cycles / dt, ndofs, dt, jax.devices()[0].platform


def bench_oracle_baseline(n_elems: int, cycles: int) -> float:
    """Reference-semantics baseline (scipy CSR + vectorized transfers) in
    DOF/s per V-cycle on the host CPU; measured at a smaller size and
    reported per-DOF (CSR SpMV throughput is size-independent at these
    scales)."""
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "tests"))
    from oracle.reference_semantics import build_oracle, v_cycle
    from multigrid_dolfinx_tpu import models
    from multigrid_dolfinx_tpu.config import CycleSpec

    import math

    finest = int(math.log2(n_elems // 8))
    cyc = CycleSpec(nu1=2, nu2=2, restriction="injection",
                    tol=1e-6, max_cycles=cycles)
    cfg = models.poisson2d(
        finest_level=finest, coarsest_level=max(0, finest - 6),
        dtype="float64", cycle=cyc,
    )
    prob = build_oracle(cfg)
    f = prob.levels[-1].b
    v = np.zeros_like(f)
    L = len(prob.levels) - 1
    v = v_cycle(prob, cfg, L, v, f)       # warm caches
    t0 = time.perf_counter()
    for _ in range(cycles):
        v = v_cycle(prob, cfg, L, v, f)
    dt = time.perf_counter() - t0
    ndofs = (n_elems + 1) ** 2
    return ndofs * cycles / dt


def main():
    n_elems = int(os.environ.get("MG_BENCH_N", "2048"))
    cycles = int(os.environ.get("MG_BENCH_CYCLES", "10"))
    base_n = int(os.environ.get("MG_BENCH_BASE_N", "512"))

    dofs_per_s, ndofs, dt, platform = bench_tpu(n_elems, cycles)
    baseline = bench_oracle_baseline(base_n, max(2, cycles // 2))

    print(
        json.dumps(
            {
                "metric": "vcycle_throughput_2d_poisson",
                "value": round(dofs_per_s, 1),
                "unit": "DOF/s",
                "vs_baseline": round(dofs_per_s / baseline, 2),
                "detail": {
                    "ndofs": ndofs,
                    "cycles": cycles,
                    "seconds": round(dt, 4),
                    "platform": platform,
                    "config": "V(2,2) rbgs + P^T restriction, f32, 7 levels, pallas",
                    "baseline": "scipy-CSR reference-semantics oracle on host CPU (DOF/s)",
                    "baseline_dofs_per_s": round(baseline, 1),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
