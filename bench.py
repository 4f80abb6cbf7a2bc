"""Benchmark: V-cycle throughput (DOFs/s) on the target accelerator.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "DOF/s", "vs_baseline": N, ...}

Headline metric (BASELINE.json north star): 3D Poisson P1, 512^3 = 135M
DOFs on a single chip, V(2,2) red-black Gauss-Seidel with variational P^T
restriction, float32, fused Pallas kernels, lean (O(1)-host) hierarchy.
Also solves to 1e-8 relative residual end-to-end as a correctness guard.

The reference publishes no numbers (README is empty — BASELINE.md), so the
baseline is self-generated: the scipy/CSR oracle that re-executes the
reference solver's semantics (tests/oracle/reference_semantics.py) timed on
the same host CPU, per-DOF-per-cycle.  That baseline is *generous* to the
reference — the oracle's transfers are vectorized numpy, whereas the real
reference does per-DOF Python dict loops (multigrid.py:59-198), so
vs_baseline understates the true speedup.

Env knobs: MG_BENCH_NDIM (3|2), MG_BENCH_N (elements/dim), MG_BENCH_CYCLES,
MG_BENCH_PALLAS (1|0), MG_BENCH_BASE_N, MG_BENCH_MIXED (1 = float32
iterative refinement around a bfloat16 inner V-cycle, solver/mixed.py).
"""
from __future__ import annotations

import json
import math
import os
import sys
import time

import numpy as np

from multigrid_dolfinx_tpu.mesh import factor_levels as _factor_levels


def _flush(msg):
    print(msg, file=sys.stderr, flush=True)


def bench_device(ndim: int, n_elems: int, cycles: int, use_pallas: bool,
                 mixed: bool = False):
    import jax
    import jax.numpy as jnp

    from multigrid_dolfinx_tpu.utils.compile_cache import (
        enable_compilation_cache,
    )

    cache_dir = enable_compilation_cache()
    _flush(f"compilation cache: {cache_dir}")

    from multigrid_dolfinx_tpu import models, solve
    from multigrid_dolfinx_tpu.config import CycleSpec
    from multigrid_dolfinx_tpu.solver.hierarchy import build_lean_hierarchy
    from multigrid_dolfinx_tpu.solver.vcycle import vcycle

    base, finest = _factor_levels(n_elems)
    # the reachable f32 relative-residual floor shrinks with problem size
    # (rn_ref grows); small smoke sizes stagnate just above 1e-8.
    rtol = 1e-8 if n_elems >= 256 else 1e-6
    cyc = CycleSpec(nu1=2, nu2=2, smoother="rbgs", restriction="pt",
                    tol=0.0, rtol=rtol, max_cycles=40,
                    use_pallas=use_pallas, track_error=False)
    model = models.poisson3d if ndim == 3 else models.poisson2d
    cfg = model(finest_level=finest, coarsest_level=max(0, finest - 6),
                coarsest_elements=base, dtype="float32", cycle=cyc)
    _flush(f"building lean hierarchy ({n_elems}^{ndim}, mixed={mixed})...")
    if mixed:
        # float32 iterative refinement around a bfloat16 inner V-cycle
        # (solver/mixed.py): the timed unit is one refinement iteration —
        # bf16 V-cycle on the correction + the f32 fine residual that
        # feeds the next iteration (and the convergence test), i.e.
        # everything the tolerance loop pays per cycle.
        from multigrid_dolfinx_tpu.solver.mixed import (
            _from16, _to16, build_mixed, solve_mixed,
        )
        from multigrid_dolfinx_tpu.solver.vcycle import compute_residual

        mh = build_mixed(cfg)
        hier = mh.h32
        jax.block_until_ready(hier.finest.b)
        L = hier.num_levels - 1
        shape16 = tuple(mh.h16.finest.shape)
        shape32 = tuple(hier.finest.shape)

        @jax.jit
        def k_cycles(mh_, v):
            f = mh_.h32.finest.b
            f16_zero = jnp.zeros(shape16, jnp.bfloat16)

            def body(i, carry):
                v, r = carry
                e16 = vcycle(mh_.h16, cyc, L, f16_zero, _to16(r, shape16))
                v = v + _from16(e16, shape32)
                r = compute_residual(mh_.h32.finest, v, f,
                                     use_pallas=use_pallas)
                return v, r

            r0 = compute_residual(mh_.h32.finest, v, f,
                                  use_pallas=use_pallas)
            return jax.lax.fori_loop(0, cycles, body, (v, r0))[0]

        bench_arg = mh
    else:
        # cropped lean storage (solver/hierarchy._crop_points_3d): drops
        # the masked high-boundary node plane so the lane dim is n, not
        # roundup(n+1, 128) — at 512^3 that removes the ~20% of every HBM
        # pass that moved tile padding.  Bitwise-equal V-cycle on the
        # stored overlap, fused FEM-L2 norm extended to the cropped
        # layout, rtol threshold from the exact full-storage rn_ref
        # precomputed at build, FMG ramp reconstructs the missing planes
        # analytically (tests/test_lean.py::
        # test_cropped_storage_vcycle_bitwise_equal and
        # test_cropped_tolerance_solve_matches_full).
        crop = (os.environ.get("MG_BENCH_CROP", "1") == "1"
                and ndim == 3 and use_pallas)
        hier = build_lean_hierarchy(cfg, crop_storage=crop)
        jax.block_until_ready(hier.finest.b)
        L = hier.num_levels - 1

        @jax.jit
        def k_cycles(hier, v):
            f = hier.finest.b
            return jax.lax.fori_loop(
                0, cycles, lambda i, vv: vcycle(hier, cyc, L, vv, f), v
            )

        bench_arg = hier

    v0 = jnp.zeros_like(hier.finest.b)
    _flush("compiling V-cycle loop...")
    t0 = time.time()
    v = k_cycles(bench_arg, v0)
    float(v[(1,) * v.ndim])  # readback forces real completion
    _flush(f"compile+warmup {time.time() - t0:.1f}s; timing...")
    del v                    # a live warmup output is a whole fine array

    reps = 3
    # distinct inputs per rep: the remote-execution layer caches identical
    # calls, and async dispatch means only a readback proves completion.
    # Each rep's input is created inside the timed region and freed after
    # its call (pre-building all of them held reps extra fine arrays live
    # — at 768^3 that alone exceeded HBM); the one fill pass per rep is
    # <0.2% of the 20-cycle call it feeds.
    shape, dt_ = v0.shape, v0.dtype
    del v0
    t0 = time.perf_counter()
    for i in range(reps):
        vv = jnp.full(shape, 1e-6 * (i + 1), dt_)
        out = k_cycles(bench_arg, vv)
        float(out[(1,) * out.ndim])
        del vv, out
    dt = (time.perf_counter() - t0) / reps

    # correctness guard: full solve to 1e-8 relative residual
    t0 = time.time()
    if mixed:
        res = solve_mixed(mh, cyc)
    else:
        res = solve(hier, cyc, mode="tol")
    float(res.u[(1,) * res.u.ndim])
    t_solve = time.time() - t0
    assert bool(res.converged), "bench solve did not converge"

    ndofs = (n_elems + 1) ** ndim
    return {
        "dofs_per_s": ndofs * cycles / dt,
        "ndofs": ndofs,
        "ms_per_cycle": dt / cycles * 1e3,
        "solve_seconds_incl_compile": round(t_solve, 3),
        "solve_cycles": int(res.num_cycles),
        "platform": jax.devices()[0].platform,
    }


def bench_oracle_baseline(ndim: int, n_elems: int, cycles: int) -> float:
    """Reference-semantics baseline (scipy CSR + vectorized transfers) in
    DOF/s per V-cycle on the host CPU, measured at a smaller size and
    reported per-DOF (CSR SpMV throughput is size-independent here)."""
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "tests"))
    from oracle.reference_semantics import build_oracle, v_cycle
    from multigrid_dolfinx_tpu import models
    from multigrid_dolfinx_tpu.config import CycleSpec

    base, finest = _factor_levels(n_elems)
    cyc = CycleSpec(nu1=2, nu2=2, restriction="injection",
                    tol=1e-6, max_cycles=cycles)
    model = models.poisson3d if ndim == 3 else models.poisson2d
    cfg = model(finest_level=finest, coarsest_level=max(0, finest - 3),
                coarsest_elements=base, dtype="float64", cycle=cyc)
    prob = build_oracle(cfg)
    f = prob.levels[-1].b
    v = np.zeros_like(f)
    L = len(prob.levels) - 1
    v = v_cycle(prob, cfg, L, v, f)       # warm caches
    t0 = time.perf_counter()
    for _ in range(cycles):
        v = v_cycle(prob, cfg, L, v, f)
    dt = time.perf_counter() - t0
    ndofs = (n_elems + 1) ** ndim
    return ndofs * cycles / dt


def main():
    ndim = int(os.environ.get("MG_BENCH_NDIM", "3"))
    default_n = "512" if ndim == 3 else "2048"
    n_elems = int(os.environ.get("MG_BENCH_N", default_n))
    # 40 cycles per timed call: each device call through the axon tunnel
    # pays ~30 ms RPC latency, which at 5 cycles inflated the reported
    # per-cycle time by ~6 ms (profiler-traced device time per V-cycle is
    # 20.7 ms at 512^3 post-tail-fusion vs 28.6 ms reported at 5
    # cycles/call).  The production tolerance driver runs its whole
    # (up to max_cycles=40) V-cycle loop inside ONE device program, so
    # amortizing the RPC over 40 cycles mirrors the real call pattern;
    # it leaves < 0.8 ms/cycle of tunnel overhead in the number.
    cycles = int(os.environ.get("MG_BENCH_CYCLES", "40"))
    base_n = int(os.environ.get("MG_BENCH_BASE_N",
                                "128" if ndim == 3 else "1024"))
    use_pallas = os.environ.get("MG_BENCH_PALLAS", "1") == "1"
    mixed = os.environ.get("MG_BENCH_MIXED", "0") == "1"

    dev = bench_device(ndim, n_elems, cycles, use_pallas, mixed=mixed)
    # Oracle measured at two sizes: the smaller shows the in-cache rate,
    # the larger (2M+ DOFs, default 128^3 / 1024^2 — well out of L3) is
    # what vs_baseline uses, so the per-DOF extrapolation to the device's
    # problem size leans on the slower, defensible out-of-cache number.
    base_small = base_n // 2
    baseline_small = bench_oracle_baseline(ndim, base_small,
                                           max(2, cycles // 2))
    baseline = bench_oracle_baseline(ndim, base_n, max(2, cycles // 4))

    print(
        json.dumps(
            {
                "metric": f"vcycle_throughput_{ndim}d_poisson",
                "value": round(dev["dofs_per_s"], 1),
                "unit": "DOF/s",
                "vs_baseline": round(dev["dofs_per_s"] / baseline, 2),
                "detail": {
                    "ndofs": dev["ndofs"],
                    "cycles": cycles,
                    "ms_per_vcycle": round(dev["ms_per_cycle"], 2),
                    "solve_to_rtol1e-8_seconds_incl_compile":
                        dev["solve_seconds_incl_compile"],
                    "platform": dev["platform"],
                    "config": (
                        "V(2,2) rbgs + P^T restriction, lean hierarchy, "
                        "pallas kernels, "
                        + ("mixed precision (f32 iterative refinement + "
                           "bf16 inner V-cycle; unit = one refinement "
                           "iteration incl. the f32 residual)"
                           if mixed else "f32")
                    ),
                    "baseline": "scipy-CSR reference-semantics oracle on "
                                "host CPU (DOF/s per V-cycle, measured "
                                f"at {base_n}^{ndim} elements)",
                    "baseline_dofs_per_s": round(baseline, 1),
                    "baseline_dofs_per_s_small": {
                        "n_elems": base_small,
                        "dofs_per_s": round(baseline_small, 1),
                    },
                },
            }
        )
    )


if __name__ == "__main__":
    main()
