"""Capture a jax.profiler device trace of K V-cycles at N^3 and print the
per-kernel device-time breakdown (parsed from the trace events), giving
ground-truth op costs inside the real V-cycle instead of isolated-chain
estimates.  Usage: python scripts/trace3d.py [N] [K] [outdir]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import glob
import gzip
import json
import sys
from collections import defaultdict

import jax
import jax.numpy as jnp

from multigrid_dolfinx_tpu.utils.compile_cache import enable_compilation_cache
enable_compilation_cache()

from multigrid_dolfinx_tpu import models
from multigrid_dolfinx_tpu.config import CycleSpec
from multigrid_dolfinx_tpu.solver.hierarchy import build_lean_hierarchy
from multigrid_dolfinx_tpu.solver.vcycle import vcycle

N = int(sys.argv[1]) if len(sys.argv) > 1 else 512
K = int(sys.argv[2]) if len(sys.argv) > 2 else 5
OUT = sys.argv[3] if len(sys.argv) > 3 else "/tmp/mgtrace"

cyc = CycleSpec(nu1=2, nu2=2, smoother="rbgs", restriction="pt",
                tol=0.0, rtol=1e-8, max_cycles=40, use_pallas=True,
                track_error=False)
cfg = models.poisson3d(finest_level=6, coarsest_level=0,
                       coarsest_elements=N // 64,
                       dtype="float32", cycle=cyc)
hier = build_lean_hierarchy(cfg)
L = hier.num_levels - 1


@jax.jit
def run(h, v):
    f = h.levels[L].b
    return jax.lax.fori_loop(0, K, lambda i, vv: vcycle(h, cyc, L, vv, f), v)


v0 = jnp.zeros_like(hier.levels[L].b)
out = run(hier, v0)
float(out[1, 1, 1])                      # warm up / compile

with jax.profiler.trace(OUT):
    out = run(hier, out)
    float(out[1, 1, 1])

# ---- parse the trace: sum device-stream event durations by kernel name
files = sorted(glob.glob(OUT + "/**/*.trace.json.gz", recursive=True))
assert files, f"no trace files under {OUT}"
with gzip.open(files[-1], "rt") as fh:
    trace = json.load(fh)

# device lanes: process whose name mentions TPU / device XLA ops
pid_name = {}
for ev in trace["traceEvents"]:
    if ev.get("ph") == "M" and ev.get("name") == "process_name":
        pid_name[ev["pid"]] = ev["args"].get("name", "")

dev_pids = {p for p, n in pid_name.items()
            if "TPU" in n or "/device" in n.lower()}
tot = defaultdict(float)
cnt = defaultdict(int)
for ev in trace["traceEvents"]:
    if ev.get("ph") == "X" and ev.get("pid") in dev_pids and "dur" in ev:
        name = ev["name"].split(".")[0]
        tot[name] += ev["dur"] / 1e3      # us -> ms
        cnt[name] += 1

rows = sorted(tot.items(), key=lambda kv: -kv[1])
total = sum(tot.values())
print(f"{'kernel':58s} {'ms/Vcyc':>9s} {'count':>6s} {'%':>6s}")
for name, ms in rows[:24]:
    print(f"{name[:58]:58s} {ms / K:9.3f} {cnt[name]:6d} {100 * ms / total:6.1f}")
print(f"{'TOTAL (device-stream sum)':58s} {total / K:9.3f}")
