"""Child program for the 2-process multi-controller smoke test
(test_multihost.py spawns two of these).  Each process: join the cluster
from MG_* env vars, build a global 1D mesh over all 4 devices (2 local
per process), run the z-decomposed 3D halo solve, and print one JSON line
with the cycle count and the solution's center value (fetched as a
replicated scalar so every process can read it back)."""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

from multigrid_dolfinx_tpu.parallel import multihost  # noqa: E402

assert multihost.initialize_from_env(verbose=True)
assert jax.process_count() == 2, jax.process_count()
assert jax.device_count() == 4, jax.device_count()

from multigrid_dolfinx_tpu import models  # noqa: E402
from multigrid_dolfinx_tpu.config import CycleSpec  # noqa: E402
from multigrid_dolfinx_tpu.parallel.halo3d import build_halo_solver3d  # noqa: E402

mesh = multihost.make_global_mesh()
cyc = CycleSpec(nu1=2, nu2=2, smoother="rbgs", restriction="pt",
                tol=0.0, rtol=1e-6, max_cycles=30)
cfg = models.poisson3d(finest_level=2, coarsest_level=1,
                       coarsest_elements=4, dtype="float64", cycle=cyc)
hier, solve_fn = build_halo_solver3d(cfg, mesh)
u, k, done = solve_fn(hier)

m = cfg.hierarchy.elements_at(cfg.hierarchy.finest_level) + 1
center = jax.jit(lambda x: x[m // 2, m // 2, m // 2])(u)
out = {
    "process": jax.process_index(),
    "cycles": int(k),
    "done": bool(done),
    "center": float(center),
}
print("MHRESULT " + json.dumps(out), flush=True)
sys.exit(0)
