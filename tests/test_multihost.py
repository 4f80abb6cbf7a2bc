"""Multi-process (multi-controller) launch substrate: a REAL 2-process
run on CPU — `jax.distributed.initialize` cluster formation, a global
mesh spanning both processes' devices, and the z-decomposed 3D halo solve
whose ppermute/psum/all_gather collectives cross the process boundary.

This is the analogue of the reference's `mpirun` substrate
(Multigrid_prototype.py:66): ranks are spawned externally, every rank
runs the same program, and the runtime stitches them into one device
mesh.  The spawn/validate machinery lives in
multigrid_dolfinx_tpu/parallel/multihost_dryrun.py (shared with the
MG_DRYRUN_MULTIHOST=1 opt-in leg of __graft_entry__.dryrun_multichip);
see parallel/multihost.py for the launch recipe.
"""
import pytest

from multigrid_dolfinx_tpu.parallel import multihost_dryrun


@pytest.mark.isolate
def test_two_process_halo3d_solve():
    results = multihost_dryrun.spawn(num_processes=2, local_devices=2)
    # spawn() already cross-checks: rc 0 for every child, identical
    # cycle counts (SPMD — both processes observe the same global
    # solve), converged, center value == manufactured solution.
    assert len(results) == 2
    assert {r["process"] for r in results} == {0, 1}
    assert all(r["devices"] == 4 for r in results)
