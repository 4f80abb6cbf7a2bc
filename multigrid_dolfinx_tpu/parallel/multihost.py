"""Multi-host / multi-process launch substrate.

The reference inherits its distribution substrate from `mpirun`: dolfinx/
PETSc shard the mesh across MPI ranks spawned externally, and every rank
executes the same script against `MPI.COMM_WORLD`
(/root/reference/Multigrid_prototype.py:66; ghost scatters at :79-80,
106-107).  The JAX analogue is the multi-controller runtime: every process
runs the same program, `jax.distributed.initialize` forms the cluster, and
`jax.devices()` then spans ALL processes' devices — a `Mesh` built over it
gives pjit/shard_map collectives that ride ICI within a slice and DCN
across slices, with no application-visible rank logic beyond the mesh.

Launch recipe (one process per host / per TPU slice worker):

    # host 0 (also the coordinator):
    MG_COORDINATOR=host0:8476 MG_NUM_PROCESSES=4 MG_PROCESS_ID=0 python app.py
    # host k:
    MG_COORDINATOR=host0:8476 MG_NUM_PROCESSES=4 MG_PROCESS_ID=k python app.py

On Cloud TPU pods the three env vars can be omitted entirely:
`jax.distributed.initialize()` autodetects the coordinator and process
count from the TPU metadata, so `initialize_from_env()` still does the
right thing.  For CPU smoke tests of the multi-process path (no TPU pod
needed), additionally set MG_LOCAL_DEVICES=N to give each process N
virtual CPU devices — see tests/test_multihost.py, which runs a real
2-process solve this way.

Typical use:

    from multigrid_dolfinx_tpu.parallel import multihost
    multihost.initialize_from_env()          # no-op when single-process
    mesh = multihost.make_global_mesh()      # 1D ('gz',) over ALL devices
    hier, solve = build_halo_solver3d(cfg, mesh)

`build_halo_solver3d`'s solve step is already multi-process-clean: its
inputs are replicated host values turned into global arrays here, and its
collectives (ppermute halos, psum norms, all_gather coarse grids) are
mesh-axis collectives that XLA lowers to the right transport per link.
"""
from __future__ import annotations

import os
from typing import Optional, Tuple

import numpy as np


def initialize_from_env(verbose: bool = False) -> bool:
    """Form the multi-controller cluster from MG_* env vars (or TPU-pod
    autodetection).  Returns True if a multi-process runtime was (or had
    already been) initialized, False for plain single-process runs.

    Env: MG_COORDINATOR=host:port, MG_NUM_PROCESSES=N, MG_PROCESS_ID=k;
    MG_LOCAL_DEVICES=N optionally gives each process N virtual CPU
    devices (CPU smoke tests of the multi-host path)."""
    num = os.environ.get("MG_NUM_PROCESSES")
    coord = os.environ.get("MG_COORDINATOR")
    if num is None and coord is None and not _on_tpu_pod():
        return False

    import jax

    local = os.environ.get("MG_LOCAL_DEVICES")
    if local is not None:
        # must be staged before the backend exists
        jax.config.update("jax_num_cpu_devices", int(local))
    kwargs = {}
    if coord is not None:
        kwargs["coordinator_address"] = coord
    if num is not None:
        kwargs["num_processes"] = int(num)
    pid = os.environ.get("MG_PROCESS_ID")
    if pid is not None:
        kwargs["process_id"] = int(pid)
    jax.distributed.initialize(**kwargs)
    if verbose:
        print(
            f"[multihost] process {jax.process_index()}/{jax.process_count()}"
            f": {jax.local_device_count()} local of "
            f"{jax.device_count()} global devices",
            flush=True,
        )
    return True


def _on_tpu_pod() -> bool:
    """Best-effort TPU-pod autodetection hint (jax.distributed.initialize
    can self-configure there)."""
    return os.environ.get("TPU_WORKER_HOSTNAMES") is not None


def make_global_mesh(axis_names: Tuple[str, ...] = ("gz",),
                     shape: Optional[Tuple[int, ...]] = None):
    """Device mesh over ALL processes' devices (jax.devices() is global
    after initialize).  Default: 1D ('gz',) — the layout the z-decomposed
    3D solver consumes.  Devices are ordered process-major, so contiguous
    z-slabs land on contiguous processes (halo ppermutes between z
    neighbors cross DCN only at process boundaries)."""
    import jax
    from jax.sharding import Mesh

    devs = np.array(jax.devices())
    if shape is None:
        shape = (len(devs),) + (1,) * (len(axis_names) - 1)
    return Mesh(devs.reshape(shape), axis_names)


def host_value_to_global(x, mesh, pspec):
    """Replicated host ndarray -> global jax.Array with the given
    PartitionSpec: each process contributes only its addressable shards
    (multi-controller device_put semantics); single-process it is a plain
    device_put.  This is how the halo solver's replicated RHS/factor
    inputs become mesh-global arrays."""
    import jax
    from jax.sharding import NamedSharding

    return jax.device_put(x, NamedSharding(mesh, pspec))
