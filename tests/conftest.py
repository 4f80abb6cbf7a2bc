"""Test environment: 8 virtual CPU devices (multi-chip sharding tests run on
a virtual mesh, per the driver's dryrun model) and float64 enabled for
parity-vs-oracle tests."""
import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    _flags = (_flags + " --xla_force_host_platform_device_count=8").strip()
if "xla_cpu_collective_call_terminate_timeout_seconds" not in _flags:
    # Root cause of the rare 'Fatal Python error: Aborted' in the shard_map
    # CPU solves (round-2 flake): XLA's collective-call rendezvous EXITS THE
    # PROCESS ("Exiting to ensure a consistent program state") when the 8
    # per-device threads don't all arrive within its terminate timeout —
    # which on this 1-core host under load (parallel test runs, interpret-
    # mode Pallas) they sometimes don't.  The abort message lands in
    # pytest's captured stderr and dies with the process, hence the
    # previously "unexplained" SIGABRT.  Raise the timeouts far beyond any
    # legitimate scheduling delay; real hangs still terminate, just later.
    _flags = (
        _flags
        + " --xla_cpu_collective_call_warn_stuck_timeout_seconds=120"
        + " --xla_cpu_collective_call_terminate_timeout_seconds=1200"
        + " --xla_cpu_collective_timeout_seconds=1200"
    )
os.environ["XLA_FLAGS"] = _flags

# Isolate the suite from the repo's shared persistent compilation cache
# (.jax_cache).  Any test that reaches enable_compilation_cache (the CLI,
# __graft_entry__) would otherwise point THIS process at the same directory
# a concurrently-running TPU bench is writing — and a torn/truncated entry
# segfaults jax's cache reader (observed: Fatal Python error: Segmentation
# fault in compilation_cache.get_executable_and_time during full-suite runs
# alongside device work; this, not shard_map, was the remaining "random"
# crash).  A per-run private dir keeps the cache feature exercised while
# making concurrent corruption impossible.
if "MG_COMPILATION_CACHE" not in os.environ:
    import tempfile

    os.environ["MG_COMPILATION_CACHE"] = tempfile.mkdtemp(
        prefix="mg-test-jaxcache-")

import jax  # noqa: E402

# Force CPU via jax.config: the environment may pin JAX_PLATFORMS to a real
# TPU platform (e.g. 'axon' via sitecustomize), and the env var alone does
# not win against it; tests must run on the 8-device virtual CPU mesh.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import subprocess  # noqa: E402
import sys  # noqa: E402
from pathlib import Path  # noqa: E402

import pytest  # noqa: E402

# Make tests/oracle importable as a plain module path.
sys.path.insert(0, str(Path(__file__).parent))


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "isolate: run this test in a fresh python subprocess (the "
        "shard_map CPU solves have shown rare nondeterministic SIGABRTs "
        "in native XLA code under repeated in-process runs; isolation "
        "keeps a crash from killing the whole suite and captures the "
        "faulthandler traceback for diagnosis)",
    )


def _isolated_runtest(item):
    nodeid = item.nodeid

    def run():
        env = dict(os.environ, MG_TEST_ISOLATED="1")
        r = subprocess.run(
            [sys.executable, "-m", "pytest", "-q", "-x", "-p",
             "no:cacheprovider", nodeid],
            cwd=str(item.config.rootpath), env=env,
            capture_output=True, text=True, timeout=1800,
        )
        if r.returncode != 0:
            pytest.fail(
                f"isolated subprocess exited {r.returncode}:\n"
                f"{r.stdout[-4000:]}\n{r.stderr[-2000:]}",
                pytrace=False,
            )

    return run


def pytest_collection_modifyitems(config, items):
    if os.environ.get("MG_TEST_ISOLATED"):
        return  # already inside an isolated child: run normally
    for item in items:
        if item.get_closest_marker("isolate"):
            item.runtest = _isolated_runtest(item)
