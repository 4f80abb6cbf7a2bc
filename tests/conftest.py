"""Test environment: 8 virtual CPU devices (multi-chip sharding tests run on
a virtual mesh, per the driver's dryrun model) and float64 enabled for
parity-vs-oracle tests."""
import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# Force CPU via jax.config: the environment may pin JAX_PLATFORMS to a real
# TPU platform (e.g. 'axon' via sitecustomize), and the env var alone does
# not win against it; tests must run on the 8-device virtual CPU mesh.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import sys  # noqa: E402
from pathlib import Path  # noqa: E402

# Make tests/oracle importable as a plain module path.
sys.path.insert(0, str(Path(__file__).parent))
