"""Distributed 3D Pallas smoothing (z-decomposition + slab halo exchange)
== single-device fused kernels, on the 8-device CPU mesh (interpret)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from multigrid_dolfinx_tpu.ops.pallas import stencil3d
from multigrid_dolfinx_tpu.parallel.halo3d import (
    make_distributed_jacobi_smoother,
    make_distributed_rb_smoother,
)


requires_8_devices = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)

LM = 29                      # logical points per dim
SHAPE = (32, 32, 128)        # padded global (z divides 8 -> local 4 slabs)
WC, WOFF = 6.0 / 28.0, -1.0 / 28.0


def _fields(seed):
    rng = np.random.default_rng(seed)
    v = np.zeros(SHAPE, np.float32)
    f = np.zeros(SHAPE, np.float32)
    v[:LM, :LM, :LM] = rng.standard_normal((LM,) * 3)
    f[:LM, :LM, :LM] = rng.standard_normal((LM,) * 3)
    return jnp.asarray(v), jnp.asarray(f)


@requires_8_devices
def test_distributed_rb_matches_single_device():
    mesh = Mesh(np.array(jax.devices()[:8]), ("gz",))
    v, f = _fields(0)
    want = v
    for _ in range(2):
        want = stencil3d.rb_sweep_fused(want, f, LM, WC, WOFF,
                                        interpret=True)

    sm = make_distributed_rb_smoother(mesh, LM, WC, WOFF, nsweeps=2,
                                      interpret=True)
    sh = NamedSharding(mesh, P("gz"))
    got = sm(jax.device_put(v, sh), jax.device_put(f, sh))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-6, atol=2e-6)


@requires_8_devices
def test_distributed_jacobi_matches_single_device():
    mesh = Mesh(np.array(jax.devices()[:8]), ("gz",))
    v, f = _fields(1)
    want = v
    for _ in range(3):
        want = stencil3d.jacobi_sweep(want, f, LM, WC, WOFF, 2.0 / 3.0,
                                      interpret=True)

    sm = make_distributed_jacobi_smoother(mesh, LM, WC, WOFF, 2.0 / 3.0,
                                          nsweeps=3, interpret=True)
    sh = NamedSharding(mesh, P("gz"))
    got = sm(jax.device_put(v, sh), jax.device_put(f, sh))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-6, atol=2e-6)
