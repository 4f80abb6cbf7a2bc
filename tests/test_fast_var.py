"""Device-side variable-coefficient hierarchy construction (fem.fast_var
+ solver.hierarchy.build_var_hierarchy) against the exact host assembler.

The host path (fem.assembly + fem.galerkin) is the oracle: it is itself
validated entry-by-entry against the exact-rational independent assembler
(test_golden_assembly).  The device path must reproduce its planes, RHS,
and Dirichlet grids to float64 roundoff — and hence identical solve
trajectories (reference capability: dolfinx's general coefficient forms,
Multigrid_prototype.py:88-91, now at device-build speed)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from multigrid_dolfinx_tpu import build_hierarchy, solve
from multigrid_dolfinx_tpu.config import (
    CycleSpec,
    HierarchySpec,
    ProblemSpec,
    SolverConfig,
)
from multigrid_dolfinx_tpu.solver.hierarchy import build_var_hierarchy


def _kappa(*xs):
    return 1.0 + xs[0] + 2.0 * xs[-1]


def _cfg(ndim, finest, coarse_op, smoother, reaction=0.0,
         dtype="float64", use_pallas=False):
    cyc = CycleSpec(nu1=2, nu2=2, smoother=smoother, restriction="pt",
                    tol=0.0, rtol=1e-8, max_cycles=60,
                    use_pallas=use_pallas)
    return SolverConfig(
        problem=ProblemSpec(ndim=ndim, kappa=_kappa, rhs_const=-6.0,
                            reaction=reaction),
        hierarchy=HierarchySpec(coarsest_elements=4, coarsest_level=1,
                                finest_level=finest,
                                coarse_operator=coarse_op),
        cycle=cyc, dtype=dtype,
    )


def _assert_levels_match(h_host, h_dev):
    assert h_host.num_levels == h_dev.num_levels
    for lh, ld in zip(h_host.levels, h_dev.levels):
        dh = {o: np.asarray(lh.A.planes[k])
              for k, o in enumerate(lh.A.offsets)}
        dd = {o: np.asarray(ld.A.planes[k])
              for k, o in enumerate(ld.A.offsets)}
        for o in sorted(set(dh) | set(dd)):
            a = dh.get(o)
            b = dd.get(o)
            if a is None:
                a = np.zeros_like(b)
            if b is None:
                b = np.zeros_like(a)
            np.testing.assert_allclose(
                a, b, atol=1e-11,
                err_msg=f"level {lh.level} offset {o}")
        np.testing.assert_allclose(np.asarray(lh.b), np.asarray(ld.b),
                                   atol=1e-11)
        np.testing.assert_allclose(np.asarray(lh.g), np.asarray(ld.g),
                                   atol=1e-11)


@pytest.mark.parametrize(
    "ndim,finest,coarse_op,smoother,reaction",
    [
        (2, 3, "galerkin", "rbgs", 0.0),
        (3, 2, "galerkin", "jacobi", 0.0),
        (3, 2, "rediscretize", "rbgs", 0.0),
        (3, 2, "galerkin", "rbgs", 5.0),      # screened Poisson
    ],
)
def test_device_build_matches_host(ndim, finest, coarse_op, smoother,
                                   reaction):
    cfg = _cfg(ndim, finest, coarse_op, smoother, reaction)
    h_host = build_hierarchy(cfg)
    h_dev = build_var_hierarchy(cfg)
    _assert_levels_match(h_host, h_dev)
    r1 = solve(h_host, cfg.cycle, mode="tol")
    r2 = solve(h_dev, cfg.cycle, mode="tol")
    assert int(r1.num_cycles) == int(r2.num_cycles)
    np.testing.assert_allclose(np.asarray(r1.u), np.asarray(r2.u),
                               atol=1e-9)


def test_device_build_chebyshev_lmax():
    """The device power iteration lands on the host estimate (same
    operator, same convergent quantity) and the solves agree."""
    cfg = _cfg(2, 3, "galerkin", "chebyshev")
    h_host = build_hierarchy(cfg)
    h_dev = build_var_hierarchy(cfg)
    for lh, ld in zip(h_host.levels, h_dev.levels):
        # both sides are 40-step power iterations from different random
        # starts — estimates agree to ~1-2%, which is all the Chebyshev
        # window needs
        assert abs(float(lh.sm.lmax) - float(ld.sm.lmax)) \
            < 2.5e-2 * float(lh.sm.lmax)
    r1 = solve(h_host, cfg.cycle, mode="tol")
    r2 = solve(h_dev, cfg.cycle, mode="tol")
    assert int(r1.num_cycles) == int(r2.num_cycles)


def test_device_build_pallas_aligned_storage_solve():
    """f32 + use_pallas storage (tile-aligned padding) solves through the
    planes kernels path and converges to the same solution as the host
    build (f32 tolerance)."""
    import dataclasses as dc

    cfg = _cfg(3, 2, "galerkin", "rbgs", dtype="float32", use_pallas=True)
    # rtol 1e-8 sits below the f32 residual floor (cf. bench.py) — the
    # f32 config checks kernel-path convergence, not the f64 floor
    cfg = dc.replace(cfg, cycle=dc.replace(cfg.cycle, rtol=1e-5))
    h_dev = build_var_hierarchy(cfg)
    assert h_dev.finest.shape[-1] % 128 == 0
    r = solve(h_dev, cfg.cycle, mode="tol")
    assert bool(r.converged)
    h_host = build_hierarchy(cfg)
    r0 = solve(h_host, cfg.cycle, mode="tol")
    np.testing.assert_allclose(np.asarray(r.u), np.asarray(r0.u),
                               rtol=2e-5, atol=2e-5)


def test_device_build_rejects_const():
    cfg = _cfg(2, 3, "galerkin", "rbgs")
    cfg = SolverConfig(
        problem=ProblemSpec(ndim=2, kappa=None, rhs_const=-6.0),
        hierarchy=cfg.hierarchy, cycle=cfg.cycle, dtype=cfg.dtype,
    )
    with pytest.raises(ValueError):
        build_var_hierarchy(cfg)


def test_galerkin_rap_chunked_matches_unchunked():
    """The z-chunked RAP conv (the at-scale form: the NC-layout conv
    input relayout materializes a full (K, lm^3) copy — 7.9 GB at 513^3)
    is bitwise the unchunked contraction: chunking never splits any
    output element's reduction window."""
    import jax.numpy as jnp

    from multigrid_dolfinx_tpu.fem import fast_var as fv
    from multigrid_dolfinx_tpu.mesh import GridLevel

    p = ProblemSpec(ndim=3, kappa=_kappa, rhs_const=-6.0)
    t = fv.build_var_template(p)
    g = GridLevel(level=0, ndim=3, n=16)
    planes = fv.device_raw_planes(t, g, p.kappa, jnp.dtype("float64"))
    elim = fv.eliminate_dirichlet_device(t.offsets, planes, 17)
    offs1, out1 = fv.galerkin_rap_device(t.offsets, elim, 17,
                                         chunk_threshold=999)
    offs2, out2 = fv.galerkin_rap_device(t.offsets, elim, 17,
                                         chunk_threshold=4)
    assert offs1 == offs2
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))
