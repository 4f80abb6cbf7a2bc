"""Command-line entry point.

The reference's only "entry point" is executing Multigrid_prototype.py top
to bottom with hardcoded literals (SURVEY.md §1).  This CLI makes every
parameter a flag and reproduces the reference's CSV outputs.

Examples::

    # the reference's exact run (3 levels, V(50,50), tol 1e-11) + CSVs
    python -m multigrid_dolfinx_tpu solve --reference-parity --csv

    # production config on TPU
    python -m multigrid_dolfinx_tpu solve --finest-level 8 --nu 2 \\
        --smoother rbgs --restriction pt --dtype float32 --tol 1e-8 --pallas

    # 3D
    python -m multigrid_dolfinx_tpu solve --ndim 3 --finest-level 4 \\
        --coarsest-level 1 --nu 2 --restriction pt --dtype float32
"""
from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def _build_config(args):
    from .config import CycleSpec, HierarchySpec, ProblemSpec, SolverConfig

    if args.reference_parity:
        from .config import reference_parity_config

        return reference_parity_config()

    kappa = None
    if args.kappa:
        from .config import KAPPA_PRESETS

        kappa = KAPPA_PRESETS[args.kappa]
    problem = ProblemSpec(
        ndim=args.ndim,
        degree=args.degree,
        rhs_const=args.rhs_const,
        diagonal=args.diagonal,
        kappa=kappa,
    )
    hierarchy = HierarchySpec(
        coarsest_elements=args.coarsest_elements,
        coarsest_level=args.coarsest_level,
        finest_level=args.finest_level,
        coarse_operator=args.coarse_operator,
    )
    cycle = CycleSpec(
        mu0=args.mu0,
        nu1=args.nu,
        nu2=args.nu,
        omega=args.omega,
        smoother=args.smoother,
        cycle=args.cycle,
        restriction=args.restriction,
        tol=args.tol,
        rtol=args.rtol,
        max_cycles=args.max_cycles,
        use_pallas=args.pallas,
        track_error=not args.no_track_error,
    )
    return SolverConfig(
        problem=problem, hierarchy=hierarchy, cycle=cycle, dtype=args.dtype
    )


def _direct_reference_error(cfg, hier):
    """Error of the direct-LU finest-grid solution vs the manufactured
    solution — the reference's validation solve + the `['Dolf', err]` row
    it appends to the error CSV (Multigrid_prototype.py:120-133, 152-156).
    SuperLU on the assembled CSR, FEM-L2 error via the same quadrature the
    MG solve reports."""
    from scipy.sparse.linalg import spsolve

    from .fem import assembly as fa
    from .mesh import build_grid_hierarchy
    from .solver.fmg import error_norm
    from .solver.vcycle import pad_to

    import jax.numpy as jnp

    grids = build_grid_hierarchy(cfg.hierarchy, ndim=cfg.problem.ndim)
    asm = fa.assemble_level(grids[-1], cfg.problem)
    A = fa.stencil_to_csr(asm.offsets, asm.A_planes)
    u = spsolve(A.tocsr(), asm.b.reshape(-1))
    ug = pad_to(
        jnp.asarray(u.reshape(asm.b.shape), hier.finest.b.dtype),
        hier.finest.shape,
    )
    return float(error_norm(hier, ug))


def cmd_solve(args) -> int:
    if args.platform:
        import jax

        # env JAX_PLATFORMS can be pinned by site config; jax.config wins.
        jax.config.update("jax_platforms", args.platform)
    if args.dtype == "float64" or args.reference_parity:
        # --reference-parity implies the reference's float64 semantics
        import jax

        jax.config.update("jax_enable_x64", True)

    from . import build_hierarchy, solve
    from .utils import csv_io
    from .utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    cfg = _build_config(args)
    t0 = time.perf_counter()
    if args.shard in ("halo3d", "halo2d"):
        # full explicit distributed V-cycle: z-decomposition in 3D,
        # row decomposition in 2D (the latter runs the stencil2d_dist
        # halo-strip kernels when --pallas and f32)
        import numpy as _np
        import jax as _jax
        from jax.sharding import Mesh

        ndev = args.shard_devices or len(_jax.devices())
        if args.shard == "halo3d":
            mesh = Mesh(_np.array(_jax.devices()[:ndev]), ("gz",))
            if args.resume:
                from .parallel.halo3d import build_halo_resume3d
                from .utils.checkpoint import load_halo_checkpoint

                hier, dist_resume = build_halo_resume3d(cfg, mesh)
                u0, k0, hist0 = load_halo_checkpoint(args.resume, cfg)

                def dist_solve(h):
                    return dist_resume(h, u0, k0, hist0)
            elif args.mgcg:
                from .parallel.halo3d import build_halo_mgcg3d

                hier, dist_solve = build_halo_mgcg3d(cfg, mesh)
            else:
                from .parallel.halo3d import build_halo_solver3d

                hier, dist_solve = build_halo_solver3d(cfg, mesh)
        else:
            from .parallel.halo import build_halo_solver

            mesh = Mesh(
                _np.array(_jax.devices()[:ndev]).reshape(ndev, 1),
                ("gx", "gy"),
            )
            hier, dist_solve = build_halo_solver(cfg, mesh)
        t_build = time.perf_counter() - t0
        t0 = time.perf_counter()
        u, k_dev, done, hist_dev = dist_solve(hier)
        np.asarray(u)
        t_solve = time.perf_counter() - t0
        k = int(k_dev)
        if args.checkpoint and args.shard == "halo3d":
            from .utils.checkpoint import save_halo_checkpoint

            save_halo_checkpoint(args.checkpoint, cfg, u, k,
                                 _np.asarray(hist_dev))
        n = cfg.hierarchy.elements_at(cfg.hierarchy.finest_level)
        out = {
            "converged": bool(done),
            "cycles": k,
            "ndofs": (n + 1) ** cfg.problem.ndim,
            "devices": ndev,
            "build_seconds": round(t_build, 3),
            "solve_seconds": round(t_solve, 3),
        }
        print(json.dumps(out))
        return 0 if bool(done) else 1
    if args.shard == "gspmd":
        from .parallel.sharding import (
            build_sharded_hierarchy,
            make_device_mesh,
        )

        mesh = make_device_mesh(args.shard_devices or None)
        hier = build_sharded_hierarchy(cfg, mesh, lean=args.lean)
    elif args.mixed:
        from .solver.mixed import build_mixed

        hier = build_mixed(cfg)
    elif cfg.problem.kappa is not None and cfg.problem.degree == 1:
        # variable-coefficient flagship path: the whole hierarchy builds
        # on device (fem.fast_var) — the host assembler is impractical
        # past ~256^3 (BENCHMARKS.md).  Reference capability: arbitrary
        # coefficient forms at the entry point
        # (Multigrid_prototype.py:88-91).
        from .solver.hierarchy import build_var_hierarchy

        hier = build_var_hierarchy(cfg)
    elif cfg.problem.kappa is not None:
        # variable-kappa P2 composes only through the exact host
        # assembler today (BASELINE config 4 at toy scale; PARITY.md).
        hier = build_hierarchy(cfg)
    elif args.lean and args.degree == 2:
        # plane-free parity-table P2 — the production-scale P2 path
        # (zero operator bytes in HBM; fem.fast_p2).
        from .solver.hierarchy import build_p2_hierarchy

        hier = build_p2_hierarchy(cfg, crop_storage=args.crop)
    elif args.lean:
        from .solver.hierarchy import build_lean_hierarchy

        hier = build_lean_hierarchy(cfg, crop_storage=args.crop)
    else:
        hier = build_hierarchy(cfg)
    t_build = time.perf_counter() - t0

    t0 = time.perf_counter()
    if args.mixed:
        from .solver.mixed import solve_mixed

        result = solve_mixed(hier, cfg.cycle)
        cycles = int(result.num_cycles)
        err_hist = np.asarray(result.err_hist)
    elif args.mgcg:
        from .solver.krylov import solve_mgcg

        result = solve_mgcg(hier, cfg.cycle)
        cycles = int(result.num_iters)
        err_hist = None
    elif args.resume:
        from .solver.fmg import resume_solve
        from .utils.checkpoint import load_checkpoint

        u0, _, _, prev_cycles, _ = load_checkpoint(args.resume, cfg)
        result = resume_solve(hier, cfg.cycle, u0)
        cycles = int(result.num_cycles)
        err_hist = np.asarray(result.err_hist)
    else:
        result = solve(hier, cfg.cycle, mode="fixed" if args.fixed else "tol")
        cycles = int(result.num_cycles)
        err_hist = np.asarray(result.err_hist)
    np.asarray(result.u)
    t_solve = time.perf_counter() - t0

    n = cfg.hierarchy.elements_at(cfg.hierarchy.finest_level)
    ndofs = (n + 1) ** cfg.problem.ndim
    res_hist = np.asarray(result.res_hist)
    k = cycles
    out = {
        "converged": bool(result.converged),
        "cycles": k,
        "final_residual": float(res_hist[k - 1]) if k > 0 else None,
        "final_error": (
            float(err_hist[k - 1]) if err_hist is not None and k > 0 else None
        ),
        "ndofs": ndofs,
        "build_seconds": round(t_build, 3),
        "solve_seconds": round(t_solve, 3),
        "dofs_per_second_per_cycle": (
            round(ndofs * k / t_solve, 1) if t_solve > 0 and k else None
        ),
    }
    print(json.dumps(out))

    if args.csv:
        L = cfg.hierarchy.num_levels
        csv_io.write_residual_csv(res_hist, n, L, args.csv_dir)
        if err_hist is not None:
            ref_err = None
            do_ref = args.reference_solve or args.reference_parity
            if do_ref and not (args.lean or args.mixed) \
                    and ndofs <= 2_000_000:
                ref_err = _direct_reference_error(cfg, hier)
            elif do_ref:
                print("skipping direct reference solve "
                      "(lean hierarchy or > 2M DOFs)", file=sys.stderr)
            csv_io.write_error_csv(err_hist, n, L, args.csv_dir,
                                   reference_error=ref_err)
        csv_io.append_iter_count_csv(n, L, k, args.csv_dir)

    if args.checkpoint:
        from .utils.checkpoint import save_checkpoint

        save_checkpoint(args.checkpoint, cfg, result)
    return 0 if bool(result.converged) or args.fixed else 1


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(prog="multigrid_dolfinx_tpu")
    sub = parser.add_subparsers(dest="command", required=True)

    ps = sub.add_parser("solve", help="run a multigrid solve")
    ps.add_argument("--reference-parity", action="store_true",
                    help="the reference driver's exact config "
                         "(Multigrid_prototype.py:35-46)")
    ps.add_argument("--ndim", type=int, default=2, choices=(2, 3))
    ps.add_argument("--degree", type=int, default=1, choices=(1, 2))
    ps.add_argument("--rhs-const", type=float, default=None)
    ps.add_argument("--diagonal", default="right", choices=("right", "left"))
    ps.add_argument("--coarsest-elements", type=int, default=8)
    ps.add_argument("--coarsest-level", type=int, default=1)
    ps.add_argument("--finest-level", type=int, default=3)
    ps.add_argument("--coarse-operator", default="rediscretize",
                    choices=("rediscretize", "galerkin"))
    ps.add_argument("--mu0", type=int, default=2)
    ps.add_argument("--nu", type=int, default=2,
                    help="pre/post smoothing sweeps")
    ps.add_argument("--omega", type=float, default=2.0 / 3.0)
    ps.add_argument("--smoother", default="rbgs",
                    choices=("jacobi", "rbgs", "chebyshev"))
    ps.add_argument("--cycle", default="V", choices=("V", "W", "F"))
    ps.add_argument("--restriction", default="pt",
                    choices=("injection", "full_weighting", "pt"))
    ps.add_argument("--tol", type=float, default=1e-8)
    ps.add_argument("--rtol", type=float, default=0.0,
                    help="also stop at rtol * zero-iterate residual")
    ps.add_argument("--max-cycles", type=int, default=100)
    ps.add_argument("--dtype", default="float32")
    ps.add_argument("--platform", default=None,
                    help="force a jax platform (e.g. cpu, tpu)")
    ps.add_argument("--pallas", action="store_true",
                    help="fused Pallas TPU kernels")
    ps.add_argument("--kappa", default=None,
                    choices=("linear", "peak", "layers"),
                    help="variable diffusion coefficient preset "
                         "(config.KAPPA_PRESETS); degree 1 routes through "
                         "the device-side builder (build_var_hierarchy), "
                         "degree 2 through the exact host assembler")
    ps.add_argument("--lean", action="store_true",
                    help="O(1)-host-memory hierarchy (constant-coefficient "
                         "P1 via fast_const, or with --degree 2 the "
                         "plane-free parity-table P2 path; keeps FEM-L2 "
                         "residual and error norms via class-table mass + "
                         "on-the-fly u*)")
    ps.add_argument("--crop", action="store_true",
                    help="crop-eligible lean storage: drop the high-"
                         "boundary Dirichlet planes from 3D level arrays "
                         "(~20%% less HBM traffic per sweep at 512^3; "
                         "tolerance solves stop after identical cycle "
                         "counts via the build-time exact rn_ref)")
    ps.add_argument("--shard", default="none",
                    choices=("none", "gspmd", "halo2d", "halo3d"),
                    help="multi-chip path: GSPMD block sharding or the "
                         "explicit z-decomposed 3D V-cycle")
    ps.add_argument("--shard-devices", type=int, default=0,
                    help="devices to use (0 = all)")
    ps.add_argument("--no-track-error", action="store_true",
                    help="skip the per-cycle FEM-L2 error-vs-exact norm "
                         "(S*Q compute passes per cycle at scale)")
    ps.add_argument("--mixed", action="store_true",
                    help="mixed precision: float32 iterative refinement "
                         "around a bfloat16 inner V-cycle (lean "
                         "constant-coefficient configs; halves HBM "
                         "traffic per cycle)")
    ps.add_argument("--mgcg", action="store_true",
                    help="MG-preconditioned CG instead of plain V-cycles")
    ps.add_argument("--fixed", action="store_true",
                    help="fixed mu0 cycles at every level "
                         "(reference FullMultiGrid_test)")
    ps.add_argument("--csv", action="store_true",
                    help="write reference-format CSV histories")
    ps.add_argument("--csv-dir", default=".")
    ps.add_argument("--checkpoint", default=None,
                    help="save solver state to this .npz")
    ps.add_argument("--resume", default=None,
                    help="resume V-cycling from a checkpoint .npz "
                         "(fingerprint-checked against the config)")
    ps.add_argument("--reference-solve", action="store_true",
                    help="also run the direct-LU validation solve and "
                         "append its error as the ['Dolf', err] row of "
                         "the error CSV (reference "
                         "Multigrid_prototype.py:120-133,152-156); "
                         "implied by --reference-parity")
    ps.set_defaults(rhs_const=None)
    args = parser.parse_args(argv)

    if args.command == "solve":
        if args.rhs_const is None:
            args.rhs_const = -6.0 if args.ndim == 2 else -12.0
        return cmd_solve(args)
    return 2


if __name__ == "__main__":
    sys.exit(main())
