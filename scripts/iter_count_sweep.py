"""Reproduce the reference's mesh-size-vs-iteration-count study
(multigrid.py:296-302): run the solver across finest-grid sizes and append
`iter_count_for_diff_num_elems_{L}_levels.csv` rows — the classic
h-independence experiment.

Usage: python scripts/iter_count_sweep.py [--reference-parity] [--out DIR]
"""
import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reference-parity", action="store_true",
                    help="V(50,50) Jacobi + injection (reference config); "
                         "default is the production V(2,2) rbgs + pt")
    ap.add_argument("--levels", type=int, default=3)
    ap.add_argument("--finest", nargs="+", type=int, default=[2, 3, 4],
                    help="finest_level values to sweep (elems = 8*2^L)")
    ap.add_argument("--platform", default=None)
    ap.add_argument("--out", default=".")
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from multigrid_dolfinx_tpu import build_hierarchy, models, solve
    from multigrid_dolfinx_tpu.config import CycleSpec
    from multigrid_dolfinx_tpu.utils.csv_io import append_iter_count_csv

    jax.config.update("jax_enable_x64", True)
    if args.reference_parity:
        cyc = CycleSpec()          # reference defaults
    else:
        cyc = CycleSpec(nu1=2, nu2=2, smoother="rbgs", restriction="pt",
                        tol=1e-9, max_cycles=60)
    dtype = "float64"

    rows = []
    for fl in args.finest:
        cfg = models.poisson2d(
            finest_level=fl, coarsest_level=fl - args.levels + 1,
            dtype=dtype, cycle=cyc,
        )
        hier = build_hierarchy(cfg)
        res = solve(hier, cfg.cycle, mode="tol")
        n = cfg.hierarchy.elements_at(fl)
        k = int(res.num_cycles)
        append_iter_count_csv(n, args.levels, k, args.out)
        rows.append({"elements": n, "cycles": k,
                     "converged": bool(res.converged)})
        print(json.dumps(rows[-1]), flush=True)
    print(json.dumps({"h_independent":
                      max(r["cycles"] for r in rows)
                      - min(r["cycles"] for r in rows) <= 2}))


if __name__ == "__main__":
    main()
