"""Checkpoint / resume for solver state.

The reference persists nothing but CSV histories (multigrid.py:345-356) and
cannot resume an interrupted solve (SURVEY.md §5).  V-cycles are stateless
between iterations, so the full resumable state is tiny: the current
iterate, the recorded histories, and the cycle counter.  Stored as a plain
.npz next to a JSON config fingerprint so a resume against a different
problem is rejected loudly.
"""
from __future__ import annotations

import hashlib
import json
from pathlib import Path
import numpy as np

from ..config import SolverConfig
from ..solver.fmg import SolveResult


def config_fingerprint(config: SolverConfig) -> str:
    """Stable hash of the parts of the config that define the linear system
    (problem + hierarchy + dtype); cycle parameters may change on resume."""
    payload = {
        "ndim": config.problem.ndim,
        "degree": config.problem.degree,
        "rhs_const": config.problem.rhs_const,
        "diagonal": config.problem.diagonal,
        "has_kappa": config.problem.kappa is not None,
        "coarsest_elements": config.hierarchy.coarsest_elements,
        "coarsest_level": config.hierarchy.coarsest_level,
        "finest_level": config.hierarchy.finest_level,
        "coarse_operator": config.hierarchy.coarse_operator,
        "dtype": config.dtype,
    }
    return hashlib.sha256(
        json.dumps(payload, sort_keys=True).encode()
    ).hexdigest()[:16]


def save_checkpoint(path, config: SolverConfig, result: SolveResult) -> Path:
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    np.savez(
        path,
        u=np.asarray(result.u),
        res_hist=np.asarray(result.res_hist),
        err_hist=np.asarray(result.err_hist),
        num_cycles=int(result.num_cycles),
        converged=bool(result.converged),
        fingerprint=config_fingerprint(config),
    )
    return path


def save_halo_checkpoint(path, config: SolverConfig, u, num_cycles,
                         res_hist) -> Path:
    """Distributed-solver checkpoint: the z-sharded global iterate is
    gathered to host (np.asarray collects the addressable shards; under a
    multi-controller runtime call this on a fully-replicated gather or
    per-process with distinct paths), plus cycle index, residual history,
    and the config fingerprint."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    np.savez(
        path,
        u=np.asarray(u),
        res_hist=np.asarray(res_hist),
        num_cycles=int(num_cycles),
        fingerprint=config_fingerprint(config),
        kind="halo3d",
    )
    return path


def load_halo_checkpoint(path, config: SolverConfig):
    """Returns (u, num_cycles, res_hist) for build_halo_resume3d; raises
    if the checkpoint belongs to a different problem."""
    p = Path(path)
    data = np.load(p if str(p).endswith(".npz") else p.with_suffix(".npz"))
    fp = str(data["fingerprint"])
    want = config_fingerprint(config)
    if fp != want:
        raise ValueError(
            f"checkpoint fingerprint {fp} does not match config {want}"
        )
    return data["u"], int(data["num_cycles"]), data["res_hist"]


def load_checkpoint(path, config: SolverConfig):
    """Returns (u, res_hist, err_hist, num_cycles, converged); raises if the
    checkpoint belongs to a different problem."""
    data = np.load(Path(path).with_suffix(".npz") if not str(path).endswith(".npz") else path)
    fp = str(data["fingerprint"])
    want = config_fingerprint(config)
    if fp != want:
        raise ValueError(
            f"checkpoint fingerprint {fp} does not match config {want}"
        )
    return (
        data["u"],
        data["res_hist"],
        data["err_hist"],
        int(data["num_cycles"]),
        bool(data["converged"]),
    )
