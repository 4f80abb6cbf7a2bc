"""Profiling and timing utilities.

The reference has no timers at all (SURVEY.md §5).  Here: wall-clock phase
timers with DOFs/s derivation (the BASELINE metric) and a thin wrapper
around jax.profiler for device traces.
"""
from __future__ import annotations

import contextlib
import json
import time
from dataclasses import dataclass, field
from typing import Dict

import jax


@dataclass
class PhaseTimer:
    """Accumulates wall-clock per named phase; blocks on device work so the
    numbers mean what they say."""

    phases: Dict[str, float] = field(default_factory=dict)
    counts: Dict[str, int] = field(default_factory=dict)

    @contextlib.contextmanager
    def phase(self, name: str, block_on=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if block_on is not None:
                jax.block_until_ready(block_on)
            dt = time.perf_counter() - t0
            self.phases[name] = self.phases.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def dofs_per_second(self, name: str, ndofs: int, per_call: int = 1) -> float:
        total = self.phases.get(name, 0.0)
        n = self.counts.get(name, 0) * per_call
        if total <= 0.0 or n == 0:
            return 0.0
        return ndofs * n / total

    def summary(self) -> Dict[str, dict]:
        return {
            k: {
                "seconds": round(v, 6),
                "calls": self.counts.get(k, 0),
                "mean_ms": round(1e3 * v / max(1, self.counts.get(k, 0)), 4),
            }
            for k, v in sorted(self.phases.items())
        }

    def dump_json(self) -> str:
        return json.dumps(self.summary())


@contextlib.contextmanager
def device_trace(log_dir: str = "/tmp/mg_trace"):
    """Capture a jax.profiler trace (view with TensorBoard / xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()
