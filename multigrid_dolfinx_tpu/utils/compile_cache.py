"""Persistent XLA compilation cache.

A 7-level 3D V-cycle program can take minutes to compile on first run
(kernel unroll length scales it); the reference never compiles anything,
so compile latency is a TPU-build-specific delivery risk.  Enabling JAX's
persistent compilation cache makes every run after the first start warm:
compiled executables are keyed by (HLO, compile options, backend) and
reloaded from disk.

Call `enable_compilation_cache()` once early (bench.py, the CLI, and the
driver entry do).  Safe to call multiple times; silently no-ops if the
backend or jax build doesn't support it.
"""
from __future__ import annotations

import os

_DEFAULT_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), ".jax_cache")

_enabled = False


def enable_compilation_cache(cache_dir: str | None = None) -> str | None:
    """Point jax at a persistent on-disk compilation cache and lower the
    write thresholds so solver-sized programs always persist.  Returns the
    cache dir, or None if the cache could not be enabled."""
    global _enabled
    import jax

    path = (
        cache_dir
        or os.environ.get("MG_COMPILATION_CACHE")
        or _DEFAULT_DIR
    )
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        # default min compile time is 1s; V-cycle programs always exceed
        # it, but keep small kernels too — recompiling dozens of Pallas
        # shapes is where the minutes go.
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
        try:
            jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        except Exception:
            pass
        _enabled = True
        return path
    except Exception:  # pragma: no cover - unsupported backend/build
        return None
