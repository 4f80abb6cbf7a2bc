"""ctypes bindings for the native (C++) assembly kernels in csrc/.

The reference's assembly is native (dolfinx C++ + FFCx-generated C,
Multigrid_prototype.py:88-110); csrc/assembler.cpp is this framework's
equivalent native setup component.  The library is built on demand with
`make -C csrc` (g++, no external deps); if unavailable, callers fall back
to the pure-numpy assembler transparently.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path
from typing import Optional

import numpy as np

_CSRC = Path(__file__).resolve().parent.parent.parent / "csrc"
_LIB_PATH = _CSRC / "libmgassembly.so"
_lib = None
_tried = False


def _build_library() -> bool:
    try:
        r = subprocess.run(
            ["make", "-C", str(_CSRC)],
            capture_output=True, text=True, timeout=120,
        )
        return r.returncode == 0 and _LIB_PATH.exists()
    except Exception:
        return False


def load_library():
    """Load (building if needed) the native assembler; None if unavailable."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if os.environ.get("MG_DISABLE_NATIVE", "0") == "1":
        return None
    if not _LIB_PATH.exists() and not _build_library():
        return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
    except OSError:
        return None
    dp = ctypes.POINTER(ctypes.c_double)
    lib.assemble_p1_2d.argtypes = [
        ctypes.c_int64, ctypes.c_double, ctypes.c_int, dp, dp, dp, dp,
        ctypes.c_double,
    ]
    lib.assemble_p1_2d.restype = None
    lib.assemble_p1_3d.argtypes = [
        ctypes.c_int64, ctypes.c_double, ctypes.c_int, dp, dp, dp, dp,
        ctypes.c_double,
    ]
    lib.assemble_p1_3d.restype = None
    _lib = lib
    return _lib


def _ptr(a: Optional[np.ndarray]):
    if a is None:
        return ctypes.POINTER(ctypes.c_double)()
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def native_assemble_p1(
    ndim: int,
    n: int,
    h: float,
    diagonal: str,
    kappa_cells: Optional[np.ndarray],
    f_const: float,
):
    """Assemble raw (no-BC) P1 stiffness + mass planes and constant-f load.

    Returns (planes (3^d, m..m), mass_planes, b) or None when the native
    library is unavailable.  kappa_cells: per-(simplex, cell) coefficient
    array ((S,) + (n,)*d, C-contiguous float64) or None.
    """
    lib = load_library()
    if lib is None:
        return None
    m = n + 1
    K = 3 ** ndim
    planes = np.zeros((K,) + (m,) * ndim, dtype=np.float64)
    # np.zeros -> calloc (lazy zero pages); zeros_like memsets eagerly,
    # which at 128^3+ costs seconds per level
    massp = np.zeros((K,) + (m,) * ndim, dtype=np.float64)
    b = np.zeros((m,) * ndim, dtype=np.float64)
    kp = None
    if kappa_cells is not None:
        kp = np.ascontiguousarray(kappa_cells, dtype=np.float64)
    if ndim == 2:
        lib.assemble_p1_2d(
            n, h, 1 if diagonal == "right" else 0, _ptr(kp),
            _ptr(planes), _ptr(massp), _ptr(b), f_const,
        )
    else:
        lib.assemble_p1_3d(
            n, h, 1 if diagonal == "right" else 0, _ptr(kp),
            _ptr(planes), _ptr(massp), _ptr(b), f_const,
        )
    return planes, massp, b
