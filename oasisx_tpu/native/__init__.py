"""Native (C++) host-runtime kernels, loaded via ctypes.

The reference's setup-time heavy lifting lives in DOLFINx C++ (mesh,
topology, dofmaps — SURVEY §2b); here the hot host-side setup kernels are
C++ too, compiled on demand with g++ (-O3 -shared -fPIC, cached next to
the source) and exposed through a plain C ABI. NumPy fallbacks keep
everything working when no compiler is available.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading
from pathlib import Path

import numpy as np

logger = logging.getLogger("oasisx_tpu.native")

_SRC = Path(__file__).parent / "topology.cpp"
_LIB = Path(__file__).parent / "_topology.so"
_lock = threading.Lock()
_lib = None
_tried = False


def _load():
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        try:
            if not _LIB.exists() or _LIB.stat().st_mtime < _SRC.stat().st_mtime:
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", str(_SRC), "-o", str(_LIB)],
                    check=True,
                    capture_output=True,
                )
            lib = ctypes.CDLL(str(_LIB))
            i32p = ctypes.POINTER(ctypes.c_int32)
            lib.build_facet_topology.restype = ctypes.c_int64
            lib.build_facet_topology.argtypes = [
                i32p, ctypes.c_int64, ctypes.c_int32, i32p, ctypes.c_int32,
                ctypes.c_int32, i32p, i32p, i32p, i32p,
            ]
            lib.unique_rows.restype = ctypes.c_int64
            lib.unique_rows.argtypes = [i32p, ctypes.c_int64, ctypes.c_int32, i32p, i32p]
            _lib = lib
        except Exception as e:  # pragma: no cover - compiler unavailable
            logger.warning("native kernels unavailable (%s); using NumPy fallbacks", e)
            _lib = None
        return _lib


def available() -> bool:
    return _load() is not None


def _as_i32(a):
    return np.ascontiguousarray(a, dtype=np.int32)


def build_facet_topology(cells: np.ndarray, local_facets: np.ndarray):
    """Returns (facets, facet_cells, facet_local, inverse) or None."""
    lib = _load()
    if lib is None:
        return None
    cells = _as_i32(cells)
    lf = _as_i32(local_facets)
    ncells, nvc = cells.shape
    nlf, fnv = lf.shape
    m = ncells * nlf
    inverse = np.empty(m, dtype=np.int32)
    facets = np.empty((m, fnv), dtype=np.int32)
    fcells = np.empty((m, 2), dtype=np.int32)
    flocal = np.empty((m, 2), dtype=np.int32)
    p = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))
    nf = lib.build_facet_topology(
        p(cells), ncells, nvc, p(lf), nlf, fnv, p(inverse), p(facets), p(fcells), p(flocal)
    )
    return facets[:nf].copy(), fcells[:nf].copy(), flocal[:nf].copy(), inverse


def unique_rows(rows: np.ndarray):
    """Returns (unique_rows, inverse_ids) or None."""
    lib = _load()
    if lib is None:
        return None
    rows = _as_i32(rows)
    n, k = rows.shape
    out = np.empty_like(rows)
    ids = np.empty(n, dtype=np.int32)
    p = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))
    nu = lib.unique_rows(p(rows), n, k, p(out), p(ids))
    return out[:nu].copy(), ids
