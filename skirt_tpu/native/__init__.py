"""Native (C++) runtime components.

ref: the reference's native third-party layer (Voro++, Cfitsio, GAlib,
FFTConvolution — SURVEY.md §1 L0).  Components here are built on demand
with the system toolchain and loaded through ctypes; every consumer has a
pure-Python fallback so the framework works without a compiler.
"""

import ctypes
import os
import subprocess
import sysconfig

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, "libskirt_native.so")
_SOURCES = ["voronoi.cpp", "alias.cpp"]


def _needs_build() -> bool:
    if not os.path.exists(_LIB_PATH):
        return True
    lib_mtime = os.path.getmtime(_LIB_PATH)
    return any(os.path.getmtime(os.path.join(_DIR, s)) > lib_mtime
               for s in _SOURCES)


def build(force: bool = False) -> str:
    """Compile the native library (g++ -O3) if missing or stale."""
    if force or _needs_build():
        cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC",
               "-std=c++17", "-o", _LIB_PATH]
        cmd += [os.path.join(_DIR, s) for s in _SOURCES]
        subprocess.run(cmd, check=True, capture_output=True, text=True)
    return _LIB_PATH


_lib = None


def load():
    """Load (building if needed) the native library; None if unavailable."""
    global _lib
    if _lib is not None:
        return _lib
    try:
        path = build()
        _lib = ctypes.CDLL(path)
        _lib.voronoi_build.restype = ctypes.c_int
        _lib.voronoi_build.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64),
        ]
        _lib.alias_build.restype = ctypes.c_int
        _lib.alias_build.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int32),
        ]
        return _lib
    except Exception:
        return None


def voronoi_cells(sites, box):
    """Exact Voronoi cells: (volumes, centroids, neighbor CSR) or None.

    sites: (n, 3) float64; box: (xmin, ymin, zmin, xmax, ymax, zmax).
    """
    import numpy as np
    lib = load()
    if lib is None:
        return None
    sites = np.ascontiguousarray(sites, dtype=np.float64)
    box = np.ascontiguousarray(box, dtype=np.float64)
    n = sites.shape[0]
    volumes = np.empty(n)
    centroids = np.empty((n, 3))
    offsets = np.empty(n + 1, dtype=np.int64)
    cap = max(32 * n, 1024)
    for _ in range(3):
        data = np.empty(cap, dtype=np.int64)
        rc = lib.voronoi_build(
            sites.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            ctypes.c_int64(n),
            box.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            volumes.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            centroids.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            data.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            ctypes.c_int64(cap),
            offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
        if rc == 0:
            return volumes, centroids, data[:offsets[n]], offsets
        cap = int(offsets[n]) + 16
    return None


def alias_tables(weights):
    """Walker alias tables via the native builder; None if unavailable.

    weights: (R, N) float array.  Returns (prob (R,N) float32,
    alias (R,N) int32) or None when the toolchain is missing (callers
    fall back to the numpy/python builder in numerics.build_alias_tables).
    """
    import numpy as np
    lib = load()
    if lib is None:
        return None
    w = np.ascontiguousarray(weights, np.float64)
    R, N = w.shape
    prob = np.empty((R, N), np.float32)
    alias = np.empty((R, N), np.int32)
    lib.alias_build(
        w.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        ctypes.c_int64(R), ctypes.c_int64(N),
        prob.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        alias.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    return prob, alias
