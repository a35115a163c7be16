"""ctypes bindings for the native tesseroid GLQ engine."""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "native", "tessglq.cpp")
_LIB_PATH = os.path.join(_HERE, "native", "libtessglq.so")
_lock = threading.Lock()
_lib = None

FIELD_IDS = {
    "potential": 0, "gx": 1, "gy": 2, "gz": 3,
    "gxx": 4, "gxy": 5, "gxz": 6, "gyy": 7, "gyz": 8, "gzz": 9,
}


def _build(out_path=_LIB_PATH):
    cmd = ["g++", "-O3", "-march=native", "-fopenmp", "-std=c++17",
           "-shared", "-fPIC", _SRC, "-o", out_path]
    subprocess.run(cmd, check=True, capture_output=True)


def _rebuild_and_load():
    """Rebuild into a unique filename and dlopen THAT path: glibc dlopen
    caches by pathname, so re-opening _LIB_PATH after overwriting it
    returns the already-loaded stale handle and the new symbols never
    appear in-process. The fresh binary is atomically renamed over
    _LIB_PATH afterwards for future processes (the in-process handle keeps
    its inode alive)."""
    tmp_path = os.path.join(_HERE, "native", f"libtessglq.{os.getpid()}.so")
    _build(tmp_path)
    lib = ctypes.CDLL(tmp_path)
    os.replace(tmp_path, _LIB_PATH)
    return lib


def get_lib():
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        if (not os.path.exists(_LIB_PATH)
                or os.path.getmtime(_LIB_PATH) < os.path.getmtime(_SRC)):
            _build()
        lib = ctypes.CDLL(_LIB_PATH)
        # a stale binary (older ABI than this module expects) must trigger
        # a rebuild, not a silent numpy fallback in every caller: mtimes
        # are unreliable (git checkout resets them), so probe the newest
        # symbol directly
        if not hasattr(lib, "tessglq_subdiv_count"):
            lib = _rebuild_and_load()
        dptr = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
        iptr = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
        lib.tessglq_kernel_matrix.restype = None
        lib.tessglq_kernel_matrix.argtypes = [
            ctypes.c_int, dptr, dptr, dptr, ctypes.c_int64,
            dptr, ctypes.c_int64, ctypes.c_double, dptr]
        lib.tessglq_kernel_pairs.restype = None
        lib.tessglq_kernel_pairs.argtypes = [
            ctypes.c_int, dptr, dptr, dptr, iptr, iptr, ctypes.c_int64,
            dptr, ctypes.c_double, dptr]
        lib.tessglq_num_threads.restype = ctypes.c_int
        lib.tessglq_num_threads.argtypes = []
        i64ptr = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
        i32ptr = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        lib.tessglq_subdiv_count.restype = None
        lib.tessglq_subdiv_count.argtypes = [
            dptr, dptr, dptr, dptr, ctypes.c_int64,
            dptr, dptr, dptr, dptr, dptr, ctypes.c_int64, i64ptr]
        lib.tessglq_subdiv_fill.restype = None
        lib.tessglq_subdiv_fill.argtypes = [
            dptr, dptr, dptr, dptr, ctypes.c_int64,
            dptr, dptr, dptr, dptr, dptr, ctypes.c_int64, i64ptr,
            i32ptr, i32ptr]
        _lib = lib
        return _lib


def kernel_matrix(field, lon, lat, height, cells, ratio):
    """(D, M) unscaled kernel matrix via the native adaptive GLQ engine."""
    lib = get_lib()
    lon = np.ascontiguousarray(lon, dtype=np.float64)
    lat = np.ascontiguousarray(lat, dtype=np.float64)
    height = np.ascontiguousarray(height, dtype=np.float64)
    cells = np.ascontiguousarray(cells, dtype=np.float64)
    D = lon.size
    M = cells.shape[0]
    out = np.empty((D, M), dtype=np.float64)
    lib.tessglq_kernel_matrix(FIELD_IDS[field], lon, lat, height, D,
                              cells, M, float(ratio), out)
    return out


def kernel_pairs(field, lon, lat, height, oi, ci, cells, ratio):
    """Unscaled kernel values of an explicit (obs, cell) pair subset —
    the near-field correction path of the device kernel builder."""
    lib = get_lib()
    lon = np.ascontiguousarray(lon, dtype=np.float64)
    lat = np.ascontiguousarray(lat, dtype=np.float64)
    height = np.ascontiguousarray(height, dtype=np.float64)
    oi = np.ascontiguousarray(oi, dtype=np.int64)
    ci = np.ascontiguousarray(ci, dtype=np.int64)
    cells = np.ascontiguousarray(cells, dtype=np.float64)
    out = np.empty(oi.size, dtype=np.float64)
    lib.tessglq_kernel_pairs(FIELD_IDS[field], lon, lat, height, oi, ci,
                             oi.size, cells, float(ratio), out)
    return out


def subdivision_pairs(lon_r, sinlat, coslat, radius, lont, sinlatt,
                      coslatt, rt, thr):
    """(oi, ci) near-field pairs via the native two-pass mask: the f64
    pair test of ops/tesseroid.subdivision_mask's host path, OpenMP over
    observations, with no D x M temporaries and no device link traffic."""
    lib = get_lib()
    obs = [np.ascontiguousarray(a, np.float64)
           for a in (lon_r, sinlat, coslat, radius)]
    cell = [np.ascontiguousarray(a, np.float64)
            for a in (lont, sinlatt, coslatt, rt, thr)]
    D = obs[0].size
    M = cell[0].size
    counts = np.empty(D, dtype=np.int64)
    lib.tessglq_subdiv_count(*obs, D, *cell, M, counts)
    offsets = np.zeros(D, dtype=np.int64)
    np.cumsum(counts[:-1], out=offsets[1:])
    total = int(counts.sum())
    oi = np.empty(total, dtype=np.int32)
    ci = np.empty(total, dtype=np.int32)
    lib.tessglq_subdiv_fill(*obs, D, *cell, M, offsets, oi, ci)
    return oi, ci
