"""ctypes bindings for the native C++ LO-RANSAC (`native/lo_ransac.cpp`).

The PoseLib-equivalent host estimator: adaptive-iteration LO-RANSAC in C++.
The shared library is built on demand with g++ (no pip deps).
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import numpy as np

from .. import logger

_NATIVE_DIR = Path(__file__).parent.parent.parent / "native"
_LIB_PATH = _NATIVE_DIR / "liblo_ransac.so"
_lib = None


def _build():
    src = _NATIVE_DIR / "lo_ransac.cpp"
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-o", str(_LIB_PATH), str(src)]
    logger.info(f"building native lo_ransac: {' '.join(cmd)}")
    subprocess.run(cmd, check=True)


def get_lib():
    global _lib
    if _lib is not None:
        return _lib
    src = _NATIVE_DIR / "lo_ransac.cpp"
    # always build from source when the binary is missing or older than the
    # source — a stale committed .so must never shadow source changes
    if not _LIB_PATH.exists() or _LIB_PATH.stat().st_mtime < src.stat().st_mtime:
        _build()
    lib = ctypes.CDLL(str(_LIB_PATH))
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    f64p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    i32p = ctypes.POINTER(ctypes.c_int)
    lib.lo_ransac_homography.argtypes = [
        f32p, f32p, u8p, ctypes.c_int, ctypes.c_float, ctypes.c_int,
        ctypes.c_int, ctypes.c_uint, f64p, u8p, i32p,
    ]
    lib.lo_ransac_homography.restype = ctypes.c_int
    lib.lo_ransac_essential.argtypes = [
        f32p, f32p, u8p, ctypes.c_int, ctypes.c_float, ctypes.c_int,
        ctypes.c_int, ctypes.c_uint, ctypes.c_int, f64p, f64p, f64p, u8p,
        i32p,
    ]
    lib.lo_ransac_essential.restype = ctypes.c_int
    _lib = lib
    return lib


def native_ransac_homography(
    pts0, pts1, valid=None, th=3.0, max_iters=2000, lo_iters=4, seed=0
):
    lib = get_lib()
    pts0 = np.ascontiguousarray(pts0, np.float32)
    pts1 = np.ascontiguousarray(pts1, np.float32)
    n = len(pts0)
    if valid is None:
        valid = np.ones(n, np.uint8)
    valid = np.ascontiguousarray(np.asarray(valid).astype(np.uint8))
    H = np.zeros(9, np.float64)
    inl = np.zeros(n, np.uint8)
    ninl = ctypes.c_int(0)
    ok = lib.lo_ransac_homography(
        pts0, pts1, valid, n, th, max_iters, lo_iters, seed, H, inl,
        ctypes.byref(ninl),
    )
    return bool(ok), H.reshape(3, 3).astype(np.float32), inl.astype(bool), ninl.value


def native_ransac_essential(
    p0, p1, valid=None, th=1e-3, max_iters=4000, lo_iters=4, seed=0,
    solver="5pt",
):
    lib = get_lib()
    p0 = np.ascontiguousarray(p0, np.float32)
    p1 = np.ascontiguousarray(p1, np.float32)
    n = len(p0)
    if valid is None:
        valid = np.ones(n, np.uint8)
    valid = np.ascontiguousarray(np.asarray(valid).astype(np.uint8))
    E = np.zeros(9, np.float64)
    R = np.zeros(9, np.float64)
    t = np.zeros(3, np.float64)
    inl = np.zeros(n, np.uint8)
    ninl = ctypes.c_int(0)
    solver_id = {"5pt": 0, "8pt": 1}[solver]
    ok = lib.lo_ransac_essential(
        p0, p1, valid, n, th, max_iters, lo_iters, seed, solver_id, E, R, t,
        inl, ctypes.byref(ninl),
    )
    return (
        bool(ok),
        E.reshape(3, 3).astype(np.float32),
        R.reshape(3, 3).astype(np.float32),
        t.astype(np.float32),
        inl.astype(bool),
        ninl.value,
    )
