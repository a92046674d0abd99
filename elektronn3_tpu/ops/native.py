"""ctypes bindings for the native C++ warp-interpolation kernels.

The reference obtains native speed for its interpolation hot loop from
Numba-compiled gufuncs (coord_transforms.py:27-130). Here the same
kernels are real C++ (native/warp_kernels.cpp), built on first use with
g++ and loaded via ctypes; everything degrades gracefully to the
vectorized numpy implementations when no compiler is available.

The fused ``warp_interp_*`` variants additionally fold the 4x4
coordinate transform INTO the interpolation loop, so the (P, 3) source
coordinate array is never materialized — one pass, no temporaries.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import tempfile
from typing import Optional

import numpy as np

from elektronn3_tpu import logger

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

_SRC = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native",
    "warp_kernels.cpp")
_CACHE_DIR = os.path.join(
    os.path.expanduser("~"), ".cache", "elektronn3_tpu")


def _build_library() -> Optional[str]:
    os.makedirs(_CACHE_DIR, exist_ok=True)
    so_path = os.path.join(_CACHE_DIR, "libwarp_kernels.so")
    if os.path.isfile(so_path) and os.path.getmtime(so_path) >= \
            os.path.getmtime(_SRC):
        return so_path
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC",
             "-o", so_path, _SRC],
            check=True, capture_output=True, timeout=120)
        return so_path
    except (OSError, subprocess.SubprocessError) as e:
        logger.debug(f"native warp kernel build failed: {e}")
        return None


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    if not os.path.isfile(_SRC):
        return None
    so_path = _build_library()
    if so_path is None:
        return None
    try:
        lib = ctypes.CDLL(so_path)
    except OSError:
        return None
    i64 = ctypes.c_int64
    fp = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    for name in ("map_coordinates_nearest_f32",
                 "map_coordinates_linear_f32"):
        fn = getattr(lib, name)
        fn.argtypes = [fp, i64, i64, i64, fp, i64, fp, fp]
        fn.restype = None
    for name in ("warp_interp_linear_f32", "warp_interp_nearest_f32"):
        fn = getattr(lib, name)
        fn.argtypes = [fp, i64, i64, i64, fp, i64, i64, i64, fp,
                       ctypes.c_int, fp]
        fn.restype = None
    _LIB = lib
    logger.debug(f"Loaded native warp kernels from {so_path}")
    return _LIB


def available() -> bool:
    return _load() is not None


def map_coordinates_nearest(src: np.ndarray, coords: np.ndarray,
                            lo: np.ndarray) -> np.ndarray:
    """Native nearest-neighbor gather; same contract as
    data.coord_transforms.map_coordinates_nearest."""
    lib = _load()
    src = np.ascontiguousarray(src, np.float32)
    cshape = coords.shape[:-1]
    coords = np.ascontiguousarray(coords, np.float32).reshape(-1, 3)
    lo = np.ascontiguousarray(lo, np.float32)
    dest = np.empty(coords.shape[0], np.float32)
    lib.map_coordinates_nearest_f32(
        src, src.shape[0], src.shape[1], src.shape[2],
        coords, coords.shape[0], lo, dest)
    return dest.reshape(cshape)


def map_coordinates_linear(src: np.ndarray, coords: np.ndarray,
                           lo: np.ndarray) -> np.ndarray:
    """Native trilinear gather; same contract as
    data.coord_transforms.map_coordinates_linear."""
    lib = _load()
    src = np.ascontiguousarray(src, np.float32)
    cshape = coords.shape[:-1]
    coords = np.ascontiguousarray(coords, np.float32).reshape(-1, 3)
    lo = np.ascontiguousarray(lo, np.float32)
    dest = np.empty(coords.shape[0], np.float32)
    lib.map_coordinates_linear_f32(
        src, src.shape[0], src.shape[1], src.shape[2],
        coords, coords.shape[0], lo, dest)
    return dest.reshape(cshape)


def warp_interp(src: np.ndarray, M_inv: np.ndarray, patch_shape,
                lo: np.ndarray, perspective: bool,
                discrete: bool) -> np.ndarray:
    """Fused transform+interpolate of one channel into a patch."""
    lib = _load()
    src = np.ascontiguousarray(src, np.float32)
    M_inv = np.ascontiguousarray(M_inv, np.float32).reshape(16)
    lo = np.ascontiguousarray(lo, np.float32)
    pd, ph, pw = patch_shape
    dest = np.empty(pd * ph * pw, np.float32)
    fn = (lib.warp_interp_nearest_f32 if discrete
          else lib.warp_interp_linear_f32)
    fn(src, src.shape[0], src.shape[1], src.shape[2], M_inv,
       pd, ph, pw, lo, int(perspective), dest)
    return dest.reshape(patch_shape)
