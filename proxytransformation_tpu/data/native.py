"""ctypes bindings for the native data-pipeline kernels.

Loads `native/libpt_native.so` (built by native/build.sh) and exposes
depth backprojection / FPS / sampling / point transforms with numpy
fallbacks when the library is absent — the pipeline works either way,
the native path is just faster (this is the host-side hot loop the
reference serves with its SharedArray C extension and CUDA FPS).
"""
from __future__ import annotations

import ctypes
import os
from typing import Optional

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _find_lib() -> Optional[str]:
    here = os.path.dirname(os.path.abspath(__file__))
    candidates = [
        os.path.join(here, '..', '..', 'native', 'libpt_native.so'),
        os.path.join(here, 'libpt_native.so'),
        os.environ.get('PT_NATIVE_LIB', ''),
    ]
    for c in candidates:
        if c and os.path.exists(c):
            return c
    return None


def get_lib() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    path = _find_lib()
    if path is None:
        return None
    try:
        lib = ctypes.CDLL(path)
        f32p = np.ctypeslib.ndpointer(np.float32, flags='C_CONTIGUOUS')
        u16p = np.ctypeslib.ndpointer(np.uint16, flags='C_CONTIGUOUS')
        i64p = np.ctypeslib.ndpointer(np.int64, flags='C_CONTIGUOUS')
        lib.depth_to_points.restype = ctypes.c_int64
        lib.depth_to_points.argtypes = [
            u16p, ctypes.c_int64, ctypes.c_int64, ctypes.c_float,
            ctypes.c_float, ctypes.c_float, ctypes.c_float, ctypes.c_float,
            f32p
        ]
        lib.fps_sample.restype = None
        lib.fps_sample.argtypes = [f32p, ctypes.c_int64, ctypes.c_int64,
                                   i64p]
        lib.random_sample.restype = None
        lib.random_sample.argtypes = [ctypes.c_int64, ctypes.c_int64,
                                      ctypes.c_uint64, i64p]
        lib.transform_points.restype = None
        lib.transform_points.argtypes = [f32p, ctypes.c_int64,
                                         ctypes.c_int64, f32p]
        lib.invert_4x4.restype = ctypes.c_int
        lib.invert_4x4.argtypes = [f32p, f32p]
        _LIB = lib
    except OSError:
        _LIB = None
    return _LIB


def depth_to_points(depth_u16: np.ndarray, cam2img: np.ndarray,
                    depth_shift: float = 1000.0) -> np.ndarray:
    """uint16 depth map → (N, 3) camera-frame points (valid only)."""
    lib = get_lib()
    k = np.asarray(cam2img, np.float32)
    fx, fy, cx, cy = k[0, 0], k[1, 1], k[0, 2], k[1, 2]
    if lib is not None and depth_u16.dtype == np.uint16:
        depth_u16 = np.ascontiguousarray(depth_u16)
        h, w = depth_u16.shape
        out = np.empty((h * w, 3), np.float32)
        n = lib.depth_to_points(depth_u16, h, w, fx, fy, cx, cy,
                                float(depth_shift), out)
        return out[:n].copy()
    # numpy fallback
    d = depth_u16.astype(np.float32) / depth_shift
    h, w = d.shape
    us, vs = np.meshgrid(np.arange(w), np.arange(h))
    nz = d > 0
    u, v, z = us[nz].astype(np.float32), vs[nz].astype(np.float32), d[nz]
    return np.stack([(u - cx) * z / fx, (v - cy) * z / fy, z], -1)


def fps_sample(points: np.ndarray, k: int) -> np.ndarray:
    lib = get_lib()
    xyz = np.ascontiguousarray(points[:, :3], np.float32)
    n = len(xyz)
    if lib is not None:
        out = np.zeros(k, np.int64)
        lib.fps_sample(xyz, n, min(k, n), out)
        return out[:min(k, n)]
    sel = np.zeros(min(k, n), np.int64)
    closest = np.full(n, np.inf)
    cur = 0
    for i in range(1, len(sel)):
        d = np.sum((xyz - xyz[cur]) ** 2, -1)
        closest = np.minimum(closest, d)
        cur = int(np.argmax(closest))
        sel[i] = cur
    return sel


def random_sample(n: int, k: int, seed: int) -> np.ndarray:
    lib = get_lib()
    if lib is not None:
        out = np.zeros(k, np.int64)
        lib.random_sample(n, k, seed & 0xFFFFFFFFFFFFFFFF, out)
        return out
    rng = np.random.RandomState(seed & 0x7FFFFFFF)
    return rng.choice(n, k, replace=n < k)


def transform_points_inplace(points: np.ndarray, mat: np.ndarray) -> None:
    """p[:, :3] = M[:3,:3] @ p + M[:3,3], in place (C-contiguous f32)."""
    lib = get_lib()
    if lib is not None and points.dtype == np.float32 \
            and points.flags['C_CONTIGUOUS']:
        lib.transform_points(points, len(points), points.shape[1],
                             np.ascontiguousarray(mat, np.float32))
        return
    xyz = points[:, :3] @ np.asarray(mat)[:3, :3].T + np.asarray(mat)[:3, 3]
    points[:, :3] = xyz


def invert_4x4(mat: np.ndarray) -> np.ndarray:
    lib = get_lib()
    m = np.ascontiguousarray(mat, np.float32)
    if lib is not None:
        out = np.empty((4, 4), np.float32)
        if lib.invert_4x4(m, out) == 0:
            return out
    return np.linalg.inv(m.astype(np.float64)).astype(np.float32)
