"""Native host-pipeline kernels: lazy g++ build + ctypes bindings.

`lib()` compiles p2m_native.cc once per container (cached beside the
source) and returns the ctypes handle, or None when no toolchain exists —
callers fall back to the numpy implementations in data/pipeline.py, which
define the behavior these kernels must match (tests/test_native.py).
"""
from __future__ import annotations

import ctypes
import os
import os.path as osp
import subprocess
import threading
from typing import Optional

import numpy as np

__all__ = ["lib", "available", "affine_batch", "standardize_batch",
           "rot_flip_3d_batch"]

_HERE = osp.dirname(osp.abspath(__file__))
_SRC = osp.join(_HERE, "p2m_native.cc")
_SO = osp.join(_HERE, "libp2m_native.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> Optional[str]:
    if osp.exists(_SO) and os.path.getmtime(_SO) >= os.path.getmtime(_SRC):
        return _SO
    cmd = ["g++", "-O3", "-march=native", "-fopenmp", "-shared", "-fPIC",
           _SRC, "-o", _SO]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return _SO
    except (subprocess.SubprocessError, FileNotFoundError):
        return None


def lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        so = _build()
        if so is None:
            return None
        L = ctypes.CDLL(so)
        f32p = ctypes.POINTER(ctypes.c_float)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        i32p = ctypes.POINTER(ctypes.c_int32)
        i64 = ctypes.c_int64
        L.affine_batch.argtypes = [f32p, f32p, f32p, i64, i64]
        L.standardize_batch.argtypes = [f32p, i64, i64,
                                        ctypes.c_float, ctypes.c_float]
        L.rot_flip_3d_batch.argtypes = [f32p, f32p, u8p, i32p, i64, i64, i64]
        _lib = L
        return _lib


def available() -> bool:
    return lib() is not None


def _fp(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def affine_batch(joints: np.ndarray, mats: np.ndarray) -> np.ndarray:
    """(B, J, 2) x (B, 2, 3) -> (B, J, 2), C++ path."""
    L = lib()
    joints = np.ascontiguousarray(joints, np.float32)
    mats = np.ascontiguousarray(mats, np.float32)
    out = np.empty_like(joints)
    B, J = joints.shape[:2]
    L.affine_batch(_fp(joints), _fp(mats), _fp(out), B, J)
    return out


def standardize_batch(joints: np.ndarray, w: float, h: float) -> np.ndarray:
    L = lib()
    joints = np.ascontiguousarray(joints, np.float32).copy()
    B, J = joints.shape[:2]
    L.standardize_batch(_fp(joints), B, J, 1.0 / w, 1.0 / h)
    return joints


def rot_flip_3d_batch(joints: np.ndarray, rot_deg: np.ndarray,
                      flip: np.ndarray, pairs: np.ndarray) -> np.ndarray:
    L = lib()
    joints = np.ascontiguousarray(joints, np.float32).copy()
    rot = np.ascontiguousarray(np.deg2rad(rot_deg), np.float32)
    flip = np.ascontiguousarray(flip, np.uint8)
    pairs = np.ascontiguousarray(pairs, np.int32).reshape(-1, 2)
    B, J = joints.shape[:2]
    L.rot_flip_3d_batch(
        _fp(joints), _fp(rot),
        flip.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        pairs.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        B, J, len(pairs),
    )
    return joints
