"""ctypes bindings for the native host toolkit (native/hr_native.cpp).

Compiles the shared library on first use (g++ is in the image); every entry
point has a pure-Python fallback so the framework works without a
toolchain. The native pieces replace the reference's C++ host layer:
binned-SAH BVH build (vs BLAS builds) and OBJ loading (vs Assimp).
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "..", "..", "native", "hr_native.cpp")
_LIB = os.path.join(os.path.dirname(__file__), "..", "..", "native", "libhr_native.so")

_lock = threading.Lock()
_lib = None
_tried = False


def _compile() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-o", _LIB, _SRC],
            check=True, capture_output=True, timeout=240,
        )
        return True
    except Exception:
        return False


def get_lib():
    """Load (building if needed) the native library, or None."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB) or (
            os.path.exists(_SRC)
            and os.path.getmtime(_SRC) > os.path.getmtime(_LIB)
        ):
            if not _compile():
                return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError:
            return None
        lib.hr_build_bvh.restype = ctypes.c_int32
        lib.hr_build_bvh.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int32, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ]
        lib.hr_load_obj.restype = ctypes.c_void_p
        lib.hr_load_obj.argtypes = [ctypes.c_char_p]
        lib.hr_obj_counts.restype = None
        lib.hr_obj_counts.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
        ]
        lib.hr_obj_copy.restype = None
        lib.hr_obj_copy.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int32),
        ]
        lib.hr_obj_free.restype = None
        lib.hr_obj_free.argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib


def build_bvh_native(tri_pos: np.ndarray, leaf_size: int = 4):
    """Binned-SAH build via the native library. Returns
    (nodes_min, nodes_max, nodes_meta, order) in the ops/bvh.py layout, or
    None if the library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    tris = np.ascontiguousarray(tri_pos, np.float32).reshape(-1, 9)
    T = tris.shape[0]
    max_nodes = 2 * T
    out_min = np.empty((max_nodes, 3), np.float32)
    out_max = np.empty((max_nodes, 3), np.float32)
    out_meta = np.empty((max_nodes, 3), np.int32)
    out_order = np.empty(T, np.int32)
    fp = ctypes.POINTER(ctypes.c_float)
    ip = ctypes.POINTER(ctypes.c_int32)
    n = lib.hr_build_bvh(
        tris.ctypes.data_as(fp), T, leaf_size,
        out_min.ctypes.data_as(fp), out_max.ctypes.data_as(fp),
        out_meta.ctypes.data_as(ip), out_order.ctypes.data_as(ip),
    )
    if n <= 0:
        return None
    return out_min[:n], out_max[:n], out_meta[:n], out_order


def load_obj_native(path: str):
    """Loads an OBJ via the native parser. Returns
    (positions (V,3), normals (V,3), uvs (V,2), indices (F,3)) or None."""
    lib = get_lib()
    if lib is None:
        return None
    handle = lib.hr_load_obj(path.encode())
    if not handle:
        return None
    try:
        nv = ctypes.c_int32()
        nf = ctypes.c_int32()
        lib.hr_obj_counts(handle, ctypes.byref(nv), ctypes.byref(nf))
        V, F = nv.value, nf.value
        if V == 0 or F == 0:
            return None
        pos = np.empty((V, 3), np.float32)
        nrm = np.empty((V, 3), np.float32)
        uv = np.empty((V, 2), np.float32)
        idx = np.empty((F, 3), np.int32)
        fp = ctypes.POINTER(ctypes.c_float)
        ip = ctypes.POINTER(ctypes.c_int32)
        lib.hr_obj_copy(
            handle, pos.ctypes.data_as(fp), nrm.ctypes.data_as(fp),
            uv.ctypes.data_as(fp), idx.ctypes.data_as(ip),
        )
        return pos, nrm, uv, idx
    finally:
        lib.hr_obj_free(handle)
