"""ctypes bindings for the native C++ hierarchy builder.

Compiled on demand with g++ (no pybind11 in this image); falls back to the
NumPy builders when compilation is unavailable. The .so is cached next to
the source keyed by source hash.
"""
from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "builder.cpp")
_lib = None
_tried = False


def _compile() -> str | None:
    with open(_SRC, "rb") as f:
        tag = hashlib.sha1(f.read()).hexdigest()[:12]
    so_path = os.path.join(_DIR, f"libbuilder_{tag}.so")
    if os.path.exists(so_path):
        return so_path
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
             _SRC, "-o", so_path],
            check=True, capture_output=True, timeout=300)
        return so_path
    except Exception:
        return None


def get_lib():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    so = _compile()
    if so is None:
        return None
    lib = ctypes.CDLL(so)
    lib.build_hierarchy.argtypes = [
        ctypes.POINTER(ctypes.c_float)] * 3 + [
        ctypes.c_int64, ctypes.c_int, ctypes.c_int, ctypes.c_double,
        ctypes.c_int, ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int)]
    lib.build_hierarchy.restype = ctypes.c_int
    lib.fetch_arrays.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float)] + [
        ctypes.POINTER(ctypes.c_int32)] * 4
    lib.fetch_arrays.restype = ctypes.c_int
    lib.get_stats.argtypes = [ctypes.POINTER(ctypes.c_int64)] * 4
    lib.release.argtypes = []
    _lib = lib
    return _lib


def available() -> bool:
    return get_lib() is not None


def build_native(v0: np.ndarray, v1: np.ndarray, v2: np.ndarray,
                 max_leaf: int, max_depth: int, alpha: float,
                 use_spatial: bool):
    """Returns a BuiltBVH or None when the native library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    from fluctus_tpu.accel.bvh import BuiltBVH

    def ptr(a):
        return np.ascontiguousarray(a, np.float32).ctypes.data_as(
            ctypes.POINTER(ctypes.c_float))

    v0c = np.ascontiguousarray(v0, np.float32)
    v1c = np.ascontiguousarray(v1, np.float32)
    v2c = np.ascontiguousarray(v2, np.float32)
    n_nodes = ctypes.c_int64()
    n_prims = ctypes.c_int64()
    depth = ctypes.c_int()
    rc = lib.build_hierarchy(
        v0c.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        v1c.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        v2c.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        len(v0c), max_leaf, max_depth, alpha, int(use_spatial),
        ctypes.byref(n_nodes), ctypes.byref(n_prims), ctypes.byref(depth))
    if rc != 0:
        return None
    n, k = n_nodes.value, n_prims.value
    node_lo = np.empty((n, 3), np.float32)
    node_hi = np.empty((n, 3), np.float32)
    node_right = np.empty(n, np.int32)
    node_count = np.empty(n, np.int32)
    node_parent = np.empty(n, np.int32)
    prim_idx = np.empty(k, np.int32)
    lib.fetch_arrays(
        node_lo.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        node_hi.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        node_right.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        node_count.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        node_parent.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        prim_idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    sn, du, ul, ur = (ctypes.c_int64() for _ in range(4))
    lib.get_stats(ctypes.byref(sn), ctypes.byref(du), ctypes.byref(ul),
                  ctypes.byref(ur))
    lib.release()
    built = BuiltBVH(node_lo=node_lo, node_hi=node_hi,
                     node_right=node_right, node_count=node_count,
                     node_parent=node_parent, prim_idx=prim_idx,
                     depth=depth.value)
    built.stats = {
        "spatial_nodes": sn.value, "duplicated": du.value,
        "unsplit_left": ul.value, "unsplit_right": ur.value,
        "refs": int(k), "tris": int(len(v0c)),
        "duplication_pct": 100.0 * (k - len(v0c)) / max(len(v0c), 1),
    }
    if use_spatial and os.environ.get("FLUCTUS_BUILD_STATS", "0") == "1":
        print(f"[sbvh] {built.stats}")
    return built
