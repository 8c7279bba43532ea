"""ctypes bindings to the native C++ build runtime (native/bvh_builder.cpp).

Provides the binned-SAH BVH builder and SAH-subtree cluster decomposition.
Falls back gracefully (returns None) when the shared library hasn't been
built — callers then use the pure-JAX LBVH / Morton clustering. Build with
``make -C native``; the loader also builds on demand when a compiler is
available (scene build is host-side, so this is a load-time cost only).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)
_LIB_PATH = os.path.join(_NATIVE_DIR, "libvkrt_native.so")
_lib = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(
                ["make", "-C", _NATIVE_DIR, "-s"],
                check=True,
                capture_output=True,
                timeout=120,
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    f32p = ctypes.POINTER(ctypes.c_float)
    i32p = ctypes.POINTER(ctypes.c_int32)
    lib.vkrt_build_bvh.restype = ctypes.c_int
    lib.vkrt_build_bvh.argtypes = [
        f32p, f32p, f32p, ctypes.c_int, ctypes.c_int, f32p, f32p, i32p, i32p,
    ]
    lib.vkrt_build_clusters.restype = ctypes.c_int
    lib.vkrt_build_clusters.argtypes = [
        f32p, f32p, f32p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, i32p, f32p, f32p,
    ]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def _fp(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _ip(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def build_sah_bvh(v0, e1, e2, leaf_size: int = 1):
    """Binned SAH flat threaded BVH. Returns (node_min, node_max, node_skip,
    node_tri) numpy arrays, or None when the native lib is unavailable."""
    lib = _load()
    if lib is None:
        return None
    v0 = np.ascontiguousarray(v0, np.float32)
    e1 = np.ascontiguousarray(e1, np.float32)
    e2 = np.ascontiguousarray(e2, np.float32)
    n = len(v0)
    cap = max(2 * n - 1, 1)
    node_min = np.zeros((cap, 3), np.float32)
    node_max = np.zeros((cap, 3), np.float32)
    node_skip = np.zeros(cap, np.int32)
    node_tri = np.zeros(cap, np.int32)
    m = lib.vkrt_build_bvh(
        _fp(v0), _fp(e1), _fp(e2), n, leaf_size,
        _fp(node_min), _fp(node_max), _ip(node_skip), _ip(node_tri),
    )
    if m <= 0:
        return None
    return node_min[:m], node_max[:m], node_skip[:m], node_tri[:m]


def build_sah_clusters(
    v0, e1, e2, cluster_size: int, super_size: int
) -> Optional[Tuple[np.ndarray, np.ndarray, np.ndarray, int, int]]:
    """SAH-subtree clusters. Returns (tri_order (n_c*C,) with -1 padding,
    cluster_aabb (n_c, 6), super_aabb (n_s, 6), n_clusters, n_super)."""
    lib = _load()
    if lib is None:
        return None
    v0 = np.ascontiguousarray(v0, np.float32)
    e1 = np.ascontiguousarray(e1, np.float32)
    e2 = np.ascontiguousarray(e2, np.float32)
    n = len(v0)
    # SAH cuts can produce small clusters; size for the worst case observed
    # (every cut at ~cluster_size/4) plus headroom
    cap_clusters = max(8 * ((n + cluster_size - 1) // cluster_size) + 8, 16)
    cap_clusters = ((cap_clusters + super_size - 1) // super_size) * super_size
    tri_order = np.full(cap_clusters * cluster_size, -1, np.int32)
    cluster_aabb = np.zeros((cap_clusters, 6), np.float32)
    super_aabb = np.zeros((cap_clusters // super_size, 6), np.float32)
    n_clusters = lib.vkrt_build_clusters(
        _fp(v0), _fp(e1), _fp(e2), n, cluster_size, super_size,
        cap_clusters, _ip(tri_order), _fp(cluster_aabb), _fp(super_aabb),
    )
    if n_clusters <= 0:
        return None
    n_clusters_pad = ((n_clusters + super_size - 1) // super_size) * super_size
    n_super = n_clusters_pad // super_size
    return (
        tri_order[: n_clusters_pad * cluster_size],
        cluster_aabb[:n_clusters_pad],
        super_aabb[:n_super],
        n_clusters_pad,
        n_super,
    )
