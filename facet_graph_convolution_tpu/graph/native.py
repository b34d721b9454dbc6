"""ctypes bindings to the C++ graph kernels (``native/graphlib.cpp``).

The sequential host hot loops — Graclus matching and BFS patch growth — are
implemented in C++ for preprocessing throughput; the NumPy implementations in
:mod:`coarsen` / :mod:`patching` remain as fallback and correctness oracle.

The shared library is built on demand with ``g++ -O3`` into
``native/build/``; set ``FGC_DISABLE_NATIVE=1`` to force the NumPy paths.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_LIB = None
_LOAD_FAILED = False
_LOCK = threading.Lock()


def _repo_root() -> str:
    return os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _load() -> ctypes.CDLL:
    global _LIB, _LOAD_FAILED
    if os.environ.get("FGC_DISABLE_NATIVE"):
        raise ImportError("native disabled via FGC_DISABLE_NATIVE")
    if _LOAD_FAILED:
        raise ImportError("native build failed earlier in this process")
    with _LOCK:
        if _LIB is not None:
            return _LIB
        root = _repo_root()
        src = os.path.join(root, "native", "graphlib.cpp")
        build_dir = os.path.join(root, "native", "build")
        lib_path = os.path.join(build_dir, "libgraph.so")
        if not os.path.exists(src):
            _LOAD_FAILED = True
            raise ImportError("native source not found")
        try:
            if (not os.path.exists(lib_path)) or (
                os.path.getmtime(lib_path) < os.path.getmtime(src)
            ):
                os.makedirs(build_dir, exist_ok=True)
                subprocess.run(
                    ["g++", "-O3", "-march=native", "-shared", "-fPIC",
                     "-std=c++17", src, "-o", lib_path],
                    check=True,
                    capture_output=True,
                )
            lib = ctypes.CDLL(lib_path)
        except Exception as exc:
            # remember the failure so hot loops don't re-fork a failing
            # compiler on every call; warn once
            _LOAD_FAILED = True
            import warnings

            warnings.warn(
                f"native graph kernels unavailable ({exc}); falling back to "
                "NumPy paths (slower preprocessing)"
            )
            raise ImportError(str(exc))

        i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
        i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        i8p = np.ctypeslib.ndpointer(np.int8, flags="C_CONTIGUOUS")
        f64p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")

        lib.match_one_level.restype = ctypes.c_double
        lib.match_one_level.argtypes = [
            i64p, i64p, f64p, ctypes.c_int64,          # rr, cc, vv, nnz
            i64p, f64p, ctypes.c_int64,                # rid, inv_weights, N
            i32p,                                       # out cluster_id
        ]
        lib.grow_patch.restype = ctypes.c_int64
        lib.grow_patch.argtypes = [
            i64p, ctypes.c_int64, ctypes.c_int64,      # adj0 (zero-indexed), N, K
            ctypes.c_int64, ctypes.c_int64,            # seed, nodes_num
            i8p, ctypes.c_int64,                       # mask, min_size
            i64p, i64p, i64p, i64p,                    # out_adj, old_idx, scratch new_idx, out_meta
        ]
        lib.face_adjacency.restype = ctypes.c_int64
        lib.face_adjacency.argtypes = [
            i64p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,  # faces, F, V, k
            i32p,                                       # out fadj [F, k]
        ]
        f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        lib.obj_parse.restype = ctypes.c_void_p
        lib.obj_parse.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.obj_copy.restype = None
        lib.obj_copy.argtypes = [ctypes.c_void_p, f32p, i64p]
        lib.obj_release.restype = None
        lib.obj_release.argtypes = [ctypes.c_void_p]
        _LIB = lib
        return lib


def match_one_level_native(
    rr: np.ndarray,
    cc: np.ndarray,
    vv: np.ndarray,
    rid: np.ndarray,
    weights: np.ndarray,
    num_nodes: int,
) -> Tuple[np.ndarray, float]:
    lib = _load()
    rr = np.ascontiguousarray(rr, dtype=np.int64)
    cc = np.ascontiguousarray(cc, dtype=np.int64)
    vv = np.ascontiguousarray(vv, dtype=np.float64)
    rid = np.ascontiguousarray(rid, dtype=np.int64)
    inv_w = np.zeros(num_nodes, dtype=np.float64)
    w = np.asarray(weights, dtype=np.float64)
    nz = w != 0
    inv_w[nz] = 1.0 / w[nz]
    cluster_id = np.zeros(num_nodes, dtype=np.int32)
    assoc = lib.match_one_level(
        rr, cc, vv, rr.shape[0], rid, inv_w, num_nodes, cluster_id
    )
    return cluster_id, float(assoc)


def parse_obj_native(path: str) -> Tuple[np.ndarray, np.ndarray]:
    """Parse an OBJ file with the C++ fast path: returns
    ``(vertices [V,3] float32, faces [T,3] int64, fan-triangulated,
    0-indexed)`` — identical output to the Python line loop in
    ``geometry.obj_io.load_obj`` (~20-40× faster on multi-million-facet
    meshes). Raises ``ImportError``/``OSError`` so the caller can fall back.
    """
    lib = _load()
    nv = ctypes.c_int64()
    nt = ctypes.c_int64()
    handle = lib.obj_parse(path.encode(), ctypes.byref(nv), ctypes.byref(nt))
    if not handle:
        # unreadable, truncated, or a construct the C parser refuses
        # (negative/relative or malformed face indices) — the caller falls
        # back to the Python loop, which raises the Pythonic error
        raise OSError(f"obj_parse could not parse {path!r}")
    try:
        verts = np.empty((nv.value, 3), dtype=np.float32)
        tris = np.empty((nt.value, 3), dtype=np.int64)
    except BaseException:
        lib.obj_release(handle)
        raise
    lib.obj_copy(handle, verts, tris)
    return verts, tris


def face_adjacency_native(
    faces: np.ndarray, num_vertices: int, k: int
) -> Tuple[np.ndarray, int]:
    """Vertex-shared facet K-list via the C++ single-pass builder — identical
    output to the vectorized Python path in ``graph.adjacency`` (which stays
    as the fallback/oracle). Returns ``(fadj [F,k] int32, dropped)``."""
    lib = _load()
    faces = np.ascontiguousarray(faces, dtype=np.int64)
    fnum = faces.shape[0]
    fadj = np.zeros((fnum, k), dtype=np.int32)
    dropped = lib.face_adjacency(faces, fnum, int(num_vertices), k, fadj)
    return fadj, int(dropped)


def grow_patch_native(
    adj: np.ndarray,
    nodes_num: int,
    seed: int,
    mask: Optional[np.ndarray],
    min_size: int,
) -> Tuple[np.ndarray, np.ndarray, int]:
    lib = _load()
    n, k = adj.shape
    adj0 = np.ascontiguousarray(adj.astype(np.int64) - 1)
    mask_arr = (
        np.ascontiguousarray(mask, dtype=np.int8)
        if mask is not None
        else np.zeros(n, dtype=np.int8)
    )
    cap = min(max(nodes_num, min_size) + k, n)
    out_adj = np.full((cap, k), -1, dtype=np.int64)
    old_idx = np.full(cap, -1, dtype=np.int64)
    new_idx = np.full(n, -1, dtype=np.int64)
    meta = np.zeros(2, dtype=np.int64)  # [count, next_seed]
    count = lib.grow_patch(
        adj0, n, k, seed, nodes_num, mask_arr, min_size,
        out_adj, old_idx, new_idx, meta,
    )
    count = int(count)
    result = (out_adj[:count] + 1).astype(np.int32)
    return result, old_idx[:count].copy(), int(meta[1])
