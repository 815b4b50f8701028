"""ctypes bindings to the native C++ host runtime (builder + oracle search).

The shared library is compiled on demand from hnsw_builder.cc with g++
(pybind11 is not available in this environment; the C ABI + ctypes keeps the
binding dependency-free). Artifacts land next to the source and are keyed on
a source hash so edits trigger rebuilds.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "hnsw_builder.cc")
_lock = threading.Lock()
_lib = None


def _lib_path() -> str:
    with open(_SRC, "rb") as f:
        h = hashlib.sha256(f.read()).hexdigest()[:12]
    return os.path.join(_HERE, f"libshine_native_{h}.so")


def _build(path: str) -> None:
    cmd = [
        "g++",
        "-O3",
        "-march=native",
        "-funroll-loops",
        "-std=c++20",
        "-shared",
        "-fPIC",
        "-pthread",
        _SRC,
        "-o",
        path + ".tmp",
    ]
    subprocess.run(cmd, check=True, capture_output=True)
    os.replace(path + ".tmp", path)


def load() -> ctypes.CDLL:
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        path = _lib_path()
        if not os.path.exists(path):
            _build(path)
        lib = ctypes.CDLL(path)
        i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
        f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        lib.shine_hnsw_build.restype = ctypes.c_int
        lib.shine_hnsw_build.argtypes = [
            f32p,  # vecs
            ctypes.c_int64,  # n
            ctypes.c_int,  # d
            ctypes.c_int,  # M
            ctypes.c_int,  # efc
            ctypes.c_uint64,  # seed
            ctypes.c_int,  # metric
            ctypes.c_int,  # threads
            ctypes.c_int64,  # upper_cap
            ctypes.c_int,  # level_cap
            i32p,  # levels
            i32p,  # neighbors0
            i32p,  # upper_row
            i32p,  # upper_neighbors
            i64p,  # meta
        ]
        lib.shine_hnsw_search.restype = None
        lib.shine_hnsw_search.argtypes = [
            f32p,  # vecs
            ctypes.c_int64,  # n
            ctypes.c_int,  # d
            ctypes.c_int,  # M
            ctypes.c_int,  # metric
            i32p,  # levels
            i32p,  # neighbors0
            i32p,  # upper_row
            i32p,  # upper_neighbors
            ctypes.c_int,  # level_cap
            ctypes.c_int32,  # entry_point
            ctypes.c_int,  # top_level
            f32p,  # queries
            ctypes.c_int64,  # nq
            ctypes.c_int,  # k
            ctypes.c_int,  # ef
            ctypes.c_int,  # threads
            i32p,  # results
            f32p,  # dists
        ]
        lib.shine_reverse_merge.restype = ctypes.c_int
        lib.shine_reverse_merge.argtypes = [
            i32p,  # fwd_sel (n, M)
            f32p,  # fwd_d (n, M)
            i32p,  # ids (n,)
            ctypes.c_int64,  # n
            ctypes.c_int,  # M
            ctypes.c_int,  # cap_c
            i32p,  # cand_out (n, cap_c)
            f32p,  # cd_out (n, cap_c)
            ctypes.c_int,  # threads (0 = hardware concurrency)
        ]
        _lib = lib
        return _lib


def reverse_merge(fwd_sel: np.ndarray, fwd_d: np.ndarray, ids: np.ndarray,
                  cap_c: int, threads: int = 0) -> tuple[np.ndarray, np.ndarray]:
    """Native reverse-edge merge — bit-identical to
    models/fastbuild.py:_reverse_merge_np (tests/test_fastbuild.py); one
    counting sort + per-row small sorts instead of numpy's three global
    lexsorts (545 s of the 10M x M=16 fastbuild wall, 1404 s at M=32)."""
    lib = load()
    n, M = fwd_sel.shape
    fwd_sel = np.ascontiguousarray(fwd_sel, np.int32)
    fwd_d = np.ascontiguousarray(fwd_d, np.float32)
    ids = np.ascontiguousarray(ids, np.int32)
    cand = np.empty((n, cap_c), np.int32)
    cd = np.empty((n, cap_c), np.float32)
    rc = lib.shine_reverse_merge(fwd_sel, fwd_d, ids, n, M, cap_c, cand, cd,
                                 threads)
    if rc != 0:
        raise ValueError(f"shine_reverse_merge failed (rc={rc})")
    return cand, cd
