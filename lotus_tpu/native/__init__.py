"""ctypes bindings for the C++ host-runtime library (native/lotus_native.cpp).

The library is built on demand with g++ the first time it is needed and
cached next to the sources; every entry point has a pure-Python fallback so
the framework works without a toolchain.

Components (see native/lotus_native.cpp):
- union_find: connected components over duplicate-pair edges (sem_dedup)
- topk_merge: k-way merge of per-shard descending top-k lists
- write_array / read_array: checksummed (CRC32) raw array files for index
  integrity verification
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

import lotus_tpu

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "liblotus_native.so")

_lib: Optional[ctypes.CDLL] = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    try:
        src = os.path.join(_NATIVE_DIR, "lotus_native.cpp")
        stale = (
            os.path.exists(src)
            and os.path.exists(_LIB_PATH)
            and os.path.getmtime(src) > os.path.getmtime(_LIB_PATH)
        )
        if not os.path.exists(_LIB_PATH) or stale:
            if not os.path.exists(src):
                return None
            subprocess.run(
                ["g++", "-O3", "-fPIC", "-std=c++17", "-shared", "-o", _LIB_PATH, src],
                check=True,
                capture_output=True,
                timeout=120,
            )
        lib = ctypes.CDLL(_LIB_PATH)
        lib.lotus_union_find.argtypes = [
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.lotus_topk_merge.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int64),
        ]
        lib.lotus_topk_merge_batch.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int64),
        ]
        lib.lotus_write_array.argtypes = [ctypes.c_char_p, ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64]
        lib.lotus_write_array.restype = ctypes.c_int
        lib.lotus_read_array.argtypes = [ctypes.c_char_p, ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64]
        lib.lotus_read_array.restype = ctypes.c_int64
        _lib = lib
    except Exception as e:
        lotus_tpu.logger.debug(f"native library unavailable ({e}); using Python fallbacks")
        _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


# ------------------------------------------------------------- union-find
def union_find(edges: np.ndarray, n_nodes: int) -> np.ndarray:
    """Component label per node for an (E, 2) int array of edges."""
    edges = np.ascontiguousarray(np.asarray(edges, dtype=np.int64).reshape(-1, 2))
    lib = _load()
    if lib is not None:
        out = np.empty(n_nodes, dtype=np.int64)
        lib.lotus_union_find(
            edges.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            len(edges), n_nodes,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        )
        return out
    # Python fallback.
    parent = np.arange(n_nodes, dtype=np.int64)

    def find(x: int) -> int:
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:
            parent[x], x = root, parent[x]
        return root

    for a, b in edges:
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            parent[rb] = ra
    return np.array([find(int(i)) for i in range(n_nodes)], dtype=np.int64)


# ------------------------------------------------------------- top-k merge
def topk_merge(scores: np.ndarray, ids: np.ndarray, k: int) -> tuple[np.ndarray, np.ndarray]:
    """Merge (n_lists, list_len) descending candidate lists into global
    top-k. ids of -1 mark missing entries."""
    scores = np.ascontiguousarray(np.asarray(scores, dtype=np.float32))
    ids = np.ascontiguousarray(np.asarray(ids, dtype=np.int64))
    lib = _load()
    if lib is not None:
        out_s = np.empty(k, dtype=np.float32)
        out_i = np.empty(k, dtype=np.int64)
        lib.lotus_topk_merge(
            scores.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            scores.shape[0], scores.shape[1], k,
            out_s.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            out_i.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        )
        return out_s, out_i
    flat_s, flat_i = scores.ravel(), ids.ravel()
    valid = flat_i >= 0
    flat_s, flat_i = flat_s[valid], flat_i[valid]
    order = np.argsort(-flat_s, kind="stable")[:k]
    out_s = np.full(k, -3.0e38, np.float32)
    out_i = np.full(k, -1, np.int64)
    out_s[: len(order)] = flat_s[order]
    out_i[: len(order)] = flat_i[order]
    return out_s, out_i


def topk_merge_batch(scores: np.ndarray, ids: np.ndarray, k: int) -> tuple[np.ndarray, np.ndarray]:
    """Per-query merge of (B, n_lists, list_len) descending candidate lists
    into (B, k) global top-k — one native call for the whole batch."""
    scores = np.ascontiguousarray(np.asarray(scores, dtype=np.float32))
    ids = np.ascontiguousarray(np.asarray(ids, dtype=np.int64))
    if scores.ndim != 3 or scores.shape != ids.shape:
        raise ValueError(f"expected matching (B, n_lists, list_len) arrays, got {scores.shape} / {ids.shape}")
    b, n_lists, list_len = scores.shape
    lib = _load()
    if lib is not None:
        out_s = np.empty((b, k), dtype=np.float32)
        out_i = np.empty((b, k), dtype=np.int64)
        lib.lotus_topk_merge_batch(
            scores.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            b, n_lists, list_len, k,
            out_s.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            out_i.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        )
        return out_s, out_i
    merged = [topk_merge(scores[q], ids[q], k) for q in range(b)]
    return np.stack([m[0] for m in merged]), np.stack([m[1] for m in merged])


# ---------------------------------------------------------- checksummed IO
def write_array(path: str, arr: np.ndarray) -> None:
    """Write raw bytes with a CRC32-checked header."""
    data = np.ascontiguousarray(arr).view(np.uint8).ravel()
    lib = _load()
    if lib is not None:
        rc = lib.lotus_write_array(
            path.encode(), data.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), len(data)
        )
        if rc != 0:
            raise OSError(f"lotus_write_array failed with code {rc} for {path}")
        return
    import zlib

    with open(path, "wb") as f:
        f.write(b"LTPU")
        f.write((1).to_bytes(4, "little"))
        f.write(len(data).to_bytes(8, "little"))
        f.write(zlib.crc32(data.tobytes()).to_bytes(4, "little"))
        f.write(data.tobytes())


def read_array(path: str, dtype: np.dtype, shape: tuple[int, ...]) -> np.ndarray:
    """Read a checksummed array; raises on corruption."""
    lib = _load()
    expected = int(np.prod(shape)) * np.dtype(dtype).itemsize
    if lib is not None:
        out = np.empty(expected, dtype=np.uint8)
        got = lib.lotus_read_array(
            path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), expected
        )
        if got == -3:
            raise OSError(f"checksum mismatch reading {path} (corrupt index file)")
        if got < 0:
            raise OSError(f"lotus_read_array failed with code {got} for {path}")
        if got != expected:
            raise OSError(f"size mismatch reading {path}: {got} != {expected}")
        return out.view(dtype).reshape(shape)
    import zlib

    with open(path, "rb") as f:
        if f.read(4) != b"LTPU":
            raise OSError(f"bad magic in {path}")
        int.from_bytes(f.read(4), "little")
        blen = int.from_bytes(f.read(8), "little")
        crc = int.from_bytes(f.read(4), "little")
        payload = f.read(blen)
    if zlib.crc32(payload) != crc:
        raise OSError(f"checksum mismatch reading {path} (corrupt index file)")
    if blen != expected:
        raise OSError(f"size mismatch reading {path}: {blen} != {expected}")
    return np.frombuffer(payload, dtype=dtype).reshape(shape)
