"""On-disk index format: raw little-endian arrays + a JSON manifest.

Replaces the reference's pickle + faiss-file persistence
(``lotus/vector_store/faiss_vs.py:27-36``) with an mmap-friendly layout:

    index_dir/
      meta.json          — manifest: format version, shapes, dtype, metric,
                           index kind and kind-specific metadata
      vectors.npy        — (N, d) embeddings (original row order)
      <extra>.npy        — kind-specific arrays (centroids, list offsets, ...)

Arrays are stored with numpy's .npy container so they can be memory-mapped
for zero-copy host reads and streamed to device in blocks.
"""

from __future__ import annotations

import json
import os
from typing import Any

import numpy as np

FORMAT_VERSION = 1
META_FILE = "meta.json"
VECTORS_FILE = "vectors.npy"


def write_meta(index_dir: str, meta: dict[str, Any]) -> None:
    os.makedirs(index_dir, exist_ok=True)
    meta = dict(meta)
    meta["format_version"] = FORMAT_VERSION
    with open(os.path.join(index_dir, META_FILE), "w") as f:
        json.dump(meta, f, indent=2, default=str)


def read_meta(index_dir: str) -> dict[str, Any]:
    path = os.path.join(index_dir, META_FILE)
    if not os.path.exists(path):
        raise FileNotFoundError(f"No index manifest at {path}")
    with open(path) as f:
        meta = json.load(f)
    if meta.get("format_version", 0) > FORMAT_VERSION:
        raise ValueError(
            f"Index at {index_dir} has format_version {meta['format_version']}; "
            f"this build reads up to {FORMAT_VERSION}"
        )
    return meta


def write_array(index_dir: str, name: str, arr: np.ndarray) -> None:
    os.makedirs(index_dir, exist_ok=True)
    np.save(os.path.join(index_dir, f"{name}.npy"), arr)


def read_array(index_dir: str, name: str, mmap: bool = True) -> np.ndarray:
    path = os.path.join(index_dir, f"{name}.npy")
    return np.load(path, mmap_mode="r" if mmap else None)


def array_exists(index_dir: str, name: str) -> bool:
    return os.path.exists(os.path.join(index_dir, f"{name}.npy"))


def has_shard_manifest(index_dir: str) -> bool:
    """True when the index was persisted as per-host shards
    (parallel/distributed.py's shards.json lives next to meta.json)."""
    from lotus_tpu.parallel.distributed import SHARD_MANIFEST

    return os.path.exists(os.path.join(index_dir, SHARD_MANIFEST))
