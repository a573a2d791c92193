"""Multi-host scaffolding: process initialization, DCN x ICI meshes, and
per-host index shard persistence.

The reference framework is single-process (SURVEY.md §2.10); this module is
the TPU-native growth path past one host (BASELINE.md config 5's 100M-row
stretch). Design:

- ``init_runtime`` wraps ``jax.distributed.initialize``; coordinates from
  explicit args or the standard env vars, and is a no-op for single-process
  runs so library code can call it unconditionally.
- ``hybrid_mesh`` builds a 2-D ("host", "shard") mesh: the host axis spans
  DCN (one entry per process), the shard axis spans the ICI-connected chips
  within each host. Index rows/lists shard over the flattened device axis;
  collectives that ride DCN (the final cross-host top-k merge) move only
  (k x devices) candidate tuples, never vector data.
- ``save_index_shards`` / ``load_index_shard`` persist one ``.npy`` per
  host plus a JSON manifest (format_version, shard table), so a 100M-row
  index is written and re-read with every host touching only its slice.
"""

from __future__ import annotations

import json
import os
from pathlib import Path
from typing import Any

import numpy as np

SHARD_MANIFEST = "shards.json"
SHARD_FORMAT_VERSION = 1

#: Mesh axis names: hosts over DCN, chips over ICI.
HOST_AXIS = "host"
CHIP_AXIS = "shard"


def init_runtime(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> bool:
    """Initialize multi-process JAX if this looks like a multi-host run.

    Sources, in order: explicit arguments, then the standard env vars
    (``JAX_COORDINATOR_ADDRESS`` / ``JAX_NUM_PROCESSES`` / ``JAX_PROCESS_ID``,
    or a TPU pod environment where ``jax.distributed.initialize()`` can
    auto-detect everything). Returns True when a distributed runtime was
    started, False for plain single-process runs (no-op).
    """
    import jax

    coordinator_address = coordinator_address or os.getenv("JAX_COORDINATOR_ADDRESS")
    env_procs = os.getenv("JAX_NUM_PROCESSES")
    num_processes = num_processes if num_processes is not None else (
        int(env_procs) if env_procs else None
    )
    env_pid = os.getenv("JAX_PROCESS_ID")
    process_id = process_id if process_id is not None else (int(env_pid) if env_pid else None)

    if coordinator_address is None and num_processes is None:
        return False  # single host; nothing to do
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True


def hybrid_mesh(host_axis: str = HOST_AXIS, chip_axis: str = CHIP_AXIS):
    """(host, chip) mesh: host axis over DCN, chip axis over local ICI.

    Single-process runs get a (1, n_local_devices) mesh with the same axis
    names, so sharding code is host-count agnostic.
    """
    import jax
    from jax.experimental import mesh_utils
    from jax.sharding import Mesh

    n_hosts = jax.process_count()
    per_host = len(jax.devices()) // n_hosts
    if n_hosts > 1:
        devices = mesh_utils.create_hybrid_device_mesh(
            mesh_shape=(1, per_host),
            dcn_mesh_shape=(n_hosts, 1),
        )
    else:
        devices = np.asarray(jax.devices()).reshape(1, per_host)
    return Mesh(devices, (host_axis, chip_axis))


def serving_mesh(axis_name: str | None = None):
    """Flat 1-D mesh over every chip, ordered so ICI neighbours are adjacent.

    The vector-store serving topology: index shards over the single axis,
    candidate merges all_gather over it.  Uses ``hybrid_mesh``'s
    DCN-aware device ordering so intra-host hops ride ICI and only the
    (k x devices)-tuple merge ever crosses DCN.  This is what
    ``TpuVS.distributed()`` builds.
    """
    from jax.sharding import Mesh

    from lotus_tpu.parallel.mesh import SHARD_AXIS

    devices = hybrid_mesh().devices.reshape(-1)
    return Mesh(devices, (axis_name or SHARD_AXIS,))


# ---------------------------------------------------------------------------
# Per-host shard persistence
# ---------------------------------------------------------------------------


def save_index_shards(
    index_dir: str,
    arrays: dict[str, np.ndarray],
    *,
    shard_id: int,
    num_shards: int,
    meta: dict[str, Any] | None = None,
) -> None:
    """Write this host's slice of every index array plus the shared manifest.

    Layout: ``<index_dir>/shard_<id>/<name>.npy``; the manifest records the
    shard table and per-array row counts so any host (or a differently-sized
    reload) can validate coverage before serving.
    """
    root = Path(index_dir)
    shard_dir = root / f"shard_{shard_id:05d}"
    shard_dir.mkdir(parents=True, exist_ok=True)
    rows: dict[str, int] = {}
    for name, arr in arrays.items():
        np.save(shard_dir / f"{name}.npy", np.ascontiguousarray(arr))
        rows[name] = int(arr.shape[0])

    manifest_path = root / SHARD_MANIFEST
    manifest: dict[str, Any] = {
        "format_version": SHARD_FORMAT_VERSION,
        "num_shards": num_shards,
        "shards": {},
    }
    if manifest_path.exists():
        manifest = json.loads(manifest_path.read_text())
        if manifest.get("format_version") != SHARD_FORMAT_VERSION:
            raise ValueError(
                f"index shard manifest version {manifest.get('format_version')} "
                f"!= supported {SHARD_FORMAT_VERSION}"
            )
        if int(manifest.get("num_shards", num_shards)) != num_shards:
            raise ValueError("num_shards mismatch with existing manifest")
    manifest["shards"][str(shard_id)] = {"dir": shard_dir.name, "rows": rows}
    if meta is not None:
        manifest["meta"] = meta
    manifest_path.write_text(json.dumps(manifest, indent=1, sort_keys=True))


def load_index_shard(index_dir: str, shard_id: int, *, mmap: bool = True) -> dict[str, np.ndarray]:
    """Read one host's shard back (mmap'd by default)."""
    root = Path(index_dir)
    manifest = json.loads((root / SHARD_MANIFEST).read_text())
    if manifest.get("format_version") != SHARD_FORMAT_VERSION:
        raise ValueError(
            f"index shard manifest version {manifest.get('format_version')} "
            f"!= supported {SHARD_FORMAT_VERSION}"
        )
    entry = manifest["shards"].get(str(shard_id))
    if entry is None:
        raise FileNotFoundError(f"shard {shard_id} not present in {root / SHARD_MANIFEST}")
    shard_dir = root / entry["dir"]
    out: dict[str, np.ndarray] = {}
    for name, nrows in entry["rows"].items():
        arr = np.load(shard_dir / f"{name}.npy", mmap_mode="r" if mmap else None)
        if int(arr.shape[0]) != nrows:
            raise ValueError(f"shard {shard_id} array {name}: rows {arr.shape[0]} != manifest {nrows}")
        out[name] = arr
    return out


def shard_manifest(index_dir: str) -> dict[str, Any]:
    """The parsed shard manifest (for coverage checks before serving)."""
    return json.loads((Path(index_dir) / SHARD_MANIFEST).read_text())
