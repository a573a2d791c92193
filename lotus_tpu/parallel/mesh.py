"""Mesh construction and row-sharding helpers."""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from lotus_tpu.ops.common import round_up

SHARD_AXIS = "shard"


def default_mesh(n_devices: Optional[int] = None, axis_name: str = SHARD_AXIS) -> Mesh:
    """1-D mesh over all (or the first n) devices."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return jax.make_mesh((len(devices),), (axis_name,), devices=np.array(devices))


def shard_rows(
    x: jnp.ndarray,
    mesh: Mesh,
    *,
    axis_name: str = SHARD_AXIS,
    block_rows: int = 1,
) -> tuple[jnp.ndarray, int]:
    """Pad x's rows so each shard is a whole multiple of block_rows, then
    place it row-sharded on the mesh.

    Returns (sharded array, logical row count).
    """
    n = x.shape[0]
    n_dev = mesh.shape[axis_name]
    n_pad = round_up(max(n, n_dev * block_rows), n_dev * block_rows)
    if n_pad != n:
        x = jnp.pad(x, ((0, n_pad - n),) + ((0, 0),) * (x.ndim - 1))
    sharding = NamedSharding(mesh, P(axis_name, *([None] * (x.ndim - 1))))
    return jax.device_put(x, sharding), n
