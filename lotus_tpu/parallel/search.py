"""Sharded exact search: per-shard top-k + ICI all-gather merge.

Each device scans only its row shard with the same blocked kernel as the
single-chip path (lotus_tpu/ops/flat.py), producing local (k) candidates
with globalized row ids; candidates ride the ICI via all_gather (k x n_dev
rows per query — tiny) and every device computes the identical final merge.
This is the design SURVEY.md §2.10 calls for, replacing nothing in the
reference (it has no distributed path) but required for pod-scale corpora.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from lotus_tpu.ops.common import MASK_SCORE, NO_HIT, as_distance, as_similarity, check_metric
from lotus_tpu.ops.flat import DEFAULT_BLOCK_ROWS, flat_search
from lotus_tpu.parallel.mesh import SHARD_AXIS


def sharded_flat_search(
    xb_sharded: jnp.ndarray,
    xq: jnp.ndarray,
    k: int,
    *,
    n_rows: int,
    metric: str = "ip",
    valid: Optional[jnp.ndarray] = None,
    mesh: Optional[Mesh] = None,
    axis_name: str = SHARD_AXIS,
    block_rows: int = DEFAULT_BLOCK_ROWS,
    approx: bool = False,
    xb_scales: Optional[jnp.ndarray] = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Exact top-k over a row-sharded database.

    Args:
        xb_sharded: (N_pad, d) array placed with NamedSharding(mesh, P(axis,)),
            e.g. via :func:`lotus_tpu.parallel.shard_rows`.
        xq: (B, d) queries (replicated).
        n_rows: logical row count (padding rows are masked out).
        valid: optional (N_pad,) bool subset mask, sharded like xb.
        xb_scales: per-row dequantization factors for int8 databases,
            sharded like xb.

    Returns:
        (distances, indices) of shape (B, k), replicated; indices are global
        row ids, -1 for missing hits.
    """
    check_metric(metric)
    if mesh is None:
        raise ValueError("mesh is required")
    n_pad = xb_sharded.shape[0]
    n_dev = mesh.shape[axis_name]
    assert n_pad % n_dev == 0
    rows_per_shard = n_pad // n_dev

    squeeze = xq.ndim == 1
    if squeeze:
        xq = xq[None, :]

    def local_search(xb_local, valid_local, xq_rep, scales_local=None):
        shard_id = jax.lax.axis_index(axis_name)
        row_offset = shard_id * rows_per_shard
        # Rows beyond the logical count are masked via n_rows relative to
        # this shard's offset.
        local_n = jnp.clip(jnp.int32(n_rows) - row_offset, 0, rows_per_shard)
        dists, idx = flat_search(
            xb_local,
            xq_rep,
            k,
            metric=metric,
            n_rows=local_n,
            valid=valid_local,
            block_rows=block_rows,
            approx=approx,
            xb_scales=scales_local,
        )
        scores = as_similarity(dists, metric)
        scores = jnp.where(idx == NO_HIT, MASK_SCORE, scores)
        gidx = jnp.where(idx == NO_HIT, NO_HIT, idx + row_offset)

        # (n_dev, B, k) candidate sets on every device.
        all_scores = jax.lax.all_gather(scores, axis_name, axis=0)
        all_idx = jax.lax.all_gather(gidx, axis_name, axis=0)
        b = xq_rep.shape[0]
        cand_s = jnp.moveaxis(all_scores, 0, 1).reshape(b, n_dev * k)
        cand_i = jnp.moveaxis(all_idx, 0, 1).reshape(b, n_dev * k)
        top_s, pos = jax.lax.top_k(cand_s, k)
        top_i = jnp.take_along_axis(cand_i, pos, axis=1)
        return top_s, top_i

    # Build the shard_map entry for the present optional operands (valid
    # mask and/or int8 scales), each row-sharded alongside xb.
    operands: list[jnp.ndarray] = [xb_sharded]
    specs: list = [P(axis_name, None)]
    has_valid, has_scales = valid is not None, xb_scales is not None
    if has_valid:
        operands.append(valid)
        specs.append(P(axis_name))
    if has_scales:
        operands.append(xb_scales)
        specs.append(P(axis_name))
    operands.append(xq)
    specs.append(P())

    def entry(*args):
        xb_local = args[0]
        i = 1
        valid_local = args[i] if has_valid else None
        i += int(has_valid)
        scales_local = args[i] if has_scales else None
        xq_rep = args[-1]
        return local_search(xb_local, valid_local, xq_rep, scales_local)

    fn = jax.shard_map(
        entry, mesh=mesh,
        in_specs=tuple(specs),
        out_specs=(P(), P()), check_vma=False,
    )
    top_s, top_i = fn(*operands)

    # flat_search already returned full metric-convention distances (incl. the
    # +||q||^2 term for l2), so converting back is exact here.
    dists = as_distance(top_s, metric)
    if metric == "l2":
        dists = jnp.where(top_i == NO_HIT, jnp.finfo(jnp.float32).max, dists)
    if squeeze:
        return dists[0], top_i[0]
    return dists, top_i
