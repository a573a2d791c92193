"""Sharded Lloyd's k-means: local (sums, counts) + psum over the mesh.

Data rows are sharded across devices; every device keeps a replicated copy
of the centroids, assigns its local rows (blocked distance + argmin), and
contributes per-centroid partial sums that are psum'd over ICI.  This is the
"training step" of the retrieval engine — it backs sem_cluster_by and the
IVF coarse quantizer at pod scale.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from lotus_tpu.ops.common import check_metric, l2_normalize
from lotus_tpu.ops.kmeans import KMeansResult, _assign_scores
from lotus_tpu.parallel.mesh import SHARD_AXIS


def _local_stats(x_local, centroids, n_local, k, metric, block_rows):
    """Blocked assign over the local shard -> (sums, counts, score_sum)."""
    rows, d = x_local.shape
    c32 = centroids.astype(jnp.float32)
    c_norms = jnp.sum(jnp.square(c32), axis=-1)

    if rows > block_rows and rows % block_rows == 0:
        num_blocks, br = rows // block_rows, block_rows
    else:
        num_blocks, br = 1, rows
    blocks = x_local.reshape(num_blocks, br, d)
    local_ids = jax.lax.broadcasted_iota(jnp.int32, (br, 1), 0).squeeze(-1)

    def body(carry, inp):
        sums, counts, score_acc = carry
        block, bidx = inp
        gids = bidx * br + local_ids
        row_ok = gids < n_local
        best, best_score = _assign_scores(block, centroids, metric, c_norms)
        seg = jnp.where(row_ok, best, k)
        sums = sums + jax.ops.segment_sum(
            jnp.where(row_ok[:, None], block.astype(jnp.float32), 0.0), seg, num_segments=k + 1
        )[:k]
        counts = counts + jax.ops.segment_sum(row_ok.astype(jnp.float32), seg, num_segments=k + 1)[:k]
        score_acc = score_acc + jnp.sum(jnp.where(row_ok, best_score, 0.0))
        return (sums, counts, score_acc), None

    init = (jnp.zeros((k, d), jnp.float32), jnp.zeros((k,), jnp.float32), jnp.float32(0.0))
    bidxs = jax.lax.broadcasted_iota(jnp.int32, (num_blocks, 1), 0).squeeze(-1)
    (sums, counts, score_acc), _ = jax.lax.scan(body, init, (blocks, bidxs))
    return sums, counts, score_acc


def sharded_kmeans_fit(
    x_sharded: jnp.ndarray,
    k: int,
    *,
    n_rows: int,
    mesh: Mesh,
    iters: int = 20,
    metric: str = "l2",
    key: Optional[jax.Array] = None,
    spherical: bool = False,
    axis_name: str = SHARD_AXIS,
    block_rows: int = 16384,
) -> KMeansResult:
    """Train k-means over a row-sharded dataset.

    x_sharded: (N_pad, d), placed with P(axis_name, None) via shard_rows.
    n_rows: logical rows (padding masked out).
    """
    check_metric(metric)
    if key is None:
        key = jax.random.PRNGKey(0)
    n_pad, d = x_sharded.shape
    n_dev = mesh.shape[axis_name]
    rows_per_shard = n_pad // n_dev

    # Init: sample k distinct logical rows (gathered to host is fine — k*d).
    init_idx = jax.random.choice(key, n_rows, shape=(k,), replace=False)
    from jax.sharding import NamedSharding

    init_centroids = (
        x_sharded.at[jnp.sort(init_idx)]
        .get(out_sharding=NamedSharding(mesh, P()))
        .astype(jnp.float32)
    )
    if spherical:
        init_centroids = l2_normalize(init_centroids)

    def step(x_local, centroids):
        shard_id = jax.lax.axis_index(axis_name)
        n_local = jnp.clip(jnp.int32(n_rows) - shard_id * rows_per_shard, 0, rows_per_shard)
        sums, counts, score_acc = _local_stats(x_local, centroids, n_local, k, metric, block_rows)
        sums = jax.lax.psum(sums, axis_name)
        counts = jax.lax.psum(counts, axis_name)
        score_acc = jax.lax.psum(score_acc, axis_name)
        new_c = sums / jnp.maximum(counts[:, None], 1.0)
        new_c = jnp.where(counts[:, None] > 0, new_c, centroids)
        if spherical:
            new_c = l2_normalize(new_c)
        return new_c, score_acc

    def all_iters(x_local, centroids0):
        def body(c, _):
            new_c, score = step(x_local, c)
            return new_c, score
        centroids, scores = jax.lax.scan(body, centroids0, None, length=iters)
        return centroids, scores

    fn = jax.shard_map(
        all_iters, mesh=mesh,
        in_specs=(P(axis_name, None), P()),
        out_specs=(P(), P()), check_vma=False,
    )
    centroids, scores = fn(x_sharded, init_centroids)

    # Final assignment pass, sharded.
    def assign(x_local, centroids):
        c_norms = jnp.sum(jnp.square(centroids.astype(jnp.float32)), axis=-1)
        best, best_score = _assign_scores(x_local, centroids, metric, c_norms)
        return best, best_score

    fn_assign = jax.shard_map(
        assign, mesh=mesh,
        in_specs=(P(axis_name, None), P()),
        out_specs=(P(axis_name), P(axis_name)), check_vma=False,
    )
    best, best_score = fn_assign(x_sharded, centroids)
    # Replicate before slicing to the logical row count (a slice of a
    # row-sharded array is generally not evenly shardable).
    from jax.sharding import NamedSharding

    rep = NamedSharding(mesh, P())
    best = jax.device_put(best, rep)[:n_rows]
    best_score = jax.device_put(best_score, rep)[:n_rows]
    if metric == "l2":
        x_norms_pad = jnp.sum(jnp.square(x_sharded.astype(jnp.float32)), axis=-1)
        x_norms = jax.device_put(x_norms_pad, rep)[:n_rows]
        dists = jnp.maximum(x_norms - best_score, 0.0)
        inertia = jnp.sum(dists)
    else:
        inertia = -jnp.sum(best_score)
    return KMeansResult(centroids=centroids, assignments=best, inertia=inertia)
