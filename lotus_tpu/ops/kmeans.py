"""Lloyd's k-means in pure XLA: assign = blocked distance + argmin,
update = segment-sum.

TPU-native replacement for ``faiss.Kmeans`` as used by the reference's
``cluster()`` factory (``lotus/utils.py:14-72``) and the IVF coarse
quantizer.  The update step is expressed as per-block partial sums so the
same code shards across a device mesh with ``psum`` of (sums, counts) —
see ``lotus_tpu/parallel``.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp

from lotus_tpu.ops.common import cdiv, check_metric, l2_normalize

DEFAULT_BLOCK_ROWS = 16384


@dataclass
class KMeansResult:
    centroids: jnp.ndarray  # (k, d) f32
    assignments: jnp.ndarray  # (N,) i32
    inertia: jnp.ndarray  # () f32 — sum of squared distances (l2) or -sum sims


def _pad_rows(x: jnp.ndarray, block_rows: int) -> tuple[jnp.ndarray, int]:
    n = x.shape[0]
    n_pad = cdiv(n, block_rows) * block_rows if n > block_rows else n
    if n_pad != n:
        x = jnp.pad(x, ((0, n_pad - n), (0, 0)))
    return x, n


def _assign_scores(block: jnp.ndarray, centroids: jnp.ndarray, metric: str, c_norms: jnp.ndarray):
    """(block, d) x (k, d) -> per-row best centroid (idx, max-score)."""
    if block.dtype == jnp.bfloat16:
        compute_dtype, precision = jnp.bfloat16, None
    else:
        compute_dtype, precision = jnp.float32, jax.lax.Precision.HIGHEST
    sims = jnp.einsum(
        "nd,kd->nk",
        block.astype(compute_dtype),
        centroids.astype(compute_dtype),
        preferred_element_type=jnp.float32,
        precision=precision,
    )
    if metric == "l2":
        scores = 2.0 * sims - c_norms[None, :]
    else:
        scores = sims
    best = jnp.argmax(scores, axis=1).astype(jnp.int32)
    best_score = jnp.max(scores, axis=1)
    return best, best_score


@functools.partial(jax.jit, static_argnames=("metric", "block_rows"))
def _assign_top2_impl(x: jnp.ndarray, centroids: jnp.ndarray, metric: str, block_rows: int):
    n_pad, d = x.shape
    c32 = centroids.astype(jnp.float32)
    c_norms = jnp.sum(jnp.square(c32), axis=-1)

    def top2(block):
        if block.dtype == jnp.bfloat16:
            compute_dtype, precision = jnp.bfloat16, None
        else:
            compute_dtype, precision = jnp.float32, jax.lax.Precision.HIGHEST
        sims = jnp.einsum(
            "nd,kd->nk", block.astype(compute_dtype), centroids.astype(compute_dtype),
            preferred_element_type=jnp.float32, precision=precision,
        )
        scores = 2.0 * sims - c_norms[None, :] if metric == "l2" else sims
        # Two argmax passes, not lax.top_k: a TopK custom call inside a scan
        # wedges the axon runtime (observed), argmax lowers to reductions.
        a1 = jnp.argmax(scores, axis=1).astype(jnp.int32)
        s1 = jnp.take_along_axis(scores, a1[:, None], axis=1)[:, 0]
        masked = scores.at[jnp.arange(scores.shape[0]), a1].set(-jnp.inf)
        a2 = jnp.argmax(masked, axis=1).astype(jnp.int32)
        s2 = jnp.take_along_axis(masked, a2[:, None], axis=1)[:, 0]
        return a1, a2, s1 - s2

    num_blocks = cdiv(n_pad, block_rows)
    if num_blocks <= 1:
        return top2(x)
    assert n_pad % block_rows == 0
    blocks = x.reshape(num_blocks, block_rows, d)
    a1, a2, margin = jax.lax.map(top2, blocks)
    return a1.reshape(-1), a2.reshape(-1), margin.reshape(-1)


def kmeans_assign_top2(
    x: jnp.ndarray, centroids: jnp.ndarray, *, metric: str = "l2", block_rows: int | None = None
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Top-2 centroid assignment: (a1, a2, margin).

    ``margin`` is the score gap between the best and second-best centroid
    in the metric's similarity convention (always >= 0) — the spill
    criterion for SOAR-style replicated IVF assignment.  Blocked so the
    score matrix peaks at (block_rows, k) regardless of N.
    """
    check_metric(metric)
    n = x.shape[0]
    k = centroids.shape[0]
    if block_rows is None:
        # ~256 MB f32 score-tile budget.
        block_rows = max(1024, min(DEFAULT_BLOCK_ROWS * 4, (1 << 26) // max(k, 1)))
    x_pad, _ = _pad_rows(x, block_rows)
    a1, a2, margin = _assign_top2_impl(x_pad, centroids, metric, block_rows)
    return a1[:n], a2[:n], margin[:n]


@functools.partial(jax.jit, static_argnames=("metric", "block_rows", "k"))
def _assign_impl(x: jnp.ndarray, centroids: jnp.ndarray, n_rows: jnp.ndarray, metric: str, block_rows: int, k: int):
    n_pad, d = x.shape
    c32 = centroids.astype(jnp.float32)
    c_norms = jnp.sum(jnp.square(c32), axis=-1)

    num_blocks = cdiv(n_pad, block_rows)
    if num_blocks <= 1:
        best, best_score = _assign_scores(x, centroids, metric, c_norms)
        return best, best_score

    assert n_pad % block_rows == 0
    blocks = x.reshape(num_blocks, block_rows, d)

    def body(_, block):
        best, best_score = _assign_scores(block, centroids, metric, c_norms)
        return None, (best, best_score)

    _, (best, best_score) = jax.lax.scan(body, None, blocks)
    return best.reshape(-1), best_score.reshape(-1)


def kmeans_assign(
    x: jnp.ndarray,
    centroids: jnp.ndarray,
    *,
    metric: str = "l2",
    block_rows: int = DEFAULT_BLOCK_ROWS,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Assign each row of x to its nearest centroid.

    Returns (assignments (N,) i32, distances (N,) f32) where distances follow
    the metric convention (squared l2, or similarity for ip/cosine).
    """
    check_metric(metric)
    n = x.shape[0]
    x_pad, _ = _pad_rows(x, block_rows)
    best, best_score = _assign_impl(x_pad, centroids, jnp.int32(n), metric, block_rows, centroids.shape[0])
    best, best_score = best[:n], best_score[:n]
    if metric == "l2":
        x_norms = jnp.sum(jnp.square(x.astype(jnp.float32)), axis=-1)
        dist = jnp.maximum(x_norms - best_score, 0.0)
        return best, dist
    return best, best_score


@functools.partial(jax.jit, static_argnames=("k",))
def _kmeanspp_init(x: jnp.ndarray, n_rows: jnp.ndarray, k: int, key: jax.Array) -> jnp.ndarray:
    """k-means++ (D^2-weighted) seeding over x (padded rows masked out).

    Each of the k rounds scores all points against only the newest centroid,
    so the total cost is one k x N distance pass — cheap relative to Lloyd
    iterations and much more robust than random seeding (random init
    regularly splits/merges well-separated clusters).
    """
    n, d = x.shape
    x32 = x.astype(jnp.float32)
    row_ok = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0).squeeze(-1) < n_rows

    key0, key = jax.random.split(key)
    first = jax.random.randint(key0, (), 0, n_rows)
    centroids0 = jnp.zeros((k, d), jnp.float32).at[0].set(x32[first])

    def dist_to(c):
        return jnp.sum(jnp.square(x32 - c[None, :]), axis=-1)

    init_d = jnp.where(row_ok, dist_to(x32[first]), 0.0)

    def body(j, carry):
        centroids, min_d, key = carry
        key_j, key = jax.random.split(key)
        # Sample proportional to min squared distance (Gumbel-max on logs).
        logits = jnp.where(min_d > 0, jnp.log(min_d), -jnp.inf)
        gumbel = jax.random.gumbel(key_j, (n,))
        pick = jnp.argmax(jnp.where(row_ok, logits + gumbel, -jnp.inf))
        c = x32[pick]
        centroids = centroids.at[j].set(c)
        min_d = jnp.minimum(min_d, jnp.where(row_ok, dist_to(c), 0.0))
        return centroids, min_d, key

    centroids, _, _ = jax.lax.fori_loop(1, k, body, (centroids0, init_d, key))
    return centroids


@functools.partial(jax.jit, static_argnames=("k", "metric", "block_rows", "iters", "spherical"))
def _kmeans_iterate(
    x: jnp.ndarray,
    init_centroids: jnp.ndarray,
    n_rows: jnp.ndarray,
    k: int,
    metric: str,
    block_rows: int,
    iters: int,
    spherical: bool,
):
    n_pad, d = x.shape
    num_blocks = max(1, cdiv(n_pad, block_rows))
    blocks = x.reshape(num_blocks, min(block_rows, n_pad), d)
    local_ids = jax.lax.broadcasted_iota(jnp.int32, (blocks.shape[1], 1), 0).squeeze(-1)

    def one_iter(centroids, _):
        c32 = centroids.astype(jnp.float32)
        c_norms = jnp.sum(jnp.square(c32), axis=-1)

        def body(carry, inp):
            sums, counts, score_acc = carry
            block, bidx = inp
            gids = bidx * blocks.shape[1] + local_ids
            row_ok = gids < n_rows
            best, best_score = _assign_scores(block, centroids, metric, c_norms)
            seg = jnp.where(row_ok, best, k)  # overflow bucket for padding
            sums = sums + jax.ops.segment_sum(
                jnp.where(row_ok[:, None], block.astype(jnp.float32), 0.0), seg, num_segments=k + 1
            )[:k]
            counts = counts + jax.ops.segment_sum(
                row_ok.astype(jnp.float32), seg, num_segments=k + 1
            )[:k]
            score_acc = score_acc + jnp.sum(jnp.where(row_ok, best_score, 0.0))
            return (sums, counts, score_acc), None

        init = (
            jnp.zeros((k, d), jnp.float32),
            jnp.zeros((k,), jnp.float32),
            jnp.float32(0.0),
        )
        bidxs = jax.lax.broadcasted_iota(jnp.int32, (num_blocks, 1), 0).squeeze(-1)
        (sums, counts, score_acc), _ = jax.lax.scan(body, init, (blocks, bidxs))

        new_c = sums / jnp.maximum(counts[:, None], 1.0)
        # Empty clusters keep their previous centroid.
        new_c = jnp.where(counts[:, None] > 0, new_c, c32)
        if spherical:
            new_c = l2_normalize(new_c)
        return new_c.astype(init_centroids.dtype), score_acc

    centroids, scores = jax.lax.scan(one_iter, init_centroids, None, length=iters)
    return centroids, scores


def kmeans_fit(
    x: jnp.ndarray,
    k: int,
    *,
    iters: int = 20,
    metric: str = "l2",
    key: Optional[jax.Array] = None,
    spherical: bool = False,
    block_rows: int = DEFAULT_BLOCK_ROWS,
    max_points: Optional[int] = None,
    init: str = "kmeans++",
) -> KMeansResult:
    """Train k-means with Lloyd's algorithm.

    Args:
        x: (N, d) data.
        k: number of centroids.
        iters: Lloyd iterations (faiss default is 25; the reference's
            ``cluster()`` exposes ``niter``).
        metric: "l2" (default, faiss.Kmeans convention) or "ip"/"cosine".
        spherical: renormalize centroids each iteration (for ip/cosine).
        max_points: if set, train on a uniform subsample of at most this many
            points (faiss-style ``max_points_per_centroid`` subsampling), then
            assign all points.
        init: "kmeans++" (default, D^2-weighted seeding) or "random"
            (faiss-style sampled points; cheaper for very large k).
    """
    check_metric(metric)
    if key is None:
        key = jax.random.PRNGKey(0)
    n = x.shape[0]
    if k > n:
        raise ValueError(f"k={k} > number of points {n}")

    train_x = x
    if max_points is not None and n > max_points:
        sel_key, key = jax.random.split(key)
        sel = jax.random.choice(sel_key, n, shape=(max_points,), replace=False)
        train_x = x[jnp.sort(sel)]

    tn = train_x.shape[0]
    perm_key, key = jax.random.split(key)
    if init == "kmeans++":
        # Seed on a bounded subsample: ++ quality without a k x N full pass.
        pp_cap = max(64 * k, 4096)
        if tn > pp_cap:
            sub_key, perm_key = jax.random.split(perm_key)
            sub = train_x[jax.random.choice(sub_key, tn, shape=(pp_cap,), replace=False)]
        else:
            sub = train_x
        init_centroids = _kmeanspp_init(sub.astype(jnp.float32), jnp.int32(sub.shape[0]), k, perm_key)
    elif init == "random":
        init_idx = jax.random.choice(perm_key, tn, shape=(k,), replace=False)
        init_centroids = train_x[init_idx].astype(jnp.float32)
    else:
        raise ValueError(f"Unknown init {init!r}; expected 'kmeans++' or 'random'")
    if spherical:
        init_centroids = l2_normalize(init_centroids)

    train_pad, _ = _pad_rows(train_x, block_rows)
    centroids, _ = _kmeans_iterate(
        train_pad, init_centroids, jnp.int32(tn), k, metric, block_rows, iters, spherical
    )

    assignments, dists = kmeans_assign(x, centroids, metric=metric, block_rows=block_rows)
    if metric == "l2":
        inertia = jnp.sum(dists)
    else:
        inertia = -jnp.sum(dists)
    return KMeansResult(centroids=centroids, assignments=assignments, inertia=inertia)
