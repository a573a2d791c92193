"""Shared helpers for the compute core."""

from __future__ import annotations

import jax.numpy as jnp

# Sentinel for "no hit". Matches the reference convention of -1 indices for
# padded/missing results (e.g. lotus/vector_store/qdrant_vs.py:137-140 and
# faiss's own -1 fill).
NO_HIT = -1

# Score used to mask out invalid rows. Finite (not -inf) so downstream
# arithmetic never produces NaNs; far below any real similarity.
MASK_SCORE = -3.0e38

METRICS = ("ip", "cosine", "l2")


def dedup_topk(
    scores: jnp.ndarray, ids: jnp.ndarray, k: int, aux: jnp.ndarray | None = None
):
    """Top-k of (scores, ids) rows with duplicate ids collapsed to their
    best-scored copy.

    Used wherever spilled (replicated-assignment) rows can reach a candidate
    pool through more than one list or shard.  Input columns should already
    be a small, score-descending pool (e.g. top_k output with 2k head-room);
    the argsort is per-row over that pool only.  Masked entries are
    ``NO_HIT`` ids with ``MASK_SCORE`` scores.  ``aux`` (e.g. storage
    positions) is permuted alongside and returned as a third output.
    """
    import jax

    b = scores.shape[0]
    grp = jnp.argsort(ids, axis=1, stable=True)  # group ids; keep score order inside
    gi = jnp.take_along_axis(ids, grp, axis=1)
    gs = jnp.take_along_axis(scores, grp, axis=1)
    ga = jnp.take_along_axis(aux, grp, axis=1) if aux is not None else None
    prev = jnp.concatenate([jnp.full((b, 1), -2, gi.dtype), gi[:, :-1]], axis=1)
    dup = (gi == prev) & (gi != NO_HIT)
    gs = jnp.where(dup, MASK_SCORE, gs)
    gi = jnp.where(dup, NO_HIT, gi)
    k_fin = min(k, scores.shape[1])
    top_s, pos = jax.lax.top_k(gs, k_fin)
    top_i = jnp.take_along_axis(gi, pos, axis=1)
    top_a = jnp.take_along_axis(ga, pos, axis=1) if ga is not None else None
    if k_fin < k:
        padn = k - k_fin
        top_s = jnp.concatenate([top_s, jnp.full((b, padn), MASK_SCORE, top_s.dtype)], axis=1)
        top_i = jnp.concatenate([top_i, jnp.full((b, padn), NO_HIT, top_i.dtype)], axis=1)
        if top_a is not None:
            top_a = jnp.concatenate([top_a, jnp.zeros((b, padn), top_a.dtype)], axis=1)
    if aux is not None:
        return top_s, top_i, top_a
    return top_s, top_i


def fetch_int32(x: jnp.ndarray) -> "np.ndarray":  # noqa: F821
    """Device->host fetch of an int32 array, bitcast to f32 for the wire.

    Through the axon dev tunnel integer device->host transfers take a slow
    path (~26 KB/s observed vs >50 MB/s for floats — 155 s for a 4 MB
    assignment vector).  Bitcasting to f32 on device and viewing the bytes
    back as int32 on host is exact and rides the fast path.  On directly
    attached hosts it is a no-op-cost reinterpret either way.
    """
    import jax
    import numpy as np

    if x.dtype != jnp.int32:
        x = x.astype(jnp.int32)
    y = jax.lax.bitcast_convert_type(x, jnp.float32)
    # Block before the transfer: starting a D2H while the dispatch queue is
    # deep intermittently wedges the axon tunnel (observed hangs).
    y.block_until_ready()
    return np.asarray(y).view(np.int32).reshape(x.shape)


def cdiv(a: int, b: int) -> int:
    return -(-a // b)


def round_up(x: int, m: int) -> int:
    return cdiv(x, m) * m


def check_metric(metric: str) -> None:
    if metric not in METRICS:
        raise ValueError(f"Unknown metric {metric!r}; expected one of {METRICS}")


def as_similarity(distances: jnp.ndarray, metric: str) -> jnp.ndarray:
    """Convert user-facing distances to internal max-is-better scores."""
    return distances if metric in ("ip", "cosine") else -distances


def as_distance(scores: jnp.ndarray, metric: str) -> jnp.ndarray:
    """Convert internal max-is-better scores to user-facing distances.

    For inner-product/cosine metrics the "distance" is the similarity itself
    (higher = closer), matching faiss METRIC_INNER_PRODUCT semantics that the
    reference relies on (lotus/vector_store/faiss_vs.py:14).  For l2 the
    distance is the (non-negative) squared euclidean distance.
    """
    return scores if metric in ("ip", "cosine") else -scores


def l2_normalize(x: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    norm = jnp.sqrt(jnp.sum(jnp.square(x.astype(jnp.float32)), axis=-1, keepdims=True))
    return (x.astype(jnp.float32) / jnp.maximum(norm, eps)).astype(x.dtype)
