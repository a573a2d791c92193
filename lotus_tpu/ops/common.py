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
