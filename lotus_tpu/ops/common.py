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
    return np.asarray(jax.lax.bitcast_convert_type(x, jnp.float32)).view(np.int32).reshape(x.shape)


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
