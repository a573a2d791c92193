"""Symmetric int8 quantization for the vector store.

Per-row symmetric quantization: x_q = round(x * 127 / max|x_row|).  Inner
products factor exactly: q . x = (qscale * rowscale) * (q_q . x_q), so
scoring runs int8 x int8 on the MXU with an int32 accumulator and two cheap
rank-1 scale multiplies.  Storage and HBM traffic halve vs bfloat16
(~7.5 GB for 10M x 768), doubling per-chip corpus capacity.
"""

from __future__ import annotations

import jax.numpy as jnp


def quantize_rows(x: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-row symmetric int8: returns (values int8, scales f32).

    ``scales`` are the dequantization factors: x ~ values * scales[:, None].
    Zero rows get scale 0 (and quantize to zeros).
    """
    x32 = x.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(x32), axis=-1)
    scale = absmax / 127.0
    inv = jnp.where(scale > 0, 1.0 / jnp.where(scale > 0, scale, 1.0), 0.0)
    q = jnp.clip(jnp.round(x32 * inv[:, None]), -127, 127).astype(jnp.int8)
    return q, scale


def int8_scores(
    xq_q: jnp.ndarray,
    q_scale: jnp.ndarray,
    xb_q: jnp.ndarray,
    b_scale: jnp.ndarray,
) -> jnp.ndarray:
    """(B, d) int8 x (N, d) int8 -> (B, N) f32 inner products."""
    acc = jnp.einsum(
        "qd,nd->qn", xq_q.astype(jnp.int32), xb_q.astype(jnp.int32),
        preferred_element_type=jnp.int32,
    )
    return acc.astype(jnp.float32) * q_scale[:, None] * b_scale[None, :]
