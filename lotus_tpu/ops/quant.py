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


def quantize_refinement_int4(resid: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-row symmetric int4 of a quantization residual, nibble-packed.

    The refinement layer costs 0.5 byte/dim and shrinks the effective
    quantization step ~14x when added back at rescoring time (the
    "extra bits for reorder" trick: scan coarse, re-rank fine).  Returns
    (packed (n, d//2) int8 with even dims in the low nibble, scales f32).
    """
    r32 = resid.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(r32), axis=-1)
    scale = absmax / 7.0
    inv = jnp.where(scale > 0, 1.0 / jnp.where(scale > 0, scale, 1.0), 0.0)
    q = jnp.clip(jnp.round(r32 * inv[:, None]), -7, 7).astype(jnp.int8)
    lo = q[:, 0::2] & 0xF
    hi = q[:, 1::2] & 0xF
    return (lo | (hi << 4)).astype(jnp.int8), scale


def unpack_int4(packed: jnp.ndarray) -> jnp.ndarray:
    """(… , d//2) nibble-packed int4 -> (… , d) int8 values in [-8, 7]."""
    u = packed.astype(jnp.uint8)
    lo = (u & 0xF).astype(jnp.int8)
    hi = ((u >> 4) & 0xF).astype(jnp.int8)
    # Sign-extend 4-bit two's complement.
    lo = jnp.where(lo >= 8, lo - 16, lo)
    hi = jnp.where(hi >= 8, hi - 16, hi)
    return jnp.stack([lo, hi], axis=-1).reshape(*packed.shape[:-1], packed.shape[-1] * 2)


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
