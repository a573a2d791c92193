"""Pallas fused distance + bucket-reduce kernel for Flat search.

The TPU-KNN recipe ("K Nearest Neighbor Search at Peak FLOP/s",
arXiv:2206.14286) at the kernel level: for each (query tile, db block) the
kernel computes the score tile on the MXU and immediately reduces it to one
(max score, argmax id) candidate per BUCKET consecutive db rows — entirely
in VMEM, so the (TQ, TN) score tile never touches HBM.  A query's exact
top-k is then recovered with one cheap `lax.top_k` over the (N / BUCKET)
candidates.

Recall: with k neighbours hashed into N/BUCKET buckets, the expected loss
is ~C(k,2)*BUCKET/N (two true neighbours colliding in one bucket); at
N=1M, k=10, BUCKET=128 that is ~0.6% — and BUCKET is tunable.

The kernel avoids HBM traffic for scores: per block only (TQ, TN/BUCKET)
candidates are written, a BUCKET-fold reduction of output bandwidth.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lotus_tpu.ops.common import MASK_SCORE, NO_HIT, cdiv

DEFAULT_TQ = 512  # query tile rows
DEFAULT_TN = 2048  # db block rows per grid step
DEFAULT_BUCKET = 128  # db rows per emitted candidate


def _bucket_kernel(xq_ref, xb_ref, out_s_ref, out_i_ref, *, bucket: int, tn: int):
    """One (query tile, db block) step: score tile -> per-bucket (max, argmax).

    Candidates are written transposed, (nb, TQ): Pallas TPU requires output
    block minor dims divisible by (8, 128), which (TQ, nb=TN/bucket) would
    violate for practical bucket sizes.
    """
    scores = jnp.dot(
        xq_ref[:], xb_ref[:].T, preferred_element_type=jnp.float32
    )  # (TQ, TN) on the MXU
    tq = scores.shape[0]
    nb = tn // bucket
    # (TQ, nb, bucket) -> reduce the bucket axis.
    s3 = scores.reshape(tq, nb, bucket)
    bmax = jnp.max(s3, axis=2)
    barg = jnp.argmax(s3, axis=2).astype(jnp.int32)
    block_idx = pl.program_id(1)
    local_bucket = jax.lax.broadcasted_iota(jnp.int32, (tq, nb), 1)
    ids = block_idx * tn + local_bucket * bucket + barg
    out_s_ref[:] = bmax.T
    out_i_ref[:] = ids.T


@functools.partial(
    jax.jit, static_argnames=("k", "tq", "tn", "bucket", "interpret")
)
def pallas_bucketed_search(
    xb: jnp.ndarray,
    xq: jnp.ndarray,
    k: int,
    *,
    n_rows: int | None = None,
    tq: int = DEFAULT_TQ,
    tn: int = DEFAULT_TN,
    bucket: int = DEFAULT_BUCKET,
    interpret: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Inner-product top-k via the fused Pallas bucket kernel.

    Requirements: xb rows divisible by ``tn`` (the vector store pads —
    pass ``n_rows`` for the logical count so padded zero rows can't win),
    ``tn`` divisible by ``bucket``; query batch is padded to ``tq``
    internally.  Returns (scores desc, ids) of shape (B, k).
    """
    n, d = xb.shape
    b = xq.shape[0]
    assert n % tn == 0, f"db rows {n} must be a multiple of tn={tn}"
    assert tn % bucket == 0
    if n_rows is None:
        n_rows = n
    k = min(k, n // bucket)  # at most one candidate per bucket exists

    b_pad = cdiv(b, tq) * tq
    if b_pad != b:
        xq = jnp.pad(xq, ((0, b_pad - b), (0, 0)))

    compute_dtype = jnp.bfloat16 if xb.dtype == jnp.bfloat16 else xq.dtype
    xq_c = xq.astype(compute_dtype)
    xb_c = xb.astype(compute_dtype)

    grid = (b_pad // tq, n // tn)
    nb = tn // bucket
    out_shape = (
        jax.ShapeDtypeStruct(((n // tn) * nb, b_pad), jnp.float32),
        jax.ShapeDtypeStruct(((n // tn) * nb, b_pad), jnp.int32),
    )
    cand_s_t, cand_i_t = pl.pallas_call(
        functools.partial(_bucket_kernel, bucket=bucket, tn=tn),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tq, d), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tn, d), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((nb, tq), lambda i, j: (j, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, tq), lambda i, j: (j, i), memory_space=pltpu.VMEM),
        ),
        out_shape=out_shape,
        cost_estimate=pl.CostEstimate(
            flops=2 * b_pad * n * d,
            bytes_accessed=b_pad * d * 4 + n * d * 2 + b_pad * (n // bucket) * 8,
            transcendentals=0,
        ),
        interpret=interpret,
    )(xq_c, xb_c)

    cand_s = cand_s_t.T  # (b_pad, total_nb)
    cand_i = cand_i_t.T
    # Mask candidates from padded rows (zero vectors can out-score negative
    # true products) before the final top-k.
    cand_s = jnp.where(cand_i < n_rows, cand_s, MASK_SCORE)
    top_s, pos = jax.lax.top_k(cand_s, k)
    top_i = jnp.take_along_axis(cand_i, pos, axis=1)
    top_i = jnp.where(top_s <= MASK_SCORE / 2, NO_HIT, top_i)
    return top_s[:b], top_i[:b]
