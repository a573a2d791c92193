"""Exact (Flat) vector search: blocked matmul scoring + streaming top-k merge.

TPU-native replacement for the reference's faiss Flat index
(``lotus/vector_store/faiss_vs.py:13-77``).  The database is scanned in
row-blocks with ``lax.scan``; each block contributes a local top-k that is
merged into a running top-k, so peak memory is O(B * (k + block_rows)) no
matter how large N is.  Subset search is a validity mask on scores — this
replaces the reference's rebuild-a-temp-index hack
(``faiss_vs.py:57-72``) with a single masked pass.

Metrics follow faiss conventions: ``ip``/``cosine`` similarities are returned
as-is (higher = closer); ``l2`` returns squared euclidean distance
(lower = closer).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from lotus_tpu.ops.common import MASK_SCORE, NO_HIT, as_distance, cdiv, check_metric

DEFAULT_BLOCK_ROWS = 8192


def _scores_for_block(
    xq: jnp.ndarray,
    block: jnp.ndarray,
    metric: str,
    block_norms_sq: Optional[jnp.ndarray],
    block_scales: Optional[jnp.ndarray] = None,
    q_scale: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """(B, d) x (block, d) -> (B, block) max-is-better scores in f32."""
    if block.dtype == jnp.int8:
        # Quantized storage: int8 x int8 on the MXU with int32 accumulation,
        # dequantized by the two rank-1 scale factors (ops/quant.py).
        from lotus_tpu.ops.quant import int8_scores

        assert block_scales is not None and q_scale is not None
        sims = int8_scores(xq, q_scale, block, block_scales)
        if metric in ("ip", "cosine"):
            return sims
        if block_norms_sq is None:
            raise ValueError("l2 over int8 storage requires precomputed row norms")
        return 2.0 * sims - block_norms_sq[None, :]
    # MXU policy: if either side is bf16, multiply in bf16 (full MXU rate)
    # and accumulate in f32.  For f32 inputs request HIGHEST precision —
    # the TPU default would silently round operands to bf16, breaking the
    # "exact parity with faiss Flat" contract (BASELINE.md config 1).
    if block.dtype == jnp.bfloat16 or xq.dtype == jnp.bfloat16:
        compute_dtype, precision = jnp.bfloat16, None
    else:
        compute_dtype, precision = jnp.float32, jax.lax.Precision.HIGHEST
    sims = jnp.einsum(
        "qd,nd->qn",
        xq.astype(compute_dtype),
        block.astype(compute_dtype),
        preferred_element_type=jnp.float32,
        precision=precision,
    )
    if metric in ("ip", "cosine"):
        return sims
    # l2: score = -(||x||^2 - 2 q.x); the per-query ||q||^2 constant is added
    # back when converting to distances.
    if block_norms_sq is None:
        block_norms_sq = jnp.sum(jnp.square(block.astype(jnp.float32)), axis=-1)
    return 2.0 * sims - block_norms_sq[None, :]


def _merge_topk(
    best_s: jnp.ndarray,
    best_i: jnp.ndarray,
    new_s: jnp.ndarray,
    new_i: jnp.ndarray,
    k: int,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    s = jnp.concatenate([best_s, new_s], axis=1)
    i = jnp.concatenate([best_i, new_i], axis=1)
    top_s, pos = jax.lax.top_k(s, k)
    return top_s, jnp.take_along_axis(i, pos, axis=1)


def _pad_cols(s: jnp.ndarray, i: jnp.ndarray, k: int) -> tuple[jnp.ndarray, jnp.ndarray]:
    pad = k - s.shape[1]
    if pad <= 0:
        return s, i
    b = s.shape[0]
    s = jnp.concatenate([s, jnp.full((b, pad), MASK_SCORE, s.dtype)], axis=1)
    i = jnp.concatenate([i, jnp.full((b, pad), NO_HIT, i.dtype)], axis=1)
    return s, i


@functools.partial(
    jax.jit,
    static_argnames=("k", "metric", "block_rows", "approx", "recall_target"),
)
def _flat_search_impl(
    xb: jnp.ndarray,
    xq: jnp.ndarray,
    n_rows: jnp.ndarray,
    valid: Optional[jnp.ndarray],
    xb_norms_sq: Optional[jnp.ndarray],
    k: int,
    metric: str,
    block_rows: int,
    approx: bool,
    recall_target: float,
    xb_scales: Optional[jnp.ndarray] = None,
    q_scale: Optional[jnp.ndarray] = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    n_pad, d = xb.shape
    b = xq.shape[0]

    need_norms = metric == "l2"
    if need_norms and xb_norms_sq is None:
        if xb.dtype == jnp.int8:
            assert xb_scales is not None
            xb_norms_sq = (
                jnp.sum(jnp.square(xb.astype(jnp.float32)), axis=-1) * jnp.square(xb_scales)
            )
        else:
            xb_norms_sq = jnp.sum(jnp.square(xb.astype(jnp.float32)), axis=-1)

    def masked_scores(block, bnorm, bvalid, gids, bscale=None):
        scores = _scores_for_block(xq, block, metric, bnorm, block_scales=bscale, q_scale=q_scale)
        row_ok = gids[None, :] < n_rows
        if bvalid is not None:
            row_ok = jnp.logical_and(row_ok, bvalid[None, :])
        return jnp.where(row_ok, scores, MASK_SCORE)

    num_blocks = cdiv(n_pad, block_rows)
    if num_blocks <= 1:
        gids = jax.lax.broadcasted_iota(jnp.int32, (n_pad, 1), 0).squeeze(-1)
        scores = masked_scores(xb, xb_norms_sq, valid, gids, xb_scales)
        kb = min(k, n_pad)
        if approx and n_pad > 4 * kb:
            top_s, pos = jax.lax.approx_max_k(scores, kb, recall_target=recall_target)
        else:
            top_s, pos = jax.lax.top_k(scores, kb)
        # top_k positions over the full array ARE the row ids — gathering a
        # broadcast id matrix here would materialize (B, N) ints.
        top_i = jnp.where(top_s <= MASK_SCORE / 2, NO_HIT, pos)
        return _pad_cols(top_s, top_i, k)

    assert n_pad % block_rows == 0, "padded database rows must be a multiple of block_rows"
    kb = min(k, block_rows)
    local_ids = jax.lax.broadcasted_iota(jnp.int32, (block_rows, 1), 0).squeeze(-1)

    xs = {
        "block": xb.reshape(num_blocks, block_rows, d),
        "bidx": jax.lax.broadcasted_iota(jnp.int32, (num_blocks, 1), 0).squeeze(-1),
    }
    if need_norms:
        xs["norms"] = xb_norms_sq.reshape(num_blocks, block_rows)
    if valid is not None:
        xs["valid"] = valid.reshape(num_blocks, block_rows)
    if xb_scales is not None:
        xs["scales"] = xb_scales.reshape(num_blocks, block_rows)

    init = (
        jnp.full((b, k), MASK_SCORE, jnp.float32),
        jnp.full((b, k), NO_HIT, jnp.int32),
    )

    def body(carry, inp):
        best_s, best_i = carry
        gids = inp["bidx"] * block_rows + local_ids
        scores = masked_scores(inp["block"], inp.get("norms"), inp.get("valid"), gids, inp.get("scales"))
        if approx and scores.shape[1] > 4 * kb:
            top_s, pos = jax.lax.approx_max_k(scores, kb, recall_target=recall_target)
        else:
            top_s, pos = jax.lax.top_k(scores, kb)
        # Block-local top-k positions globalize with the block offset — no
        # (B, block) id gather needed.  Masked rows (score == MASK_SCORE)
        # surface as NO_HIT instead of a real-looking row id.
        top_i = jnp.where(top_s <= MASK_SCORE / 2, NO_HIT, inp["bidx"] * block_rows + pos)
        top_s, top_i = _pad_cols(top_s, top_i, k)
        return _merge_topk(best_s, best_i, top_s, top_i, k), None

    (best_s, best_i), _ = jax.lax.scan(body, init, xs)
    return best_s, best_i


@functools.partial(jax.jit, static_argnames=("k",))
def _flat_rescore_impl(
    xq: jnp.ndarray,
    cand_i: jnp.ndarray,
    xb: jnp.ndarray,
    xb_scales: Optional[jnp.ndarray],
    k: int,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    v = jnp.take(xb, jnp.maximum(cand_i, 0), axis=0).astype(jnp.float32)
    if xb_scales is not None:
        v = v * jnp.take(xb_scales, jnp.maximum(cand_i, 0), axis=0)[..., None]
    s = jnp.einsum(
        "qd,qmd->qm", xq, v, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    s = jnp.where(cand_i == NO_HIT, MASK_SCORE, s)
    top_s, pos = jax.lax.top_k(s, min(k, s.shape[1]))
    top_i = jnp.take_along_axis(cand_i, pos, axis=1)
    top_i = jnp.where(top_s <= MASK_SCORE / 2, NO_HIT, top_i)
    return top_s, top_i


def flat_rescore(
    xb: jnp.ndarray,
    xq: jnp.ndarray,
    cand_i: jnp.ndarray,
    k: int,
    *,
    xb_scales: Optional[jnp.ndarray] = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Exact f32 re-rank of flat-scan candidates (ip/cosine).

    The IVF trick (ops/ivf.rescore_candidates) applied to the flat path:
    take the approximate scan's top-``len(cand)`` candidate rows, rebuild
    them at f32 (int8 storage dequantizes by its per-row scale) and re-rank
    with full-precision queries — removing the quantization/approx rank
    flips at the top-k boundary for O(B x rescore x d) extra FLOPs.
    """
    return _flat_rescore_impl(xq.astype(jnp.float32), cand_i, xb, xb_scales, k)


def flat_search(
    xb: jnp.ndarray,
    xq: jnp.ndarray,
    k: int,
    *,
    metric: str = "ip",
    n_rows: int | jnp.ndarray | None = None,
    valid: Optional[jnp.ndarray] = None,
    xb_norms_sq: Optional[jnp.ndarray] = None,
    block_rows: int = DEFAULT_BLOCK_ROWS,
    approx: bool = False,
    recall_target: float = 0.95,
    xb_scales: Optional[jnp.ndarray] = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Exact top-k search of ``xq`` against ``xb``.

    int8 databases (``xb.dtype == int8`` with per-row ``xb_scales``) are
    scored int8 x int8 on the MXU; queries are quantized per call
    (ops/quant.py).

    Args:
        xb: (N_pad, d) database. May be padded past the logical row count;
            pass ``n_rows`` for the logical count. For the multi-block path
            N_pad must be a multiple of ``block_rows`` (the vector store pads
            at build time to avoid copies here).
        xq: (B, d) or (d,) queries.
        k: number of neighbours (static).
        metric: "ip" | "cosine" | "l2". "cosine" assumes inputs are already
            normalized (the RM layer normalizes).
        n_rows: logical number of valid rows in xb (default: xb.shape[0]).
        valid: optional (N_pad,) bool mask — masked-subset search, replacing
            the reference's temp-index rebuild (faiss_vs.py:57-72).
        xb_norms_sq: optional precomputed squared row norms (l2 only).
        approx: use TPU ``approx_max_k`` (PartialReduce) per block.

    Returns:
        (distances, indices): (B, k) f32 distances in metric convention and
        (B, k) i32 row indices, -1 where fewer than k valid rows exist.
    """
    check_metric(metric)
    squeeze = xq.ndim == 1
    if squeeze:
        xq = xq[None, :]
    if xq.dtype == jnp.float64:
        xq = xq.astype(jnp.float32)
    if n_rows is None:
        n_rows = xb.shape[0]
    n_rows_arr = jnp.asarray(n_rows, jnp.int32)

    q_scale = None
    if xb.dtype == jnp.int8:
        # Quantized storage: quantize queries per-row so scoring stays int8.
        from lotus_tpu.ops.quant import quantize_rows

        if xb_scales is None:
            raise ValueError("int8 databases require xb_scales (per-row dequant factors)")
        xq_orig = xq
        xq, q_scale = quantize_rows(xq)
    else:
        xq_orig = xq

    n_pad = xb.shape[0]
    if n_pad > block_rows and n_pad % block_rows != 0:
        # Copy fallback; the store pre-pads to avoid this. Warn, because the
        # copy repeats on EVERY call and costs more than the search itself
        # at large N (observed 6x slowdown at 1M x 768).
        import lotus_tpu

        lotus_tpu.logger.warning(
            f"flat_search: database rows ({n_pad}) not a multiple of block_rows "
            f"({block_rows}); padding copies the database on every call — "
            "pre-pad the storage for performance."
        )
        pad = cdiv(n_pad, block_rows) * block_rows - n_pad
        xb = jnp.pad(xb, ((0, pad), (0, 0)))
        if valid is not None:
            valid = jnp.pad(valid, (0, pad))
        if xb_norms_sq is not None:
            xb_norms_sq = jnp.pad(xb_norms_sq, (0, pad))
        if xb_scales is not None:
            xb_scales = jnp.pad(xb_scales, (0, pad))

    scores, idx = _flat_search_impl(
        xb, xq, n_rows_arr, valid, xb_norms_sq,
        k, metric, block_rows, approx, recall_target,
        xb_scales, q_scale,
    )
    dists = as_distance(scores, metric)
    if metric == "l2":
        q_norms = jnp.sum(jnp.square(xq_orig.astype(jnp.float32)), axis=-1, keepdims=True)
        dists = dists + q_norms
        dists = jnp.where(idx == NO_HIT, jnp.finfo(jnp.float32).max, dists)
    if squeeze:
        return dists[0], idx[0]
    return dists, idx
