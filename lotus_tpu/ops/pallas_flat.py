"""Pallas flat-scan kernel: streaming exhaustive search with zero score
epilogue traffic.

The XLA scan path (ops/flat.py) runs at ~95% of what XLA's fused
matmul+reduce achieves, but that fusion itself caps at ~43% of MXU peak at
search shapes because every block's (B, block_rows) f32 score tile cycles
through HBM for the scale/mask/top-k epilogue (docs/benchmarks.md).  This
kernel keeps everything on-chip:

  grid = (query_tiles, db_blocks), blocks innermost.  Each step runs one
  (QU x BLK) MXU dot and folds it into a per-lane running TOP-2 held in
  VMEM scratch — the TPU-KNN bucket argument with the whole database as
  one bucket stream: lane l accumulates the best two scores among db rows
  {r : r mod NL == l}.  Only the final (QU, 2*NL) candidates are written,
  once, per query tile; XLA top-k's them to k.

Expected recall: a true top-k row is lost only when >= 2 other top rows
share its lane (triple collisions, ~C(k,3)/NL^2).  For k=10, NL=128:
~0.07% — below the approx_max_k default target.

Storage: plain int8 (with per-row scales) or bf16/f32 rows; `ids`-subset
masks fold into the score like the XLA path.  Residual-encoded IVF
storage is NOT supported here (flat scans have no probed-list bias).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lotus_tpu.ops.common import MASK_SCORE, NO_HIT

QU = 256    # queries per tile
BLK = 1024  # db rows per grid step
NL = 128    # candidate lanes (running top-2 each)


def _scan_kernel(xq_ref, xb_ref, *rest, dequant, n_valid, biased, masked):
    """One (q_tile, block) step: dot + fold into the running per-lane top-2.

    ``biased``: a (1, QU) per-(query, block) score offset — the exact f32
    q.c term for residual-encoded storage, constant across the block's rows
    because block-aligned CSR keeps each 512/1024-row block inside one list.
    ``masked``: a per-row validity plane for storage with internal padding
    (list tails), laid out like the scales.
    """
    refs = list(rest)
    sec_i_ref = refs.pop()
    sec_s_ref = refs.pop()
    best_i_ref = refs.pop()
    best_s_ref = refs.pop()
    sc_ref = refs.pop(0) if dequant else None
    bias_ref = refs.pop(0) if biased else None
    mask_ref = refs.pop(0) if masked else None

    bstep = pl.program_id(1)

    @pl.when(bstep == 0)
    def _init():
        best_s_ref[...] = jnp.full((QU, NL), MASK_SCORE, jnp.float32)
        best_i_ref[...] = jnp.full((QU, NL), NO_HIT, jnp.int32)
        sec_s_ref[...] = jnp.full((QU, NL), MASK_SCORE, jnp.float32)
        sec_i_ref[...] = jnp.full((QU, NL), NO_HIT, jnp.int32)

    blk = xb_ref.shape[0]
    xb = xb_ref[...]
    if xb.dtype == jnp.int8 and xq_ref.dtype == jnp.int8:
        dot = jnp.dot(xq_ref[...], xb.T, preferred_element_type=jnp.int32)
    else:
        xb = xb.astype(xq_ref.dtype) if xb.dtype != xq_ref.dtype else xb
        prec = jax.lax.Precision.HIGHEST if xq_ref.dtype == jnp.float32 else None
        dot = jnp.dot(xq_ref[...], xb.T, preferred_element_type=jnp.float32, precision=prec)

    base = bstep * blk
    best_s = best_s_ref[...]
    best_i = best_i_ref[...]
    sec_s = sec_s_ref[...]
    sec_i = sec_i_ref[...]
    lane = jax.lax.broadcasted_iota(jnp.int32, (QU, NL), 1)
    for j in range(blk // NL):
        sl = dot[:, j * NL : (j + 1) * NL].astype(jnp.float32)
        if sc_ref is not None:
            sl = sl * sc_ref[0, j][None, :]
        if bias_ref is not None:
            sl = sl + bias_ref[0, :][:, None]
        rows = base + j * NL + lane
        sl = jnp.where(rows < n_valid, sl, MASK_SCORE)
        if mask_ref is not None:
            sl = jnp.where(mask_ref[0, j][None, :] != 0, sl, MASK_SCORE)
        upd = sl > best_s
        new_sec_s = jnp.where(upd, best_s, jnp.maximum(sec_s, sl))
        new_sec_i = jnp.where(upd, best_i, jnp.where(sl > sec_s, rows, sec_i))
        sec_s, sec_i = new_sec_s, new_sec_i
        best_i = jnp.where(upd, rows, best_i)
        best_s = jnp.where(upd, sl, best_s)
    best_s_ref[...] = best_s
    best_i_ref[...] = best_i
    sec_s_ref[...] = sec_s
    sec_i_ref[...] = sec_i


@functools.partial(jax.jit, static_argnames=("k", "interpret", "n_rows", "blk"))
def _flat_pallas_impl(xb, xq, n_rows, xb_scales, q_scales, k, interpret, bias_blocks=None, row_mask=None, blk=BLK):
    b, d = xq.shape
    n_pad = xb.shape[0]
    assert n_pad % blk == 0 and b % QU == 0
    nq_tiles = b // QU
    n_blocks = n_pad // blk
    dequant = xb_scales is not None

    kernel = functools.partial(
        _scan_kernel, dequant=dequant, n_valid=n_rows,
        biased=bias_blocks is not None, masked=row_mask is not None,
    )
    in_specs = [
        pl.BlockSpec((QU, d), lambda qt, bs: (qt, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((blk, d), lambda qt, bs: (bs, 0), memory_space=pltpu.VMEM),
    ]
    operands = [xq, xb]
    if dequant:
        in_specs.append(
            pl.BlockSpec((1, blk // NL, NL), lambda qt, bs: (bs, 0, 0), memory_space=pltpu.VMEM)
        )
        operands.append(xb_scales.reshape(-1, blk // NL, NL))
    if bias_blocks is not None:
        in_specs.append(
            pl.BlockSpec((1, QU), lambda qt, bs: (bs, qt), memory_space=pltpu.VMEM)
        )
        operands.append(bias_blocks)  # (n_blocks, b) f32
    if row_mask is not None:
        in_specs.append(
            pl.BlockSpec((1, blk // NL, NL), lambda qt, bs: (bs, 0, 0), memory_space=pltpu.VMEM)
        )
        operands.append(row_mask.reshape(-1, blk // NL, NL))

    # Scratch-as-output: the per-lane running top-2 lives in the output
    # blocks, which stay pinned in VMEM for all block steps of a query tile
    # (their index_map ignores the block dimension) and are flushed once.
    out_specs = tuple(
        pl.BlockSpec((QU, NL), lambda qt, bs: (qt, 0), memory_space=pltpu.VMEM)
        for _ in range(4)
    )
    out_shape = (
        jax.ShapeDtypeStruct((b, NL), jnp.float32),
        jax.ShapeDtypeStruct((b, NL), jnp.int32),
        jax.ShapeDtypeStruct((b, NL), jnp.float32),
        jax.ShapeDtypeStruct((b, NL), jnp.int32),
    )
    grid = (nq_tiles, n_blocks)
    best_s, best_i, sec_s, sec_i = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0, grid=grid, in_specs=in_specs, out_specs=out_specs
        ),
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * n_pad * d,
            bytes_accessed=nq_tiles * n_pad * d + b * d * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*operands)

    cand_s = jnp.concatenate([best_s, sec_s], axis=1)   # (b, 2*NL)
    cand_i = jnp.concatenate([best_i, sec_i], axis=1)
    if q_scales is not None:
        cand_s = cand_s * q_scales[:, None]
    top_s, pos = jax.lax.top_k(cand_s, min(k, 2 * NL))
    top_i = jnp.take_along_axis(cand_i, pos, axis=1)
    top_i = jnp.where(top_s <= MASK_SCORE / 2, NO_HIT, top_i)
    return top_s, top_i


def flat_search_pallas(
    xb: jnp.ndarray,
    xq: jnp.ndarray,
    k: int,
    *,
    n_rows: int | None = None,
    xb_scales: jnp.ndarray | None = None,
    int8_queries: bool = True,
    interpret: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Streaming Pallas exhaustive search (ip/cosine; max-is-better scores).

    ``xb`` must be row-padded to a multiple of 1024 (the vector store
    pre-pads); queries are padded to a multiple of 256 here.  int8
    databases score int8 x int8 when ``int8_queries`` (per-query scales are
    rank-neutral and applied at the merge); otherwise bf16.
    """
    b = xq.shape[0]
    n = n_rows if n_rows is not None else xb.shape[0]
    if xb.shape[0] % BLK != 0:
        raise ValueError(f"database rows must be padded to a multiple of {BLK}")
    q_scales = None
    if xb.dtype == jnp.int8:
        if xb_scales is None:
            raise ValueError("int8 databases require xb_scales")
        if int8_queries:
            from lotus_tpu.ops.quant import quantize_rows

            xq, q_scales = quantize_rows(xq)
        else:
            xq = xq.astype(jnp.bfloat16)
    else:
        xq = xq.astype(jnp.bfloat16)
    b_pad = -(-b // QU) * QU
    if b_pad != b:
        xq = jnp.pad(xq, ((0, b_pad - b), (0, 0)))
        if q_scales is not None:
            q_scales = jnp.pad(q_scales, (0, b_pad - b))
    s, i = _flat_pallas_impl(xb, xq, int(n), xb_scales, q_scales, k, interpret)
    return s[:b], i[:b]


def ivf_residual_scan(
    state: dict,
    xq: jnp.ndarray,
    k: int,
    *,
    rescore: int | None = 64,
    int8_queries: bool = True,
    interpret: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Exhaustive streaming scan of a residual-encoded IVF store (ip/cosine).

    Block-aligned CSR storage keeps every 512-row block inside one list, so
    the exact f32 coarse term q.c is a per-(query, block) SCALAR — streamed
    into the kernel as a (n_blocks, B) plane instead of the per-row gather
    that defeats XLA fusion.  Scans ALL rows (no coarse-probe coverage
    loss); quantization rank flips are removed by the exact rescoring pass.
    Candidate ids are deduped (spilled rows may appear twice).
    """
    from lotus_tpu.ops.common import dedup_topk
    from lotus_tpu.ops.ivf import ensure_pos_list, rescore_candidates

    meta = state["meta"]
    blk = int(meta.get("block_align", 0))
    if blk not in (512, 1024) or meta.get("metric") == "l2":
        raise ValueError("ivf_residual_scan needs a block-aligned ip/cosine store")
    vecs = state["ivf_vectors"]
    rows = vecs.shape[0] // blk * blk  # window tail is dead (never in a list)
    vecs = vecs[:rows]
    row_ids = state["ivf_row_ids"][:rows]
    scales = state["ivf_row_scales"][:rows]
    residual = meta.get("encoding") == "residual_int8" and vecs.dtype == jnp.int8

    b = xq.shape[0]
    xqf = xq.astype(jnp.float32)
    b_pad = -(-b // QU) * QU
    bias_blocks = None
    if residual:
        qc = jnp.einsum(
            "qd,ld->ql", xqf, state["centroids"], preferred_element_type=jnp.float32
        )  # (b, nlist)
        block_lists = ensure_pos_list(state)[:rows:blk]  # (n_blocks,)
        bias_blocks = qc[:, block_lists].T  # (n_blocks, b)
        if b_pad != b:
            bias_blocks = jnp.pad(bias_blocks, ((0, 0), (0, b_pad - b)))
    mask = (row_ids >= 0).astype(jnp.int8)

    q_scales = None
    xq_in = xqf
    if vecs.dtype == jnp.int8:
        if int8_queries and not residual:
            from lotus_tpu.ops.quant import quantize_rows

            xq_in, q_scales = quantize_rows(xqf)
        else:
            # Residual scoring adds a bias, so the per-query scale is NOT
            # rank-neutral: keep queries bf16.
            xq_in = xqf.astype(jnp.bfloat16)
    else:
        xq_in = xqf.astype(jnp.bfloat16)
    if b_pad != b:
        xq_in = jnp.pad(xq_in, ((0, b_pad - b), (0, 0)))
        if q_scales is not None:
            q_scales = jnp.pad(q_scales, (0, b_pad - b))

    k_cand = max(k, rescore or k)
    s, pos = _flat_pallas_impl(
        vecs, xq_in, rows, scales, q_scales, max(k_cand, k), interpret,
        bias_blocks=bias_blocks, row_mask=mask, blk=blk,
    )
    s, pos = s[:b], pos[:b]
    ids = jnp.where(pos >= 0, row_ids[jnp.maximum(pos, 0)], NO_HIT)
    s, ids = dedup_topk(s, ids, k_cand)
    if rescore is not None:
        s, ids = rescore_candidates(state, xqf, ids, k)
    else:
        s, ids = s[:, :k], ids[:, :k]
    return s, ids
