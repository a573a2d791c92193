"""Pallas grouped IVF probe: scalar-prefetched block DMA.

The XLA grouped probe (ops/ivf.py:ivf_search_grouped) is algorithmically
right but gather-bound: its vmapped list reads lower to row-granularity
gathers.  This kernel fixes that with ``PrefetchScalarGridSpec``: work-unit
tables (which query tile, which db block, how many rows are live) are
computed in XLA, prefetched as scalars, and drive the BlockSpec index_maps
— so the Pallas pipeline double-buffers each probed 512-row block from HBM
as a real DMA.

Work decomposition (all static):
  unit u = (query chunk of QU pairs of one list, one BL-row block of it)
  u_max  = max_blocks * (B*nprobe // QU) + rows // BL   (proved in-line)
Each grid step runs one (QU x BL) MXU matmul (int8 or float) and reduces it
to per-bucket top-2 candidates — the TPU-KNN bucket trick (arXiv:2206.14286)
with a second survivor so pair collisions cost ~nothing; XLA then routes
candidates back to (query, probe slot) with a direct per-pair gather and
top-k's.  Fills the large-batch half of faiss IVF-Flat's role
(reference: lotus/vector_store/faiss_vs.py + BASELINE.md config 4); the
window probe in ops/ivf.py covers the small-batch half.

Requires an index built with ``build_ivf(..., block_align=BL)``.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lotus_tpu.ops.common import MASK_SCORE, NO_HIT, as_distance, dedup_topk
from lotus_tpu.ops.flat import flat_search

QU = 128     # query lanes per unit
# Default BUILD alignment (db rows per kernel block).  The probe adapts to
# each store's own ``block_align`` per call (512-aligned stores keep
# working); new builds default to 1024, which halves the grid-step count at
# identical per-lane bucket statistics — measured +7% QPS on the 10M bench
# (18.2k vs 17.0k at nprobe=256, same 0.9957 recall, 2026-08-18,
# tools_dev/exp_probe_bl.py).  VMEM bounds the ceiling (~2048 at d=768).
BL = 1024
# Buckets per 512 storage rows.  The fold's lane count is nbk = 512//BUCKET
# and the per-call bucket loop runs bl//nbk iterations, so bucket
# STATISTICS (rows per candidate lane across a folded list) are independent
# of the block size.  IVF candidate pools are small (nprobe lists, not the
# whole DB), so the bucket must be much finer than the flat kernel's 128.
# With the exact-rescoring stage downstream, the bucket only needs to
# DELIVER candidates, not rank them.  Since the fold runs across a WHOLE
# list (several blocks), clustered corpora concentrate many of a query's
# true top-10 in one list: at BUCKET=16 (32 lanes x top-2) triple
# collisions capped recall at 0.9906 on the 10M bench regardless of
# nprobe/rescore; BUCKET=8 (64 lanes x top-2 = 128 candidates per pair)
# removes that ceiling for ~2x the (now chunk-granular) output memory.
BUCKET = 8  # -> nbk = 64, 128 candidates per (query, list-chunk)
# Fold mode: "top2" keeps two survivors per bucket (collision-robust);
# "top1" keeps one from finer buckets — fewer epilogue ops per score
# element at equal candidate count, but pair collisions return.  Measured
# on the 10M bench (tools_dev/exp_probe_fold.py) before choosing.
FOLD = "top2"
# Packed epilogue: steal the low LOCAL_BITS mantissa bits of each f32 score
# for the candidate's window-local row id — the fold then maintains top-2
# with plain max/min on ONE value (no index arrays: ~1/3 fewer epilogue ops,
# half the output state), and the reassembly recovers storage rows as
# list_start[probed list] + low bits.  Keeps ~10 effective score bits
# (> bf16's 8); exact rescoring absorbs the tie noise downstream.  Default
# ON after the 10M shootout (tools_dev/exp_probe_fold.py, 2026-08-18):
# 13,757 QPS vs 13,117 unpacked at identical 0.9957 recall@10.  Probes
# whose window exceeds the packed-id range fall back to the unpacked fold
# automatically (per-call, in _grouped_probe_pallas).
PACKED = True
# Cost-attribution knob for tools_dev/exp_probe_where.py ONLY (module-global,
# read at trace time — callers must jax.clear_caches() after flipping):
# 1 = replace the kernel output with zeros (measures the XLA side: tables,
# query layout, reassembly gathers, final top-k); 2 = return dummies right
# after the kernel (measures tables + layout + kernel, no reassembly);
# 3 = return dummies before the kernel (tables + query layout only —
# includes the coarse centroid ranking); 4 = after the coarse ranking only;
# 5 = after pair grouping (hist/cumsum/rank); 6 = after the padded query
# layout gather (before the per-unit scalar tables).
_DEBUG_STAGE = 0
# Pool pre-reduction (packed path): keep only the per-(query,list) top-PR
# candidates BEFORE the reassembly gather, shrinking the gather and the
# final per-query top-k by kc/PR.  Exact for the final ranking whenever
# PR >= the pool head (k, or 2k on spilled stores): one pair can contribute
# at most that many survivors.  0 = off.  Modes: "exact" (lax.top_k over the
# ncand minor dim), "approx" (hardware PartialReduce).
POOL_PREREDUCE = 0
POOL_PREREDUCE_MODE = "exact"
# Pair-grouping rank via MXU instead of jnp.cumsum: the exclusive prefix
# over the (b, nlist) probe histogram is a strictly-lower-triangular ones
# matmul (f32 is exact: counts <= b << 2^24).  jnp.cumsum over the 67 MB
# histogram lowered to a multi-pass scan measured ~21 ms of the 138 ms
# batch at the 10M operating point; the MXU does the same prefix as a
# b x b x nlist matmul.
CUMSUM_MATMUL = False


def _dbg_out(b, k, return_rows, anchor):
    import jax.numpy as _jnp

    top_s = _jnp.full((b, k), MASK_SCORE, _jnp.float32) + anchor
    top_i = _jnp.full((b, k), NO_HIT, _jnp.int32)
    if return_rows:
        return top_s, top_i, _jnp.zeros((b, k), _jnp.int32)
    return top_s, top_i
# Final candidate selection via jax.lax.approx_max_k (hardware
# PartialReduce) instead of the sort-based exact top_k.  Applies only when
# the pool is >= 4x the output (the approx op needs reduction headroom).
# Measured on the 10M bench (2026-08-18): a WASH within tunnel noise
# (nprobe=256/rescore=32: 17.1k QPS approx vs 16.6k exact at identical
# 0.9957 recall; nprobe=192: 18.5k vs 20.9k) — the pool top-k is not the
# bottleneck, so the default stays exact (zero tail risk).
APPROX_TOPK = False
# Coarse centroid ranking via approx_max_k: selecting the top-nprobe of
# nlist lists is probe SELECTION, not scoring — an occasionally-missed
# marginal list costs ~nothing at operating nprobe, while the exact
# top_k(nprobe) over the (b, nlist) coarse scores is a full per-row sort
# (measured 16 of the 18.5 ms coarse stage at the 10M operating point).
# Applies when nlist >= 4x nprobe (the approx op needs reduction headroom).
COARSE_APPROX = False
LOCAL_BITS = 13  # covers probe windows up to 8192 rows
_LOCAL_MASK = (1 << LOCAL_BITS) - 1
# vfw bit layout, derived from the per-call block size so a retune can never
# silently collide: bits [0, vbits) hold the valid-row count (0..bl
# inclusive), bit vbits is the chunk-start flag, bits above it hold
# block-in-list.  Block-in-list bits are only MEANINGFUL under the packed
# gate (which bounds block_idx < max_blocks <= 2^LOCAL_BITS / bl); in the
# unpacked path they may wrap int32 for absurdly long lists and are never
# read.  vbits = bl.bit_length() (11 for bl=1024).


def _bucket_top2_accum(get_slice, base, first, out_s_ref, out_i_ref, nbk, bucket):
    """Fold BUCKET slices of (QU, nbk) scores into the running per-bucket
    (top-2 score, global index) state held in the OUTPUT block.

    Buckets are STRIDED (bucket b = cols {b + j*nbk}), so the reduction is a
    running max over BUCKET contiguous (QU, nbk) lane slices — no lane-dim
    reshape, which Mosaic handles poorly for trailing dims != 128.  Keeping
    the TOP-2 of each bucket turns the recall loss from pair collisions
    (~C(k,2)*BUCKET/list_rows, several points at IVF list sizes) into triple
    collisions (negligible).

    Consecutive grid units of one (list, query-chunk) visit the chunk's
    blocks back-to-back with the SAME output index, so Pallas keeps the
    output block resident in VMEM: the fold runs across ALL of a list's
    blocks and the (chunk, QU, 2*nbk) result is flushed to HBM once per
    chunk — this is what shrinks probe memory/traffic by ~blocks-per-list
    versus emitting per-block candidates.  ``first`` (scalar) marks the
    chunk's first block: the previous output contents are garbage then and
    are replaced by MASK_SCORE.  ``get_slice(j)`` returns the masked f32
    scores for db rows [j*nbk, (j+1)*nbk) of the block; ``base`` is the
    block's global starting row, so emitted indices are global int32.
    """
    lane = jax.lax.broadcasted_iota(jnp.int32, (QU, nbk), 1)
    prev_s = out_s_ref[0]
    prev_i = out_i_ref[0]
    best_s = jnp.where(first, MASK_SCORE, prev_s[:, :nbk])
    best_i = jnp.where(first, 0, prev_i[:, :nbk])
    sec_s = jnp.where(first, MASK_SCORE, prev_s[:, nbk:])
    sec_i = jnp.where(first, 0, prev_i[:, nbk:])
    for j in range(bucket):
        sl = get_slice(j)
        idx = base + j * nbk + lane
        upd = sl > best_s
        upd2 = sl > sec_s
        new_sec_s = jnp.where(upd, best_s, jnp.where(upd2, sl, sec_s))
        new_sec_i = jnp.where(upd, best_i, jnp.where(upd2, idx, sec_i))
        best_i = jnp.where(upd, idx, best_i)
        best_s = jnp.where(upd, sl, best_s)
        sec_s, sec_i = new_sec_s, new_sec_i
    out_s_ref[0] = jnp.concatenate([best_s, sec_s], axis=1)
    out_i_ref[0] = jnp.concatenate([best_i, sec_i], axis=1)


def _bucket_pack_accum(get_raw_slice, local_base, vcount, first, out_ref, nbk, bucket):
    """Packed top-k-per-bucket fold (``PACKED``): the window-local row id
    rides the low mantissa bits of the score, so the running (best[, second])
    state is plain f32 tiles updated with max/min — no index arrays.

    Packing preserves float ORDER above the truncation granularity: clearing
    the low bits rounds every score toward -inf by < 2^-10 relative, and the
    id bits break ties deterministically.  Masked lanes keep MASK_SCORE
    exactly (their ids are never recovered — the score threshold kills them
    in the reassembly).  The validity mask is fused INTO the pack select
    (one select per element instead of mask-select + re-mask), so this
    accumulator takes the RAW (unmasked) score slice.  ``FOLD == "top1"``
    keeps one survivor per bucket (half the state and ~1/3 fewer ops; pair
    collisions return — measure before enabling)."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (QU, nbk), 1)
    top1 = FOLD == "top1"
    prev = out_ref[0]
    best = jnp.where(first, MASK_SCORE, prev if top1 else prev[:, :nbk])
    sec = None if top1 else jnp.where(first, MASK_SCORE, prev[:, nbk:])
    for j in range(bucket):
        sl = get_raw_slice(j)
        idx = local_base + j * nbk + lane
        bits = jax.lax.bitcast_convert_type(sl, jnp.int32)
        pk = jax.lax.bitcast_convert_type((bits & ~_LOCAL_MASK) | idx, jnp.float32)
        pk = jnp.where(_slice_mask(j, vcount, nbk), pk, MASK_SCORE)
        if top1:
            best = jnp.maximum(best, pk)
        else:
            new_best = jnp.maximum(best, pk)
            sec = jnp.maximum(sec, jnp.minimum(best, pk))
            best = new_best
    out_ref[0] = best if top1 else jnp.concatenate([best, sec], axis=1)


def _bucket_top1_accum(get_slice, base, first, out_s_ref, out_i_ref, nbk, bucket):
    """Top-1-per-bucket fold (``FOLD == "top1"``): same output width as the
    top-2 fold when BUCKET is halved, at ~1/3 fewer epilogue ops per score
    element — the candidate-count/VPU-work trade the fold-mode knob exposes."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (QU, nbk), 1)
    best_s = jnp.where(first, MASK_SCORE, out_s_ref[0])
    best_i = jnp.where(first, 0, out_i_ref[0])
    for j in range(bucket):
        sl = get_slice(j)
        idx = base + j * nbk + lane
        upd = sl > best_s
        best_i = jnp.where(upd, idx, best_i)
        best_s = jnp.where(upd, sl, best_s)
    out_s_ref[0] = best_s
    out_i_ref[0] = best_i


def _slice_mask(j, vcount, nbk):
    cols = j * nbk + jax.lax.broadcasted_iota(jnp.int32, (QU, nbk), 1)
    return cols < vcount


def _probe_kernel(qtab_ref, btab_ref, vfw_ref, xq_ref, xb_ref, *rest, int8_dot, dequant, l2, packed, bl, bucket):
    """One unit: (QU, d) x (BL, d)^T -> per-bucket (top-2, arg).

    Variants (static flags; extra inputs in order):
    - ``int8_dot``: int8 x int8 on the MXU (ip only — the per-query scale is
      rank-neutral there and is applied after the final top-k).
    - ``dequant``: multiply dot slices by prefetched row scales.  The scale
      block is (1, BUCKET, nbk): row j holds db rows [j*nbk, (j+1)*nbk) —
      exactly the bucket-loop slice — so a (1, BL) block (which would break
      the (8, 128) tile rule) is never needed.
    - ``l2``: score slices become 2*dot - ||x||^2 with norms prefetched the
      same way (int8 l2 keeps queries bf16: the query scale would multiply
      only the dot term, so it is NOT rank-neutral under the subtraction).
    """
    nbk = bl // bucket
    vbits = bl.bit_length()
    vmask = (1 << vbits) - 1
    refs = list(rest)
    if packed:
        out_ref = refs.pop()
    else:
        out_i_ref = refs.pop()
        out_s_ref = refs.pop()
    sc_ref = refs.pop(0) if dequant else None
    nm_ref = refs.pop(0) if l2 else None

    u = pl.program_id(0)
    # vfw packs (valid-row count, chunk-start flag, block-in-list) into one
    # int32 per unit: SMEM holds ~1 MB total and each prefetched scalar
    # table costs u_max * 4 bytes (221 KB at the 10M operating point), so
    # five separate tables exceed it — three fit with margin.
    vfw = vfw_ref[u]
    vcount = vfw & vmask
    base = btab_ref[u] * bl
    first = ((vfw >> vbits) & 1) != 0

    # The static grid bound u_max is ~2x the actual unit count at typical
    # operating points (it assumes every chunk spans max_blocks); parked
    # units (vcount == 0) share their neighbours' block indices so they cost
    # no DMA, but without this gate they still ran the full VPU epilogue —
    # measured as ~half the probe's epilogue work at nprobe=256/10M.
    @pl.when(vcount > 0)
    def _body():
        xb = xb_ref[:]
        if int8_dot:
            dot = jnp.dot(xq_ref[:], xb.T, preferred_element_type=jnp.int32)
        else:
            xbc = xb.astype(xq_ref.dtype) if xb.dtype != xq_ref.dtype else xb
            # f32 inputs need HIGHEST or the MXU silently rounds through bf16
            # (wrong l2 distances); bf16 inputs take the fast path.
            prec = jax.lax.Precision.HIGHEST if xq_ref.dtype == jnp.float32 else None
            dot = jnp.dot(xq_ref[:], xbc.T, preferred_element_type=jnp.float32, precision=prec)

        def get_raw_slice(j):
            sl = dot[:, j * nbk : (j + 1) * nbk].astype(jnp.float32)
            if sc_ref is not None:
                sl = sl * sc_ref[0, j][None, :]
            if nm_ref is not None:
                sl = 2.0 * sl - nm_ref[0, j][None, :]
            return sl

        def get_slice(j):
            return jnp.where(_slice_mask(j, vcount, nbk), get_raw_slice(j), MASK_SCORE)

        if packed:
            _bucket_pack_accum(
                get_raw_slice, (vfw >> (vbits + 1)) * bl, vcount, first, out_ref, nbk, bucket
            )
        elif FOLD == "top1":
            _bucket_top1_accum(get_slice, base, first, out_s_ref, out_i_ref, nbk, bucket)
        else:
            _bucket_top2_accum(get_slice, base, first, out_s_ref, out_i_ref, nbk, bucket)


@functools.partial(
    jax.jit,
    static_argnames=("k", "nprobe", "max_blocks", "metric", "interpret", "int8_queries", "return_rows", "packed_ok", "bl", "spilled"),
)
def _grouped_probe_pallas(
    centroids: jnp.ndarray,
    xb_sorted: jnp.ndarray,
    row_ids: jnp.ndarray,
    list_start: jnp.ndarray,
    list_size: jnp.ndarray,
    xq: jnp.ndarray,
    row_scales: jnp.ndarray | None,
    norms_sq: jnp.ndarray | None,
    k: int,
    nprobe: int,
    max_blocks: int,
    metric: str,
    interpret: bool,
    int8_queries: bool,
    owned: jnp.ndarray | None = None,
    probe_lists: jnp.ndarray | None = None,
    probe_bias: jnp.ndarray | None = None,
    return_rows: bool = False,
    packed_ok: bool = False,
    bl: int = 512,
    spilled: bool = True,
):
    b, d = xq.shape
    nlist = list_start.shape[0]
    p = b * nprobe
    # Per-call block geometry: nbk (candidate lanes) is block-size-invariant
    # (512 // BUCKET), the bucket loop covers the whole block.
    nbk = 512 // BUCKET
    bucket = bl // nbk
    vbits = bl.bit_length()
    is_int8 = xb_sorted.dtype == jnp.int8
    is_l2 = metric == "l2"
    # Mixed precision is the default for int8 storage: the db stays int8 in
    # HBM (the bandwidth win) but queries ride in bf16, so quantization noise
    # enters from one side only — measured worth ~1-2 recall points.  Full
    # int8 x int8 (int8_queries=True) trades those points for int8-MXU rate;
    # l2 always keeps queries bf16 (the query scale is not rank-neutral
    # under the norm subtraction).
    int8_dot = is_int8 and int8_queries and not is_l2

    # Coarse ranking always uses the float queries; under shard_map the
    # caller passes the (replicated) ranking in so it is computed once.
    if probe_lists is None:
        approx = COARSE_APPROX and metric != "l2" and centroids.shape[0] >= 4 * nprobe
        _, probe_lists = flat_search(
            centroids, xq, nprobe, metric=metric, approx=approx, recall_target=0.99
        )
    # Sharded probes own a subset of lists: zeroing the others' sizes makes
    # their pairs produce no work units, so non-owned candidates never exist.
    if owned is not None:
        list_size = jnp.where(owned, list_size, 0)

    if _DEBUG_STAGE == 4:  # coarse centroid ranking only
        return _dbg_out(b, k, return_rows, jnp.sum(probe_lists[0, :1]).astype(jnp.float32))

    if int8_dot:
        from lotus_tpu.ops.quant import quantize_rows

        xq_store, q_scales = quantize_rows(xq)  # int8 queries + per-query scale
    elif is_int8 or xb_sorted.dtype == jnp.bfloat16:
        xq_store, q_scales = xq.astype(jnp.bfloat16), None
    else:
        xq_store, q_scales = xq, None

    # ---- pair grouping WITHOUT a sort --------------------------------------
    # A pair is (query q, probed list l); the kernel wants pairs grouped by
    # list in query-ascending order.  The original implementation stable-
    # argsorted the P = b*nprobe list ids — measured ~40% of the whole probe
    # at the 10M operating point (sorts are the slowest XLA op family on
    # TPU).  But probe_lists rows are DISTINCT per query (top-nprobe of the
    # coarse ranking), so each (q, l) occurs at most once and a pair's rank
    # within its list group is simply "how many earlier queries probed l" —
    # an exclusive cumsum over the (b, nlist) 0/1 probe histogram.  This
    # also lets every downstream pool stay in ORIGINAL pair order: no
    # order/inv_order permutations at all.
    l_flat = probe_lists.reshape(-1)
    q_ids = jnp.repeat(jnp.arange(b, dtype=jnp.int32), nprobe)
    if b * nlist <= (1 << 26):  # histogram scratch <= 256 MB
        hist = jnp.zeros((b, nlist), jnp.int32)
        hist = hist.at[q_ids, l_flat].set(1, mode="drop", unique_indices=True)
        if CUMSUM_MATMUL:
            histf = hist.astype(jnp.float32)
            counts = jnp.sum(hist, axis=0)
            # Exclusive prefix as one MXU matmul (see flag comment above).
            # Default (bf16-input) precision is EXACT here: 0/1 inputs are
            # bf16-representable and the MXU accumulates in f32.
            tril = jnp.tril(jnp.ones((b, b), jnp.float32), -1)
            excl = jax.lax.dot(tril, histf)
            rank = excl[q_ids, l_flat].astype(jnp.int32)
        else:
            cum = jnp.cumsum(hist, axis=0)
            counts = cum[-1]
            rank = (cum - hist)[q_ids, l_flat]      # (P,) rank within list
    else:  # huge-nlist fallback: group by one stable sort
        order = jnp.argsort(l_flat, stable=True)
        sl = l_flat[order]
        counts = jax.ops.segment_sum(jnp.ones((p,), jnp.int32), sl, num_segments=nlist)
        pair_start = jnp.concatenate([jnp.zeros(1, jnp.int32), jnp.cumsum(counts)[:-1]])
        rank_sorted = jnp.arange(p, dtype=jnp.int32) - pair_start[sl]
        rank = jnp.zeros((p,), jnp.int32).at[order].set(rank_sorted, unique_indices=True)
    if _DEBUG_STAGE == 5:  # + pair grouping (hist/cumsum/rank)
        return _dbg_out(b, k, return_rows, (rank[0] + counts[0]).astype(jnp.float32))
    chunks = -(-counts // QU)                      # query chunks per list
    chunk_cum = jnp.cumsum(chunks)                 # inclusive
    n_chunks_max = p // QU + nlist                 # static bound
    blocks = jnp.where(counts > 0, -(-list_size // bl), 0)  # probed lists only
    upl = chunks * blocks                          # units per list
    unit_cum = jnp.cumsum(upl)                     # inclusive
    total_units = unit_cum[-1]
    # Static grid bound: sum_l ceil(counts_l/QU)*blocks_l
    #   <= max_blocks * (P // QU)            (the counts_l // QU part)
    #    + rows // BL                        (the +1-per-probed-list part:
    #                                         every list's blocks exist in
    #                                         the block-aligned storage)
    # and ALSO <= P * max_blocks (ceil(c/QU) <= c for c >= 1), which is far
    # tighter at small batch: without it a B=1 probe of a 10M store parks
    # ~rows/BL grid steps, paying grid overhead for no work.
    u_max = min(
        max_blocks * (p // QU) + xb_sorted.shape[0] // bl,
        p * max_blocks,
    )

    # ---- per-chunk padded query layout ------------------------------------
    # chunk c of list l sits at global chunk id (chunk_cum[l-1] + c); its QU
    # lanes hold the list's pairs in rank order, dummy b elsewhere.
    chunk_base = jnp.concatenate([jnp.zeros(1, jnp.int32), chunk_cum[:-1]])
    padpos = (chunk_base[l_flat] + rank // QU) * QU + rank % QU    # (P,)
    sq_full = jnp.full((n_chunks_max * QU,), b, jnp.int32).at[padpos].set(
        q_ids, mode="drop", unique_indices=True
    )
    xq_pad = jnp.concatenate([xq_store, jnp.zeros((1, d), xq_store.dtype)])
    xq_units = xq_pad[sq_full]                                  # (chunks*QU, d)

    if _DEBUG_STAGE == 6:  # + padded query layout gather
        return _dbg_out(b, k, return_rows, xq_units.reshape(-1)[0].astype(jnp.float32))

    # ---- per-unit scalar tables --------------------------------------------
    # Unit order within a list is chunk-major, block-minor: consecutive units
    # walk one chunk's blocks back-to-back, which is what lets the kernel
    # fold its per-bucket top-2 across blocks in the resident output block.
    u_ids = jnp.arange(u_max, dtype=jnp.int32)
    lid = jnp.searchsorted(unit_cum, u_ids, side="right").astype(jnp.int32)
    lid = jnp.minimum(lid, nlist - 1)
    prev_units = jnp.where(lid > 0, unit_cum[lid - 1], 0)
    within = u_ids - prev_units
    blk_l = jnp.maximum(blocks[lid], 1)
    chunk_idx = within // blk_l
    block_idx = within % blk_l
    valid_u = u_ids < total_units

    qtab = jnp.where(valid_u, chunk_base[lid] + chunk_idx, n_chunks_max)  # query-tile index
    btab = jnp.where(valid_u, list_start[lid] // bl + block_idx, xb_sorted.shape[0] // bl - 1)
    vtab = jnp.where(valid_u, jnp.clip(list_size[lid] - block_idx * bl, 0, bl), 0)
    ftab = jnp.where(valid_u, (block_idx == 0).astype(jnp.int32), 1)  # chunk-start flag
    wtab = jnp.where(valid_u, block_idx, 0)  # block-in-list (packed-id base)
    # One packed scalar table (see _probe_kernel): valid count (vbits bits,
    # 0..bl inclusive), chunk-start flag (bit vbits), block-in-list above.
    # Layout is derived from bl so a block-size retune cannot collide fields.
    vfw = vtab | (ftab << vbits) | (wtab << (vbits + 1))

    # Pad query tiles with one dummy tile for parked units.
    xq_units = jnp.concatenate([xq_units, jnp.zeros((QU, d), xq_store.dtype)])
    xb_blocks = xb_sorted  # (rows, d), rows % bl == 0 (+ window padding)

    # Survivors per bucket x buckets (FOLD-many per bucket, packed or not).
    # Packing truncates 13 mantissa bits of every score, so it is only used
    # when the caller exactly re-ranks the candidates afterwards
    # (packed_ok); windows beyond the LOCAL_BITS id range (8192 rows) fall
    # back to the unpacked fold instead of failing.
    packed = PACKED and packed_ok and max_blocks * bl <= (1 << LOCAL_BITS)
    ncand = (1 if FOLD == "top1" else 2) * nbk
    in_specs = [
        pl.BlockSpec((QU, d), lambda u, qt, bt, vfw: (qt[u], 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((bl, d), lambda u, qt, bt, vfw: (bt[u], 0), memory_space=pltpu.VMEM),
    ]
    operands = [xq_units, xb_blocks]  # xq_store dtype already matches the kernel variant
    # (nblocks, BUCKET, nbk): full trailing dims per block (tile-legal).
    per_row_spec = pl.BlockSpec(
        (1, bucket, nbk), lambda u, qt, bt, vfw: (bt[u], 0, 0), memory_space=pltpu.VMEM
    )
    if is_int8:
        in_specs.append(per_row_spec)
        operands.append(row_scales.reshape(-1, bucket, nbk))
    if is_l2:
        in_specs.append(per_row_spec)
        operands.append(norms_sq.reshape(-1, bucket, nbk))
    kernel = functools.partial(
        _probe_kernel, int8_dot=int8_dot, dequant=is_int8, l2=is_l2, packed=packed,
        bl=bl, bucket=bucket,
    )
    # Output is indexed by CHUNK, not unit: consecutive units of one chunk
    # revisit the same output block (kept in VMEM, flushed once per chunk).
    # Row n_chunks_max is the parking row for padded units.
    out_spec = pl.BlockSpec(
        (1, QU, ncand), lambda u, qt, bt, vfw: (qt[u], 0, 0), memory_space=pltpu.VMEM
    )
    out_shape = jax.ShapeDtypeStruct((n_chunks_max + 1, QU, ncand), jnp.float32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(u_max,),
        in_specs=in_specs,
        out_specs=out_spec if packed else (out_spec, out_spec),
    )
    cost = pl.CostEstimate(
        flops=2 * u_max * QU * bl * d,
        bytes_accessed=u_max * (QU * d * 4 + bl * d * 2)
        + n_chunks_max * (1 if packed else 2) * ncand * QU * 4,
        transcendentals=0,
    )
    if _DEBUG_STAGE == 3:  # tables + query layout only: skip kernel AND reassembly
        anchor = xq_units.reshape(-1)[0].astype(jnp.float32) + (qtab[0] + btab[0] + vfw[0])
        top_s = jnp.full((b, k), MASK_SCORE, jnp.float32) + anchor
        top_i = jnp.full((b, k), NO_HIT, jnp.int32)
        if return_rows:
            return top_s, top_i, jnp.zeros((b, k), jnp.int32)
        return top_s, top_i
    if _DEBUG_STAGE == 1:  # XLA side only: zero kernel output, same shapes
        anchor = xq_units.reshape(-1)[0].astype(jnp.float32) + qtab[0] + btab[0] + vfw[0]
        cand_pk = jnp.zeros(out_shape.shape, out_shape.dtype) + anchor
        cand_s, cand_i = cand_pk, jnp.zeros(out_shape.shape, jnp.int32)
    elif packed:
        cand_pk = pl.pallas_call(
            kernel, grid_spec=grid_spec, out_shape=out_shape,
            cost_estimate=cost, interpret=interpret,
        )(qtab, btab, vfw, *operands)
    else:
        cand_s, cand_i = pl.pallas_call(
            kernel, grid_spec=grid_spec,
            out_shape=(out_shape, jax.ShapeDtypeStruct((n_chunks_max + 1, QU, ncand), jnp.int32)),
            cost_estimate=cost, interpret=interpret,
        )(qtab, btab, vfw, *operands)
    if _DEBUG_STAGE == 2:  # stop after the kernel: dummies with a data anchor
        anchor = (cand_pk if packed or _DEBUG_STAGE == 1 else cand_s).reshape(-1)[0]
        top_s = jnp.full((b, k), MASK_SCORE, jnp.float32) + anchor
        top_i = jnp.full((b, k), NO_HIT, jnp.int32)
        if return_rows:
            return top_s, top_i, jnp.zeros((b, k), jnp.int32)
        return top_s, top_i

    # ---- reassemble per pair ----------------------------------------------
    # Pair p's candidates live at flattened row padpos[p] of the kernel
    # output (chunk * QU + lane) — one (P, ncand)-row gather.  padpos is
    # indexed by ORIGINAL pair order (the sort-free grouping above), so the
    # gather lands directly in (query, probe slot) layout — no inverse
    # permutation pass.  A pair whose list produced no units (probed but
    # empty) reads an unwritten chunk row: mask by blocks-of-list > 0.
    kc = ncand
    empty = (blocks[l_flat] > 0)[:, None]
    pool_head = min((2 * k if spilled else k), nprobe * kc)
    if packed:
        # One packed pool: scores carry their window-local row id in the low
        # mantissa bits; storage rows recover as list_start[probed list] +
        # local (clamped — masked lanes decode garbage ids but their scores
        # stay MASK_SCORE and die at the top-k).
        flat = cand_pk.reshape((n_chunks_max + 1) * QU, ncand)
        pr = POOL_PREREDUCE
        if pr and pool_head <= pr < kc:
            # Keep each pair's top-pr before the gather: one pair can put at
            # most pool_head rows into the final per-query head, so this is
            # exact for the final ranking (selection already operates on the
            # id-packed truncated scores, same as the big pool top-k below).
            # (A strided max-pool variant was also measured — QPS-wash like
            # these, plus a recall cliff at some widths — and removed;
            # tools_dev/exp_probe_r5b.py records the numbers.)
            if POOL_PREREDUCE_MODE == "approx":
                flat = jax.lax.approx_max_k(flat, pr)[0]
            else:
                flat = jax.lax.top_k(flat, pr)[0]
            kc = pr
        pool = jnp.where(empty, flat[padpos], MASK_SCORE)
        packed3 = pool.reshape(b, nprobe, kc)
        bits = jax.lax.bitcast_convert_type(packed3, jnp.int32)
        starts = jnp.take(list_start, probe_lists, axis=0)  # (b, nprobe)
        cand_i = jnp.minimum(
            starts[:, :, None] + (bits & _LOCAL_MASK), xb_sorted.shape[0] - 1
        )
        cand_s = jax.lax.bitcast_convert_type(bits & ~_LOCAL_MASK, jnp.float32)
    else:
        flat_s = cand_s.reshape((n_chunks_max + 1) * QU, ncand)
        flat_i = cand_i.reshape((n_chunks_max + 1) * QU, ncand)
        cand_s = jnp.where(empty, flat_s[padpos], MASK_SCORE).reshape(b, nprobe, kc)
        cand_i = flat_i[padpos].reshape(b, nprobe, kc)
    if probe_bias is not None:
        # Residual encoding: the stored vectors are (x - centroid), so every
        # candidate of probe slot s owes the exact coarse term q.c held in
        # probe_bias[:, s].  The bias breaks the "q-scale is rank-neutral"
        # trick, so int8 queries are dequantized here instead of after top-k.
        masked = cand_s <= MASK_SCORE / 2
        if q_scales is not None:
            cand_s = cand_s * q_scales[:, None, None]
        cand_s = jnp.where(masked, MASK_SCORE, cand_s + probe_bias[:, :, None])
    cand_s = cand_s.reshape(b, nprobe * kc)
    cand_i = cand_i.reshape(b, nprobe * kc)

    # Spilled (SOAR-style replicated) rows can reach the pool through two
    # probed lists, so those stores take 2k head-room and collapse duplicate
    # ids to their best copy.  Unspilled stores (the default build) hold
    # each row in exactly ONE list and every (query, list) pair occurs once,
    # so pool ids are unique by construction: the pool top-k IS the final
    # ranking and the dedup pass (a per-row argsort) is skipped entirely.
    k_out = min(2 * k if spilled else k, nprobe * kc)
    if APPROX_TOPK and nprobe * kc >= 4 * k_out:
        # Candidate SELECTION over the (b, nprobe*ncand) pool rides the
        # hardware PartialReduce (the sort-based exact top_k was ~20% of the
        # whole batch at k_out=64); the loss is bounded by recall_target and
        # the survivors are exactly re-ranked downstream when rescoring.
        top_s, pos = jax.lax.approx_max_k(cand_s, k_out, recall_target=0.99)
    else:
        top_s, pos = jax.lax.top_k(cand_s, k_out)
    top_rows = jnp.take_along_axis(cand_i, pos, axis=1)
    top_i = row_ids[top_rows]
    top_i = jnp.where(top_s <= MASK_SCORE / 2, NO_HIT, top_i)

    if not spilled:
        if k_out < k:  # pool smaller than k: pad, preserving the sorted head
            pad = k - k_out
            top_s = jnp.concatenate([top_s, jnp.full((b, pad), MASK_SCORE, top_s.dtype)], axis=1)
            top_i = jnp.concatenate([top_i, jnp.full((b, pad), NO_HIT, top_i.dtype)], axis=1)
            top_rows = jnp.concatenate([top_rows, jnp.zeros((b, pad), top_rows.dtype)], axis=1)
        rows_out = top_rows
    elif return_rows:
        # Storage positions ride along for shard-local exact rescoring
        # (the caller gathers vectors directly, no inverse permutation).
        top_s, top_i, rows_out = dedup_topk(top_s, top_i, k, aux=top_rows)
    else:
        top_s, top_i = dedup_topk(top_s, top_i, k)
    if q_scales is not None and probe_bias is None:
        # Per-query dequantization constant; rank-neutral, so applied last.
        top_s = jnp.where(top_i == NO_HIT, top_s, top_s * q_scales[:, None])
    if return_rows:
        return top_s, top_i, rows_out
    return top_s, top_i


def ivf_search_pallas(
    state: dict[str, Any],
    xq: jnp.ndarray,
    k: int,
    *,
    nprobe: int,
    metric: str = "ip",
    interpret: bool = False,
    int8_queries: bool = False,
    query_chunk: int | None = None,
    rescore: int | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Grouped IVF probe via the Pallas block-DMA kernel (ip/cosine/l2).

    Requires a block-aligned index (``build_ivf(..., block_align=...)`` with
    a multiple of 512; the kernel adapts to the store's own alignment, so
    512-aligned and 1024-aligned stores both probe natively).

    Stores with ``meta["encoding"] == "residual_int8"`` hold int8 residuals
    (x - assigned centroid); the exact f32 coarse term q.c from the ranking
    pass is added back per probe slot, shrinking quantization noise by the
    residual-to-vector magnitude ratio (ip/cosine only).

    ``query_chunk`` bounds the candidate-pool memory (which grows with
    b * nprobe) by probing the batch in slices.  The kernel folds its
    per-bucket top-2 across every block of a probed list, so chunks can be
    large: full MXU lane occupancy needs ~QU * nlist / nprobe queries per
    chunk (at B=4096/nprobe=256/nlist=4096 that is 2048 — 8x the lane
    occupancy of a 256-query chunk, which was the round-2 bottleneck).

    ``rescore`` widens the probe to that many candidates and exactly
    re-ranks them with f32 queries over reconstructed rows (int8 plus the
    packed-int4 refinement when the store carries one) — removing the
    quantization rank flips at the top-k boundary.
    """
    meta = state["meta"]
    bl = int(meta.get("block_align", 0))
    if bl < 512 or bl % (512 // BUCKET) != 0:
        raise ValueError(
            f"index must be built with block_align >= 512 (a multiple of {512 // BUCKET}) "
            f"for the Pallas probe; got {bl}"
        )
    nlist = int(meta["nlist"])
    window = int(meta["probe_window"])
    nprobe = max(1, min(nprobe, nlist))
    max_blocks = max(1, window // bl)
    residual = meta.get("encoding") == "residual_int8" and state["ivf_vectors"].dtype == jnp.int8
    if residual and metric == "l2":
        raise ValueError("residual_int8 stores support ip/cosine only")

    squeeze = xq.ndim == 1
    if squeeze:
        xq = xq[None, :]
    xq = xq.astype(jnp.float32)

    if query_chunk is not None and xq.shape[0] > query_chunk:
        parts = [
            ivf_search_pallas(
                state, xq[lo : lo + query_chunk], k, nprobe=nprobe, metric=metric,
                interpret=interpret, int8_queries=int8_queries, rescore=rescore,
            )
            for lo in range(0, xq.shape[0], query_chunk)
        ]
        return jnp.concatenate([p[0] for p in parts]), jnp.concatenate([p[1] for p in parts])

    # Block-aligned builds store whole blocks plus a whole-block window pad,
    # so this never copies; anything else would re-pad the DB every call.
    vecs = state["ivf_vectors"]
    if vecs.shape[0] % bl != 0:
        raise ValueError(f"block-aligned IVF storage expected (rows % {bl} != 0)")
    if metric == "l2" and "ivf_norms_sq" not in state:
        # Float stores don't persist norms; compute once and cache.
        state["ivf_norms_sq"] = jnp.sum(jnp.square(vecs.astype(jnp.float32)), axis=-1)
    probe_lists = probe_bias = None
    if residual:
        approx = COARSE_APPROX and state["centroids"].shape[0] >= 4 * nprobe
        coarse_sim, probe_lists = flat_search(
            state["centroids"], xq, nprobe, metric=metric, approx=approx, recall_target=0.99
        )
        probe_bias = coarse_sim  # ip/cosine: distances ARE similarities
    do_rescore = rescore is not None and metric != "l2"
    k_probe = max(k, rescore) if do_rescore else k
    scores, idx = _grouped_probe_pallas(
        state["centroids"],
        vecs,
        state["ivf_row_ids"],
        state["ivf_list_start"],
        state["ivf_list_size"],
        xq,
        state.get("ivf_row_scales"),
        state.get("ivf_norms_sq") if metric == "l2" else None,
        k_probe,
        nprobe,
        max_blocks,
        metric,
        interpret,
        int8_queries,
        probe_lists=probe_lists,
        probe_bias=probe_bias,
        packed_ok=do_rescore,
        bl=bl,
        spilled=float(meta.get("spill_frac", 0.0) or 0.0) > 0.0,
    )
    if do_rescore:
        from lotus_tpu.ops.ivf import rescore_candidates

        scores, idx = rescore_candidates(state, xq, idx, k)
    dists = as_distance(scores, metric)
    if metric == "l2":
        q_norms = jnp.sum(jnp.square(xq), axis=-1, keepdims=True)
        dists = jnp.where(idx == NO_HIT, jnp.finfo(jnp.float32).max, dists + q_norms)
    if squeeze:
        return dists[0], idx[0]
    return dists, idx
