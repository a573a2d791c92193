"""IVF-Flat index: k-means coarse quantizer + inverted lists in sorted
(CSR-style) storage, probed with static-shape gather kernels.

Replaces faiss IVF-Flat (BASELINE.md config 4).  Layout: vectors are sorted
by list id into one contiguous array; each list is a (start, size) window.
The probe kernel gathers a fixed-width window per (query, probe) — the
width is the max list size, static at build time — masks the tail, scores
with one batched matmul, and top-k's the candidate pool.  All shapes are
static so the whole search jits to a single XLA program.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from lotus_tpu.ops import io as index_io
from lotus_tpu.ops.common import MASK_SCORE, NO_HIT, as_distance, dedup_topk, round_up
from lotus_tpu.ops.flat import flat_search
from lotus_tpu.ops.kmeans import kmeans_fit

# Max points used to train the coarse quantizer (faiss-style subsampling:
# ~256 samples per centroid).
TRAIN_POINTS_PER_CENTROID = 256


def plan_block_aligned_layout(
    assign: np.ndarray, nlist: int, block_align: int, row_of_entry: np.ndarray | None = None
) -> dict[str, Any]:
    """Plan the block-aligned CSR layout from a list assignment (host-side).

    Every list starts at a multiple of ``block_align`` rows and occupies
    whole blocks; tail rows of each list's last block are padding (row id
    ``NO_HIT``).  Returns the geometry plus the scatter mapping:
    ``order`` (entries in assignment-sorted order) and ``dest`` (the storage
    position of each of those entries), so callers can place vector data
    with ``storage[dest] = vectors[order]`` — on host or on device.

    ``row_of_entry`` maps each assignment ENTRY to its logical row id,
    allowing one row to be stored in several lists (spilled/SOAR-style
    replicated assignment); by default entry i IS row i.
    """
    n = assign.shape[0]
    order = np.argsort(assign, kind="stable")
    list_size = np.bincount(assign, minlength=nlist).astype(np.int32)
    max_list = int(list_size.max()) if nlist > 0 else 0

    padded_size = np.maximum(((list_size + block_align - 1) // block_align) * block_align, block_align)
    list_start = np.zeros(nlist, np.int32)
    list_start[1:] = np.cumsum(padded_size)[:-1]
    total = int(padded_size.sum())

    csum = np.zeros(nlist + 1, np.int64)
    csum[1:] = np.cumsum(list_size)
    rank_in_list = np.arange(n, dtype=np.int64) - csum[assign[order]]
    dest = list_start.astype(np.int64)[assign[order]] + rank_in_list

    row_ids = np.full(total, NO_HIT, np.int32)
    row_ids[dest] = order if row_of_entry is None else row_of_entry[order]
    window = max(block_align, int(((max_list + block_align - 1) // block_align) * block_align))
    return {
        "order": order,
        "dest": dest,
        "row_ids": row_ids,
        "list_start": list_start,
        "list_size": list_size,
        "max_list": max_list,
        "window": window,
        "total": total,
    }


def build_ivf(
    index_dir: str,
    emb: np.ndarray,
    *,
    nlist: int,
    metric: str,
    train_iters: int = 10,
    seed: int = 0,
    block_align: int | None = None,
    spill_frac: float = 0.0,
) -> dict[str, Any]:
    """Train the coarse quantizer, assign, sort, persist. Returns meta patch.

    With ``block_align`` set (e.g. 512), every list starts at a multiple of
    that many rows and occupies whole blocks (zero rows / -1 ids pad each
    list's tail) — the layout the Pallas grouped-probe kernel needs for
    block-granularity DMA.

    ``spill_frac`` > 0 stores that fraction of rows (those with the
    smallest top-2 centroid score margin — the cell-boundary rows that
    dominate IVF recall loss) in BOTH their nearest lists; the probes
    dedup by row id.  Requires ``block_align``.
    """
    n, d = emb.shape
    nlist = min(nlist, n)

    # Subsample for training on the HOST, then ship only the sample: the
    # full array may exceed HBM (10M x 768 f32 = 30 GB vs 16 GB on a v5e).
    max_train = TRAIN_POINTS_PER_CENTROID * nlist
    if n > max_train:
        sel = np.random.default_rng(seed).choice(n, size=max_train, replace=False)
        sel.sort()
        train_x = jnp.asarray(emb[sel])
    else:
        train_x = jnp.asarray(emb)

    res = kmeans_fit(
        train_x,
        nlist,
        iters=train_iters,
        metric="l2",
        spherical=(metric != "l2"),
        key=jax.random.PRNGKey(seed),
    )
    centroids = np.asarray(res.centroids, dtype=np.float32)
    del train_x

    if spill_frac > 0 and not block_align:
        raise ValueError("spill_frac requires a block-aligned build")

    # Assign by the index metric so probe-time coarse ranking is consistent.
    # Chunked host->device streaming keeps peak HBM at one chunk + centroids.
    from lotus_tpu.ops.common import fetch_int32
    from lotus_tpu.ops.kmeans import kmeans_assign, kmeans_assign_top2

    cent_dev = jnp.asarray(centroids)
    assign = np.empty(n, np.int32)
    assign2 = np.empty(n, np.int32) if spill_frac > 0 else None
    margins = np.empty(n, np.float32) if spill_frac > 0 else None
    chunk_rows = max(1, (1 << 31) // max(d * 4, 1))  # ~2 GB of f32 rows per pass
    for s in range(0, n, chunk_rows):
        x_dev = jnp.asarray(emb[s : s + chunk_rows])
        if spill_frac > 0:
            a1, a2, mg = kmeans_assign_top2(x_dev, cent_dev, metric=metric)
            assign[s : s + chunk_rows] = fetch_int32(a1)
            assign2[s : s + chunk_rows] = fetch_int32(a2)
            margins[s : s + chunk_rows] = np.asarray(mg)
        else:
            a, _ = kmeans_assign(x_dev, cent_dev, metric=metric)
            assign[s : s + chunk_rows] = fetch_int32(a)
    del cent_dev

    if block_align:
        if spill_frac > 0:
            tau = float(np.quantile(margins, spill_frac))
            spill_rows = np.where(margins <= tau)[0]
            entry_assign = np.concatenate([assign, assign2[spill_rows]])
            row_of_entry = np.concatenate([np.arange(n, dtype=np.int64), spill_rows]).astype(np.int32)
        else:
            entry_assign, row_of_entry = assign, None
        plan = plan_block_aligned_layout(entry_assign, nlist, block_align, row_of_entry)
        list_start, list_size = plan["list_start"], plan["list_size"]
        row_ids, window = plan["row_ids"], plan["window"]
        order, dest = plan["order"], plan["dest"]
        src_rows = order if row_of_entry is None else row_of_entry[order]
        sorted_vecs = np.zeros((plan["total"], d), np.float32)
        # Vectorized scatter: entry e (in assignment-sorted order) lands at
        # its list's start plus its rank within the list; chunked so the
        # 10M x 768 case streams instead of materializing a second copy.
        chunk = max(1, (1 << 28) // max(d * 4, 1))  # ~256 MB of rows per pass
        for s in range(0, len(src_rows), chunk):
            sorted_vecs[dest[s : s + chunk]] = emb[src_rows[s : s + chunk]]
        max_list = plan["max_list"]
    else:
        order = np.argsort(assign, kind="stable")
        list_size = np.bincount(assign, minlength=nlist).astype(np.int32)
        max_list = int(list_size.max()) if nlist > 0 else 0
        sorted_vecs = emb[order]
        row_ids = order.astype(np.int32)
        list_start = np.zeros(nlist, np.int32)
        list_start[1:] = np.cumsum(list_size)[:-1]
        window = max(1, round_up(max_list, 8))

    # Pad storage so start + window never reads out of bounds.
    pad = window
    sorted_vecs = np.concatenate([sorted_vecs, np.zeros((pad, d), np.float32)])
    row_ids = np.concatenate([row_ids, np.full(pad, NO_HIT, np.int32)])

    index_io.write_array(index_dir, "ivf_centroids", centroids)
    index_io.write_array(index_dir, "ivf_vectors", np.asarray(sorted_vecs, dtype=np.float32))
    index_io.write_array(index_dir, "ivf_row_ids", row_ids)
    index_io.write_array(index_dir, "ivf_list_start", list_start)
    index_io.write_array(index_dir, "ivf_list_size", list_size)
    return {
        "nlist": int(nlist),
        "max_list_size": max_list,
        "probe_window": int(window),
        "block_align": int(block_align) if block_align else 0,
        "spill_frac": float(spill_frac),
    }


def centroid_of_position(list_start: np.ndarray, total_rows: int) -> np.ndarray:
    """List id of every storage position (CSR lists are start-sorted)."""
    pos = np.arange(total_rows, dtype=np.int64)
    return (np.searchsorted(list_start, pos, side="right") - 1).clip(0).astype(np.int32)


def ensure_inv_perm(state: dict[str, Any]) -> jnp.ndarray:
    """original-row-id -> one storage position (cached in the state)."""
    if "ivf_inv_perm" not in state:
        storage_ids = np.asarray(state["ivf_row_ids"])
        live = storage_ids >= 0
        n_rows = int(storage_ids[live].max()) + 1 if live.any() else 0
        inv = np.zeros(max(n_rows, 1), np.int32)
        inv[storage_ids[live]] = np.nonzero(live)[0].astype(np.int32)
        state["ivf_inv_perm"] = jnp.asarray(inv)
    return state["ivf_inv_perm"]


def ensure_pos_list(state: dict[str, Any]) -> jnp.ndarray:
    """storage position -> owning list id (cached in the state)."""
    if "ivf_pos_list" not in state:
        starts = np.asarray(state["ivf_list_start"])
        state["ivf_pos_list"] = jnp.asarray(
            centroid_of_position(starts, int(state["ivf_vectors"].shape[0]))
        )
    return state["ivf_pos_list"]


@functools.partial(jax.jit, static_argnames=("k", "residual"))
def _rescore_impl(
    xq: jnp.ndarray,
    cand_i: jnp.ndarray,
    cand_rows: jnp.ndarray,
    vecs: jnp.ndarray,
    scales: jnp.ndarray,
    refine: jnp.ndarray | None,
    refine_scales: jnp.ndarray | None,
    pos_list: jnp.ndarray | None,
    centroids: jnp.ndarray | None,
    k: int,
    residual: bool,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Exact f32 rescoring of a small candidate set (ip/cosine).

    Reconstructs each candidate from its int8 (+optional packed-int4
    refinement) storage and rescans with full-precision queries, then
    re-ranks.  Kills the quantization rank flips that cap recall@k when
    rank-boundary score gaps approach the int8 noise (measured: 10M x 768
    residual-int8 plateaus at 0.965 recall@10 while 0.992 of true top-10
    sit within the probe's top-20).
    """
    v = vecs[cand_rows].astype(jnp.float32)
    if scales is not None:  # float stores rescore without dequantization
        v = v * scales[cand_rows][..., None]
    if refine is not None:
        from lotus_tpu.ops.quant import unpack_int4

        # Refinement is keyed by ORIGINAL row id (one entry per logical row,
        # no duplication for spilled copies); it refines the PRIMARY copy's
        # residual, which is the copy inv_perm points at.
        rid = jnp.maximum(cand_i, 0)
        v = v + unpack_int4(refine[rid]).astype(jnp.float32) * refine_scales[rid][..., None]
    if residual:
        v = v + centroids[pos_list[cand_rows]]
    s = jnp.einsum(
        "qd,qmd->qm", xq, v, preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST
    )
    s = jnp.where(cand_i == NO_HIT, MASK_SCORE, s)
    top_s, pos = jax.lax.top_k(s, min(k, s.shape[1]))
    return top_s, jnp.take_along_axis(cand_i, pos, axis=1)


def rescore_candidates(
    state: dict[str, Any], xq: jnp.ndarray, cand_i: jnp.ndarray, k: int
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Exact-rescore probe candidates (original row ids) down to top-k."""
    residual = state["meta"].get("encoding") == "residual_int8"
    inv = ensure_inv_perm(state)
    rows = jnp.take(inv, jnp.maximum(cand_i, 0), axis=0)
    return _rescore_impl(
        xq.astype(jnp.float32), cand_i, rows,
        state["ivf_vectors"], state.get("ivf_row_scales"),
        state.get("ivf_refine"), state.get("ivf_refine_scales"),
        ensure_pos_list(state) if residual else None,
        state["centroids"] if residual else None,
        k, residual,
    )


def load_ivf_state(
    index_dir: str,
    meta: dict[str, Any],
    dtype: Any,
    refine_int4: bool | None = None,
    device: bool = True,
) -> dict[str, Any]:
    """Load (and for int8, quantize) the IVF arrays.

    ``device=False`` keeps everything in numpy — used by the shard-save
    path (``parallel.ivf.save_ivf_shards``), which re-slices the arrays
    host-side and must not bounce a 100M-row store through one chip's HBM.
    """
    wrap = jnp.asarray if device else np.asarray
    state: dict[str, Any] = {
        "centroids": wrap(index_io.read_array(index_dir, "ivf_centroids", mmap=False)),
        "ivf_row_ids": wrap(index_io.read_array(index_dir, "ivf_row_ids", mmap=False)),
        "ivf_list_start": wrap(index_io.read_array(index_dir, "ivf_list_start", mmap=False)),
        "ivf_list_size": wrap(index_io.read_array(index_dir, "ivf_list_size", mmap=False)),
    }
    vecs = index_io.read_array(index_dir, "ivf_vectors")  # f32 mmap
    if dtype == jnp.int8:
        # Per-row symmetric quantization on the host, chunked so a 10M x 768
        # store never needs a second float copy in RAM. Scores factor as
        # qscale * rowscale * int8dot; rowscale rides along in the state.
        #
        # residual_int8 (ip/cosine, opt-in via meta["encoding"]): quantize
        # (vec - list centroid) instead — the residual's smaller maxabs
        # shrinks the int8 step ~4x, and the probes add the exact f32 q.c
        # term back per probed list.
        residual = meta.get("encoding") == "residual_int8" and meta.get("metric") != "l2"
        n = vecs.shape[0]
        q = np.empty(vecs.shape, np.int8)
        scales = np.empty(n, np.float32)
        if residual:
            cents = np.asarray(index_io.read_array(index_dir, "ivf_centroids", mmap=False), np.float32)
            starts = np.asarray(index_io.read_array(index_dir, "ivf_list_start", mmap=False))
            row_ids_np = np.asarray(index_io.read_array(index_dir, "ivf_row_ids", mmap=False))
            pos_list = centroid_of_position(starts, n)
            # Residual coding only helps when rows sit close to their
            # centroid (clustered data / enough lists).  On a sample, compare
            # the residual's per-row maxabs (= the int8 step) against the raw
            # vector's; fall back to plain int8 when residuals are no
            # smaller.  The returned state carries the decision in "meta".
            live_pos = np.nonzero(row_ids_np >= 0)[0]
            sample = live_pos[:: max(1, len(live_pos) // 4096)][:4096]
            sv = np.asarray(vecs[sample], np.float32)
            raw_step = np.abs(sv).max(axis=1).mean()
            res_step = np.abs(sv - cents[pos_list[sample]]).max(axis=1).mean()
            if res_step >= raw_step * 0.9:
                residual = False
                state["meta"] = {**meta, "encoding": "int8"}
        refine = bool(refine_int4 if refine_int4 is not None else meta.get("refine_int4", False))
        refine = refine and meta.get("metric") != "l2"
        if refine:
            row_ids_all = np.asarray(index_io.read_array(index_dir, "ivf_row_ids", mmap=False))
            n_rows = int(row_ids_all.max()) + 1
            d = vecs.shape[1]
            r4 = np.zeros((n_rows, d // 2), np.int8)
            r4s = np.zeros(n_rows, np.float32)
        step = 1 << 20
        for s in range(0, n, step):
            block = np.asarray(vecs[s : s + step], dtype=np.float32)
            if residual:
                live = (row_ids_np[s : s + step] >= 0)[:, None]
                block = np.where(live, block - cents[pos_list[s : s + step]], 0.0)
            m = np.abs(block).max(axis=1)
            sc = np.where(m > 0, m / 127.0, 1.0).astype(np.float32)
            q[s : s + step] = np.clip(np.rint(block / sc[:, None]), -127, 127).astype(np.int8)
            scales[s : s + step] = sc
            if refine:
                # Packed-int4 refinement of the int8 quantization residual,
                # keyed by ORIGINAL row id (spilled copies share one entry).
                rid = row_ids_all[s : s + step]
                live_rows = rid >= 0
                r2 = block - q[s : s + step].astype(np.float32) * sc[:, None]
                m4 = np.abs(r2).max(axis=1)
                s4 = np.where(m4 > 0, m4 / 7.0, 1.0).astype(np.float32)
                q4 = np.clip(np.rint(r2 / s4[:, None]), -7, 7).astype(np.int8)
                packed = ((q4[:, 0::2] & 0xF) | ((q4[:, 1::2] & 0xF) << 4)).astype(np.int8)
                r4[rid[live_rows]] = packed[live_rows]
                r4s[rid[live_rows]] = s4[live_rows]
        state["ivf_vectors"] = wrap(q)
        state["ivf_row_scales"] = wrap(scales)
        if refine:
            state["ivf_refine"] = wrap(r4)
            state["ivf_refine_scales"] = wrap(r4s)
        if meta.get("metric") == "l2":
            norms = (q.astype(np.float32) ** 2).sum(axis=1) * scales.astype(np.float64) ** 2
            state["ivf_norms_sq"] = wrap(norms.astype(np.float32))
    else:
        if device:
            state["ivf_vectors"] = jnp.asarray(np.asarray(vecs), dtype=dtype)
        else:
            state["ivf_vectors"] = np.asarray(vecs).astype(dtype)
    return state


@functools.partial(jax.jit, static_argnames=("k", "nprobe", "window", "metric", "query_chunk", "residual"))
def _ivf_probe(
    centroids: jnp.ndarray,
    xb_sorted: jnp.ndarray,
    row_ids: jnp.ndarray,
    list_start: jnp.ndarray,
    list_size: jnp.ndarray,
    xq: jnp.ndarray,
    k: int,
    nprobe: int,
    window: int,
    metric: str,
    query_chunk: int,
    row_scales: jnp.ndarray | None = None,
    norms_sq: jnp.ndarray | None = None,
    residual: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    b, d = xq.shape
    is_int8 = xb_sorted.dtype == jnp.int8

    # Coarse ranking: nearest nprobe centroids per query.  For residual
    # stores the coarse similarities double as the exact q.c score term.
    coarse_s, probe_lists = flat_search(centroids, xq, nprobe, metric=metric)

    if metric == "l2":
        # int8 stores ship precomputed norms; float stores derive them here.
        xb_norms = norms_sq if norms_sq is not None else jnp.sum(
            jnp.square(xb_sorted.astype(jnp.float32)), axis=-1
        )
    else:
        xb_norms = None

    if is_int8 or xq.dtype == jnp.bfloat16 or xb_sorted.dtype == jnp.bfloat16:
        compute_dtype, precision = jnp.bfloat16, None
    else:
        compute_dtype, precision = jnp.float32, jax.lax.Precision.HIGHEST

    offsets = jax.lax.broadcasted_iota(jnp.int32, (window, 1), 0).squeeze(-1)

    def chunk_search(args):
        xq_c, lists_c, coarse_c = args  # (QC, d), (QC, nprobe), (QC, nprobe)
        qc = xq_c.shape[0]
        starts = list_start[lists_c]  # (QC, nprobe)
        sizes = list_size[lists_c]
        rows = starts[:, :, None] + offsets[None, None, :]  # (QC, nprobe, W)
        in_list = offsets[None, None, :] < sizes[:, :, None]
        rows_flat = rows.reshape(qc, nprobe * window)
        gathered = xb_sorted[rows_flat]  # (QC, nprobe*W, d)
        sims = jnp.einsum(
            "qd,qnd->qn",
            xq_c.astype(compute_dtype),
            gathered.astype(compute_dtype),
            preferred_element_type=jnp.float32,
            precision=precision,
        )
        if row_scales is not None:
            # Dequantize at the score level: int8 rows factor their scale out
            # of the dot product (cheaper than scaling the gathered slab).
            sims = sims * row_scales[rows_flat]
        if residual:
            # Residual store: every candidate of probe slot s owes q.c of
            # that slot's list (exact, f32, from the coarse ranking).
            sims = (sims.reshape(qc, nprobe, window) + coarse_c[:, :, None]).reshape(qc, -1)
        if metric == "l2":
            sims = 2.0 * sims - xb_norms[rows_flat]
        scores = jnp.where(in_list.reshape(qc, nprobe * window), sims, MASK_SCORE)
        # 2k head-room, then drop duplicate row ids (spilled rows can appear
        # through two probed lists) keeping each id's best-scored copy.
        kc = min(2 * k, nprobe * window)
        top_s, pos = jax.lax.top_k(scores, kc)
        top_rows = jnp.take_along_axis(rows_flat, pos, axis=1)
        top_ids = row_ids[top_rows]
        top_ids = jnp.where(top_s <= MASK_SCORE / 2, NO_HIT, top_ids)
        return dedup_topk(top_s, top_ids, k)

    if b <= query_chunk:
        return chunk_search((xq, probe_lists, coarse_s))

    # Pad queries to a chunk multiple, process with lax.map.
    b_pad = round_up(b, query_chunk)
    xq_p = jnp.pad(xq, ((0, b_pad - b), (0, 0)))
    lists_p = jnp.pad(probe_lists, ((0, b_pad - b), (0, 0)))
    coarse_p = jnp.pad(coarse_s, ((0, b_pad - b), (0, 0)))
    xq_chunks = xq_p.reshape(-1, query_chunk, d)
    list_chunks = lists_p.reshape(-1, query_chunk, nprobe)
    coarse_chunks = coarse_p.reshape(-1, query_chunk, nprobe)
    top_s, top_ids = jax.lax.map(chunk_search, (xq_chunks, list_chunks, coarse_chunks))
    return top_s.reshape(b_pad, k)[:b], top_ids.reshape(b_pad, k)[:b]


def ivf_search(
    state: dict[str, Any],
    xq: jnp.ndarray,
    k: int,
    *,
    nprobe: int,
    metric: str,
    vmem_budget_rows: int = 1 << 21,
    rescore: int | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Search the IVF index. Returns (distances, original-row indices).

    ``rescore`` widens the probe to that many candidates and exactly
    re-ranks them with f32 queries over reconstructed rows (int8 plus the
    int4 refinement when the state carries one) — see rescore_candidates.
    """
    meta = state["meta"]
    nlist = int(meta["nlist"])
    window = int(meta["probe_window"])
    nprobe = max(1, min(nprobe, nlist))
    # Residual scoring applies only when storage really is int8 residuals
    # (an f32 load of the same index stores the raw vectors).
    residual = meta.get("encoding") == "residual_int8" and state["ivf_vectors"].dtype == jnp.int8
    if residual and metric == "l2":
        raise ValueError("residual_int8 stores support ip/cosine only")

    # Chunk queries so the gathered candidate slab stays within budget.
    per_query_rows = nprobe * window
    query_chunk = max(1, min(1024, vmem_budget_rows // max(per_query_rows, 1)))

    squeeze = xq.ndim == 1
    if squeeze:
        xq = xq[None, :]
    xq = xq.astype(jnp.float32)

    do_rescore = rescore is not None and metric != "l2" and state["ivf_vectors"].dtype == jnp.int8
    k_probe = max(k, rescore) if do_rescore else k
    scores, idx = _ivf_probe(
        state["centroids"],
        state["ivf_vectors"],
        state["ivf_row_ids"],
        state["ivf_list_start"],
        state["ivf_list_size"],
        xq,
        k_probe,
        nprobe,
        window,
        metric,
        query_chunk,
        state.get("ivf_row_scales"),
        state.get("ivf_norms_sq"),
        residual=residual,
    )
    if do_rescore:
        scores, idx = rescore_candidates(state, xq, idx, k)
    dists = as_distance(scores, metric)
    if metric == "l2":
        q_norms = jnp.sum(jnp.square(xq), axis=-1, keepdims=True)
        dists = jnp.where(idx == NO_HIT, jnp.finfo(jnp.float32).max, dists + q_norms)
    if squeeze:
        return dists[0], idx[0]
    return dists, idx


# ---------------------------------------------------------------------------
# Query-grouped probe: the large-batch IVF path.
#
# The window probe above gathers O(nprobe x window) rows PER QUERY; this
# kernel inverts the loop and processes each probed list ONCE for all the
# queries that probe it, so the whole batch reads at most the database once
# while doing only sum-over-pairs FLOPs (~nprobe/nlist of an exhaustive
# scan).  Everything is static-shaped: (query, list) pairs are sorted by
# list on device, cut into work units of at most QU queries over one list,
# and a fori_loop executes one (QU x window) MXU matmul per unit, writing
# each unit's candidates into its disjoint slice of a per-pair pool.
# ---------------------------------------------------------------------------

GROUPED_QU = 128  # queries per work unit


@functools.partial(
    jax.jit, static_argnames=("k", "nprobe", "window", "metric", "qu", "u_max")
)
def _ivf_probe_grouped(
    centroids: jnp.ndarray,
    xb_sorted: jnp.ndarray,
    row_ids: jnp.ndarray,
    list_start: jnp.ndarray,
    list_size: jnp.ndarray,
    xq: jnp.ndarray,
    k: int,
    nprobe: int,
    window: int,
    metric: str,
    qu: int,
    u_max: int,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    b, d = xq.shape
    nlist = list_start.shape[0]
    p = b * nprobe

    _, probe_lists = flat_search(centroids, xq, nprobe, metric=metric)  # (B, nprobe)

    # Sorted (query, list, slot) pair table.
    q_ids = jnp.repeat(jnp.arange(b, dtype=jnp.int32), nprobe)
    slots = jnp.tile(jnp.arange(nprobe, dtype=jnp.int32), b)
    l_ids = probe_lists.reshape(-1)
    order = jnp.argsort(l_ids, stable=True)
    sq, sl, sslot = q_ids[order], l_ids[order], slots[order]

    counts = jax.ops.segment_sum(jnp.ones((p,), jnp.int32), sl, num_segments=nlist)
    pair_start = jnp.concatenate([jnp.zeros(1, jnp.int32), jnp.cumsum(counts)[:-1]])
    chunks = -(-counts // qu)  # ceil
    chunk_cum = jnp.cumsum(chunks)  # inclusive
    total_units = chunk_cum[-1]

    if metric == "l2":
        xb_norms = jnp.sum(jnp.square(xb_sorted.astype(jnp.float32)), axis=-1)
    else:
        xb_norms = None

    if xq.dtype == jnp.bfloat16 or xb_sorted.dtype == jnp.bfloat16:
        cd, prec = jnp.bfloat16, None
    else:
        cd, prec = jnp.float32, jax.lax.Precision.HIGHEST

    # Pad query table so out-of-chunk lanes index a dummy row.
    sq_pad = jnp.concatenate([sq, jnp.zeros((qu,), jnp.int32)])
    xq_pad = jnp.concatenate([xq, jnp.zeros((1, d), xq.dtype)])  # dummy query b

    kc = min(k, window)
    pool_s = jnp.full((p + qu, kc), MASK_SCORE, jnp.float32)
    pool_i = jnp.full((p + qu, kc), NO_HIT, jnp.int32)
    offsets_w = jax.lax.broadcasted_iota(jnp.int32, (window, 1), 0).squeeze(-1)
    offsets_q = jax.lax.broadcasted_iota(jnp.int32, (qu, 1), 0).squeeze(-1)

    def one_unit(u):
        """Candidates for unit u: (targets, scores, ids) each (QU, ...)."""
        valid_unit = u < total_units
        # Which list does unit u belong to, and which chunk within it?
        lid = jnp.searchsorted(chunk_cum, u, side="right").astype(jnp.int32)
        lid = jnp.minimum(lid, nlist - 1)
        prev_units = jnp.where(lid > 0, chunk_cum[lid - 1], 0)
        chunk_idx = (u - prev_units).astype(jnp.int32)

        qstart = pair_start[lid] + chunk_idx * qu
        remaining = counts[lid] - chunk_idx * qu
        in_chunk = offsets_q < remaining

        q_idx = jax.lax.dynamic_slice(sq_pad, (qstart,), (qu,))
        qvecs = xq_pad[jnp.where(in_chunk, q_idx, b)]  # (QU, d)

        lstart = list_start[lid]
        lsize = list_size[lid]
        lvecs = jax.lax.dynamic_slice(xb_sorted, (lstart, 0), (window, d))
        row_ok = offsets_w < lsize

        sims = jnp.einsum(
            "qd,wd->qw", qvecs.astype(cd), lvecs.astype(cd),
            preferred_element_type=jnp.float32, precision=prec,
        )
        if metric == "l2":
            wnorms = jax.lax.dynamic_slice(xb_norms, (lstart,), (window,))
            sims = 2.0 * sims - wnorms[None, :]
        scores = jnp.where(row_ok[None, :] & in_chunk[:, None], sims, MASK_SCORE)

        top_s, pos = jax.lax.top_k(scores, kc)
        top_rows = lstart + jnp.take_along_axis(
            jnp.broadcast_to(offsets_w[None, :], scores.shape), pos, axis=1
        )
        top_ids = row_ids[top_rows]
        top_ids = jnp.where(top_s <= MASK_SCORE / 2, NO_HIT, top_ids)

        # Each unit owns a disjoint range of sorted-pair rows; out-of-chunk
        # lanes and padded units are parked on the dummy tail.
        targets = jnp.where(valid_unit & in_chunk, qstart + offsets_q, p + offsets_q)
        return targets, top_s, top_ids

    # Process G units per loop step (vmapped): one sequential fori_loop step
    # per unit serializes on the pool scatter (~80 us/unit measured); G-wide
    # batches turn that into a handful of large matmuls + one scatter.
    G = 16
    n_steps = -(-u_max // G)

    def body(step, pools):
        pool_s, pool_i = pools
        us = step * G + jax.lax.broadcasted_iota(jnp.int32, (G, 1), 0).squeeze(-1)
        targets, top_s, top_ids = jax.vmap(one_unit)(us)
        flat_t = targets.reshape(-1)
        pool_s = pool_s.at[flat_t].set(top_s.reshape(-1, kc))
        pool_i = pool_i.at[flat_t].set(top_ids.reshape(-1, kc))
        return pool_s, pool_i

    pool_s, pool_i = jax.lax.fori_loop(0, n_steps, body, (pool_s, pool_i))
    pool_s, pool_i = pool_s[:p], pool_i[:p]

    # Route each sorted pair's candidates back to (query, probe slot).
    cand_s = jnp.full((b, nprobe, kc), MASK_SCORE, jnp.float32)
    cand_i = jnp.full((b, nprobe, kc), NO_HIT, jnp.int32)
    cand_s = cand_s.at[sq, sslot].set(pool_s)
    cand_i = cand_i.at[sq, sslot].set(pool_i)
    cand_s = cand_s.reshape(b, nprobe * kc)
    cand_i = cand_i.reshape(b, nprobe * kc)

    k_out = min(k, nprobe * kc)
    top_s, pos = jax.lax.top_k(cand_s, k_out)
    top_i = jnp.take_along_axis(cand_i, pos, axis=1)
    if k_out < k:
        padn = k - k_out
        top_s = jnp.concatenate([top_s, jnp.full((b, padn), MASK_SCORE)], axis=1)
        top_i = jnp.concatenate([top_i, jnp.full((b, padn), NO_HIT, jnp.int32)], axis=1)
    return top_s, top_i


def ivf_search_grouped(
    state: dict[str, Any],
    xq: jnp.ndarray,
    k: int,
    *,
    nprobe: int,
    metric: str,
    qu: int = GROUPED_QU,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Large-batch IVF search via the query-grouped probe."""
    meta = state["meta"]
    if state["ivf_vectors"].dtype == jnp.int8:
        raise NotImplementedError(
            "int8 storage: use the Pallas grouped probe (ops/pallas_ivf.py)"
        )
    nlist = int(meta["nlist"])
    window = int(meta["probe_window"])
    nprobe = max(1, min(nprobe, nlist))

    squeeze = xq.ndim == 1
    if squeeze:
        xq = xq[None, :]
    xq = xq.astype(jnp.float32)
    b = xq.shape[0]
    u_max = -(-b * nprobe // qu) + nlist

    scores, idx = _ivf_probe_grouped(
        state["centroids"],
        state["ivf_vectors"],
        state["ivf_row_ids"],
        state["ivf_list_start"],
        state["ivf_list_size"],
        xq, k, nprobe, window, metric, qu, u_max,
    )
    dists = as_distance(scores, metric)
    if metric == "l2":
        q_norms = jnp.sum(jnp.square(xq), axis=-1, keepdims=True)
        dists = jnp.where(idx == NO_HIT, jnp.finfo(jnp.float32).max, dists + q_norms)
    if squeeze:
        return dists[0], idx[0]
    return dists, idx
