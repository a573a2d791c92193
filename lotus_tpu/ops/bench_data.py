"""Deterministic on-device dataset generation + IVF build for benchmarks.

Why this exists: the benchmark environment reaches the TPU through a slow
network tunnel on a 1-core host, so materialising a 10M x 768 corpus on the
host (30 GB) or shipping it across the tunnel is off the table.  Instead the
corpus is defined by a PRNG seed and generated ON DEVICE in chunks; the only
arrays that ever cross the tunnel are small (queries, ground truth,
centroids, per-chunk assignments — a few MB each).  A bench run can rebuild
the exact same device-resident index from the seed in about a minute, which
also yields an honest on-device build-throughput number (BASELINE configs
3-4 "build vecs/sec").

Data model: clustered unit vectors (cluster centers scaled by
``cluster_scale`` plus unit Gaussian noise, L2-normalised) — the structure
real text-embedding corpora have, and the regime IVF is built for.  Queries
are perturbed copies of stored rows.  Ground truth is exact f32 inner
product against the UNQUANTISED vectors (precision=HIGHEST), computed on
device chunk by chunk with a running top-k merge — the f32 oracle that
BASELINE config 4's recall target refers to.

Replaces nothing in the reference (faiss benchmarks assume the corpus fits
in host RAM, ``lotus/vector_store/faiss_vs.py``); this is the TPU-native
equivalent of a bench harness.
"""

from __future__ import annotations

import functools
import time
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from lotus_tpu.ops.common import NO_HIT, fetch_int32
from lotus_tpu.ops.ivf import plan_block_aligned_layout
from lotus_tpu.ops.kmeans import kmeans_fit


@functools.partial(jax.jit, static_argnames=("rows", "d", "n_clusters", "cluster_scale"))
def _gen_chunk(key: jax.Array, centers: jnp.ndarray, rows: int, d: int, n_clusters: int, cluster_scale: float):
    """One corpus chunk: pick a cluster per row, add unit noise, normalise."""
    k_pick, k_noise = jax.random.split(key)
    pick = jax.random.randint(k_pick, (rows,), 0, n_clusters)
    x = centers[pick] * cluster_scale + jax.random.normal(k_noise, (rows, d), jnp.float32)
    return x / jnp.linalg.norm(x, axis=1, keepdims=True)


@jax.jit
def _quantize_rows(x: jnp.ndarray):
    """Per-row symmetric int8: scores factor as rowscale * int8dot."""
    m = jnp.max(jnp.abs(x), axis=1)
    scale = jnp.where(m > 0, m / 127.0, 1.0).astype(jnp.float32)
    q = jnp.clip(jnp.rint(x / scale[:, None]), -127, 127).astype(jnp.int8)
    return q, scale


@jax.jit
def _quantize_with_refinement(x: jnp.ndarray):
    """int8 + packed-int4 refinement of the int8 residual (0.5 byte/dim)."""
    from lotus_tpu.ops.quant import quantize_refinement_int4

    q, scale = _quantize_rows(x)
    r2 = x - q.astype(jnp.float32) * scale[:, None]
    packed, s4 = quantize_refinement_int4(r2)
    return q, scale, packed, s4


@functools.partial(jax.jit, donate_argnums=(0, 1, 2, 3), static_argnames=("residual", "refine"))
def _pack_slice(
    buf: jnp.ndarray, scale_buf: jnp.ndarray, rbuf: jnp.ndarray, rs_buf: jnp.ndarray,
    part: jnp.ndarray, dest: jnp.ndarray, a_dev: jnp.ndarray, centroids: jnp.ndarray,
    row_base: jnp.ndarray, residual: bool, refine: bool,
):
    """Residual-subtract, quantize (int8 + optional int4 refinement), and
    scatter one slice — one XLA program with every buffer donated, so the
    allocator never holds two copies of the big CSR arrays.  The refinement
    is written CONTIGUOUSLY at [row_base, row_base + rows) (row-id keyed)."""
    if residual:
        part = part - jnp.take(centroids, a_dev, axis=0)
    q8, sc = _quantize_rows(part)
    buf = buf.at[dest].set(q8)
    scale_buf = scale_buf.at[dest].set(sc)
    if refine:
        from lotus_tpu.ops.quant import quantize_refinement_int4

        r2 = part - q8.astype(jnp.float32) * sc[:, None]
        r4, s4 = quantize_refinement_int4(r2)
        rbuf = jax.lax.dynamic_update_slice_in_dim(rbuf, r4, row_base, axis=0)
        rs_buf = jax.lax.dynamic_update_slice_in_dim(rs_buf, s4, row_base, axis=0)
    return buf, scale_buf, rbuf, rs_buf


@functools.partial(jax.jit, static_argnames=("k",))
def _gt_merge(best_s: jnp.ndarray, best_i: jnp.ndarray, q: jnp.ndarray, x: jnp.ndarray, base: jnp.ndarray, k: int):
    """Fold one chunk into the running exact-f32 top-k (the oracle)."""
    scores = jnp.matmul(q, x.T, precision=jax.lax.Precision.HIGHEST)
    s, i = jax.lax.top_k(scores, k)
    cat_s = jnp.concatenate([best_s, s], axis=1)
    cat_i = jnp.concatenate([best_i, i + base], axis=1)
    top_s, pos = jax.lax.top_k(cat_s, k)
    return top_s, jnp.take_along_axis(cat_i, pos, axis=1)


@functools.partial(jax.jit, donate_argnums=(0, 1))
def _scatter_rows(buf: jnp.ndarray, scale_buf: jnp.ndarray, dest: jnp.ndarray, q: jnp.ndarray, sc: jnp.ndarray):
    """Place a quantised chunk at its CSR positions (in-place via donation)."""
    return buf.at[dest].set(q), scale_buf.at[dest].set(sc)


@functools.partial(jax.jit, static_argnames=("sub",))
def _assign_top2(x: jnp.ndarray, centroids: jnp.ndarray, sub: int = 65536):
    """Top-2 centroid assignment per row: (a1, a2, margin = s1 - s2).

    Scans query sub-chunks so the score matrix peaks at (sub, nlist) —
    a full (chunk, nlist) f32 block would not fit next to the CSR buffer.
    """
    rows, d = x.shape
    sub = min(sub, rows)
    blocks = x.reshape(rows // sub, sub, d)

    def one(blk):
        s = jnp.einsum(
            "qd,cd->qc", blk, centroids, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        # Two argmax passes instead of lax.top_k: the TopK custom call inside
        # a scan wedges the axon runtime (observed hang); argmax lowers to
        # plain reductions.
        a1 = jnp.argmax(s, axis=1).astype(jnp.int32)
        s1 = jnp.take_along_axis(s, a1[:, None], axis=1)[:, 0]
        s_wo = s.at[jnp.arange(s.shape[0]), a1].set(-jnp.inf)
        a2 = jnp.argmax(s_wo, axis=1).astype(jnp.int32)
        s2 = jnp.take_along_axis(s_wo, a2[:, None], axis=1)[:, 0]
        return a1, a2, s1 - s2

    a1, a2, margin = jax.lax.map(one, blocks)
    return a1.reshape(rows), a2.reshape(rows), margin.reshape(rows)


@functools.partial(
    jax.jit,
    donate_argnums=(2, 3, 4, 5, 6),
    static_argnames=("rows", "d", "n_clusters", "cluster_scale", "k", "spill"),
)
def _scan_chunk(
    key: jax.Array, centers: jnp.ndarray,
    best_s: jnp.ndarray, best_i: jnp.ndarray, a1_buf: jnp.ndarray,
    a2_buf: jnp.ndarray, mg_buf: jnp.ndarray,
    centroids: jnp.ndarray, xq_gt: jnp.ndarray, base: jnp.ndarray,
    rows: int, d: int, n_clusters: int, cluster_scale: float, k: int, spill: bool,
):
    """One fused pass-1 step: regenerate a chunk, fold it into the exact-f32
    oracle, top-2-assign it, and write the assignments into device-resident
    accumulators — NOTHING is fetched to the host (the round-2 build fetched
    3 arrays per chunk over the tunnel, which dominated scan time)."""
    x = _gen_chunk(key, centers, rows, d, n_clusters, cluster_scale)
    best_s, best_i = _gt_merge(best_s, best_i, xq_gt, x, base, k)
    a1, a2, mg = _assign_top2(x, centroids)
    a1_buf = jax.lax.dynamic_update_slice_in_dim(a1_buf, a1, base, axis=0)
    if spill:
        a2_buf = jax.lax.dynamic_update_slice_in_dim(a2_buf, a2, base, axis=0)
        mg_buf = jax.lax.dynamic_update_slice_in_dim(mg_buf, mg, base, axis=0)
    return best_s, best_i, a1_buf, a2_buf, mg_buf


@functools.partial(jax.jit, static_argnames=("total", "nlist"))
def _plan_layout_device(
    assign: jnp.ndarray, list_start: jnp.ndarray, total: int, nlist: int,
):
    """Device-side block-aligned CSR planning for the no-replication case
    (entry i IS row i).  Mirrors :func:`lotus_tpu.ops.ivf.plan_block_aligned_layout`,
    which runs on host for the product path; here only the (nlist,) counts
    ever cross the tunnel.  All-int32: storage positions and row counts both
    fit (x64 is disabled session-wide).

    Returns ``dest`` (storage position per row, int32) and ``row_ids``
    (logical row at each storage slot, NO_HIT padding)."""
    n = assign.shape[0]
    order = jnp.argsort(assign, stable=True).astype(jnp.int32)
    sorted_assign = jnp.take(assign, order)
    counts = jnp.zeros(nlist, jnp.int32).at[assign].add(1)
    start_unpadded = jnp.concatenate([jnp.zeros(1, jnp.int32), jnp.cumsum(counts)[:-1]])
    rank = jnp.arange(n, dtype=jnp.int32) - jnp.take(start_unpadded, sorted_assign)
    dest_sorted = jnp.take(list_start, sorted_assign) + rank
    dest = jnp.zeros(n, jnp.int32).at[order].set(dest_sorted)
    row_ids = jnp.full(total, NO_HIT, jnp.int32).at[dest_sorted].set(order)
    return dest, row_ids


def synth_ivf_device_build(
    *,
    n: int = 10_485_760,  # 10 * 2^20 ("10M"), a multiple of the chunk size
    d: int = 768,
    nlist: int = 4096,
    n_clusters: int = 65536,
    cluster_scale: float = 2.5,
    chunk: int = 1_048_576,
    queries_b: int = 4096,
    gt_queries: int = 256,
    k: int = 10,
    block_align: int = 1024,
    seed: int = 0,
    kmeans_iters: int = 10,
    encoding: str = "residual_int8",
    spill_frac: float = 0.0,
    refine: bool = True,
    train_chunks: int = 2,
    log: Any = None,
) -> dict[str, Any]:
    """Build a device-resident int8 IVF index over a seeded synthetic corpus.

    Returns a dict with the ``ivf_search_pallas``-compatible ``state``, the
    query batch (f32 host array), the f32-oracle ground truth, and phase
    timings.  Fully deterministic in ``seed``.
    """
    say = log or (lambda *_: None)
    root = jax.random.PRNGKey(seed)
    k_centers, k_query, root = jax.random.split(root, 3)
    n_chunks = (n + chunk - 1) // chunk
    assert n % chunk == 0, "n must be a multiple of chunk for static shapes"

    centers = jax.random.normal(k_centers, (n_clusters, d), jnp.float32)
    chunk_keys = jax.random.split(root, n_chunks)

    timings: dict[str, float] = {}

    # ---- pass 1: queries + coarse-quantizer training + GT + assignments ----
    t0 = time.perf_counter()
    x0 = _gen_chunk(chunk_keys[0], centers, chunk, d, n_clusters, cluster_scale)

    kq_pick, kq_noise = jax.random.split(k_query)
    pick = jax.random.randint(kq_pick, (queries_b,), 0, chunk)
    xq = x0[pick] + 0.05 * jax.random.normal(kq_noise, (queries_b, d), jnp.float32)
    xq = xq / jnp.linalg.norm(xq, axis=1, keepdims=True)
    xq_gt = xq[:gt_queries]

    if train_chunks > 1 and n_chunks > 1:
        extra = [
            _gen_chunk(chunk_keys[c], centers, chunk, d, n_clusters, cluster_scale)
            for c in range(1, min(train_chunks, n_chunks))
        ]
        train_x = jnp.concatenate([x0, *extra])
        del extra
    else:
        train_x = x0
    res = kmeans_fit(
        train_x, nlist, iters=kmeans_iters, metric="l2", spherical=True, key=jax.random.PRNGKey(seed + 1)
    )
    centroids = res.centroids.astype(jnp.float32)
    centroids.block_until_ready()
    del train_x
    timings["train_s"] = time.perf_counter() - t0
    say(f"pass1: kmeans trained ({timings['train_s']:.0f}s)")

    t0 = time.perf_counter()
    best_s = jnp.full((gt_queries, k), -np.inf, jnp.float32)
    best_i = jnp.full((gt_queries, k), -1, jnp.int32)
    spill = spill_frac > 0
    # Assignments accumulate in device buffers; the round-2 build fetched
    # a1/a2/margins per chunk (3 x 1 MB x n_chunks over a ~MB/s tunnel),
    # which dominated scan wall time.  Now at most (nlist,) counts cross.
    a1_buf = jnp.zeros(n, jnp.int32)
    a2_buf = jnp.zeros(n if spill else 1, jnp.int32)
    mg_buf = jnp.zeros(n if spill else 1, jnp.float32)
    del x0  # the fused step regenerates chunk 0 (cheap next to its scan)
    for c in range(n_chunks):
        best_s, best_i, a1_buf, a2_buf, mg_buf = _scan_chunk(
            chunk_keys[c], centers, best_s, best_i, a1_buf, a2_buf, mg_buf,
            centroids, xq_gt, jnp.int32(c * chunk),
            rows=chunk, d=d, n_clusters=n_clusters, cluster_scale=cluster_scale,
            k=k, spill=spill,
        )
        say(f"pass1: chunk {c + 1}/{n_chunks} queued")
    gt = fetch_int32(best_i)  # blocks on the whole chain; (gt_queries, k) only
    xq_host = np.asarray(xq)
    timings["scan_s"] = time.perf_counter() - t0

    # ---- layout planning ----------------------------------------------------
    # SOAR-style selective replication: the spill_frac rows closest to a
    # cell boundary (smallest top-2 score margin) are stored in BOTH lists,
    # recovering the boundary-split recall loss; the probe dedups by row id.
    t0 = time.perf_counter()
    if spill:
        # Replicated entries make the entry count data-dependent; this path
        # plans on host (one bulk fetch of the accumulated assignments).
        assign = fetch_int32(a1_buf)
        assign2 = fetch_int32(a2_buf)
        margins = np.asarray(mg_buf)
        tau = float(np.quantile(margins, spill_frac))
        spill_rows = np.where(margins <= tau)[0].astype(np.int64)
        entry_assign = np.concatenate([assign, assign2[spill_rows]])
        row_of_entry = np.concatenate([np.arange(n, dtype=np.int64), spill_rows]).astype(np.int32)
        plan = plan_block_aligned_layout(entry_assign, nlist, block_align, row_of_entry)
        entry_dest = np.empty(entry_assign.shape[0], np.int64)
        entry_dest[plan["order"]] = plan["dest"]
        primary_dest, spill_dest = entry_dest[:n], entry_dest[n:]
        primary_dest_dev = jnp.asarray(primary_dest.astype(np.int32))
        list_size_np = plan["list_size"]
        list_start_np = plan["list_start"]
        max_list, window, total = plan["max_list"], plan["window"], plan["total"]
        row_ids_final = jnp.asarray(
            np.concatenate([plan["row_ids"], np.full(window, NO_HIT, np.int32)])
        )
        say(f"plan: entries={entry_assign.shape[0]:,} total={total:,} window={window}")
    else:
        # No replication: entry i IS row i, so the whole layout is computed
        # on device (one stable sort); only the (nlist,) counts cross the
        # tunnel to derive the padded geometry.
        spill_rows = np.empty(0, np.int64)
        spill_dest = np.empty(0, np.int64)
        assign = assign2 = None
        list_size_np = np.asarray(jnp.zeros(nlist, jnp.int32).at[a1_buf].add(1))
        max_list = int(list_size_np.max()) if nlist > 0 else 0
        padded_size = np.maximum(
            ((list_size_np + block_align - 1) // block_align) * block_align, block_align
        )
        list_start_np = np.zeros(nlist, np.int32)
        list_start_np[1:] = np.cumsum(padded_size)[:-1]
        total = int(padded_size.sum())
        window = max(block_align, int(((max_list + block_align - 1) // block_align) * block_align))
        primary_dest_dev, row_ids_final = _plan_layout_device(
            a1_buf, jnp.asarray(list_start_np), total=total + window, nlist=nlist,
        )
        row_ids_final.block_until_ready()
        say(f"plan (device): entries={n:,} total={total:,} window={window}")
    timings["plan_s"] = time.perf_counter() - t0

    # ---- pass 2: regenerate, quantise, scatter into the CSR buffer ---------
    t0 = time.perf_counter()
    total_padded = total + window
    dummy_pos = total_padded - 1  # inside the never-probed window tail
    buf = jnp.zeros((total_padded, d), jnp.int8)
    scale_buf = jnp.ones((total_padded,), jnp.float32)
    # Refinement is keyed by ORIGINAL row id (not storage position): one
    # entry per logical row regardless of spill, written contiguously.
    rbuf = jnp.zeros((n, d // 2) if refine else (1, 1), jnp.int8)
    rs_buf = jnp.zeros((n,) if refine else (1,), jnp.float32)
    residual = encoding == "residual_int8"
    # Static per-chunk spill capacity so the scatter compiles once.
    spill_cap = max(1, int(chunk * max(spill_frac, 0.01) * 1.5))
    # Quantize+scatter in quarter-chunks: with the ~8.5 GB CSR buffer and
    # the ~4.2 GB refinement buffer resident, the residual path's
    # gathered-centroid and r2 temporaries must stay small.
    quarter = chunk // 4
    for c in range(n_chunks):
        x = _gen_chunk(chunk_keys[c], centers, chunk, d, n_clusters, cluster_scale)
        for lo in range(0, chunk, quarter):
            # Residuals: ~4x smaller per-row maxabs than raw vectors on
            # clustered data, so the int8 step (and its dot-product noise)
            # shrinks by the same factor.  The probe adds the exact f32
            # coarse term q.c back per probed list.
            sl = slice(c * chunk + lo, c * chunk + lo + quarter)
            buf, scale_buf, rbuf, rs_buf = _pack_slice(
                buf, scale_buf, rbuf, rs_buf,
                x[lo : lo + quarter], primary_dest_dev[sl],
                a1_buf[sl], centroids, jnp.int32(c * chunk + lo),
                residual, refine,
            )
        if spill_rows.size:
            in_c = (spill_rows >= c * chunk) & (spill_rows < (c + 1) * chunk)
            loc = spill_rows[in_c] - c * chunk
            m_c = loc.shape[0]
            if m_c > spill_cap:
                raise RuntimeError(f"spill_cap {spill_cap} < chunk spill {m_c}")
            loc_pad = np.zeros(spill_cap, np.int64)
            loc_pad[:m_c] = loc
            sd_pad = np.full(spill_cap, dummy_pos, np.int64)  # padding lands in the dead tail
            sd_pad[:m_c] = spill_dest[in_c]
            a2_pad = np.zeros(spill_cap, np.int32)
            a2_pad[:m_c] = assign2[spill_rows[in_c]]
            part = x[jnp.asarray(loc_pad)]
            if residual:
                part = part - jnp.take(centroids, jnp.asarray(a2_pad), axis=0)
            buf, scale_buf, rbuf, rs_buf = _pack_slice(
                buf, scale_buf, rbuf, rs_buf,
                part, jnp.asarray(sd_pad), jnp.asarray(a2_pad), centroids, jnp.int32(0),
                False, False,  # spill copies carry no refinement entry
            )
        say(f"pass2: chunk {c + 1}/{n_chunks} packed")
    buf.block_until_ready()
    timings["pack_s"] = time.perf_counter() - t0

    meta = {
        "nlist": int(nlist),
        "max_list_size": int(max_list),
        "probe_window": int(window),
        "block_align": int(block_align),
        "metric": "ip",
        "encoding": encoding,
        "spill_frac": spill_frac,
        "refine": bool(refine),
        "n": n,
        "d": d,
        "seed": seed,
    }
    state = {
        "meta": meta,
        "centroids": centroids,
        "ivf_vectors": buf,
        "ivf_row_scales": scale_buf,
        "ivf_row_ids": row_ids_final,
        "ivf_list_start": jnp.asarray(np.asarray(list_start_np, np.int32)),
        "ivf_list_size": jnp.asarray(np.asarray(list_size_np, np.int32)),
    }
    if refine:
        state["ivf_refine"] = rbuf
        state["ivf_refine_scales"] = rs_buf
    # inv_perm points every row at its PRIMARY copy (the one refinement
    # refines); spill copies are never the rescore source.
    state["ivf_inv_perm"] = primary_dest_dev
    build_s = timings["train_s"] + timings["scan_s"] + timings["plan_s"] + timings["pack_s"]
    return {
        "state": state,
        "queries": xq_host,
        "gt": gt,
        "timings": timings,
        "build_seconds": build_s,
        "build_vecs_per_s": n / build_s,
    }
