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
from lotus_tpu.ops.kmeans import kmeans_assign, kmeans_fit


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


def synth_ivf_device_build(
    *,
    n: int = 10_485_760,  # 10 * 2^20 ("10M"), a multiple of the chunk size
    d: int = 768,
    nlist: int = 4096,
    n_clusters: int = 6144,
    cluster_scale: float = 2.5,
    chunk: int = 1_048_576,
    queries_b: int = 4096,
    gt_queries: int = 256,
    k: int = 10,
    block_align: int = 512,
    seed: int = 0,
    kmeans_iters: int = 8,
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

    res = kmeans_fit(x0, nlist, iters=kmeans_iters, metric="l2", spherical=True, key=jax.random.PRNGKey(seed + 1))
    centroids = res.centroids.astype(jnp.float32)
    timings["train_s"] = time.perf_counter() - t0
    say(f"pass1: kmeans trained ({timings['train_s']:.0f}s)")

    t0 = time.perf_counter()
    best_s = jnp.full((gt_queries, k), -np.inf, jnp.float32)
    best_i = jnp.full((gt_queries, k), -1, jnp.int32)
    assign = np.empty(n, np.int32)
    for c in range(n_chunks):
        x = x0 if c == 0 else _gen_chunk(chunk_keys[c], centers, chunk, d, n_clusters, cluster_scale)
        say(f"pass1: chunk {c + 1}: gt_merge dispatch")
        best_s, best_i = _gt_merge(best_s, best_i, xq_gt, x, jnp.int32(c * chunk), k)
        # kmeans_assign scans row blocks, so scores peak at block x nlist —
        # a full (chunk, nlist) f32 score matrix would be 16 GB at 10M scale.
        say(f"pass1: chunk {c + 1}: assign dispatch")
        a, _ = kmeans_assign(x, centroids, metric="ip")
        say(f"pass1: chunk {c + 1}: fetch")
        assign[c * chunk : (c + 1) * chunk] = fetch_int32(a)
        say(f"pass1: chunk {c + 1}/{n_chunks} scored+assigned")
    del x0, x
    gt = fetch_int32(best_i)
    xq_host = np.asarray(xq)
    timings["scan_s"] = time.perf_counter() - t0

    # ---- host: CSR geometry (cheap integer work) ---------------------------
    t0 = time.perf_counter()
    plan = plan_block_aligned_layout(assign, nlist, block_align)
    timings["plan_s"] = time.perf_counter() - t0
    say(f"plan: total={plan['total']:,} window={plan['window']}")

    # ---- pass 2: regenerate, quantise, scatter into the CSR buffer ---------
    t0 = time.perf_counter()
    pad = plan["window"]
    total = plan["total"] + pad
    buf = jnp.zeros((total, d), jnp.int8)
    scale_buf = jnp.ones((total,), jnp.float32)
    dest = plan["dest"]
    inv = np.empty(n, np.int64)  # dest position of each ORIGINAL row (host-side int64)
    inv[plan["order"]] = dest
    for c in range(n_chunks):
        x = _gen_chunk(chunk_keys[c], centers, chunk, d, n_clusters, cluster_scale)
        q8, sc = _quantize_rows(x)
        dest_c = jnp.asarray(inv[c * chunk : (c + 1) * chunk])
        buf, scale_buf = _scatter_rows(buf, scale_buf, dest_c, q8, sc)
        say(f"pass2: chunk {c + 1}/{n_chunks} packed")
    buf.block_until_ready()
    timings["pack_s"] = time.perf_counter() - t0

    row_ids = np.concatenate([plan["row_ids"], np.full(pad, NO_HIT, np.int32)])
    meta = {
        "nlist": int(nlist),
        "max_list_size": plan["max_list"],
        "probe_window": int(plan["window"]),
        "block_align": int(block_align),
        "metric": "ip",
        "n": n,
        "d": d,
        "seed": seed,
    }
    state = {
        "meta": meta,
        "centroids": centroids,
        "ivf_vectors": buf,
        "ivf_row_scales": scale_buf,
        "ivf_row_ids": jnp.asarray(row_ids),
        "ivf_list_start": jnp.asarray(plan["list_start"]),
        "ivf_list_size": jnp.asarray(plan["list_size"]),
    }
    build_s = timings["train_s"] + timings["scan_s"] + timings["plan_s"] + timings["pack_s"]
    return {
        "state": state,
        "queries": xq_host,
        "gt": gt,
        "timings": timings,
        "build_seconds": build_s,
        "build_vecs_per_s": n / build_s,
    }
