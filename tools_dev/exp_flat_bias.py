"""Residual-aware exhaustive int8 scan at 10M: can a biased scan + rescore
beat the grouped probe's QPS at the 0.99-recall point?

Score per row = int8dot * rowscale + qc[query, list_of_row]; the bias
gathers from a (B, nlist) table with per-row list indices — fusable into
the block's elementwise epilogue.  Top-32 per block via approx_max_k,
merged, deduped, then exactly rescored (int4 refinement).
"""
import functools
import time

import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

from lotus_tpu.ops.bench_data import synth_ivf_device_build
from lotus_tpu.ops.common import MASK_SCORE, NO_HIT, dedup_topk, fetch_int32
from lotus_tpu.ops.ivf import ensure_pos_list, rescore_candidates

built = synth_ivf_device_build(n=10 * 2**20, d=768, nlist=4096, n_clusters=65536,
                               chunk=2**18, queries_b=4096, gt_queries=256, k=10,
                               seed=0, log=lambda m: print(m, flush=True))
state, xq, gt = built["state"], built["queries"], built["gt"]
pos_list = ensure_pos_list(state)
K, B = 10, 4096
xq_dev = jnp.asarray(xq, jnp.float32)

BLK = 1 << 16  # rows per scan step


@functools.partial(jax.jit, static_argnames=("kb",))
def biased_scan(q, vecs, scales, rids, plist, cents, kb):
    """Exhaustive scan of the residual store with per-row coarse bias."""
    n_pad = vecs.shape[0] // BLK * BLK  # tail (window pad) rows are dead
    qc = jnp.einsum("qd,ld->ql", q, cents, preferred_element_type=jnp.float32)  # (B, nlist)
    q16 = q.astype(jnp.bfloat16)

    def body(carry, step):
        best_s, best_i = carry
        lo = step * BLK
        blk = jax.lax.dynamic_slice_in_dim(vecs, lo, BLK, axis=0)
        sc = jax.lax.dynamic_slice_in_dim(scales, lo, BLK, axis=0)
        rid = jax.lax.dynamic_slice_in_dim(rids, lo, BLK, axis=0)
        pl = jax.lax.dynamic_slice_in_dim(plist, lo, BLK, axis=0)
        s = jnp.einsum("qd,nd->qn", q16, blk.astype(jnp.bfloat16), preferred_element_type=jnp.float32)
        # Block-aligned storage: every 512-row sub-block belongs to ONE list,
        # so the coarse bias is a (B, BLK//512) table broadcast over rows —
        # a fusable reshape-add, not a per-row gather.
        plb = pl[::512]                       # (BLK//512,) list of each sub-block
        bias = qc[:, plb]                     # (B, BLK//512)
        s = s * sc[None, :]
        s = (s.reshape(s.shape[0], BLK // 512, 512) + bias[:, :, None]).reshape(s.shape[0], BLK)
        s = jnp.where(rid[None, :] >= 0, s, MASK_SCORE)
        ts, tp = jax.lax.approx_max_k(s, kb, recall_target=0.95)
        ti = rid[tp]
        cs = jnp.concatenate([best_s, ts], axis=1)
        ci = jnp.concatenate([best_i, ti], axis=1)
        ms, mp = jax.lax.top_k(cs, kb)
        return (ms, jnp.take_along_axis(ci, mp, axis=1)), None

    init = (jnp.full((q.shape[0], kb), MASK_SCORE, jnp.float32),
            jnp.full((q.shape[0], kb), NO_HIT, jnp.int32))
    (bs, bi), _ = jax.lax.scan(body, init, jnp.arange(n_pad // BLK, dtype=jnp.int32))
    return dedup_topk(bs, bi, kb)


def run(kb):
    s_, i_ = biased_scan(xq_dev, state["ivf_vectors"], state["ivf_row_scales"],
                         state["ivf_row_ids"], pos_list, state["centroids"], kb)
    s_, i_ = rescore_candidates(state, xq_dev, i_, K)
    got = fetch_int32(i_)[:256]
    rec = float(np.mean([len(set(got[i]) & set(gt[i])) / K for i in range(256)]))
    # chained timing
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        q = xq_dev
        for _ in range(4):
            s2, i2 = biased_scan(q, state["ivf_vectors"], state["ivf_row_scales"],
                                 state["ivf_row_ids"], pos_list, state["centroids"], kb)
            s3, _ = rescore_candidates(state, q, i2, K)
            q = xq_dev + 0.0 * s3[:, :1]
        float(np.asarray(s3[0, 0]))
        best = min(best, (time.perf_counter() - t0) / 4)
    print(f"biased scan kb={kb}: recall={rec:.4f} qps={B / best:,.0f}", flush=True)


for kb in (32, 64):
    run(kb)
