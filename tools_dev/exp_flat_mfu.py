"""Flat-scan MFU probe: measure QPS across block/query-tile configurations.

Roofline hypothesis (docs/benchmarks.md row 2 = 92.9k QPS = ~37% bf16 MXU):
the (B x block) f32 score intermediate between the matmul and approx_max_k
materializes in HBM — at B=4096, block=65536 that is 1 GB per block, 16
blocks per batch, ~32 GB of HBM traffic per search ~= the observed rate.
Probe: vary block_rows and query chunking; if QPS tracks intermediate size
rather than FLOPs, the scan is HBM-bound through the intermediate.
"""
import time

import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

from lotus_tpu.ops import flat_search

N, D, B, K = 1 << 20, 768, 4096, 10
rng = np.random.default_rng(0)
xb = rng.standard_normal((N, D), dtype=np.float32)
xb /= np.linalg.norm(xb, axis=1, keepdims=True)
xq = xb[rng.integers(0, N, B)] + 0.05 * rng.standard_normal((B, D), dtype=np.float32)
xq /= np.linalg.norm(xq, axis=1, keepdims=True)
xb_dev = jnp.asarray(xb, dtype=jnp.bfloat16)
xq_dev = jnp.asarray(xq, dtype=jnp.float32)

gt = np.argsort(-(xq[:128] @ xb.T), axis=1)[:, :K]

def bench(make_search, label):
    try:
        d0, i0 = make_search(xq_dev)
        got = np.asarray(i0)
    except Exception as e:
        print(f"{label}: FAILED {type(e).__name__}: {str(e)[:120]}", flush=True)
        return
    rec = float(np.mean([len(set(got[i]) & set(gt[i])) / K for i in range(128)]))
    ITERS = 8
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        q = xq_dev
        for _ in range(ITERS):
            d, i = make_search(q)
            q = xq_dev + 0.0 * d[:, :1]
        float(np.asarray(d[0, 0]))
        best = min(best, (time.perf_counter() - t0) / ITERS)
    qps = B / best
    tflops = qps * N * D * 2 / 1e12
    print(f"{label}: qps={qps:,.0f} recall={rec:.4f} mxu={tflops:.0f} TF/s ({tflops/394*100:.0f}% bf16 peak)", flush=True)

# Current default (the bench.py config).
for blk in (65536, 32768, 16384, 8192):
    bench(lambda q, blk=blk: flat_search(xb_dev, q, K, metric="ip", block_rows=blk, approx=True, recall_target=0.95), f"scan blk={blk}")

# Single-block whole-DB approx_max_k: if XLA fuses matmul+PartialReduce this
# runs without a (B, N) f32 materialization; if it OOMs, fusion failed.
bench(lambda q: flat_search(xb_dev, q, K, metric="ip", block_rows=N, approx=True, recall_target=0.95), "single-block 1M")

# Query-chunked single-block: bound the live intermediate per step.
def chunked(q, qc):
    outs = []
    for s in range(0, B, qc):
        outs.append(flat_search(xb_dev, q[s:s+qc], K, metric="ip", block_rows=N, approx=True, recall_target=0.95))
    d = jnp.concatenate([o[0] for o in outs]); i = jnp.concatenate([o[1] for o in outs])
    return d, i
for qc in (1024, 2048):
    bench(lambda q, qc=qc: chunked(q, qc), f"single-block qchunk={qc}")

# bf16 queries too (matmul fully bf16).
xq16 = xq_dev.astype(jnp.bfloat16)
bench(lambda q: flat_search(xb_dev, q.astype(jnp.bfloat16), K, metric="ip", block_rows=N, approx=True, recall_target=0.95), "single-block bf16 queries")
