"""Benchmark: flat exact vector search QPS/chip at 1M x 768-d (bf16 storage).

Measures the TPU-native Flat index (blocked matmul + streaming top-k) that
replaces faiss in the reference's retrieval substrate (BASELINE.md configs
1-2 scale).  The CPU baseline is single-threaded numpy brute force measured
on this host on a subsample and scaled linearly — what the reference's
CPU-faiss Flat path does (BLAS matmul + top-k), since faiss itself is not
installed in this image.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import numpy as np


def main() -> None:
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from lotus_tpu.ops import flat_search

    N, D, B, K = 1_000_000, 768, 256, 10
    BLOCK = 65536
    rng = np.random.default_rng(0)
    xb = rng.standard_normal((N, D), dtype=np.float32)
    xb /= np.linalg.norm(xb, axis=1, keepdims=True)
    xq = xb[rng.integers(0, N, B)] + 0.02 * rng.standard_normal((B, D), dtype=np.float32)
    xq /= np.linalg.norm(xq, axis=1, keepdims=True)

    xb_dev = jnp.asarray(xb, dtype=jnp.bfloat16)
    xq_dev = jnp.asarray(xq, dtype=jnp.float32)

    # Warm up / compile.
    d0, i0 = flat_search(xb_dev, xq_dev, K, metric="ip", block_rows=BLOCK)
    jax.block_until_ready((d0, i0))

    iters = 5
    t0 = time.perf_counter()
    for _ in range(iters):
        d1, i1 = flat_search(xb_dev, xq_dev, K, metric="ip", block_rows=BLOCK)
    jax.block_until_ready((d1, i1))
    tpu_time = (time.perf_counter() - t0) / iters
    qps = B / tpu_time

    # Recall vs exact f32 ground truth on the subsampled queries.
    sub = 64
    gt_scores = xq[:sub] @ xb.T
    gt = np.argsort(-gt_scores, axis=1)[:, :K]
    got = np.asarray(i1)[:sub]
    recall = float(np.mean([len(set(got[i]) & set(gt[i])) / K for i in range(sub)]))

    # CPU baseline: numpy brute force on a subsample, scaled to N.
    N_SUB = 50_000
    xb_sub = xb[:N_SUB]
    t0 = time.perf_counter()
    scores = xq @ xb_sub.T
    np.argpartition(-scores, K, axis=1)[:, :K]
    cpu_time_sub = time.perf_counter() - t0
    cpu_time = cpu_time_sub * (N / N_SUB)
    cpu_qps = B / cpu_time

    print(
        json.dumps(
            {
                "metric": "flat_search_qps_per_chip_1M_768d_b256_k10",
                "value": round(qps, 1),
                "unit": "queries/sec",
                "vs_baseline": round(qps / cpu_qps, 2),
                "recall_at_10_vs_exact": round(recall, 4),
                "cpu_baseline_qps": round(cpu_qps, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
