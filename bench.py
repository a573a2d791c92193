"""Benchmark: vector search QPS/chip at 1M x 768-d (bf16 storage, batch 4096).

Measures the TPU-native Flat index (blocked matmul + fused approximate top-k
via the TPU PartialReduce unit, recall_target=0.95) that replaces faiss in
the reference's retrieval substrate (BASELINE.md configs 1-2).  The CPU
baseline is single-threaded numpy brute force on this host, measured on a
subsample and scaled linearly — the same matmul+top-k work the reference's
CPU-faiss Flat path does (faiss itself is not installed in this image).

Timing notes: this dev environment reaches the TPU through a network tunnel
with ~40 ms per host<->device roundtrip, and async dispatch makes
block_until_ready unreliable on the axon platform.  The run therefore chains
ITERS searches with a data dependency (query perturbed by the previous
result) and fetches only the final value — one roundtrip amortized over the
chain gives honest per-call device time.

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

    N, D, B, K = 1_048_576, 768, 4096, 10  # N divisible by BLOCK: the store pre-pads, so the kernel never re-pads
    BLOCK = 65536
    ITERS = 10
    rng = np.random.default_rng(0)
    xb = rng.standard_normal((N, D), dtype=np.float32)
    xb /= np.linalg.norm(xb, axis=1, keepdims=True)
    xq = xb[rng.integers(0, N, B)] + 0.05 * rng.standard_normal((B, D), dtype=np.float32)
    xq /= np.linalg.norm(xq, axis=1, keepdims=True)

    xb_dev = jnp.asarray(xb, dtype=jnp.bfloat16)
    xq_dev = jnp.asarray(xq, dtype=jnp.float32)

    def search(q):
        return flat_search(
            xb_dev, q, K, metric="ip", block_rows=BLOCK, approx=True, recall_target=0.95
        )

    # Warm up / compile; force the value back.
    d0, i0 = search(xq_dev)
    got = np.asarray(i0)

    def chained(n_iters):
        q = xq_dev
        d = i = None
        for _ in range(n_iters):
            d, i = search(q)
            # Data dependency defeats async overlap without changing results
            # materially (zero-scaled feedback).
            q = xq_dev + 0.0 * d[:, :1]
        return d, i

    # First chained trial also compiles the feedback add; report min of 3.
    per_call = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        d1, i1 = chained(ITERS)
        float(np.asarray(d1[0, 0]))  # single roundtrip fetch
        per_call = min(per_call, (time.perf_counter() - t0) / ITERS)
    qps = B / per_call

    # Recall vs exact f32 ground truth on a query subsample.
    sub = 128
    gt = np.argsort(-(xq[:sub] @ xb.T), axis=1)[:, :K]
    recall = float(np.mean([len(set(got[i]) & set(gt[i])) / K for i in range(sub)]))

    # CPU baseline: numpy brute force on a subsample, scaled to N.
    N_SUB = 50_000
    t0 = time.perf_counter()
    scores = xq[:256] @ xb[:N_SUB].T
    np.argpartition(-scores, K, axis=1)[:, :K]
    cpu_time = (time.perf_counter() - t0) * (N / N_SUB) * (B / 256)
    cpu_qps = B / cpu_time

    print(
        json.dumps(
            {
                "metric": "flat_search_qps_per_chip_1M_768d_b4096_k10",
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
