"""Benchmark: BASELINE config 4 — IVF-Flat at 10M x 768-d on one chip.

Primary metric: large-batch IVF search QPS/chip (Pallas grouped probe,
int8 storage + bf16 queries) with recall@10 measured against the EXACT
FLOAT32 ground truth (host-computed brute force over the original f32
vectors — not the quantized store), the composite number BASELINE.md
config 4 asks for (>= 0.99 recall at equal-or-less memory, >= 10x CPU).

Dataset/index/ground-truth come from .bench_cache/ (tools_dev/
build_bench_cache.py); building 10M x 768 through the axon dev tunnel
takes ~2 h, so the cache is built once per machine. Without a cache this
falls back to building a smaller instance of the SAME configuration
in-process (N=1M) and reports it under the same methodology.

Timing: the dev tunnel costs ~40 ms per host<->device roundtrip and async
dispatch makes naive timing wrong by up to 50x; searches are chained with
a data dependency and one value is fetched at the end (min of 3 trials).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
"""

import json
import os
import time

import numpy as np

CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".bench_cache")
K = 10
NPROBE = int(os.getenv("BENCH_NPROBE", "32"))


def _cpu_baseline_qps(xq: np.ndarray, xb_sample: np.ndarray, n_total: int) -> float:
    """Single-threaded numpy brute force on a subsample, scaled to N — the
    matmul+top-k work CPU-faiss Flat does (faiss is not in this image)."""
    nq = min(256, xq.shape[0])
    t0 = time.perf_counter()
    scores = xq[:nq] @ xb_sample.T
    np.argpartition(-scores, K, axis=1)[:, :K]
    dt = (time.perf_counter() - t0) * (n_total / xb_sample.shape[0])
    return nq / dt


def _build_fallback(n: int, d: int, b: int):
    """No cache: build a smaller same-shape instance in-process."""
    import jax.numpy as jnp

    from lotus_tpu.ops import io as index_io
    from lotus_tpu.ops.ivf import build_ivf

    rng = np.random.default_rng(0)
    xb = rng.standard_normal((n, d), dtype=np.float32)
    xb /= np.linalg.norm(xb, axis=1, keepdims=True)
    xq = xb[rng.integers(0, n, b)] + 0.05 * rng.standard_normal((b, d), dtype=np.float32)
    xq /= np.linalg.norm(xq, axis=1, keepdims=True)

    idx_dir = os.path.join(CACHE, f"ivf{n // 1_000_000}m_fallback")
    if not os.path.exists(os.path.join(idx_dir, "meta.json")):
        meta = build_ivf(idx_dir, xb, nlist=max(256, int(np.sqrt(n)) // 2), metric="ip", block_align=512)
        index_io.write_meta(idx_dir, {**meta, "metric": "ip"})

    gt = None  # computed below on host
    sub = 128
    scores = xq[:sub] @ xb.T
    gt = np.argsort(-scores, axis=1)[:, :K]
    return idx_dir, xb[: 50_000].copy(), xq, gt, n


def main() -> None:
    import jax

    jax.config.update("jax_compilation_cache_dir", os.path.join(os.path.dirname(CACHE), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from lotus_tpu.ops import io as index_io
    from lotus_tpu.ops.ivf import load_ivf_state
    from lotus_tpu.ops.pallas_ivf import ivf_search_pallas

    cached = os.path.exists(os.path.join(CACHE, "ivf10m", "meta.json"))
    if cached:
        idx_dir = os.path.join(CACHE, "ivf10m")
        xq = np.load(os.path.join(CACHE, "queries.npy"))
        gt = np.load(os.path.join(CACHE, "gt_f32.npy"))
        # CPU baseline sample: first 50k rows reconstructed from the store's
        # f32 vectors file (mmap'd; no full load).
        vecs = index_io.read_array(idx_dir, "ivf_vectors")
        xb_sample = np.asarray(vecs[:50_000], dtype=np.float32)
        n_total = 10_000_000
    else:
        idx_dir, xb_sample, xq, gt, n_total = _build_fallback(1_048_576, 768, 4096)

    meta = index_io.read_meta(idx_dir)
    state = load_ivf_state(idx_dir, meta, jnp.int8)
    state["meta"] = meta

    xq_dev = jnp.asarray(xq, dtype=jnp.float32)
    b = xq.shape[0]

    def search(q):
        return ivf_search_pallas(state, q, K, nprobe=NPROBE, metric="ip")

    d0, i0 = search(xq_dev)  # compile + warm
    got = np.asarray(i0)

    sub = gt.shape[0]
    recall = float(np.mean([len(set(got[i]) & set(gt[i])) / K for i in range(sub)]))

    ITERS = 10
    per_call = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        q = xq_dev
        for _ in range(ITERS):
            d, i = search(q)
            q = xq_dev + 0.0 * d[:, :1]  # data dependency defeats async overlap
        float(np.asarray(d[0, 0]))  # single roundtrip fetch
        per_call = min(per_call, (time.perf_counter() - t0) / ITERS)
    qps = b / per_call

    cpu_qps = _cpu_baseline_qps(xq, xb_sample, n_total)

    scale = "10M" if cached else "1M-fallback"
    print(
        json.dumps(
            {
                "metric": f"ivf_search_qps_per_chip_{scale}_768d_b{b}_k10_nprobe{NPROBE}",
                "value": round(qps, 1),
                "unit": "queries/sec",
                "vs_baseline": round(qps / cpu_qps, 2),
                "recall_at_10_vs_exact_f32": round(recall, 4),
                "cpu_baseline_qps": round(cpu_qps, 1),
                "storage": "int8 (bf16 queries)",
            }
        )
    )


if __name__ == "__main__":
    main()
