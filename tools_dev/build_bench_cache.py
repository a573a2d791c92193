"""Build the 10M x 768 IVF bench cache (BASELINE config 4).

Deterministic dataset -> block-aligned IVF build -> f32 exact ground truth
for a query subsample (host-chunked matmul). Everything lands in
.bench_cache/ so bench.py runs load+measure only.

Slow through the axon tunnel (the 3 GB 1M build took ~30 min); run in the
background and let it finish.
"""
import os
import time

import numpy as np

CACHE = "/root/repo/.bench_cache"
N, D, B, K = 10_000_000, 768, 4096, 10
NLIST = 4096
GT_QUERIES = 256
SEED = 0


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def main():
    os.makedirs(CACHE, exist_ok=True)
    qpath = os.path.join(CACHE, "queries.npy")
    gtpath = os.path.join(CACHE, "gt_f32.npy")
    idx_dir = os.path.join(CACHE, "ivf10m")

    rng = np.random.default_rng(SEED)
    log("generating 10M x 768 dataset (chunked)")
    xb = np.empty((N, D), np.float32)
    step = 1_000_000
    for s in range(0, N, step):
        block = rng.standard_normal((min(step, N - s), D), dtype=np.float32)
        block /= np.linalg.norm(block, axis=1, keepdims=True)
        xb[s : s + block.shape[0]] = block
        log(f"  rows {s + block.shape[0]:,}")

    if not os.path.exists(qpath):
        pick = rng.integers(0, N, B)
        xq = xb[pick] + 0.05 * rng.standard_normal((B, D), dtype=np.float32)
        xq /= np.linalg.norm(xq, axis=1, keepdims=True)
        np.save(qpath, xq)
        log("queries saved")
    xq = np.load(qpath)

    if not os.path.exists(gtpath):
        log("computing f32 exact ground truth on host (chunked)")
        q = xq[:GT_QUERIES]
        best_s = np.full((GT_QUERIES, K), -np.inf, np.float32)
        best_i = np.full((GT_QUERIES, K), -1, np.int64)
        for s in range(0, N, step):
            scores = q @ xb[s : s + step].T  # (GT, step)
            part = np.argpartition(-scores, K, axis=1)[:, :K]
            ps = np.take_along_axis(scores, part, axis=1)
            cat_s = np.concatenate([best_s, ps], axis=1)
            cat_i = np.concatenate([best_i, part + s], axis=1)
            sel = np.argpartition(-cat_s, K, axis=1)[:, :K]
            best_s = np.take_along_axis(cat_s, sel, axis=1)
            best_i = np.take_along_axis(cat_i, sel, axis=1)
            log(f"  gt rows {min(s + step, N):,}")
        order = np.argsort(-best_s, axis=1)
        np.save(gtpath, np.take_along_axis(best_i, order, axis=1))
        log("ground truth saved")

    if not os.path.exists(os.path.join(idx_dir, "ivf_vectors.npy")):
        log("building block-aligned IVF index on TPU (slow: tunnel-bound)")
        from lotus_tpu.ops import io as index_io
        from lotus_tpu.ops.ivf import build_ivf

        t0 = time.perf_counter()
        meta = build_ivf(idx_dir, xb, nlist=NLIST, metric="ip", block_align=512)
        build_s = time.perf_counter() - t0
        index_io.write_meta(idx_dir, {**meta, "metric": "ip", "build_seconds": build_s})
        log(f"build done in {build_s:.0f}s ({N / build_s:,.0f} vecs/s end-to-end incl. tunnel)")
    log("cache complete")


if __name__ == "__main__":
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    main()
