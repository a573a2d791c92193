"""TpuVS product-path benchmark: 1M x 768 IVF int8+refine through the store."""
import tempfile
import time

import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import numpy as np

from lotus_tpu.vector_store.tpu_vs import TpuVS

N, D, B, K = 1 << 20, 768, 4096, 10
rng = np.random.default_rng(0)
centers = rng.standard_normal((8192, D)).astype(np.float32)
print("gen...", flush=True)
emb = np.empty((N, D), np.float32)
step = 1 << 17
for s in range(0, N, step):
    blk = centers[rng.integers(0, 8192, step)] * 2.5 + rng.standard_normal((step, D)).astype(np.float32)
    emb[s : s + step] = blk / np.linalg.norm(blk, axis=1, keepdims=True)
xq = emb[rng.integers(0, N, B)] + 0.05 * rng.standard_normal((B, D)).astype(np.float32)
xq /= np.linalg.norm(xq, axis=1, keepdims=True)
gt = None

vs = TpuVS(index_type="ivf", nlist=1024, nprobe=64, device_dtype="int8",
           int8_refine=True, rescore=32)
with tempfile.TemporaryDirectory() as td:
    t0 = time.perf_counter()
    vs.index([], emb, td)
    print(f"build wall {time.perf_counter()-t0:.0f}s ({N/(time.perf_counter()-t0):,.0f} vecs/s end-to-end incl host+tunnel)", flush=True)

    t0 = time.perf_counter()
    out = vs(xq, K)
    wall1 = time.perf_counter() - t0
    got = np.asarray(out.indices)

    # oracle on host for 128 queries
    sub = 128
    scores = xq[:sub] @ emb.T
    gt = np.argsort(-scores, axis=1)[:, :K]
    rec = float(np.mean([len(set(got[i]) & set(gt[i])) / K for i in range(sub)]))

    t0 = time.perf_counter()
    out = vs(xq, K)
    wall2 = time.perf_counter() - t0
    print(f"TpuVS search: recall@10={rec:.4f} first-call {wall1:.2f}s warm {wall2:.2f}s "
          f"-> {B/wall2:,.0f} QPS end-to-end (incl. result fetch)", flush=True)
