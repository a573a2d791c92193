"""Experiment: int8-storage IVF probe with bf16 vs int8 queries, 1M x 768.

Measures recall@10 vs the exact f32 oracle and chained QPS for both query
precisions at a few nprobe settings. Run on the real TPU.
"""
import time

import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

from lotus_tpu.ops.ivf import build_ivf, load_ivf_state
from lotus_tpu.ops.pallas_ivf import ivf_search_pallas
from lotus_tpu.ops import io as index_io

N, D, B, K = 1_048_576, 768, 4096, 10
NLIST = 1024
rng = np.random.default_rng(0)

# Clustered corpus: mixture of gaussians (like docs' IVF comparison).
ncl = 2048
centers = rng.standard_normal((ncl, D), dtype=np.float32)
centers /= np.linalg.norm(centers, axis=1, keepdims=True)
assign = rng.integers(0, ncl, N)
xb = centers[assign] + 0.3 * rng.standard_normal((N, D), dtype=np.float32)
xb /= np.linalg.norm(xb, axis=1, keepdims=True)
xq = xb[rng.integers(0, N, B)] + 0.1 * rng.standard_normal((B, D), dtype=np.float32)
xq /= np.linalg.norm(xq, axis=1, keepdims=True)

idx_dir = "/tmp/exp_ivf_1m"
import os
if not os.path.exists(os.path.join(idx_dir, "ivf_vectors.npy")):
    t0 = time.perf_counter()
    meta = build_ivf(idx_dir, xb, nlist=NLIST, metric="ip", block_align=512)
    print(f"build: {time.perf_counter()-t0:.1f}s meta={meta}", flush=True)
    index_io.write_meta(idx_dir, {**meta, "metric": "ip"})

meta = index_io.read_meta(idx_dir)
state = load_ivf_state(idx_dir, meta, jnp.int8)
state["meta"] = meta

# f32 oracle on HOST: shipping the 3 GB f32 db through the tunnel is
# CPU-bound on this 1-core host (~25 min); a host matmul is ~30 s.
SUB = 512
gt_path = "/tmp/exp_ivf_1m_gt.npy"
if os.path.exists(gt_path):
    gt = np.load(gt_path)
else:
    scores = xq[:SUB] @ xb.T
    gt = np.argsort(-scores, axis=1)[:, :K]
    np.save(gt_path, gt)

xq_dev = jnp.asarray(xq)

def measure(int8_q, nprobe):
    def search(q):
        return ivf_search_pallas(state, q, K, nprobe=nprobe, metric="ip", int8_queries=int8_q)
    d0, i0 = search(xq_dev)
    got = np.asarray(i0)
    rec = float(np.mean([len(set(got[i]) & set(gt[i])) / K for i in range(SUB)]))
    ITERS = 10
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        q = xq_dev
        for _ in range(ITERS):
            d, i = search(q)
            q = xq_dev + 0.0 * d[:, :1]
        float(np.asarray(d[0, 0]))
        best = min(best, (time.perf_counter() - t0) / ITERS)
    print(f"int8_queries={int8_q} nprobe={nprobe}: recall@10={rec:.4f} qps={B/best:,.0f}", flush=True)

import sys
configs = [(False, 16), (True, 16), (False, 32)]
if len(sys.argv) > 1:  # e.g. "False:8,True:32"
    configs = [(p.split(":")[0] == "True", int(p.split(":")[1])) for p in sys.argv[1].split(",")]
for int8_q, np_ in configs:
    measure(int8_q, np_)
