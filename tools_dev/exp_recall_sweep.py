"""Config-4 recall decomposition: nprobe sweep + full-probe int8 ceiling.

Separates the two recall losses: lists missed by the coarse probe (rises
with nprobe) vs int8 quantization noise (the full-probe ceiling).
"""
import time

import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

from lotus_tpu.ops.bench_data import synth_ivf_device_build
from lotus_tpu.ops.common import fetch_int32
from lotus_tpu.ops.pallas_ivf import ivf_search_pallas

built = synth_ivf_device_build(n=10 * 2**20, d=768, nlist=4096, n_clusters=65536,
                               chunk=2**18, queries_b=4096, gt_queries=256, k=10, spill_frac=0.05,
                               seed=0, log=lambda m: print(m, flush=True))
state, xq, gt = built["state"], built["queries"], built["gt"]
xq_dev = jnp.asarray(xq, jnp.float32)
K = 10

def recall_at(nprobe, qc=None, rescore=32, i8=False):
    d_, i_ = ivf_search_pallas(state, xq_dev, K, nprobe=nprobe, metric="ip", query_chunk=qc, rescore=rescore, int8_queries=i8)
    got = fetch_int32(i_)[: gt.shape[0]]
    rec = float(np.mean([len(set(got[i]) & set(gt[i])) / K for i in range(gt.shape[0])]))
    # quick chained timing (3 iters is enough for a sweep)
    t0 = time.perf_counter()
    q = xq_dev
    for _ in range(3):
        dd, _ = ivf_search_pallas(state, q, K, nprobe=nprobe, metric="ip", query_chunk=qc, rescore=rescore, int8_queries=i8)
        q = xq_dev + 0.0 * dd[:, :1]
    float(np.asarray(dd[0, 0]))
    qps = 4096 / ((time.perf_counter() - t0) / 3)
    print(f"nprobe={nprobe} rescore={rescore} i8={i8}: recall={rec:.4f} qps={qps:,.0f}", flush=True)

recall_at(128, 256, i8=True)
recall_at(160, 256, i8=True)
recall_at(192, 256, i8=True)
recall_at(256, 256, i8=True)
