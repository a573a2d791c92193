"""Does SOAR spill beat plain nprobe now that probe overhead collapsed?

Round-2 measured 5% spill at 0.9902 @ 4.0k QPS (nprobe=128) vs no-spill
0.9965 @ 3.7k (nprobe=256) — a wash, because every point was
probe-overhead-bound.  The BUCKET=8 / folded-VMEM kernel moved the
frontier to 13.7k @ 0.9957 (nprobe=256) and 20.0k @ 0.9879 (nprobe=128);
spill's +recall-at-lower-nprobe trade is worth remeasuring.
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

built = synth_ivf_device_build(
    n=10 * 2**20, d=768, nlist=4096, n_clusters=65536, chunk=2**18,
    queries_b=4096, gt_queries=256, k=10, spill_frac=0.05, seed=0,
    log=lambda m: print(m, flush=True),
)
print(f"build: {built['build_vecs_per_s']:,.0f} vecs/s {built['timings']}", flush=True)
state, xq, gt = built["state"], built["queries"], built["gt"]
xq_dev = jnp.asarray(xq, jnp.float32)
K = 10


def point(nprobe, rescore=32):
    d_, i_ = ivf_search_pallas(
        state, xq_dev, K, nprobe=nprobe, metric="ip", query_chunk=2048,
        rescore=rescore, int8_queries=True,
    )
    got = fetch_int32(i_)[: gt.shape[0]]
    rec = float(np.mean([len(set(got[i]) & set(gt[i])) / K for i in range(gt.shape[0])]))
    t0 = time.perf_counter()
    q = xq_dev
    for _ in range(3):
        dd, _ = ivf_search_pallas(
            state, q, K, nprobe=nprobe, metric="ip", query_chunk=2048,
            rescore=rescore, int8_queries=True,
        )
        q = xq_dev + 0.0 * dd[:, :1]
    float(np.asarray(dd[0, 0]))
    qps = 4096 / ((time.perf_counter() - t0) / 3)
    print(f"spill5 nprobe={nprobe} rescore={rescore}: recall={rec:.4f} qps={qps:,.0f}", flush=True)


for np_ in (96, 128, 160, 192, 256):
    point(np_)
