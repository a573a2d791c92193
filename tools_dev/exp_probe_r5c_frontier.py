"""Round-5c frontier: the operating point sits at nprobe=208 (0.9957) while
BASELINE config 4's bar is >= 0.99 — at HEAD speed (28.1k QPS at 208) the
epilogue scales with b*nprobe, so nprobe in {160,176,192} may clear 32k QPS
while staying above the bar.  Round-4b measured 192 -> 0.9918 at the OLD
21.7k-QPS head; this re-measures the low side of the frontier at HEAD with
a 512-query ground truth (SE ~ 0.0013 at p=0.99) so a pick near the bar is
statistically defensible.
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

say = lambda m: print(m, flush=True)  # noqa: E731
built = synth_ivf_device_build(
    n=10 * 2**20, d=768, nlist=4096, n_clusters=65536, chunk=2**18,
    queries_b=4096, gt_queries=512, k=10, seed=0, log=lambda m: None,
)
say(f"build: {built['build_vecs_per_s']:,.0f} vecs/s {built['timings']}")
state, xq, gt = built["state"], built["queries"], built["gt"]
xq_dev = jnp.asarray(xq, jnp.float32)
B, K = xq.shape[0], 10


def point(nprobe, rescore):
    def search(q):
        return ivf_search_pallas(
            state, q, K, nprobe=nprobe, metric="ip", rescore=rescore,
            int8_queries=True, query_chunk=2048,
        )

    d_, i_ = search(xq_dev)
    got = fetch_int32(i_)[: gt.shape[0]]
    rec = float(np.mean([len(set(got[i]) & set(gt[i])) / K for i in range(gt.shape[0])]))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        q = xq_dev
        for _ in range(3):
            dd, _ = search(q)
            q = xq_dev + 0.0 * dd[:, :1]
        float(np.asarray(dd[0, 0]))
        best = min(best, (time.perf_counter() - t0) / 3)
    say(f"nprobe={nprobe} rescore={rescore}: {B / best:,.0f} QPS, recall@10={rec:.4f} (nq=512)")


for nprobe, rescore in ((208, 24), (192, 24), (176, 24), (160, 24)):
    point(nprobe, rescore)
