"""Round-4 operating-point check: sort-free tables + approx candidate
selection, QPS + recall at nprobe in {192, 256}, rescore in {32, 64}."""
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

import lotus_tpu.ops.pallas_ivf as pivf
from lotus_tpu.ops.bench_data import synth_ivf_device_build
from lotus_tpu.ops.common import fetch_int32

say = lambda m: print(m, flush=True)  # noqa: E731
built = synth_ivf_device_build(
    n=10 * 2**20, d=768, nlist=4096, n_clusters=65536, chunk=2**18,
    queries_b=4096, gt_queries=256, k=10, seed=0, log=lambda m: None,
)
state, xq, gt = built["state"], built["queries"], built["gt"]
say(f"build: {built['build_vecs_per_s']:,.0f} vecs/s")
xq_dev = jnp.asarray(xq, jnp.float32)
B, K = xq.shape[0], 10

for approx in (True, False):
    pivf.APPROX_TOPK = approx
    jax.clear_caches()
    for nprobe, rescore in ((256, 32), (192, 32), (256, 64)):
        def search(q):
            return pivf.ivf_search_pallas(
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
        say(f"approx={approx} nprobe={nprobe} rescore={rescore}: "
            f"{B / best:,.0f} QPS, recall@10={rec:.4f}")
pivf.APPROX_TOPK = True
