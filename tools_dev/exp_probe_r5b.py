"""Round-5b (HISTORICAL — the 'pool' mode measured here was removed
from pallas_ivf afterwards: QPS-wash plus a recall cliff at pr=32): cheap pool pre-reductions + rescore width, after r5a measured
exact/approx top-k pre-reduction a wash (the sort costs what the smaller
gather saves).  'pool' is one VPU pass; recall is the question.
"""
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
K = 10
built = synth_ivf_device_build(
    n=10 * 2**20, d=768, nlist=4096, n_clusters=65536, chunk=2**18,
    queries_b=4096, gt_queries=256, k=K, seed=0, log=lambda m: None,
)
say(f"build: {built['build_vecs_per_s']:,.0f} vecs/s")
state, xq, gt = built["state"], built["queries"], built["gt"]
xq_dev = jnp.asarray(xq, jnp.float32)


def point(label, rescore=24):
    def search(q):
        return pivf.ivf_search_pallas(
            state, q, K, nprobe=208, metric="ip", rescore=rescore,
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
    say(f"{label}: {xq_dev.shape[0] / best:,.0f} QPS, recall@10={rec:.4f}")


point("baseline")
for pr in (32, 16):
    jax.clear_caches()
    pivf.POOL_PREREDUCE, pivf.POOL_PREREDUCE_MODE = pr, "pool"
    point(f"pool-max to {pr}")
# wider rescore to absorb pool-drop rank flips, if recall dipped
jax.clear_caches()
pivf.POOL_PREREDUCE, pivf.POOL_PREREDUCE_MODE = 16, "pool"
point("pool-max 16 + rescore 48", rescore=48)
