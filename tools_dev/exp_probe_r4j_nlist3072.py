"""Round-4j: the intermediate shape — nlist=3072 at the 10M point.

r4g/h/i bracketed the shape trade: nlist=2048 buys 32-40k QPS from the
b*nprobe-scaled epilogue stages but its whole-list fold cap holds recall
under 0.983; nlist=4096 holds 0.9957 at 28.1k.  3072 (avg list ~3413
rows) sits between the two fold-collision regimes: if the ceiling lands
>= 0.99, ~31k QPS at spec recall is on the table.
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
B, K = 4096, 10

built = synth_ivf_device_build(
    n=10 * 2**20, d=768, nlist=3072, n_clusters=65536, chunk=2**18,
    queries_b=B, gt_queries=256, k=K, seed=0, log=lambda m: None,
)
state, xq, gt = built["state"], built["queries"], built["gt"]
say(f"nlist=3072: build {built['build_vecs_per_s']:,.0f} vecs/s, "
    f"window={state['meta'].get('probe_window')}")
xq_dev = jnp.asarray(xq, jnp.float32)

for nprobe in (144, 156, 176, 208):
    def search(q):
        return ivf_search_pallas(
            state, q, K, nprobe=nprobe, metric="ip", rescore=24,
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
    say(f"  nlist=3072 nprobe={nprobe}: {B / best:,.0f} QPS, "
        f"recall@10={rec:.4f}  (scan {nprobe/3072:.3%})")
