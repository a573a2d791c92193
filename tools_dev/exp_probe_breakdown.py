"""Where does the nprobe=256 operating point's time go?

At 13.7k QPS the probe runs at ~2% of v5e int8 compute peak and ~7% of HBM
bandwidth (11.5M x 768 int8 streamed twice per 4096-query batch), so the
bottleneck is neither the MXU dot nor the storage stream.  Candidates:
exact top-32 rescoring, the coarse centroid ranking, the candidate-pool
reassembly gathers, and the final top_k over B x (nprobe * 128) pools.

This sweep isolates each: full path, rescore off, k variations, coarse
ranking alone, and both query chunk sizes.
"""
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

from lotus_tpu.ops.bench_data import synth_ivf_device_build
from lotus_tpu.ops.flat import flat_search
from lotus_tpu.ops.pallas_ivf import ivf_search_pallas

say = lambda m: print(m, flush=True)  # noqa: E731
built = synth_ivf_device_build(
    n=10 * 2**20, d=768, nlist=4096, n_clusters=65536, chunk=2**18,
    queries_b=4096, gt_queries=256, k=10, seed=0, log=lambda m: None,
)
state, xq = built["state"], built["queries"]
say(f"build: {built['build_vecs_per_s']:,.0f} vecs/s {built['timings']}")
xq_dev = jnp.asarray(xq, jnp.float32)
B = xq.shape[0]


def bench(label, fn):
    out = fn(xq_dev)  # compile + warm
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        q = xq_dev
        for _ in range(3):
            out = fn(q)
            lead = out[0] if isinstance(out, tuple) else out
            q = xq_dev + 0.0 * lead[:, :1].astype(jnp.float32)
        jax.block_until_ready(q)
        best = min(best, (time.perf_counter() - t0) / 3)
    say(f"{label}: {B / best:,.0f} QPS ({best * 1e3:.1f} ms/batch)")
    return best


full = bench("full (nprobe=256, rescore=32, qc=2048)", lambda q: ivf_search_pallas(
    state, q, 10, nprobe=256, metric="ip", rescore=32, int8_queries=True, query_chunk=2048))
nores = bench("no rescore, k=10", lambda q: ivf_search_pallas(
    state, q, 10, nprobe=256, metric="ip", rescore=None, int8_queries=True, query_chunk=2048))
nores32 = bench("no rescore, k=32", lambda q: ivf_search_pallas(
    state, q, 32, nprobe=256, metric="ip", rescore=None, int8_queries=True, query_chunk=2048))
coarse = bench("coarse ranking only (flat over 4096 centroids)", lambda q: flat_search(
    state["centroids"], q, 256, metric="ip"))
qc1024 = bench("full, qc=1024", lambda q: ivf_search_pallas(
    state, q, 10, nprobe=256, metric="ip", rescore=32, int8_queries=True, query_chunk=1024))

say(f"rescore cost: {(full - nores32) * 1e3:.1f} ms/batch "
    f"(k=32 probe vs k=32 probe + exact re-rank)")
say(f"k 10->32 probe cost: {(nores32 - nores) * 1e3:.1f} ms/batch")
say(f"coarse share: {coarse / full * 100:.0f}%")
