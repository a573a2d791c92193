"""Round-4g: centroid-count (nlist) shape sweep at the 10M operating point.

The probe is within ~25% of its per-stage floors at nlist=4096
(docs/benchmarks.md attribution); the remaining lever is the SHAPE.
Several epilogue stages scale with b*nprobe (pair grouping, query layout,
tables) or nprobe*kc (reassembly pool), while the kernel's DMA floor
scales with the scanned fraction nprobe/nlist.  Fewer, larger lists reach
the same scanned fraction at a smaller nprobe — cheaper epilogue, same
kernel DMA — at the cost of a coarser partition (recall).  This measures
where the frontier actually sits: nlist in {2048, 4096, 8192} x nprobe
around an equal-scan-fraction match.
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


def run_config(nlist, nprobes):
    built = synth_ivf_device_build(
        n=10 * 2**20, d=768, nlist=nlist, n_clusters=65536, chunk=2**18,
        queries_b=B, gt_queries=256, k=K, seed=0, log=lambda m: None,
    )
    say(f"nlist={nlist}: build {built['build_vecs_per_s']:,.0f} vecs/s {built['timings']}")
    state, xq, gt = built["state"], built["queries"], built["gt"]
    xq_dev = jnp.asarray(xq, jnp.float32)

    for nprobe in nprobes:
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
        say(f"  nlist={nlist} nprobe={nprobe}: {B / best:,.0f} QPS, recall@10={rec:.4f}  (scan {nprobe/nlist:.3%})")
    del built, state
    return


import sys

which = sys.argv[1] if len(sys.argv) > 1 else "all"
if which in ("all", "2048"):
    run_config(2048, [96, 104, 112, 128])
if which in ("all", "8192"):
    run_config(8192, [352, 416, 480])
if which in ("all", "4096"):
    run_config(4096, [208])  # control point
