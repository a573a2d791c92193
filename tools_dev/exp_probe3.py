"""Round-3 probe sweep: one 10M build, many operating points.

The accumulating-probe kernel (per-bucket top-2 folded across a list's
blocks) raised nprobe=256 QPS 3.4x but cost ~0.6 recall points (whole-list
bucket collisions).  This sweep maps the (rescore, nprobe, query_chunk)
frontier on the SAME index so bench.py can pin the best >=0.99 point.

Usage: python tools_dev/exp_probe3.py [--small]
"""

import json
import sys
import time

import numpy as np

K = 10


def main() -> None:
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from lotus_tpu.ops.bench_data import synth_ivf_device_build
    from lotus_tpu.ops.common import fetch_int32
    from lotus_tpu.ops.pallas_ivf import ivf_search_pallas

    say = lambda m: print(m, file=sys.stderr, flush=True)  # noqa: E731
    small = "--small" in sys.argv
    cfg = (
        dict(n=2**21, d=768, nlist=1024, n_clusters=8192, chunk=2**19, queries_b=4096)
        if small
        else dict(n=10 * 2**20, d=768, nlist=4096, n_clusters=65536, chunk=2**18, queries_b=4096)
    )
    built = synth_ivf_device_build(**cfg, gt_queries=256, k=K, seed=0, log=say)
    state, xq, gt = built["state"], built["queries"], built["gt"]
    say(f"build: {built['build_vecs_per_s']:,.0f} vecs/s")
    xq_dev = jnp.asarray(xq, dtype=jnp.float32)
    b = xq.shape[0]

    import os
    grid_env = os.getenv("PROBE3_GRID")
    grid = (
        [dict(zip(("nprobe", "rescore", "query_chunk"), map(int, row.split(","))))
         for row in grid_env.split(";")]
        if grid_env
        else [
            dict(nprobe=256, rescore=32, query_chunk=2048),
            dict(nprobe=192, rescore=32, query_chunk=2048),
            dict(nprobe=128, rescore=32, query_chunk=2048),
            dict(nprobe=64, rescore=32, query_chunk=2048),
        ]
    )
    for g in grid:
        def search(q, g=g):
            return ivf_search_pallas(
                state, q, K, nprobe=g["nprobe"], metric="ip", rescore=g["rescore"],
                int8_queries=True, query_chunk=g["query_chunk"],
            )

        try:
            d0, i0 = search(xq_dev)
            got = fetch_int32(i0)
        except Exception as e:  # OOM etc: report and continue
            say(f"{g} -> FAILED {type(e).__name__}: {str(e)[:200]}")
            continue
        sub = gt.shape[0]
        recall = float(np.mean([len(set(got[i]) & set(gt[i])) / K for i in range(sub)]))

        iters = 8
        per_call = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            q = xq_dev
            for _ in range(iters):
                dists, _ = search(q)
                q = xq_dev + 0.0 * dists[:, :1]
            float(np.asarray(dists[0, 0]))
            per_call = min(per_call, (time.perf_counter() - t0) / iters)
        print(json.dumps({**g, "qps": round(b / per_call, 1), "recall@10": round(recall, 4)}), flush=True)


if __name__ == "__main__":
    main()
