"""Where does probe time go, kernel vs XLA plumbing?

The fold shootout showed the fold epilogue is no longer dominant (top1/8
at ~1/3 the fold ops gains only 6% QPS), the QU sweep ruled out per-step
fixed overhead and DMA (QU=256 halves steps AND xq DMA — a wash).  This
experiment splits the no-rescore probe with the `_DEBUG_STAGE` knob:

  stage 1: kernel output replaced by zeros  -> XLA side only
           (pair tables, query layout gather, reassembly, final top-k)
  stage 2: return right after the kernel    -> kernel side only
           (tables + query layout + grid + DMA + dot + fold)
  stage 0: full path

kernel ~= full - stage1's reassembly share; the two should roughly add.
"""
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

import lotus_tpu.ops.pallas_ivf as pivf
from lotus_tpu.ops.bench_data import synth_ivf_device_build

say = lambda m: print(m, flush=True)  # noqa: E731
built = synth_ivf_device_build(
    n=10 * 2**20, d=768, nlist=4096, n_clusters=65536, chunk=2**18,
    queries_b=4096, gt_queries=256, k=10, seed=0, log=lambda m: None,
)
state, xq = built["state"], built["queries"]
say(f"build: {built['build_vecs_per_s']:,.0f} vecs/s")
xq_dev = jnp.asarray(xq, jnp.float32)
B = xq.shape[0]


def bench(label, fn):
    out = fn(xq_dev)
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


def probe(q, rescore=None, k=10):
    return pivf.ivf_search_pallas(
        state, q, k, nprobe=208, metric="ip", rescore=rescore,
        int8_queries=True, query_chunk=2048,
    )


full = bench("full (rescore=32)", lambda q: probe(q, rescore=32))
nores = bench("stage0: no rescore, k=10", lambda q: probe(q))

for stage, label in ((1, "stage1: XLA plumbing only (zeroed kernel)"),
                     (2, "stage2: kernel only (no reassembly/top-k)"),
                     (3, "stage3: tables + query layout + coarse only"),
                     (4, "stage4: coarse ranking only"),
                     (5, "stage5: coarse + pair grouping"),
                     (6, "stage6: coarse + grouping + query layout")):
    pivf._DEBUG_STAGE = stage
    jax.clear_caches()
    try:
        bench(label, lambda q: probe(q))
    finally:
        pivf._DEBUG_STAGE = 0
jax.clear_caches()
