"""BL=1024 arm: same per-lane list coverage (BUCKET scales with BL, so
collision statistics and candidate counts are IDENTICAL to production
BL=512/BUCKET=8), but half the grid steps and double-size DMA blocks.
Isolates per-grid-step overhead.  Baseline arm runs first and last to
bound tunnel drift."""
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
B, K = 4096, 10


def build(block):
    return synth_ivf_device_build(
        n=10 * 2**20, d=768, nlist=4096, n_clusters=65536, chunk=2**18,
        queries_b=B, gt_queries=256, k=K, seed=0, log=lambda m: None,
        block_align=block,
    )


def measure(tag, built, nprobe):
    state, xq, gt = built["state"], built["queries"], built["gt"]
    xq_dev = jnp.asarray(xq, jnp.float32)

    def search(q):
        return pivf.ivf_search_pallas(
            state, q, K, nprobe=nprobe, metric="ip", rescore=32,
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
    say(f"{tag} nprobe={nprobe}: {B / best:,.0f} QPS, recall@10={rec:.4f}")


def set_bl(bl, bucket):
    pivf.BL, pivf.BUCKET = bl, bucket
    pivf._VBITS = pivf.BL.bit_length()
    pivf._VMASK = (1 << pivf._VBITS) - 1
    jax.clear_caches()


b512 = build(512)
say(f"build512: {b512['build_vecs_per_s']:,.0f} vecs/s")
measure("BL=512/BUCKET=8 (baseline)", b512, 256)
del b512  # free ~11.5 GB of device state before the second build
jax.clear_caches()

set_bl(1024, 16)
b1024 = build(1024)
say(f"build1024: {b1024['build_vecs_per_s']:,.0f} vecs/s")
measure("BL=1024/BUCKET=16", b1024, 256)
measure("BL=1024/BUCKET=16", b1024, 192)
del b1024
jax.clear_caches()

set_bl(512, 8)
b512 = build(512)
measure("BL=512/BUCKET=8 (drift check)", b512, 256)
