"""Pallas streaming flat scan vs the XLA scan at 1M x 768 on TPU."""
import time

import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

from lotus_tpu.ops.flat import flat_search
from lotus_tpu.ops.pallas_flat import flat_search_pallas
from lotus_tpu.ops.quant import quantize_rows

N, D, B, K = 1 << 20, 768, 4096, 10
key = jax.random.PRNGKey(0)
xb32 = jax.random.normal(key, (N, D), jnp.float32)
xb32 = xb32 / jnp.linalg.norm(xb32, axis=1, keepdims=True)
xq = xb32[:B] + 0.05 * jax.random.normal(jax.random.PRNGKey(1), (B, D), jnp.float32)
xq = xq / jnp.linalg.norm(xq, axis=1, keepdims=True)
xb16 = xb32.astype(jnp.bfloat16)
xb8, xb8s = quantize_rows(xb32)
gt_s = jnp.matmul(xq[:128], xb32.T, precision=jax.lax.Precision.HIGHEST)
gt = np.asarray(jax.lax.top_k(gt_s, K)[1])
del gt_s

def timeit(fn, label, peak_tf=394.0):
    s0, i0 = fn(xq)
    got = np.asarray(jax.lax.bitcast_convert_type(i0[:128], jnp.float32)).view(np.int32)
    rec = float(np.mean([len(set(got[r]) & set(gt[r])) / K for r in range(128)]))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        q = xq
        for _ in range(8):
            s_, i_ = fn(q)
            q = xq + 0.0 * s_[:, :1]
        float(np.asarray(s_[0, 0]))
        best = min(best, (time.perf_counter() - t0) / 8)
    qps = B / best
    tf = qps * N * D * 2 / 1e12
    print(f"{label}: qps={qps:,.0f} recall={rec:.4f} mxu={tf:.0f} TF/s ({tf/peak_tf*100:.0f}%)", flush=True)

timeit(lambda q: flat_search(xb16, q.astype(jnp.bfloat16), K, metric="ip", block_rows=262144, approx=True, recall_target=0.95),
       "XLA scan bf16 blk=262144")
timeit(lambda q: flat_search_pallas(xb16, q, K), "Pallas stream bf16")
timeit(lambda q: flat_search_pallas(xb8, q, K, xb_scales=xb8s), "Pallas stream int8", peak_tf=788.0)
timeit(lambda q: flat_search_pallas(xb8, q, K, xb_scales=xb8s, int8_queries=False), "Pallas stream int8/bf16q", peak_tf=788.0)
