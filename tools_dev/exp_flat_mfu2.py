"""MFU probe #2: where do the missing FLOPs go?

(a) pure matmul+max (no top-k) at the scan shape = the compute ceiling
(b) approx_max_k on top = the reduce overhead
(c) transposed (d, N) database layout
(d) bigger blocks with bf16 queries
"""
import functools
import time

import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

from lotus_tpu.ops import flat_search

N, D, B, K = 1 << 20, 768, 4096, 10
rng = np.random.default_rng(0)
xb = rng.standard_normal((N, D), dtype=np.float32)
xb /= np.linalg.norm(xb, axis=1, keepdims=True)
xq = xb[rng.integers(0, N, B)] + 0.05 * rng.standard_normal((B, D), dtype=np.float32)
xq /= np.linalg.norm(xq, axis=1, keepdims=True)
xb16 = jnp.asarray(xb, dtype=jnp.bfloat16)
xq16 = jnp.asarray(xq, dtype=jnp.bfloat16)
xbT16 = jnp.asarray(xb.T, dtype=jnp.bfloat16)  # (d, N)

gt = np.load("/tmp/exp_flat_gt.npy") if __import__("os").path.exists("/tmp/exp_flat_gt.npy") else None
if gt is None:
    gt = np.argsort(-(xq[:128] @ xb.T), axis=1)[:, :K]
    np.save("/tmp/exp_flat_gt.npy", gt)

def timeit(fn, feedback, label, recall_ids=None):
    out = fn(xq16)
    if recall_ids is not None:
        got = np.asarray(recall_ids(out))
        rec = float(np.mean([len(set(got[i]) & set(gt[i])) / K for i in range(128)]))
    else:
        rec = float("nan")
    ITERS = 8
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        q = xq16
        for _ in range(ITERS):
            out = fn(q)
            q = xq16 + feedback(out)
        jax.block_until_ready(out) if False else float(np.asarray(feedback(out)[0, 0]))
        best = min(best, (time.perf_counter() - t0) / ITERS)
    qps = B / best
    tf = qps * N * D * 2 / 1e12
    print(f"{label}: qps={qps:,.0f} recall={rec:.4f} mxu={tf:.0f} TF/s ({tf/394*100:.0f}%)", flush=True)

# (a) matmul + plain per-block max (minimal reduce; measures the matmul ceiling)
@jax.jit
def mm_max(q):
    def body(carry, blk):
        s = jnp.einsum("qd,nd->qn", q, blk, preferred_element_type=jnp.float32)
        return jnp.maximum(carry, jnp.max(s, axis=1)), None
    blocks = xb16.reshape(16, N // 16, D)
    out, _ = jax.lax.scan(body, jnp.full((B,), -1e30, jnp.float32), blocks)
    return out
timeit(lambda q: mm_max(q), lambda o: 0.0 * o[:, None].astype(jnp.bfloat16)[:, :1], "matmul+max (ceiling)")

# (a2) transposed layout: (B, d) @ (d, n_blk)
@jax.jit
def mm_max_T(q):
    def body(carry, blk):
        s = jnp.einsum("qd,dn->qn", q, blk, preferred_element_type=jnp.float32)
        return jnp.maximum(carry, jnp.max(s, axis=1)), None
    blocks = jnp.moveaxis(xbT16.reshape(D, 16, N // 16), 1, 0)
    out, _ = jax.lax.scan(body, jnp.full((B,), -1e30, jnp.float32), blocks)
    return out
timeit(lambda q: mm_max_T(q), lambda o: 0.0 * o[:, None].astype(jnp.bfloat16)[:, :1], "matmul+max transposed")

# (b) matmul + approx_max_k per block (the current production path, bf16 q)
for blk in (65536, 131072, 262144):
    f = lambda q, blk=blk: flat_search(xb16, q, K, metric="ip", block_rows=blk, approx=True, recall_target=0.95)
    timeit(f, lambda o: 0.0 * o[0][:, :1].astype(jnp.bfloat16), f"scan+approx blk={blk} bf16q", recall_ids=lambda o: o[1])

# (c) exact top_k per block for contrast
f = lambda q: flat_search(xb16, q, K, metric="ip", block_rows=65536, approx=False)
timeit(f, lambda o: 0.0 * o[0][:, :1].astype(jnp.bfloat16), "scan+exact blk=65536 bf16q", recall_ids=lambda o: o[1])
