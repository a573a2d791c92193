"""MFU probe #3 (on-device data): where do the flat-scan FLOPs go?

(a) pure matmul+max = the compute ceiling at the scan shape
(b) matmul + approx_max_k (the production path) at several block sizes
(c) int8 x int8 scan rate
"""
import time

import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

from lotus_tpu.ops.flat import flat_search
from lotus_tpu.ops.quant import quantize_rows

N, D, B, K = 1 << 20, 768, 4096, 10
key = jax.random.PRNGKey(0)
xb32 = jax.random.normal(key, (N, D), jnp.float32)
xb32 = xb32 / jnp.linalg.norm(xb32, axis=1, keepdims=True)
xq32 = xb32[:B] + 0.05 * jax.random.normal(jax.random.PRNGKey(1), (B, D), jnp.float32)
xq32 = xq32 / jnp.linalg.norm(xq32, axis=1, keepdims=True)
xb16 = xb32.astype(jnp.bfloat16)
xq16 = xq32.astype(jnp.bfloat16)
q8, q8s = quantize_rows(xq32)
xb8, xb8s = quantize_rows(xb32)
xb8.block_until_ready()

def timeit(fn, label, peak_tf=394.0, feed=None):
    """Chained timing: block_until_ready is unreliable through the axon
    tunnel, so iterations are chained by a data dependency on the previous
    output and ONE scalar is fetched at the end (min of 3 trials)."""
    out = fn(xq16)
    float(np.asarray((feed or (lambda o: o))(out)).ravel()[0])
    ITERS = 8
    best = float("inf")
    get = feed or (lambda o: o)
    for _ in range(3):
        t0 = time.perf_counter()
        q = xq16
        o = None
        for _ in range(ITERS):
            o = fn(q)
            q = xq16 + 0.0 * get(o).ravel()[0].astype(jnp.bfloat16)
        float(np.asarray(get(o)).ravel()[0])
        best = min(best, (time.perf_counter() - t0) / ITERS)
    qps = B / best
    tf = qps * N * D * 2 / 1e12
    print(f"{label}: qps={qps:,.0f} mxu={tf:.0f} TF/s ({tf/peak_tf*100:.0f}% of {peak_tf:.0f})", flush=True)

# (a) matmul + per-block max in a scan: the fused compute ceiling.
# Arrays are ARGUMENTS, not closures — a closed-over 1.5 GB array becomes a
# lowered constant that ships to the remote compiler over the tunnel.
@jax.jit
def mm_max(q, db):
    def body(carry, blk):
        s = jnp.einsum("qd,nd->qn", q, blk, preferred_element_type=jnp.float32)
        return jnp.maximum(carry, jnp.max(s, axis=1)), None
    out, _ = jax.lax.scan(body, jnp.full((B,), -1e30, jnp.float32), db.reshape(16, N // 16, D))
    return out
timeit(lambda q: mm_max(q, xb16), "bf16 matmul+max ceiling")

# (b) production scan at block sizes
for blk in (65536, 131072, 262144):
    timeit(lambda q, blk=blk: flat_search(xb16, q, K, metric="ip", block_rows=blk, approx=True, recall_target=0.95),
           f"bf16 scan+approx blk={blk}", feed=lambda o: o[0])

# (c) int8 x int8
@jax.jit
def mm_max8(q, db):
    def body(carry, blk):
        s = jnp.einsum("qd,nd->qn", q.astype(jnp.int32), blk.astype(jnp.int32), preferred_element_type=jnp.int32)
        return jnp.maximum(carry, jnp.max(s, axis=1)), None
    out, _ = jax.lax.scan(body, jnp.full((B,), -2**30, jnp.int32), db.reshape(16, N // 16, D))
    return out
timeit(lambda q: mm_max8(q8, xb8) + 0 * q[0, 0].astype(jnp.int32), "int8 matmul+max ceiling", peak_tf=788.0)
timeit(lambda q: flat_search(xb8, q.astype(jnp.float32), K, metric="ip", block_rows=131072, approx=True, recall_target=0.95, xb_scales=xb8s),
       "int8 scan+approx blk=131072", peak_tf=788.0, feed=lambda o: o[0])
