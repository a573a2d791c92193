"""One-process comparison: Pallas probe (bf16 + int8) vs exhaustive scan."""
import json
import os
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np
import jax.numpy as jnp

from lotus_tpu.ops.flat import flat_search
from lotus_tpu.ops.io import read_meta
from lotus_tpu.ops.ivf import load_ivf_state, ivf_search
from lotus_tpu.ops.pallas_ivf import ivf_search_pallas

CACHE = "/tmp/pallas_bench_cache"
emb = np.load(f"{CACHE}/emb.npy", mmap_mode="r")
xq_np = np.load(f"{CACHE}/xq.npy")
i_ex = np.load(f"{CACHE}/i_ex.npy")
B, K, NPROBE = xq_np.shape[0], 10, 16
xq = jnp.asarray(xq_np)

idx_dir = "/tmp/pallas_ivf_1m"
meta = read_meta(idx_dir)


def rec(i_got):
    i_got = np.asarray(i_got)
    return float(np.mean([len(set(i_got[i]) & set(i_ex[i])) / K for i in range(B)]))


def time_chained(fn, iters=10, trials=3):
    best = float("inf")
    for _ in range(trials):
        q = xq
        t0 = time.time()
        for _ in range(iters):
            d, _ = fn(q)
            q = xq + 0.0 * d[:, :1]
        float(jnp.sum(d[:, 0]))
        best = min(best, (time.time() - t0) / iters)
    return best


results = {}

# 1) Pallas probe, bf16 storage
state = load_ivf_state(idx_dir, meta, jnp.bfloat16)
state["meta"] = meta
fn_pl = lambda q: ivf_search_pallas(state, q, K, nprobe=NPROBE, metric="ip")
_, i_pl = fn_pl(xq)
results["pallas_bf16"] = {"recall": round(rec(i_pl), 4)}
results["pallas_bf16"]["qps"] = round(B / time_chained(fn_pl), 1)
print("pallas_bf16:", results["pallas_bf16"], flush=True)

# 2) Exhaustive approx scan on optimal 2^20 layout, same process
xb = jnp.asarray(np.ascontiguousarray(emb), dtype=jnp.bfloat16)
fn_scan = lambda q: flat_search(xb, q, K, metric="ip", approx=True, recall_target=0.95)
_, i_s = fn_scan(xq)
results["scan_rt95"] = {"recall": round(rec(i_s), 4)}
results["scan_rt95"]["qps"] = round(B / time_chained(fn_scan), 1)
print("scan_rt95:", results["scan_rt95"], flush=True)
del xb

# 3) Pallas probe, int8 storage
del state["ivf_vectors"]
state8 = load_ivf_state(idx_dir, meta, jnp.int8)
state8["meta"] = meta
t0 = time.time()
fn_q = lambda q: ivf_search_pallas(state8, q, K, nprobe=NPROBE, metric="ip")
_, i_q = fn_q(xq)
print(f"int8 first call {time.time()-t0:.1f}s", flush=True)
results["pallas_int8"] = {"recall": round(rec(i_q), 4)}
results["pallas_int8"]["qps"] = round(B / time_chained(fn_q), 1)
print("pallas_int8:", results["pallas_int8"], flush=True)

print(json.dumps(results), flush=True)
