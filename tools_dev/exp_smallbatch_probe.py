"""Round-5c: small-batch probe shootout — window probe vs grouped Pallas
probe with the tightened static grid bound (u_max <= p*max_blocks).

The window probe gathers a (B, nprobe*window, d) slab per chunk — 2.5 GB at
B=64 on a 200k f32 store, measured 90 ms device-side.  The grouped kernel
was planner-blocked below b*nprobe >= nlist only because its old grid bound
parked ~rows/BL units at small p.  Device-side timing via on-device chains
(dispatch floor cancelled; state rides as jit ARGUMENTS — baked constants
413 the axon remote-compile); recall vs exact f32 oracle.
"""
import functools
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

from lotus_tpu.ops.bench_data import synth_ivf_device_build
from lotus_tpu.ops.common import fetch_int32
from lotus_tpu.ops.ivf import ivf_search
from lotus_tpu.ops.pallas_ivf import ivf_search_pallas

say = lambda m: print(m, flush=True)  # noqa: E731
K = 10

for n, nlist, nprobe in ((2**18, 512, 32), (10 * 2**20, 4096, 208)):
    built = synth_ivf_device_build(
        n=n, d=768, nlist=nlist, n_clusters=max(64, nlist * 4), chunk=2**18,
        queries_b=256, gt_queries=128, k=K, seed=0, log=lambda m: None,
    )
    state, xq, gt = built["state"], built["queries"], built["gt"]
    # Only the BIG arrays ride as jit args (avoids the 413 payload limit);
    # small planning arrays (list_start/size etc.) must stay concrete — the
    # probe reads them on host at trace time.
    arrays = {kk: v for kk, v in state.items()
              if hasattr(v, "shape") and getattr(v, "size", 0) > (1 << 20)}
    aux = {kk: v for kk, v in state.items() if kk not in arrays}
    say(f"--- store {n} rows, nlist={nlist}, nprobe={nprobe} ---")

    def run_one(name, fn, b):
        q = jnp.asarray(xq[:b], jnp.float32)

        @functools.partial(jax.jit, static_argnums=(2,))
        def chain(arrs, qq, n_):
            def body(i, acc):
                d_, _ = fn(arrs, acc)
                return acc * (1.0 + 1e-30 * d_[0, 0])
            return jax.lax.fori_loop(0, n_, body, qq)

        d_, i_ = fn(arrays, q)
        got = fetch_int32(i_)
        sub = min(b, gt.shape[0])
        rec = float(np.mean([len(set(got[i]) & set(gt[i])) / K for i in range(sub)]))
        np.asarray(chain(arrays, q, 1)); np.asarray(chain(arrays, q, 51))
        walls = {}
        for n_ in (1, 51):
            best = float("inf")
            for _ in range(4):
                t0 = time.perf_counter(); np.asarray(chain(arrays, q, n_))
                best = min(best, time.perf_counter() - t0)
            walls[n_] = best
        per = (walls[51] - walls[1]) / 50 * 1e3
        say(f"  {name:28s} B={b:3d}: {per:8.3f} ms/call, recall@10={rec:.4f}")

    def window_fn(arrs, q):
        return ivf_search({**aux, **arrs}, q, K, nprobe=nprobe, metric="ip", rescore=24)

    def pallas_fn(arrs, q):
        return ivf_search_pallas({**aux, **arrs}, q, K, nprobe=nprobe, metric="ip",
                                 rescore=24, int8_queries=True)

    for b in (1, 16, 64):
        run_one("window probe", window_fn, b)
        run_one("grouped pallas (tight bound)", pallas_fn, b)
