"""Round-4l: decompose the coarse-nlist recall ceiling into coverage vs rest.

r4k showed the foldless window probe matches the Pallas grouped probe at
nlist=3072 (0.9484 vs 0.9469 @ nprobe=156, no rescore) — the fold is NOT
dropping candidates at coarse shapes.  This measures the other mechanism
directly: COVERAGE = the fraction of exact-f32 top-10 rows whose assigned
list is among the query's top-nprobe coarse lists.  Rows outside probed
lists are unreachable no matter how exact the scoring, so

    recall(nprobe) <= coverage(nprobe)

and (coverage - recall) bounds the quantization/rank-flip loss.  If
coverage itself sits at the observed ~0.976 ceiling, the loss is
assignment physics (centroid boundary splitting) and no probe-side fix
can recover it at that shape.
"""
import sys

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

from lotus_tpu.ops.bench_data import synth_ivf_device_build

say = lambda m: print(m, flush=True)  # noqa: E731
K = 10
nlist = int(sys.argv[1]) if len(sys.argv) > 1 else 3072
nprobes = [int(v) for v in (sys.argv[2:] or ["112", "156", "208", "256", "384", "512"])]

built = synth_ivf_device_build(
    n=10 * 2**20, d=768, nlist=nlist, n_clusters=65536, chunk=2**18,
    queries_b=256, gt_queries=256, k=K, seed=0, log=lambda m: None, refine=False,
)
state, xq, gt = built["state"], built["queries"], built["gt"]

row_ids = np.asarray(state["ivf_row_ids"])  # (slots,) global id per slot, -1 pad
starts = np.asarray(state["ivf_list_start"])  # (nlist,) CSR starts
say(f"nlist={nlist}: slots={row_ids.shape[0]:,} window={state['meta'].get('probe_window')}")

# list of each global row: slot -> list via searchsorted on CSR starts.
slot_list = np.searchsorted(starts, np.arange(row_ids.shape[0]), side="right") - 1
n_rows = int(row_ids.max()) + 1
row_list = np.full(n_rows, -1, np.int64)
live = row_ids >= 0
row_list[row_ids[live]] = slot_list[live]
gt_lists = row_list[gt]  # (q, K) list of each true-top row

# Coarse ranking exactly as the probe does it: f32 q @ centroids.T.
cent = jnp.asarray(state["centroids"], jnp.float32)
scores = jnp.asarray(xq[: gt.shape[0]], jnp.float32) @ cent.T
order = np.asarray(jnp.argsort(-scores, axis=1))  # (q, nlist) best-first

rank_of_list = np.empty_like(order)
np.put_along_axis(rank_of_list, order, np.arange(nlist)[None, :].repeat(order.shape[0], 0), axis=1)
gt_rank = np.take_along_axis(rank_of_list, gt_lists, axis=1)  # coarse rank of each GT row's list

for nprobe in nprobes:
    cov = float(np.mean(gt_rank < nprobe))
    say(f"  nprobe={nprobe:4d}: coverage@{K}={cov:.4f}")
say(f"  median coarse rank of a GT row's list: {int(np.median(gt_rank))}; "
    f"p99={int(np.percentile(gt_rank, 99))}; max={int(gt_rank.max())}")
