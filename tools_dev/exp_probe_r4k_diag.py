"""Round-4k: discriminate the coarse-nlist recall ceiling.

r4g-j: recall ceilings of 0.977 (nlist=2048) / 0.976 (3072) flat across
nprobe, BUCKET, and rescore.  Two candidate mechanisms:
  (a) probe-side: the grouped fold drops true-top candidates;
  (b) store-side: assignment/quantization physics of the coarser shape.
The window probe (ivf_search) has NO fold — it scores every row of every
probed list and keeps an exact top-k.  Same store, same queries, both
WITHOUT rescore (quantization noise hits both paths identically, and the
f32 rescore gather OOMs next to the resident 10M store): if the window
probe also caps at the ceiling, the loss is (b); if it lands well above
the Pallas number, the fold is dropping candidates (a).
"""
import sys

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
nlist = int(sys.argv[1]) if len(sys.argv) > 1 else 3072
nprobe = int(sys.argv[2]) if len(sys.argv) > 2 else 156

built = synth_ivf_device_build(
    n=10 * 2**20, d=768, nlist=nlist, n_clusters=65536, chunk=2**18,
    queries_b=256, gt_queries=256, k=K, seed=0, log=lambda m: None, refine=False,
)
state, xq, gt = built["state"], built["queries"], built["gt"]
say(f"nlist={nlist}: window={state['meta'].get('probe_window')} "
    f"max_list={state['meta'].get('max_list_size')}")
xq_dev = jnp.asarray(xq[:256], jnp.float32)


def rec(idx):
    got = fetch_int32(idx)[: gt.shape[0]]
    return float(np.mean([len(set(got[i]) & set(gt[i])) / K for i in range(gt.shape[0])]))


# Pallas grouped probe, no rescore.
_, i_p = ivf_search_pallas(state, xq_dev, K, nprobe=nprobe, metric="ip",
                           rescore=None, int8_queries=False, query_chunk=256)
say(f"pallas probe  nprobe={nprobe} (no rescore): recall@10={rec(i_p):.4f}")

# Window probe (foldless oracle of the store), no rescore.
_, i_w = ivf_search(state, xq_dev, K, nprobe=nprobe, metric="ip")
say(f"window probe  nprobe={nprobe} (no rescore): recall@10={rec(i_w):.4f}")

# Full-coverage window probe: the store's absolute ceiling (quantization
# + assignment only, zero probe-selection loss).
_, i_full = ivf_search(state, xq_dev, K, nprobe=nlist, metric="ip")
say(f"window probe  nprobe=nlist (no rescore): recall@10={rec(i_full):.4f}")
