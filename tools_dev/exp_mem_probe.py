"""Measure actual HBM after build and probe at increasing sizes."""
import gc
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np
from lotus_tpu.ops.bench_data import synth_ivf_device_build
from lotus_tpu.ops.common import fetch_int32
from lotus_tpu.ops.pallas_ivf import ivf_search_pallas

def mem(tag):
    st = jax.local_devices()[0].memory_stats()
    if st:
        print(f"{tag}: in_use={st.get('bytes_in_use',0)/2**30:.2f}G peak={st.get('peak_bytes_in_use',0)/2**30:.2f}G limit={st.get('bytes_limit',0)/2**30:.2f}G", flush=True)
    else:
        print(f"{tag}: no stats", flush=True)

mem("start")
built = synth_ivf_device_build(n=10 * 2**20, d=768, nlist=4096, n_clusters=65536,
                               chunk=2**18, queries_b=4096, gt_queries=256, k=10, spill_frac=0.10,
                               seed=0, log=lambda m: print(m, flush=True))
state, xq, gt = built["state"], built["queries"], built["gt"]
gc.collect()
mem("after build")
tot = 0
for a in jax.live_arrays():
    nb = a.size * a.dtype.itemsize
    tot += nb
    if nb > 50 * 2**20:
        print(f"  live {a.shape} {a.dtype} {nb/2**30:.2f}G", flush=True)
print(f"  TOTAL live {tot/2**30:.2f}G", flush=True)
for gb in (2.0, 1.5, 1.0, 0.5, 0.25):
    try:
        z = jnp.zeros((int(gb * 2**28),), jnp.float32)
        z.block_until_ready()
        print(f"alloc {gb}G OK", flush=True)
        del z
        break
    except Exception:
        print(f"alloc {gb}G FAILED", flush=True)
xq_dev = jnp.asarray(xq, jnp.float32)
for qc, npb in ((256, 8),):
    try:
        for tag, kw in (
            ("plain-i8", dict(int8_queries=True)),
            ("plain-bf16", dict()),
            ("rescore-i8", dict(int8_queries=True, rescore=32)),
        ):
            try:
                d_, i_ = ivf_search_pallas(state, xq_dev, 10, nprobe=npb, metric="ip", query_chunk=qc, **kw)
                got = fetch_int32(i_)[:256]
                rec = float(np.mean([len(set(got[i]) & set(gt[i])) / 10 for i in range(256)]))
                print(f"{tag} qc={qc} np={npb}: recall={rec:.4f}", flush=True)
            except Exception as e:
                print(f"{tag} qc={qc} np={npb} FAILED: {str(e)[:200]}", flush=True)
    except Exception as e:
        print(f"outer FAILED: {str(e)[:300]}", flush=True)
