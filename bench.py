"""Benchmark: BASELINE config 4 — IVF-Flat at 10M x 768-d on one chip.

Primary metric: large-batch IVF search QPS/chip (Pallas grouped probe over
int8 storage) with recall@10 measured against the EXACT FLOAT32 ground
truth over the unquantised corpus — the composite number BASELINE config 4
asks for (>= 0.99 recall at equal-or-less memory, >= 10x CPU faiss).

The corpus (10.49M x 768 clustered unit vectors) is defined by a PRNG seed
and built ON DEVICE each run (lotus_tpu/ops/bench_data.py): the dev host's
1 slow core and ~2 MB/s tunnel make shipping a 30 GB corpus impossible, and
the on-device rebuild doubles as the honest build-throughput measurement
(configs 3-4 "build vecs/sec").  Only queries/ground-truth/assignment
(a few MB) ever cross the tunnel.

Timing: the tunnel costs ~40 ms per host<->device roundtrip and async
dispatch makes naive timing wrong by up to 50x; searches are chained with a
data dependency and one scalar is fetched at the end (min of 3 trials).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
"""

import json
import os
import sys
import time

import numpy as np

K = 10
NPROBE = int(os.getenv("BENCH_NPROBE", "208"))
B = 4096


MODEL_CPU_SGEMM_FLOPS = 50e9  # generous single-core sgemm rate for the faiss model
MODEL_CPU_CORES = 16          # multi-core model: faiss IVF search threads well


def _modeled_cpu_faiss_qps(n_total: int, d: int, nprobe: int, nlist: int, cores: int = 1) -> float:
    """CPU faiss IVF-Flat model: per query it scans ~nprobe/nlist of the
    corpus at an (assumed healthy) 50 GFLOP/s-per-core sgemm rate, scaled
    by ``cores`` (faiss IVF search is embarrassingly parallel over
    queries).  A model is used because this dev host's CPU measures ~100x
    below a normal core, which would inflate vs_baseline absurdly;
    50 GFLOP/s/core is GENEROUS to faiss.  The headline ``vs_baseline``
    uses the 16-core model (the conservative, skeptic-proof framing); the
    single-core model is recorded alongside."""
    rows = n_total * nprobe / max(nlist, 1)
    return cores * MODEL_CPU_SGEMM_FLOPS / (2.0 * rows * d)


def _cpu_baseline_qps(xq: np.ndarray, xb_sample: np.ndarray, n_total: int) -> float:
    """Measured single-threaded numpy brute force on a device-fetched
    sample, scaled to N (recorded for transparency; this host's core is
    pathologically slow, so the headline vs_baseline uses the model above)."""
    nq = min(256, xq.shape[0])
    t0 = time.perf_counter()
    scores = xq[:nq] @ xb_sample.T
    np.argpartition(-scores, K, axis=1)[:, :K]
    dt = (time.perf_counter() - t0) * (n_total / xb_sample.shape[0])
    return nq / dt


def main() -> None:
    import jax

    repo = os.path.dirname(os.path.abspath(__file__))
    jax.config.update("jax_compilation_cache_dir", os.path.join(repo, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from lotus_tpu.ops.bench_data import _gen_chunk, synth_ivf_device_build
    from lotus_tpu.ops.pallas_ivf import ivf_search_pallas

    on_tpu = jax.devices()[0].platform != "cpu"
    scale_cfg = (
        dict(n=10 * 2**20, d=768, nlist=4096, n_clusters=65536, chunk=2**18, queries_b=B)
        if on_tpu
        else dict(n=2**15, d=64, nlist=64, n_clusters=48, chunk=2**13, queries_b=256)
    )

    say = lambda m: print(m, file=sys.stderr, flush=True)  # noqa: E731
    if on_tpu:
        # Prewarm the build's device programs (corpus-gen chunk, k-means
        # steps, fused scan step) on a 2-chunk corpus with IDENTICAL chunk
        # shapes: the axon compile helper re-processes each program once
        # per process even on a persistent-cache hit (measured 100s+ on the
        # first scan execution), which would otherwise be billed to the
        # build throughput below.  Steady-state build is the honest number.
        say("prewarm: 2-chunk build (same program shapes)")
        synth_ivf_device_build(
            **{**scale_cfg, "n": 2 * scale_cfg["chunk"]},
            gt_queries=16, k=K, seed=1, log=lambda m: None,
        )
    built = synth_ivf_device_build(**scale_cfg, gt_queries=256, k=K, seed=0, log=say)
    state, xq, gt = built["state"], built["queries"], built["gt"]
    n, d = scale_cfg["n"], scale_cfg["d"]
    say(f"build: {built['build_vecs_per_s']:,.0f} vecs/s ({built['build_seconds']:.0f}s) {built['timings']}")

    xq_dev = jnp.asarray(xq, dtype=jnp.float32)
    b = xq.shape[0]
    nprobe = min(NPROBE, scale_cfg["nlist"])

    def search(q):
        return ivf_search_pallas(state, q, K, nprobe=nprobe, metric="ip", interpret=not on_tpu, rescore=24, int8_queries=on_tpu, query_chunk=2048 if on_tpu else None)

    from lotus_tpu.ops.common import fetch_int32

    d0, i0 = search(xq_dev)  # compile + warm
    got = fetch_int32(i0)

    sub = gt.shape[0]
    recall = float(np.mean([len(set(got[i]) & set(gt[i])) / K for i in range(sub)]))

    ITERS = 10
    per_call = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        q = xq_dev
        for _ in range(ITERS):
            dists, _ = search(q)
            q = xq_dev + 0.0 * dists[:, :1]  # data dependency defeats async overlap
        float(np.asarray(dists[0, 0]))  # single roundtrip fetch
        per_call = min(per_call, (time.perf_counter() - t0) / ITERS)
    qps = b / per_call

    # Measured host baseline (transparency only) + modeled healthy-CPU faiss.
    centers = jax.random.normal(jax.random.PRNGKey(12345), (scale_cfg["n_clusters"], d), jnp.float32)
    sample = np.asarray(
        _gen_chunk(jax.random.PRNGKey(7), centers, 16384, d, scale_cfg["n_clusters"], 2.5)
    )
    host_qps = _cpu_baseline_qps(xq, sample, n)
    cpu_qps_1c = _modeled_cpu_faiss_qps(n, d, nprobe, scale_cfg["nlist"])
    cpu_qps_mc = _modeled_cpu_faiss_qps(n, d, nprobe, scale_cfg["nlist"], cores=MODEL_CPU_CORES)

    print(
        json.dumps(
            {
                "metric": f"ivf_search_qps_per_chip_{n // 2**20}Mi_{d}d_b{b}_k10_nprobe{nprobe}",
                "value": round(qps, 1),
                "unit": "queries/sec",
                "vs_baseline": round(qps / cpu_qps_mc, 2),
                "recall_at_10_vs_exact_f32": round(recall, 4),
                "cpu_model_qps_16core_50gflops": round(cpu_qps_mc, 1),
                "cpu_model_qps_1core_50gflops": round(cpu_qps_1c, 1),
                "cpu_host_measured_qps": round(host_qps, 2),
                "build_vecs_per_s": round(built["build_vecs_per_s"], 1),
                "storage": "residual int8 + int4 refinement, exact top-24 rescoring",
            }
        )
    )


if __name__ == "__main__":
    main()
