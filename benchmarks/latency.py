"""Interactive-latency benchmark: p50/p99 per batch size on the real chip.

The reference's primary user path is an INTERACTIVE B=1 call —
``df.sem_search`` goes straight into ``faiss.Index.search``
(``lotus/sem_ops/sem_search.py:91-157`` -> ``lotus/vector_store/faiss_vs.py:34``)
— while every published repo number so far is bulk throughput.  This suite
pins the small-batch story: p50/p99 wall latency at B in {1, 16, 64} for

- the direct ``TpuVS`` call on a Flat store (BASELINE config-1 shape) and an
  IVF store (config-4 shape, scaled by ``--spec``),
- the full ``df.sem_search`` accessor path (query embedding + store),
- the TCP serving tier (``SearchFrontEnd`` over N local ``ShardServer``s)
  vs the direct store, so the tier's added cost is a measured number.

Emits one JSON dict; ``python -m benchmarks.main latency [--spec]`` records
it.  Methodology: per-shape warmup (XLA compiles once per batch bucket),
then ``iters`` timed calls; block on results to defeat async dispatch.
"""

from __future__ import annotations

import functools
import os
import tempfile
import time
from typing import Any, Callable

import numpy as np

from benchmarks.common import make_corpus, make_queries
from lotus_tpu.vector_store import TpuVS

BATCHES = (1, 16, 64)


def _quantiles(fn: Callable[[], Any], warmup: int = 3, iters: int = 30) -> dict[str, float]:
    for _ in range(warmup):
        fn()
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        fn()
        times.append(time.perf_counter() - t0)
    arr = np.asarray(times) * 1e3
    return {
        "p50_ms": float(np.percentile(arr, 50)),
        "p99_ms": float(np.percentile(arr, 99)),
        "mean_ms": float(arr.mean()),
        "iters": iters,
    }


def _dispatch_floor(iters: int) -> dict[str, float]:
    """Host->device->host round trip for a trivial program: the per-call
    latency floor this environment imposes on EVERY interactive call (on a
    tunneled dev chip this is the tunnel RTT, ~90 ms; on local TPU hardware
    it is sub-millisecond).  Reported so device work can be read apart from
    environment overhead."""
    import jax
    import jax.numpy as jnp

    f = jax.jit(lambda x: x + 1.0)
    x = jnp.zeros((8,), jnp.float32)
    return _quantiles(lambda: np.asarray(f(x)), iters=iters)


def _bench_store(vs: TpuVS, queries: np.ndarray, k: int, iters: int) -> dict[str, Any]:
    out: dict[str, Any] = {}
    for b in BATCHES:
        q = queries[:b]
        out[f"B{b}"] = _quantiles(lambda: np.asarray(vs(q, k).indices), iters=iters)
        # Device-side per-call estimate: chain CH dependent searches in one
        # dispatch window so the per-call floor amortizes away.
        ch = 20
        qd = np.asarray(q, dtype=np.float32)

        def chained() -> None:
            prev = qd
            res = None
            for _ in range(ch):
                res = vs(prev, k)
                prev = qd  # same shape; dependency via host is fine for timing
            np.asarray(res.indices)

        t = _quantiles(chained, warmup=1, iters=max(3, iters // 6))
        out[f"B{b}"]["device_est_ms"] = round(t["p50_ms"] / ch, 3)
    return out


def _bench_accessor(df, col: str, query: str, k: int, iters: int) -> dict[str, Any]:
    # B=1 only: the accessor is inherently one query string per call.
    return {"B1": _quantiles(lambda: df.sem_search(col, query, k), iters=iters)}


def _bench_serving(vs: TpuVS, queries: np.ndarray, k: int, n_shards: int, iters: int) -> dict[str, Any]:
    from lotus_tpu.serving import SearchFrontEnd, ShardServer

    def make_fn(shard_vs: TpuVS, offset: int):
        def fn(xq: np.ndarray, kk: int):
            r = shard_vs(xq, kk)
            return np.asarray(r.distances), np.asarray(r.indices) + offset

        return fn

    servers = [ShardServer(make_fn(vs, 0)) for _ in range(n_shards)]
    for s in servers:
        s.start()
    try:
        fe = SearchFrontEnd([s.address for s in servers])
        out: dict[str, Any] = {}
        for b in BATCHES + (1024,):
            q = make_queries(np.asarray(queries), b, seed=7) if b > len(queries) else queries[:b]
            out[f"B{b}"] = _quantiles(lambda: fe.search(q, k), iters=iters)
            out[f"B{b}"]["qps"] = b / (out[f"B{b}"]["p50_ms"] / 1e3)
        fe.close()
        return out
    finally:
        for s in servers:
            s.stop()


def _device_side(fn_by_batch: dict[int, Any], reps: int = 100) -> dict[str, float]:
    """Per-search DEVICE time via an on-device fori chain: run the search
    1 and reps+1 times inside one jitted program (iterations serialized by
    an un-foldable score feedback) and difference the walls — the per-call
    dispatch floor cancels, leaving pure device work.

    Each entry is ``(search, params, q)`` with ``search(params, qq) ->
    scores``; params MUST ride as explicit jit arguments — baked-in
    constants are serialized into the remote-compile payload on tunneled
    dev chips (HTTP 413 at IVF-state sizes)."""
    import time

    import jax
    import jax.numpy as jnp

    out: dict[str, float] = {}
    for b, (search, params, q) in fn_by_batch.items():
        q = jnp.asarray(q, jnp.float32)

        @functools.partial(jax.jit, static_argnums=(2,))
        def chain(pp, qq, n, _search=search):
            def body(i, acc):
                d = _search(pp, acc)
                return acc * (1.0 + 1e-30 * d[0, 0])

            return jax.lax.fori_loop(0, n, body, qq)

        walls = {}
        np.asarray(chain(params, q, 1)), np.asarray(chain(params, q, reps + 1))
        for n in (1, reps + 1):
            best = float("inf")
            for _ in range(5):
                t0 = time.perf_counter()
                np.asarray(chain(params, q, n))
                best = min(best, time.perf_counter() - t0)
            walls[n] = best
        out[f"B{b}_ms"] = round((walls[reps + 1] - walls[1]) / reps * 1e3, 4)
    return out


def run(
    flat_n: int = 10_000,
    flat_d: int = 384,
    ivf_n: int = 200_000,
    ivf_d: int = 768,
    nlist: int = 512,
    k: int = 10,
    iters: int = 30,
    serving_shards: int = 2,
    pallas_n: int = 2**18,
) -> dict[str, Any]:
    import pandas as pd

    import lotus_tpu
    from lotus_tpu.models import TfidfRM, make_fake_lm

    results: dict[str, Any] = {
        "config": {
            "flat": f"{flat_n}x{flat_d}", "ivf": f"{ivf_n}x{ivf_d} nlist={nlist}",
            "k": k, "iters": iters,
        },
        "dispatch_floor": _dispatch_floor(iters),
    }

    with tempfile.TemporaryDirectory() as tmp:
        # Config-1 shape: Flat store, interactive point lookups.
        corpus = make_corpus(flat_n, flat_d)
        queries = make_queries(corpus, 64)
        flat = TpuVS(index_type="flat")
        flat.index([], corpus, os.path.join(tmp, "flat"))
        results["flat_direct"] = _bench_store(flat, queries, k, iters)

        # Accessor path on the same store: RM query embedding + search + df slice.
        lotus_tpu.settings.configure(lm=make_fake_lm(), rm=TfidfRM(), vs=TpuVS())
        df = pd.DataFrame({"t": [f"passage {i} topic {i % 97}" for i in range(flat_n)]})
        df = df.sem_index("t", os.path.join(tmp, "acc"))
        results["sem_search_accessor"] = _bench_accessor(df, "t", "passage topic 13", k, iters)

        # Device-side per-search time (dispatch floor cancelled): the number
        # local (untunneled) TPU hardware would see per call.
        import jax.numpy as jnp

        from lotus_tpu.ops.flat import flat_search

        pad = (-flat_n) % 8192  # pre-pad so the search doesn't copy the db
        cdev = jnp.asarray(np.concatenate([corpus, np.zeros((pad, flat_d), np.float32)]))

        def flat_fn(c, qq):
            d, _ = flat_search(c, qq, k, metric="ip")
            return d

        results["flat_device_side"] = _device_side(
            {b: (flat_fn, cdev, queries[:b]) for b in BATCHES}
        )

        # Config-4 shape: IVF store (scaled down by default; --spec raises it).
        corpus4 = make_corpus(ivf_n, ivf_d, seed=2)
        queries4 = make_queries(corpus4, 64, seed=3)
        ivf = TpuVS(index_type="ivf", nlist=nlist)
        ivf.index([], corpus4, os.path.join(tmp, "ivf"))
        results["ivf_direct"] = _bench_store(ivf, queries4, k, iters)

        from lotus_tpu.ops.ivf import ivf_search

        full_state = ivf._materialize()
        arrays = {kk: v for kk, v in full_state.items()
                  if hasattr(v, "shape") and getattr(v, "size", 0) > 0}
        aux = {kk: v for kk, v in full_state.items() if kk not in arrays}
        nprobe = ivf.nprobe

        def ivf_fn(arrs, qq):
            d, _ = ivf_search({**aux, **arrs}, qq, k, nprobe=nprobe, metric="ip")
            return d

        results["ivf_device_side_window_probe"] = _device_side(
            {b: (ivf_fn, arrays, queries4[:b]) for b in BATCHES}
        )

        # Block-aligned IVF store (avg list >= 512 rows): the shape where the
        # planner serves EVERY batch size through the Pallas grouped probe
        # (round-5 shootout, docs/benchmarks.md) — the 200k store above
        # builds un-aligned and stays on the window probe, so both serving
        # regimes get pinned.
        corpusP = make_corpus(pallas_n, ivf_d, seed=4)
        queriesP = make_queries(corpusP, 64, seed=5)
        ivf_p = TpuVS(index_type="ivf", nlist=nlist)
        ivf_p.index([], corpusP, os.path.join(tmp, "ivfp"))
        meta_p = ivf_p._materialize()["meta"]
        if ivf_p._pallas_eligible(meta_p):
            results["config"]["ivf_pallas"] = f"{pallas_n}x{ivf_d} nlist={nlist}"
            results["ivf_pallas_direct"] = _bench_store(ivf_p, queriesP, k, iters)

            from lotus_tpu.ops.pallas_ivf import ivf_search_pallas

            stateP = ivf_p._materialize()
            arraysP = {kk: v for kk, v in stateP.items()
                       if hasattr(v, "shape") and getattr(v, "size", 0) > (1 << 20)}
            auxP = {kk: v for kk, v in stateP.items() if kk not in arraysP}
            nprobe_p = ivf_p.nprobe

            def pallas_fn(arrs, qq):
                d, _ = ivf_search_pallas(
                    {**auxP, **arrs}, qq, k, nprobe=nprobe_p, metric="ip"
                )
                return d

            results["ivf_device_side_pallas_probe"] = _device_side(
                {b: (pallas_fn, arraysP, queriesP[:b]) for b in BATCHES}
            )

        # Serving tier: same IVF store behind N TCP shards on this host.
        results[f"serving_{serving_shards}shards"] = _bench_serving(
            ivf, queries4, k, serving_shards, iters
        )
        # The tier's added cost at each batch: frontend p50 minus direct p50.
        added = {}
        for b in BATCHES:
            fb, db = results[f"serving_{serving_shards}shards"][f"B{b}"], results["ivf_direct"][f"B{b}"]
            added[f"B{b}_ms"] = round(fb["p50_ms"] - db["p50_ms"], 3)
        results["serving_added_p50"] = added
    return results
