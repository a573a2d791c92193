"""IVF-Flat benchmark (BASELINE.md config 4 scaled): recall/QPS frontier
over an nprobe sweep."""

from __future__ import annotations

import tempfile
from typing import Any

import numpy as np

from benchmarks.common import exact_topk, make_corpus, make_queries, recall_at_k
from lotus_tpu.vector_store import TpuVS


def run(
    n: int = 200_000,
    d: int = 384,
    b: int = 256,
    k: int = 10,
    nlist: int = 512,
    nprobes: tuple[int, ...] = (1, 4, 16, 64),
) -> dict[str, Any]:
    import time

    corpus = make_corpus(n, d)
    queries = make_queries(corpus, b)
    truth = exact_topk(corpus, queries, k)

    with tempfile.TemporaryDirectory() as tmp:
        vs = TpuVS(index_type="ivf", nlist=nlist)
        t0 = time.perf_counter()
        vs.index([], corpus, tmp)
        build_s = time.perf_counter() - t0

        frontier = []
        for nprobe in nprobes:
            vs(queries[:8], k, nprobe=nprobe)  # warm/compile
            t0 = time.perf_counter()
            out = vs(queries, k, nprobe=nprobe)
            dt = time.perf_counter() - t0
            got = np.asarray(out.indices)
            frontier.append(
                {"nprobe": nprobe, "recall_at_k": recall_at_k(got, truth), "qps": b / dt}
            )
    return {
        "n": n, "d": d, "batch": b, "k": k, "nlist": nlist,
        "build_vecs_per_sec": n / build_s,
        "frontier": frontier,
    }
