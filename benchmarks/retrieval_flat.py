"""Flat index benchmark (BASELINE.md config 1 scaled): recall + QPS/chip."""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
import numpy as np

from benchmarks.common import exact_topk, make_corpus, make_queries, recall_at_k, timed
from lotus_tpu.ops import flat_search


def run(n: int = 100_000, d: int = 384, b: int = 256, k: int = 10, dtype: str = "bfloat16") -> dict[str, Any]:
    corpus = make_corpus(n, d)
    queries = make_queries(corpus, b)
    truth = exact_topk(corpus, queries, k)

    xb = jnp.asarray(corpus, dtype=jnp.bfloat16 if dtype == "bfloat16" else jnp.float32)
    xq = jnp.asarray(queries)

    dt, (dists, idx) = timed(lambda: flat_search(xb, xq, k, metric="ip", block_rows=65536))
    got = np.asarray(idx)
    return {
        "n": n, "d": d, "batch": b, "k": k, "dtype": dtype,
        "recall_at_k": recall_at_k(got, truth),
        "latency_ms": dt * 1000,
        "qps": b / dt,
    }
