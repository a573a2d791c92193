"""Flat index benchmark (BASELINE.md config 1 scaled): recall + QPS/chip."""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
import numpy as np

from benchmarks.common import exact_topk, make_corpus, make_queries, recall_at_k, timed
from lotus_tpu.ops import flat_search


def run(
    n: int = 100_000, d: int = 384, b: int = 256, k: int = 10,
    dtype: str = "bfloat16", spec: bool = False,
) -> dict[str, Any]:
    """``spec=True`` runs BASELINE config 1 exactly: PubMedQA-scale 10k x 384
    Flat-IP in FLOAT32 (the exact path), where recall@10 vs brute force must
    be 1.0 — asserted, not just reported."""
    if spec:
        n, d, dtype = 10_000, 384, "float32"
    corpus = make_corpus(n, d)
    queries = make_queries(corpus, b)
    truth = exact_topk(corpus, queries, k)

    xb = jnp.asarray(corpus, dtype=jnp.bfloat16 if dtype == "bfloat16" else jnp.float32)
    xq = jnp.asarray(queries)

    dt, (dists, idx) = timed(lambda: flat_search(xb, xq, k, metric="ip", block_rows=65536))
    got = np.asarray(idx)
    recall = recall_at_k(got, truth)
    if spec:
        assert recall == 1.0, f"config-1 exact-parity pin violated: recall {recall}"
    return {
        "n": n, "d": d, "batch": b, "k": k, "dtype": dtype,
        "recall_at_k": recall,
        "latency_ms": dt * 1000,
        "qps": b / dt,
        **({"config1_exact_parity": True} if spec else {}),
    }
