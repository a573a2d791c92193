"""k-means + dedup benchmark (BASELINE.md config 3 scaled): build vecs/sec
and self-join dedup wall clock."""

from __future__ import annotations

import time
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from benchmarks.common import make_corpus
from lotus_tpu.ops import kmeans_fit
from lotus_tpu.ops.flat import flat_search


def run(n: int = 200_000, d: int = 384, k: int = 256, iters: int = 10, spec: bool = False) -> dict[str, Any]:
    """``spec=True`` runs BASELINE config 3 at full scale: 1M x 768-d
    k-means with k=1024 (device-generated corpus — host RNG at this size
    would dominate wall time on this dev box)."""
    if spec:
        n, d, k = 1_000_000, 768, 1024
        from benchmarks.common import make_corpus_device

        x = make_corpus_device(n, d, seed=0)
    else:
        corpus = make_corpus(n, d)
        x = jnp.asarray(corpus)

    t0 = time.perf_counter()
    res = kmeans_fit(x, k, iters=iters, key=jax.random.PRNGKey(0))
    np.asarray(res.assignments)
    train_s = time.perf_counter() - t0

    # Dedup-style thresholded self-join over a subset (capped neighbours).
    sub = x[:20_000]
    t0 = time.perf_counter()
    d2, i2 = flat_search(sub, sub, 16, metric="ip", block_rows=8192)
    np.asarray(i2)
    selfjoin_s = time.perf_counter() - t0

    return {
        "n": n, "d": d, "k": k, "iters": iters,
        "kmeans_vecs_per_sec": n * iters / train_s,
        "inertia": float(res.inertia),
        "selfjoin_20k_s": selfjoin_s,
    }
