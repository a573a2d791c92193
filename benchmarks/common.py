"""Shared helpers for the retrieval benchmarks."""

from __future__ import annotations

import time

import numpy as np


def make_corpus(n: int, d: int, seed: int = 0, normalized: bool = True) -> np.ndarray:
    """Synthetic embedding corpus with mild cluster structure (mixture of
    gaussians) so ANN recall behaves like real embedding data."""
    rng = np.random.default_rng(seed)
    n_clusters = max(8, int(np.sqrt(n) / 4))
    centers = rng.standard_normal((n_clusters, d)).astype(np.float32)
    assign = rng.integers(0, n_clusters, n)
    x = centers[assign] + 0.5 * rng.standard_normal((n, d)).astype(np.float32)
    if normalized:
        x /= np.linalg.norm(x, axis=1, keepdims=True)
    return x


def make_queries(corpus: np.ndarray, b: int, seed: int = 1, noise: float = 0.05) -> np.ndarray:
    rng = np.random.default_rng(seed)
    idx = rng.integers(0, len(corpus), b)
    q = corpus[idx] + noise * rng.standard_normal((b, corpus.shape[1])).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    return q


def exact_topk(corpus: np.ndarray, queries: np.ndarray, k: int) -> np.ndarray:
    scores = queries @ corpus.T
    return np.argsort(-scores, axis=1)[:, :k]


def make_corpus_device(n: int, d: int, seed: int = 0, n_clusters: int | None = None):
    """Device-resident clustered unit corpus (spec-scale suites).

    The dev host's single slow core makes host-side generation of
    100k x 768+ corpora the bottleneck (SURVEY/roadmap notes); generating on
    device matches bench.py's methodology and keeps suite wall times about
    the search, not numpy RNG.
    """
    import jax
    import jax.numpy as jnp

    from lotus_tpu.ops.bench_data import _gen_chunk

    n_clusters = n_clusters or max(8, int(np.sqrt(n) / 4))
    k_centers, k_chunk = jax.random.split(jax.random.PRNGKey(seed))
    centers = jax.random.normal(k_centers, (n_clusters, d), jnp.float32)
    return _gen_chunk(k_chunk, centers, n, d, n_clusters, 2.5)


def exact_topk_device(corpus, queries, k: int) -> np.ndarray:
    """f32 exact oracle on device (HIGHEST precision) — for corpora whose
    host-side oracle matmul would dominate the suite's wall time."""
    import jax.numpy as jnp

    from lotus_tpu.ops.common import fetch_int32
    from lotus_tpu.ops.flat import flat_search

    _, idx = flat_search(
        jnp.asarray(corpus, jnp.float32), jnp.asarray(queries, jnp.float32), k, metric="ip"
    )
    return fetch_int32(idx)


def exact_topk_device_chunked(corpus, queries, k: int, chunk: int = 4096) -> np.ndarray:
    """Full f32 exact oracle on device, query-chunked so the score matrix
    stays HBM-resident (nq x n f32 at 100k x 100k would be 40 GB; 4k x 100k
    is 1.6 GB).  One compile per chunk shape: the tail chunk is padded."""
    import jax.numpy as jnp

    from lotus_tpu.ops.common import fetch_int32
    from lotus_tpu.ops.flat import flat_search

    corpus = jnp.asarray(corpus, jnp.float32)
    nq = queries.shape[0]
    out = np.empty((nq, k), dtype=np.int32)
    for start in range(0, nq, chunk):
        q = jnp.asarray(queries[start : start + chunk], jnp.float32)
        pad = chunk - q.shape[0]
        if pad:
            q = jnp.pad(q, ((0, pad), (0, 0)))
        _, idx = flat_search(corpus, q, k, metric="ip")
        out[start : start + chunk] = fetch_int32(idx)[: chunk - pad]
    return out


def recall_at_k(got: np.ndarray, truth: np.ndarray) -> float:
    k = truth.shape[1]
    return float(np.mean([len(set(got[i, :k]) & set(truth[i])) / k for i in range(len(truth))]))


def timed(fn, warmup: int = 1, iters: int = 3):
    """min-of-iters wall time; forces results to host to defeat async dispatch."""
    for _ in range(warmup):
        np.asarray(fn()[0])
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn()
        np.asarray(out[0])
        times.append(time.perf_counter() - t0)
    return min(times), out


def first_word(text) -> str:
    """First alphabetic word of an answer, lowercased — robust to the
    markdown/emphasis real models wrap verdicts in ('**Yes**\n\nThe…')."""
    import re

    words = re.findall(r"[a-z]+", str(text).lower())
    return words[0] if words else ""
