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
