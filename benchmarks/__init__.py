"""lotus_tpu benchmark registry.

Retrieval-substrate suites (BASELINE.md configs, runnable offline/on-TPU):
retrieval_flat, retrieval_ivf, sim_join, cluster_dedup.
LM-protocol suites (reference parity; run with a real provider, or with the
deterministic fake LM in smoke mode): rag_pipeline, judge_pipeline.
"""

from benchmarks import (
    cluster_dedup,
    failure_modes,
    judge_pipeline,
    latency,
    rag_pipeline,
    retrieval_flat,
    retrieval_ivf,
    sim_join,
)

_REGISTRY = {
    "retrieval_flat": retrieval_flat,
    "retrieval_ivf": retrieval_ivf,
    "sim_join": sim_join,
    "cluster_dedup": cluster_dedup,
    "rag_pipeline": rag_pipeline,
    "judge_pipeline": judge_pipeline,
    "failure_modes": failure_modes,
    "latency": latency,
}

BENCHMARKS = list(_REGISTRY.keys())


def get_benchmark(name: str):
    if name not in _REGISTRY:
        raise ValueError(f"Unknown benchmark {name!r}. Choose from {BENCHMARKS}")
    return _REGISTRY[name]
