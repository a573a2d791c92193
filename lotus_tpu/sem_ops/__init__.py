"""Semantic operators: pandas DataFrame accessors.

Importing this package registers all accessors (same registration pattern as
the reference's ``lotus/__init__.py:9-23``):

LLM ops: sem_map, sem_filter, sem_join, sem_topk, sem_agg, sem_extract,
sem_partition_by.
Retrieval ops (TPU-backed): sem_index, load_sem_index, sem_search,
sem_sim_join, sem_cluster_by, sem_dedup.
"""

from lotus_tpu.sem_ops import (
    load_sem_index,
    sem_agg,
    sem_cluster_by,
    sem_dedup,
    sem_extract,
    sem_filter,
    sem_index,
    sem_join,
    sem_map,
    sem_partition_by,
    sem_search,
    sem_sim_join,
    sem_topk,
)

__all__ = [
    "sem_map",
    "sem_filter",
    "sem_join",
    "sem_topk",
    "sem_agg",
    "sem_extract",
    "sem_partition_by",
    "sem_index",
    "load_sem_index",
    "sem_search",
    "sem_sim_join",
    "sem_cluster_by",
    "sem_dedup",
]
