"""Semantic operators: pandas DataFrame accessors.

Importing this package registers every ``df.sem_*`` accessor (the same
import-time registration the reference does in ``lotus/__init__.py:9-23``).

LLM ops: sem_map, sem_filter, sem_join, sem_topk, sem_agg, sem_extract,
sem_partition_by. Retrieval ops (TPU-backed): sem_index, load_sem_index,
sem_search, sem_sim_join, sem_cluster_by, sem_dedup.
"""

from importlib import import_module

_OPERATOR_MODULES = (
    # LLM-backed
    "sem_map", "sem_filter", "sem_join", "sem_topk", "sem_agg",
    "sem_extract", "sem_partition_by",
    # embedding / TPU-index backed
    "sem_index", "load_sem_index", "sem_search", "sem_sim_join",
    "sem_cluster_by", "sem_dedup",
)

for _name in _OPERATOR_MODULES:
    globals()[_name] = import_module(f"{__name__}.{_name}")

__all__ = list(_OPERATOR_MODULES)
