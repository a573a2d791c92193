"""sem_dedup accessor (parity: ``lotus/sem_ops/sem_dedup.py:32-91``).

Semantic near-duplicate removal: thresholded self-similarity, connected
components over duplicate *values*, keep the first value per component.

The reference materializes a full K=len(df) self sim-join (O(n^2) rows on the
host).  Here the neighbour count is capped: duplicates cluster densely, so a
cap of ``max_neighbors`` per row still connects every duplicate component
while the TPU kernel emits only O(n * cap) candidates.  ``max_neighbors=None``
reproduces the reference's exact K=len(df) behavior.
"""

from __future__ import annotations

from typing import Any

import numpy as np
import pandas as pd

import lotus_tpu
from lotus_tpu.cache import operator_cache
from lotus_tpu.sem_ops._accessor import SemAccessor


def _connected_components(pairs: set[tuple[Any, Any]]) -> list[list[Any]]:
    """Group duplicate values into components via native union-find
    (lotus_tpu.native; C++ with a Python fallback)."""
    from lotus_tpu.native import union_find

    values: dict[Any, int] = {}
    for a, b in pairs:
        values.setdefault(a, len(values))
        values.setdefault(b, len(values))
    if not values:
        return []
    edges = np.array([(values[a], values[b]) for a, b in pairs], dtype=np.int64)
    labels = union_find(edges, len(values))
    by_root: dict[int, list[Any]] = {}
    for value, idx in values.items():
        by_root.setdefault(int(labels[idx]), []).append(value)
    return list(by_root.values())


@pd.api.extensions.register_dataframe_accessor("sem_dedup")
class SemDedupByDataframe(SemAccessor):
    """Drop near-duplicate rows of an indexed column.

    Example:
        >>> df.sem_index("text", "idx").sem_dedup("text", threshold=0.9)
    """

    @operator_cache
    def __call__(
        self, col_name: str, threshold: float, max_neighbors: int | None = 64,
    ) -> pd.DataFrame:
        self._rm(), self._vs()
        K = len(self._obj) if max_neighbors is None else min(max_neighbors + 1, len(self._obj))
        joined_df = self._obj.sem_sim_join(
            self._obj, col_name, col_name, K, lsuffix="_l", rsuffix="_r"
        )
        dedup_df = joined_df[joined_df["_scores"] > threshold]
        left_col, right_col = f"{col_name}_l", f"{col_name}_r"
        dedup_df = dedup_df[dedup_df[left_col] != dedup_df[right_col]]
        lotus_tpu.logger.debug(f"dedup_df: {dedup_df}")

        pairs = {
            (lv, rv)
            for lv, rv in zip(dedup_df[left_col], dedup_df[right_col])
            if lv != rv
        }
        removed_vals: list[Any] = []
        for component in _connected_components(pairs):
            removed_vals.extend(component[1:])
        return self._obj[~self._obj[col_name].isin(removed_vals)]
