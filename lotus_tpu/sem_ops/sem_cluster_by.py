"""sem_cluster_by accessor (parity: ``lotus/sem_ops/sem_cluster_by.py:57-86``).

Runs the TPU k-means trainer over the column's indexed vectors and writes a
``cluster_id`` column.
"""

from __future__ import annotations

from typing import Any

import pandas as pd

import lotus_tpu.utils
from lotus_tpu.cache import operator_cache


@pd.api.extensions.register_dataframe_accessor("sem_cluster_by")
class SemClusterByDataframe:
    """Cluster rows by an indexed column's embeddings.

    Example:
        >>> df.sem_index("text", "text_index").sem_cluster_by("text", 8)
    """

    def __init__(self, pandas_obj: Any):
        self._validate(pandas_obj)
        self._obj = pandas_obj

    @staticmethod
    def _validate(obj: Any) -> None:
        if not isinstance(obj, pd.DataFrame):
            raise AttributeError("Must be a DataFrame")

    @operator_cache
    def __call__(
        self,
        col_name: str,
        ncentroids: int,
        return_scores: bool = False,
        return_centroids: bool = False,
        niter: int = 20,
        verbose: bool = False,
    ) -> pd.DataFrame:
        from lotus_tpu.settings import settings

        if settings.rm is None or settings.vs is None:
            raise ValueError(
                "Configure a retrieval model (rm) and vector store (vs) via "
                "lotus_tpu.settings.configure() before clustering."
            )
        cluster_fn = lotus_tpu.utils.cluster(col_name, ncentroids)
        indices = cluster_fn(self._obj, niter, verbose)
        self._obj["cluster_id"] = pd.Series(indices, index=self._obj.index)
        return self._obj
