"""sem_partition_by accessor (parity: ``lotus/sem_ops/sem_partition_by.py:8-67``).

Applies a partition function (e.g. ``lotus_tpu.utils.cluster``) and stores
``_lotus_partition_id``, which sem_agg uses to order its fold.
"""

from __future__ import annotations

from typing import Any, Callable

import pandas as pd

from lotus_tpu.cache import operator_cache


@pd.api.extensions.register_dataframe_accessor("sem_partition_by")
class SemPartitionByDataframe:
    """Assign a partition id per row for partition-aware aggregation.

    Example:
        >>> df.sem_partition_by(lotus_tpu.utils.cluster("text", 4))
    """

    def __init__(self, pandas_obj: Any):
        self._validate(pandas_obj)
        self._obj = pandas_obj

    @staticmethod
    def _validate(obj: Any) -> None:
        if not isinstance(obj, pd.DataFrame):
            raise AttributeError("Must be a DataFrame")

    @operator_cache
    def __call__(self, partition_fn: Callable[[pd.DataFrame], list[int]]) -> pd.DataFrame:
        group_ids = partition_fn(self._obj)
        self._obj["_lotus_partition_id"] = pd.Series(group_ids, index=self._obj.index)
        return self._obj
