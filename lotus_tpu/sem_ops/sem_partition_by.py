"""sem_partition_by accessor (role parity: ``lotus/sem_ops/sem_partition_by.py:8-67``).

Tags each row with ``_lotus_partition_id`` via a caller-supplied partition
function (commonly :func:`lotus_tpu.utils.cluster`); ``sem_agg`` folds rows
partition-by-partition when this column is present.
"""

from __future__ import annotations

from typing import Callable

import pandas as pd

from lotus_tpu.cache import operator_cache
from lotus_tpu.sem_ops._accessor import PARTITION_COLUMN, SemAccessor


@pd.api.extensions.register_dataframe_accessor("sem_partition_by")
class SemPartitionByDataframe(SemAccessor):
    """Assign a partition id per row for partition-aware aggregation.

    Example:
        >>> df.sem_partition_by(lotus_tpu.utils.cluster("text", 4))
    """

    @operator_cache
    def __call__(self, partition_fn: Callable[[pd.DataFrame], list[int]]) -> pd.DataFrame:
        self._obj[PARTITION_COLUMN] = pd.Series(partition_fn(self._obj), index=self._obj.index)
        return self._obj
