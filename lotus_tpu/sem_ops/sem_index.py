"""sem_index / load_sem_index accessors.

Role parity with ``lotus/sem_ops/sem_index.py:9-77`` and
``load_sem_index.py:6-51``: embed a column, build + persist the configured
vector store's index, and record the directory under
``df.attrs["index_dirs"][col]`` so downstream retrieval ops can find it.
The DataFrame's integer index must stay aligned with vector row ids.
"""

from __future__ import annotations

import pandas as pd

import lotus_tpu
from lotus_tpu.cache import operator_cache
from lotus_tpu.sem_ops._accessor import SemAccessor


def _remember_index_dir(df: pd.DataFrame, col_name: str, index_dir: str) -> pd.DataFrame:
    """Record where ``col_name``'s index lives; downstream ops read attrs."""
    registry = df.attrs.setdefault("index_dirs", {})
    registry[col_name] = index_dir
    return df


@pd.api.extensions.register_dataframe_accessor("sem_index")
class SemIndexDataframe(SemAccessor):
    """Build (and persist) a semantic index over a column.

    Example:
        >>> df.sem_index("title", "title_index")
    """

    @operator_cache
    def __call__(self, col_name: str, index_dir: str) -> pd.DataFrame:
        lotus_tpu.logger.warning(
            "Do not reset the dataframe index to ensure proper functionality of get_vectors_from_index"
        )
        from lotus_tpu.dtype_extensions import convert_to_base_data

        self._check_cols([col_name])
        column = self._obj[col_name]
        vectors = self._rm()(convert_to_base_data(column))
        self._vs().index(column, vectors, index_dir)
        return _remember_index_dir(self._obj, col_name, index_dir)
