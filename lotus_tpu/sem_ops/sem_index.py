"""sem_index / load_sem_index accessors.

Parity target: ``lotus/sem_ops/sem_index.py:9-77`` and
``load_sem_index.py:6-51``.  Contract: the DataFrame's integer index must
align with vector row ids (do not reset the index), and the index directory
is recorded in ``df.attrs["index_dirs"][col]``.
"""

from __future__ import annotations

from typing import Any

import pandas as pd

import lotus_tpu
from lotus_tpu.cache import operator_cache


@pd.api.extensions.register_dataframe_accessor("sem_index")
class SemIndexDataframe:
    """Build (and persist) a semantic index over a column.

    Embeds the column with ``settings.rm``, builds the configured vector
    store's index under ``index_dir``, and records the directory in
    ``df.attrs["index_dirs"]``.

    Example:
        >>> df.sem_index("title", "title_index")
    """

    def __init__(self, pandas_obj: Any):
        self._validate(pandas_obj)
        self._obj = pandas_obj
        self._obj.attrs.setdefault("index_dirs", {})

    @staticmethod
    def _validate(obj: Any) -> None:
        if not isinstance(obj, pd.DataFrame):
            raise AttributeError("Must be a DataFrame")

    @operator_cache
    def __call__(self, col_name: str, index_dir: str) -> pd.DataFrame:
        lotus_tpu.logger.warning(
            "Do not reset the dataframe index to ensure proper functionality of get_vectors_from_index"
        )
        from lotus_tpu.settings import settings

        rm, vs = settings.rm, settings.vs
        if rm is None or vs is None:
            raise ValueError(
                "Configure a retrieval model (rm) and vector store (vs) via "
                "lotus_tpu.settings.configure() before indexing."
            )
        from lotus_tpu.dtype_extensions import convert_to_base_data

        docs = convert_to_base_data(self._obj[col_name])
        embeddings = rm(docs)
        vs.index(self._obj[col_name], embeddings, index_dir)
        self._obj.attrs["index_dirs"][col_name] = index_dir
        return self._obj
