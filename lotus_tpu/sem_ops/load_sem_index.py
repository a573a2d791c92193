"""load_sem_index accessor (parity: ``lotus/sem_ops/load_sem_index.py:6-51``).

Only records the on-disk index directory in ``df.attrs`` so a previously
built index resumes instantly; the store loads lazily at first search.
"""

from __future__ import annotations

from typing import Any

import pandas as pd


@pd.api.extensions.register_dataframe_accessor("load_sem_index")
class LoadSemIndexDataframe:
    def __init__(self, pandas_obj: Any):
        self._validate(pandas_obj)
        self._obj = pandas_obj
        self._obj.attrs.setdefault("index_dirs", {})

    @staticmethod
    def _validate(obj: Any) -> None:
        if not isinstance(obj, pd.DataFrame):
            raise AttributeError("Must be a DataFrame")

    def __call__(self, col_name: str, index_dir: str) -> pd.DataFrame:
        self._obj.attrs["index_dirs"][col_name] = index_dir
        return self._obj
