"""load_sem_index: attach a previously built index to a DataFrame.

Role parity with ``lotus/sem_ops/load_sem_index.py``: nothing is read from
disk here — the accessor just records the column→directory mapping in
``df.attrs["index_dirs"]`` and the vector store opens it lazily on first
search (see ``sem_search`` / ``sem_sim_join``).
"""

from __future__ import annotations

import pandas as pd

from lotus_tpu.sem_ops._accessor import SemAccessor


@pd.api.extensions.register_dataframe_accessor("load_sem_index")
class LoadSemIndexDataframe(SemAccessor):
    def __call__(self, col_name: str, index_dir: str) -> pd.DataFrame:
        registry = self._obj.attrs.setdefault("index_dirs", {})
        registry[col_name] = index_dir
        return self._obj
