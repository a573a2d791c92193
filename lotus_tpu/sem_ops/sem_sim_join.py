"""sem_sim_join accessor (parity: ``lotus/sem_ops/sem_sim_join.py:84-166``).

Left-K-NN join: each left row joins its K nearest right rows by embedding
similarity.  Left vectors are reused from the left DataFrame's own index
when present; the right index is searched with an id restriction to the
rows still in ``other``; -1/missing hits are dropped; the result carries a
``_scores`` column.
"""

from __future__ import annotations

from typing import Any

import pandas as pd

from lotus_tpu.cache import operator_cache
from lotus_tpu.models.rm import RM
from lotus_tpu.types import RMOutput
from lotus_tpu.vector_store.vs import VS


@pd.api.extensions.register_dataframe_accessor("sem_sim_join")
class SemSimJoinDataframe:
    """Join on embedding similarity: K nearest right rows per left row.

    Example:
        >>> right.sem_index("abstract", "abs_index")
        >>> left.sem_sim_join(right, left_on="query", right_on="abstract", K=5)
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
        other: pd.DataFrame,
        left_on: str,
        right_on: str,
        K: int,
        lsuffix: str = "",
        rsuffix: str = "",
        score_suffix: str = "",
        keep_index: bool = False,
    ) -> pd.DataFrame:
        if isinstance(other, pd.Series):
            if other.name is None:
                raise ValueError("Other Series must have a name")
            other = pd.DataFrame({other.name: other})

        from lotus_tpu.settings import settings

        rm, vs = settings.rm, settings.vs
        if not isinstance(rm, RM) or not isinstance(vs, VS):
            raise ValueError(
                "Configure a retrieval model (rm) and vector store (vs) via "
                "lotus_tpu.settings.configure() before joining."
            )

        # Reuse the left side's stored vectors when it has its own index.
        if left_on in self._obj.attrs.get("index_dirs", {}):
            query_index_dir = self._obj.attrs["index_dirs"][left_on]
            if vs.index_dir != query_index_dir:
                vs.load_index(query_index_dir)
            try:
                queries = vs.get_vectors_from_index(query_index_dir, list(self._obj.index))
            except NotImplementedError:
                queries = self._obj[left_on]
        else:
            queries = self._obj[left_on]

        try:
            col_index_dir = other.attrs["index_dirs"][right_on]
        except KeyError:
            raise ValueError(f"Index directory for column {right_on} not found in DataFrame")
        if vs.index_dir != col_index_dir:
            vs.load_index(col_index_dir)

        query_vectors = rm.convert_query_to_query_vector(queries)
        right_ids = list(other.index)
        vs_output: RMOutput = vs(query_vectors, K, ids=right_ids)

        other_index_set = set(other.index)
        join_results = [
            (self._obj.index[qi], rid, vs_output.distances[qi][i])
            for qi, row_ids in enumerate(vs_output.indices)
            for i, rid in enumerate(row_ids)
            if rid != -1 and rid in other_index_set
        ]

        df1 = self._obj.copy()
        df2 = other.copy()
        df1["_left_id"] = df1.index
        df2["_right_id"] = df2.index
        temp_df = pd.DataFrame(join_results, columns=["_left_id", "_right_id", "_scores" + score_suffix])
        joined_df = df1.join(
            temp_df.set_index("_left_id"), how="right", on="_left_id"
        ).join(
            df2.set_index("_right_id"), how="left", on="_right_id",
            lsuffix=lsuffix, rsuffix=rsuffix,
        )
        if not keep_index:
            joined_df.drop(columns=["_left_id", "_right_id"], inplace=True)
        return joined_df
