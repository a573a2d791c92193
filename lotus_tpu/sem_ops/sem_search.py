"""sem_search accessor (parity: ``lotus/sem_ops/sem_search.py:91-157``).

Semantic contract preserved: searching a filtered DataFrame still returns K
surviving rows.  The reference achieves this with a K-doubling retry loop
(``sem_search.py:120-138``); here the TPU store is handed the surviving row
ids directly (``ids=df.index``) and scores everything else out with a
validity mask in a single pass.
"""

from __future__ import annotations

from typing import Any

import pandas as pd

from lotus_tpu.cache import operator_cache
from lotus_tpu.types import RerankerOutput, RMOutput


@pd.api.extensions.register_dataframe_accessor("sem_search")
class SemSearchDataframe:
    """Top-K semantic search over an indexed column.

    Example:
        >>> df.sem_index("title", "title_index")
        >>> df.sem_search("title", "vector databases", K=5)
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
        query: str,
        K: int | None = None,
        n_rerank: int | None = None,
        return_scores: bool = False,
        suffix: str = "_sim_score",
    ) -> pd.DataFrame:
        assert not (K is None and n_rerank is None), "K or n_rerank must be provided"
        from lotus_tpu.settings import settings

        if K is not None:
            rm, vs = settings.rm, settings.vs
            if rm is None or vs is None:
                raise ValueError(
                    "Configure a retrieval model (rm) and vector store (vs) via "
                    "lotus_tpu.settings.configure() before searching."
                )
            col_index_dir = self._obj.attrs["index_dirs"][col_name]
            if vs.index_dir != col_index_dir:
                vs.load_index(col_index_dir)

            df_ids = list(self._obj.index)
            K = min(K, len(df_ids))
            query_vectors = rm.convert_query_to_query_vector(query)
            # Masked-subset search: only rows still present in the DataFrame
            # are scored, so K survivors come back in one pass.
            vs_output: RMOutput = vs(query_vectors, K, ids=df_ids)
            doc_ids = [i for i in vs_output.indices[0] if i != -1]
            scores = vs_output.distances[0][: len(doc_ids)]

            new_df = self._obj.loc[doc_ids]
            new_df.attrs["index_dirs"] = self._obj.attrs.get("index_dirs", None)
            if return_scores:
                new_df["vec_scores" + suffix] = scores
        else:
            new_df = self._obj

        if n_rerank is not None:
            if settings.reranker is None:
                raise ValueError("Reranker not found in settings")
            docs = new_df[col_name].tolist()
            reranked: RerankerOutput = settings.reranker(query, docs, n_rerank)
            new_df = new_df.iloc[reranked.indices]

        return new_df
