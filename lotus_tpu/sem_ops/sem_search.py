"""sem_search accessor (role parity: ``lotus/sem_ops/sem_search.py:91-157``).

Contract: searching a filtered DataFrame still returns K surviving rows.
The reference gets there with a K-doubling retry loop
(``sem_search.py:120-138``); the TPU store instead takes the surviving row
ids up front (``ids=df.index``) and masks everything else out of the scan,
so one pass suffices. Optional cross-encoder rerank runs on the survivors.
"""

from __future__ import annotations

import pandas as pd

from lotus_tpu.cache import operator_cache
from lotus_tpu.sem_ops._accessor import SemAccessor


@pd.api.extensions.register_dataframe_accessor("sem_search")
class SemSearchDataframe(SemAccessor):
    """Top-K semantic search over an indexed column.

    Example:
        >>> df.sem_index("title", "title_index")
        >>> df.sem_search("title", "vector databases", K=5)
    """

    def _knn_slice(self, col_name: str, query: str, K: int, score_col: str | None) -> pd.DataFrame:
        """One masked store pass: K nearest surviving rows, best first."""
        rm, vs = self._rm(), self._vs()
        target_dir = self._obj.attrs["index_dirs"][col_name]
        if vs.index_dir != target_dir:
            vs.load_index(target_dir)

        survivors = list(self._obj.index)
        hits = vs(rm.convert_query_to_query_vector(query), min(K, len(survivors)), ids=survivors)
        kept = [(row, score) for row, score in zip(hits.indices[0], hits.distances[0]) if row != -1]

        sliced = self._obj.loc[[row for row, _ in kept]]
        sliced.attrs["index_dirs"] = self._obj.attrs.get("index_dirs", None)
        if score_col is not None:
            sliced[score_col] = [score for _, score in kept]
        return sliced

    @operator_cache
    def __call__(
        self, col_name: str, query: str,
        K: int | None = None, n_rerank: int | None = None,
        return_scores: bool = False, suffix: str = "_sim_score",
    ) -> pd.DataFrame:
        assert not (K is None and n_rerank is None), "K or n_rerank must be provided"

        result = self._obj
        if K is not None:
            score_col = "vec_scores" + suffix if return_scores else None
            result = self._knn_slice(col_name, query, K, score_col)

        if n_rerank is not None:
            order = self._reranker()(query, result[col_name].tolist(), n_rerank)
            result = result.iloc[order.indices]
        return result
