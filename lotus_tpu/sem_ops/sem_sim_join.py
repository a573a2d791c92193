"""sem_sim_join: join each left row to its K most-similar right rows.

Role parity with ``lotus/sem_ops/sem_sim_join.py``. The pipeline here is
split into four small steps — resolve left queries (reusing the left
frame's stored vectors when it carries its own index), point the store at
the right index, run an id-restricted K-NN search, and assemble the joined
frame from (left, right, score) triples via :func:`_assemble`. Missing/-1
hits are dropped; the result carries a ``_scores`` column.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd

from lotus_tpu.cache import operator_cache
from lotus_tpu.models.rm import RM
from lotus_tpu.sem_ops._accessor import SemAccessor
from lotus_tpu.types import RMOutput
from lotus_tpu.vector_store.vs import VS


def _point_store_at(vs: VS, index_dir: str) -> None:
    if vs.index_dir != index_dir:
        vs.load_index(index_dir)


def _left_queries(df: pd.DataFrame, left_on: str, vs: VS) -> Any:
    """Prefer the left frame's own stored vectors; fall back to raw values."""
    own_dir = df.attrs.get("index_dirs", {}).get(left_on)
    if own_dir is None:
        return df[left_on]
    _point_store_at(vs, own_dir)
    try:
        return vs.get_vectors_from_index(own_dir, list(df.index))
    except NotImplementedError:
        return df[left_on]


def _knn_triples(
    left_index: pd.Index, hits: RMOutput, valid_right: set
) -> Iterator[tuple[Any, Any, float]]:
    """(left_id, right_id, score) for every real hit."""
    for q, row_ids in enumerate(hits.indices):
        for rank, rid in enumerate(row_ids):
            if rid != -1 and rid in valid_right:
                yield left_index[q], rid, hits.distances[q][rank]


def _assemble(
    left: pd.DataFrame, right: pd.DataFrame, triples: list[tuple[Any, Any, float]],
    score_col: str, lsuffix: str, rsuffix: str, keep_index: bool,
) -> pd.DataFrame:
    lhs, rhs = left.copy(), right.copy()
    lhs["_left_id"] = lhs.index
    rhs["_right_id"] = rhs.index
    spine = pd.DataFrame(triples, columns=["_left_id", "_right_id", score_col])
    out = lhs.join(spine.set_index("_left_id"), how="right", on="_left_id").join(
        rhs.set_index("_right_id"), how="left", on="_right_id", lsuffix=lsuffix, rsuffix=rsuffix
    )
    if not keep_index:
        out = out.drop(columns=["_left_id", "_right_id"])
    return out


@pd.api.extensions.register_dataframe_accessor("sem_sim_join")
class SemSimJoinDataframe(SemAccessor):
    """Join on embedding similarity: K nearest right rows per left row.

    Example:
        >>> right.sem_index("abstract", "abs_index")
        >>> left.sem_sim_join(right, left_on="query", right_on="abstract", K=5)
    """

    @operator_cache
    def __call__(
        self, other: pd.DataFrame, left_on: str, right_on: str, K: int,
        lsuffix: str = "", rsuffix: str = "", score_suffix: str = "",
        keep_index: bool = False,
    ) -> pd.DataFrame:
        if isinstance(other, pd.Series):
            if other.name is None:
                raise ValueError("Other Series must have a name")
            other = other.to_frame()

        rm: RM = self._rm()
        vs: VS = self._vs()

        queries = _left_queries(self._obj, left_on, vs)

        right_dir = other.attrs.get("index_dirs", {}).get(right_on)
        if right_dir is None:
            raise ValueError(f"Index directory for column {right_on} not found in DataFrame")
        _point_store_at(vs, right_dir)

        hits: RMOutput = vs(rm.convert_query_to_query_vector(queries), K, ids=list(other.index))
        triples = list(_knn_triples(self._obj.index, hits, set(other.index)))

        return _assemble(
            self._obj, other, triples, "_scores" + score_suffix, lsuffix, rsuffix, keep_index
        )
