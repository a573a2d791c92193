"""sem_cluster_by accessor (role parity: ``lotus/sem_ops/sem_cluster_by.py:57-86``).

Labels every row with a ``cluster_id`` produced by the TPU k-means trainer
(:mod:`lotus_tpu.ops.kmeans` via :func:`lotus_tpu.utils.cluster`) running over
the column's indexed embeddings — where the reference shells out to faiss.
"""

from __future__ import annotations

import pandas as pd

from lotus_tpu.cache import operator_cache
from lotus_tpu.sem_ops._accessor import SemAccessor


@pd.api.extensions.register_dataframe_accessor("sem_cluster_by")
class SemClusterByDataframe(SemAccessor):
    """Cluster rows by an indexed column's embeddings.

    Example:
        >>> df.sem_index("text", "text_index").sem_cluster_by("text", 8)
    """

    @operator_cache
    def __call__(
        self, col_name: str, ncentroids: int,
        return_scores: bool = False, return_centroids: bool = False,
        niter: int = 20, verbose: bool = False,
    ) -> pd.DataFrame:
        from lotus_tpu.utils import cluster

        # Fail fast with the standard configure() hint before touching vectors.
        self._rm(), self._vs()
        assignments = cluster(col_name, ncentroids)(self._obj, niter, verbose)
        self._obj["cluster_id"] = pd.Series(assignments, index=self._obj.index)
        return self._obj
