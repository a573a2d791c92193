"""ColBERTv2 late-interaction retrieval (optional dependency).

Counterpart of the reference's ColBERTv2RM (``lotus/models/colbertv2_rm.py:17-156``):
bundles its own PLAID index (nbits=2 quantization), so it is both the
embedder and the store; ``get_vectors_from_index`` is unsupported by design.
"""

from __future__ import annotations

import pickle
from typing import Any

import numpy as np
from numpy.typing import NDArray

from lotus_tpu.types import RMOutput


class ColBERTv2RM:
    """Late-interaction retrieval over a PLAID index.

    Not an ``RM`` subclass (it cannot emit standalone embeddings); it
    implements the index/load_index/__call__ retrieval surface directly,
    same as the reference.
    """

    def __init__(self, doc_maxlen: int = 300, nbits: int = 2, kmeans_niters: int = 4):
        try:
            import colbert  # noqa: F401
        except ImportError as e:  # pragma: no cover - optional dependency
            raise ImportError("The 'colbert-ai' package is required for ColBERTv2RM.") from e
        self.doc_maxlen = doc_maxlen
        self.nbits = nbits
        self.kmeans_niters = kmeans_niters
        self.index_dir: str | None = None
        self.docs: list[str] | None = None

    def index(self, docs: list[str], index_dir: str, **kwargs: Any) -> None:
        from colbert import Indexer
        from colbert.infra import ColBERTConfig, Run, RunConfig

        kbits = ColBERTConfig(doc_maxlen=self.doc_maxlen, nbits=self.nbits, kmeans_niters=self.kmeans_niters)
        with Run().context(RunConfig(nranks=1, experiment="lotus")):
            indexer = Indexer(checkpoint="colbert-ir/colbertv2.0", config=kbits)
            indexer.index(name=f"{index_dir}/index", collection=list(docs), overwrite=True)

        with open(f"experiments/lotus/indexes/{index_dir}/index/docs", "wb") as f:
            pickle.dump(list(docs), f)
        self.docs = list(docs)
        self.index_dir = index_dir

    def load_index(self, index_dir: str) -> None:
        self.index_dir = index_dir
        with open(f"experiments/lotus/indexes/{index_dir}/index/docs", "rb") as f:
            self.docs = pickle.load(f)

    def __call__(
        self,
        queries: str | list[str] | NDArray[np.float64],
        K: int,
        **kwargs: Any,
    ) -> RMOutput:
        from colbert import Searcher
        from colbert.infra import ColBERTConfig, Run, RunConfig

        if isinstance(queries, str):
            queries = [queries]

        with Run().context(RunConfig(experiment="lotus")):
            searcher = Searcher(index=f"{self.index_dir}/index", config=ColBERTConfig())

        all_distances: list[list[float]] = []
        all_indices: list[list[int]] = []
        for query in queries:
            ids, _, scores = searcher.search(query, k=K)
            all_indices.append(list(ids))
            all_distances.append(list(scores))
        return RMOutput(distances=all_distances, indices=all_indices)

    def get_vectors_from_index(self, index_dir: str, ids: list[int]) -> NDArray[np.float64]:
        raise NotImplementedError("ColBERTv2RM does not support get_vectors_from_index")
