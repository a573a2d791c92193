"""Vector-store contract.

Same four-method interface as the reference (``lotus/vector_store/vs.py:10-58``)
so the semantic operators are store-agnostic: ``index``, ``load_index``,
``__call__(query_vectors, K, ids=None) -> RMOutput``, and
``get_vectors_from_index``.
"""

from __future__ import annotations

from abc import ABC, abstractmethod
from typing import Any

import numpy as np
from numpy.typing import NDArray

from lotus_tpu.types import RMOutput


class VS(ABC):
    """Abstract vector store."""

    def __init__(self) -> None:
        self.index_dir: str | None = None

    @abstractmethod
    def index(
        self,
        docs: list[str],
        embeddings: NDArray[np.float64],
        index_dir: str,
        **kwargs: Any,
    ) -> None:
        """Build an index over ``embeddings`` and persist it under ``index_dir``."""

    @abstractmethod
    def load_index(self, index_dir: str) -> None:
        """Load (or prepare to lazily load) a persisted index."""

    @abstractmethod
    def __call__(
        self,
        query_vectors: NDArray[np.float64],
        K: int,
        ids: list[int] | None = None,
        **kwargs: Any,
    ) -> RMOutput:
        """Nearest-neighbour search.

        Args:
            query_vectors: (B, d) pre-embedded queries.
            K: neighbours to return per query.
            ids: optional subset of row positions to restrict the search to.
                Implemented as a validity mask on scores — one masked pass, not
                the temp-index rebuild the reference performs
                (faiss_vs.py:57-72).

        Returns:
            RMOutput with (B, K) distances and row indices (-1 = no hit).
        """

    @abstractmethod
    def get_vectors_from_index(self, index_dir: str, ids: list[int]) -> NDArray[np.float64]:
        """Fetch stored vectors for the given row positions."""
