"""Retrieval (embedding) model interface.

Contract matches the reference RM (``lotus/models/rm.py:10-85``):
``_embed(docs) -> (n, d) float array`` plus query-format coercion.
"""

from __future__ import annotations

from abc import ABC, abstractmethod
from typing import Any, Union

import numpy as np
import pandas as pd
from numpy.typing import NDArray


class RM(ABC):
    """Abstract base class for retrieval (embedding) models."""

    @abstractmethod
    def _embed(self, docs: list[str]) -> NDArray[np.float64]:
        """Embed a list of documents -> (num_docs, dim) array."""

    def __call__(self, docs: list[str]) -> NDArray[np.float64]:
        return self._embed(docs)

    def convert_query_to_query_vector(
        self,
        queries: Union[pd.Series, str, Any, list[str], NDArray[np.float64]],
    ) -> NDArray[np.float64]:
        """Coerce str / Image / Series / list / ndarray queries to vectors.

        ndarray inputs are assumed to be pre-computed query vectors and are
        returned as-is.
        """
        if isinstance(queries, np.ndarray):
            return queries
        if isinstance(queries, pd.Series):
            queries = queries.tolist()
        elif not isinstance(queries, list):
            queries = [queries]
        return self._embed(queries)
