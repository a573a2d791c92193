"""API-backed embeddings via litellm (optional dependency).

Counterpart of the reference's ``LiteLLMRM`` (``lotus/models/litellm_rm.py:11-71``):
batched requests with optional character truncation.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
from numpy.typing import NDArray

from lotus_tpu.models.rm import RM


class LiteLLMRM(RM):
    def __init__(
        self,
        model: str = "text-embedding-3-small",
        max_batch_size: int = 64,
        truncate_limit: Optional[int] = None,
    ):
        try:
            import litellm  # noqa: F401
        except ImportError as e:  # pragma: no cover - environment dependent
            raise ImportError(
                "litellm is not installed; use SentenceTransformersRM, HashRM, "
                "or a custom RM instead."
            ) from e
        self.model = model
        self.max_batch_size = max_batch_size
        self.truncate_limit = truncate_limit

    def _embed(self, docs: list[str]) -> NDArray[np.float64]:
        from litellm import embedding

        if self.truncate_limit is not None:
            docs = [doc[: self.truncate_limit] for doc in docs]

        all_vecs: list[np.ndarray] = []
        for start in range(0, len(docs), self.max_batch_size):
            batch = docs[start : start + self.max_batch_size]
            response = embedding(model=self.model, input=batch)
            all_vecs.append(np.array([d["embedding"] for d in response.data]))
        return np.vstack(all_vecs)
