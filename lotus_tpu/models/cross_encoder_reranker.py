"""Cross-encoder reranker via sentence-transformers (optional dependency).

Counterpart of the reference's ``CrossEncoderReranker``
(``lotus/models/cross_encoder_reranker.py:7-38``).
"""

from __future__ import annotations

from typing import Optional

from lotus_tpu.models.reranker import Reranker
from lotus_tpu.types import RerankerOutput


class CrossEncoderReranker(Reranker):
    def __init__(
        self,
        model: str = "mixedbread-ai/mxbai-rerank-large-v1",
        device: Optional[str] = None,
        max_batch_size: int = 64,
    ):
        try:
            from sentence_transformers import CrossEncoder
        except ImportError as e:  # pragma: no cover - environment dependent
            raise ImportError("sentence-transformers is not installed.") from e
        self.max_batch_size = max_batch_size
        self.model = CrossEncoder(model, device=device)

    def __call__(self, query: str, docs: list[str], K: int) -> RerankerOutput:
        results = self.model.rank(query, docs, top_k=K, batch_size=self.max_batch_size)
        indices = [int(r["corpus_id"]) for r in results]
        return RerankerOutput(indices=indices)
