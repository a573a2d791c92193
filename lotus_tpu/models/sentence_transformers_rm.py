"""Local embeddings via sentence-transformers (optional dependency).

Counterpart of the reference's ``SentenceTransformersRM``
(``lotus/models/sentence_transformers_rm.py:11-76``).  Note: this runs
torch on the host; the TPU-native embedding path is the retrieval index
itself — embedding models are provider-bound by design.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
from numpy.typing import NDArray

from lotus_tpu.models.rm import RM


class SentenceTransformersRM(RM):
    def __init__(
        self,
        model: str = "intfloat/e5-base-v2",
        max_batch_size: int = 64,
        normalize_embeddings: bool = True,
        device: Optional[str] = None,
    ):
        try:
            from sentence_transformers import SentenceTransformer
        except ImportError as e:  # pragma: no cover - environment dependent
            raise ImportError("sentence-transformers is not installed.") from e
        self.model_name = model
        self.max_batch_size = max_batch_size
        self.normalize_embeddings = normalize_embeddings
        self.transformer = SentenceTransformer(model, device=device)

    def _embed(self, docs: list[str]) -> NDArray[np.float64]:
        out = self.transformer.encode(
            docs,
            batch_size=self.max_batch_size,
            normalize_embeddings=self.normalize_embeddings,
            convert_to_numpy=True,
            show_progress_bar=False,
        )
        return np.asarray(out)
