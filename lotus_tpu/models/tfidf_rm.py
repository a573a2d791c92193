"""TfidfRM — a real, offline, deterministic text-embedding model.

Character-n-gram TF-IDF (sklearn) projected to a dense ``dim``-d space with
TruncatedSVD and L2-normalised, so inner-product search behaves like cosine
retrieval over a classical lexical embedding.  Fills the
SentenceTransformersRM slot (reference:
``lotus/models/sentence_transformers_rm.py:11-76``) in environments with no
network/model weights — notably the real-data quality gates
(``benchmarks/test_real_data_quality.py``), which need an embedder whose
neighbourhoods reflect actual text similarity rather than a hash.

The model is corpus-fit: the FIRST ``_embed`` call (the ``sem_index`` build)
fits the vectorizer + SVD; later calls (queries) transform with the frozen
vocabulary, mirroring how a pretrained encoder is frozen at query time.
"""

from __future__ import annotations

from typing import Any

import numpy as np

from lotus_tpu.models.rm import RM


class TfidfRM(RM):
    """Char-n-gram TF-IDF + SVD embeddings.

    Args:
        dim: output embedding dimension (clipped to the fit corpus rank).
        ngram_range: character n-gram span; (2, 4) is robust to typos and
            morphological variants (the classical fuzzy-matching setup).
        lowercase: fold case before hashing n-grams.
    """

    def __init__(self, dim: int = 256, ngram_range: tuple[int, int] = (2, 4), lowercase: bool = True):
        self.dim = dim
        self.ngram_range = ngram_range
        self.lowercase = lowercase
        self._vectorizer: Any = None
        self._svd: Any = None

    def _fit(self, docs: list[str]) -> None:
        from sklearn.decomposition import TruncatedSVD
        from sklearn.feature_extraction.text import TfidfVectorizer

        self._vectorizer = TfidfVectorizer(
            analyzer="char_wb", ngram_range=self.ngram_range, lowercase=self.lowercase,
            sublinear_tf=True,
        )
        tfidf = self._vectorizer.fit_transform(docs)
        n_comp = min(self.dim, tfidf.shape[1] - 1, max(len(docs) - 1, 1))
        self._svd = TruncatedSVD(n_components=n_comp, random_state=0)
        self._svd.fit(tfidf)

    def _embed(self, docs: list[str]) -> np.ndarray:
        texts = [str(d) for d in docs]
        if self._vectorizer is None:
            self._fit(texts)
        dense = self._svd.transform(self._vectorizer.transform(texts)).astype(np.float32)
        norms = np.linalg.norm(dense, axis=1, keepdims=True)
        return dense / np.maximum(norms, 1e-12)
