"""Qdrant-backed remote vector store (optional dependency).

Counterpart of the reference's QdrantVS (``lotus/vector_store/qdrant_vs.py:18-171``):
cosine collection, per-query search, id restriction via payload match, -1/0.0
padding to K.  Kept for the plug-in seam; the TPU-resident store is the
default.
"""

from __future__ import annotations

from typing import Any

import numpy as np

from lotus_tpu.types import RMOutput
from lotus_tpu.vector_store.vs import VS


class QdrantVS(VS):
    def __init__(self, client: Any, max_batch_size: int = 128):
        try:
            from qdrant_client import QdrantClient  # noqa: F401
        except ImportError as e:  # pragma: no cover - optional dependency
            raise ImportError("The 'qdrant-client' package is required for QdrantVS.") from e
        super().__init__()
        self.client = client
        self.max_batch_size = max_batch_size
        self.embedding_dim: int | None = None

    def index(self, docs: list[str], embeddings: np.ndarray, index_dir: str, **kwargs: Any) -> None:
        from qdrant_client import models

        self.index_dir = index_dir
        emb = np.reshape(embeddings, (len(embeddings), -1))
        self.embedding_dim = emb.shape[1]

        try:
            self.client.delete_collection(collection_name=index_dir)
        except Exception:
            pass
        self.client.create_collection(
            collection_name=index_dir,
            vectors_config=models.VectorParams(size=self.embedding_dim, distance=models.Distance.COSINE),
        )

        def point(pos: int) -> Any:
            payload = {"content": str(docs[pos]), "doc_id": pos}
            return models.PointStruct(id=pos, vector=emb[pos].tolist(), payload=payload)

        for lo in range(0, len(docs), self.max_batch_size):
            batch = [point(p) for p in range(lo, min(lo + self.max_batch_size, len(docs)))]
            self.client.upsert(collection_name=index_dir, points=batch, wait=True)

    def load_index(self, index_dir: str) -> None:
        known = {c.name for c in self.client.get_collections().collections}
        if index_dir not in known:
            raise ValueError(f"Collection {index_dir} not found")
        self.index_dir = index_dir
        vectors = self.client.get_collection(collection_name=index_dir).config.params.vectors
        if isinstance(vectors, dict):  # named-vector config: take the first
            vectors = next(iter(vectors.values()))
        self.embedding_dim = vectors.size

    def __call__(self, query_vectors: np.ndarray, K: int, ids: list[int] | None = None, **kwargs: Any) -> RMOutput:
        from qdrant_client import models

        if self.index_dir is None:
            raise ValueError("No collection loaded. Call load_index first.")

        restrict = None
        if ids is not None:
            match = models.FieldCondition(key="doc_id", match=models.MatchAny(any=[int(i) for i in ids]))
            restrict = models.Filter(must=[match])

        dist_rows, idx_rows = [], []
        for qv in np.atleast_2d(np.asarray(query_vectors)):
            found = self.client.query_points(
                collection_name=self.index_dir, query=qv.tolist(), limit=K, query_filter=restrict, with_payload=True
            ).points
            short = K - len(found)
            dist_rows.append([(p.score or 0.0) for p in found] + [0.0] * short)
            idx_rows.append([p.payload.get("doc_id", -1) for p in found] + [-1] * short)
        return RMOutput(distances=dist_rows, indices=idx_rows)

    def get_vectors_from_index(self, index_dir: str, ids: list[int]) -> np.ndarray:
        if self.index_dir != index_dir:
            self.load_index(index_dir)
        assert self.embedding_dim is not None
        rows = {int(pid): i for i, pid in enumerate(ids)}
        out = np.zeros((len(ids), self.embedding_dim), dtype=np.float64)
        for p in self.client.retrieve(collection_name=index_dir, ids=list(ids), with_vectors=True):
            if p.id in rows:
                out[rows[p.id]] = np.asarray(p.vector, dtype=np.float64)
        return out
