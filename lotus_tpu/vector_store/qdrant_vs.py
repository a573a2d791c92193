"""Qdrant-backed remote vector store (optional dependency).

Counterpart of the reference's QdrantVS (``lotus/vector_store/qdrant_vs.py:18-171``):
cosine collection, per-query search, id restriction via payload match, -1/0.0
padding to K.  Kept for the plug-in seam; the TPU-resident store is the
default.
"""

from __future__ import annotations

from typing import Any

import numpy as np
from numpy.typing import NDArray

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

    def index(self, docs: list[str], embeddings: NDArray[np.float64], index_dir: str, **kwargs: Any) -> None:
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
        points = [
            models.PointStruct(
                id=idx,
                vector=vec.tolist(),
                payload={"content": str(doc), "doc_id": idx},
            )
            for idx, (doc, vec) in enumerate(zip(docs, emb))
        ]
        for i in range(0, len(points), self.max_batch_size):
            self.client.upsert(collection_name=index_dir, points=points[i : i + self.max_batch_size], wait=True)

    def load_index(self, index_dir: str) -> None:
        names = [c.name for c in self.client.get_collections().collections]
        if index_dir not in names:
            raise ValueError(f"Collection {index_dir} not found")
        self.index_dir = index_dir
        vectors = self.client.get_collection(collection_name=index_dir).config.params.vectors
        self.embedding_dim = (
            next(iter(vectors.values())).size if isinstance(vectors, dict) else vectors.size
        )

    def __call__(
        self, query_vectors: NDArray[np.float64], K: int, ids: list[int] | None = None, **kwargs: Any
    ) -> RMOutput:
        from qdrant_client import models

        if self.index_dir is None:
            raise ValueError("No collection loaded. Call load_index first.")

        id_filter = None
        if ids is not None:
            id_filter = models.Filter(
                must=[models.FieldCondition(key="doc_id", match=models.MatchAny(any=list(ids)))]
            )

        all_distances: list[list[float]] = []
        all_indices: list[list[int]] = []
        for qv in np.atleast_2d(np.asarray(query_vectors)):
            result = self.client.query_points(
                collection_name=self.index_dir,
                query=qv.tolist(),
                limit=K,
                query_filter=id_filter,
                with_payload=True,
            )
            distances = [p.score if p.score is not None else 0.0 for p in result.points]
            indices = [p.payload.get("doc_id", -1) for p in result.points]
            while len(indices) < K:  # pad missing hits
                indices.append(-1)
                distances.append(0.0)
            all_distances.append(distances)
            all_indices.append(indices)
        return RMOutput(distances=all_distances, indices=all_indices)

    def get_vectors_from_index(self, index_dir: str, ids: list[int]) -> NDArray[np.float64]:
        if self.index_dir != index_dir:
            self.load_index(index_dir)
        points = self.client.retrieve(collection_name=index_dir, ids=list(ids), with_vectors=True)
        assert self.embedding_dim is not None
        out = np.zeros((len(ids), self.embedding_dim), dtype=np.float64)
        pos = {pid: i for i, pid in enumerate(ids)}
        for p in points:
            if p.id in pos:
                out[pos[p.id]] = np.asarray(p.vector, dtype=np.float64)
        return out
