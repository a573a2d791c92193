"""Weaviate-backed remote vector store (optional dependency).

Counterpart of the reference's WeaviateVS (``lotus/vector_store/weaviate_vs.py:19-123``):
HNSW collection, 1 - distance as similarity, -1/0.0 padding; vector readback
is unsupported by the backend.
"""

from __future__ import annotations

from typing import Any

import numpy as np

from lotus_tpu.types import RMOutput
from lotus_tpu.vector_store.vs import VS

_PAD = (0.0, -1)  # (similarity, doc_id) filler up to K hits


class WeaviateVS(VS):
    def __init__(self, client: Any, vector_index_config: Any = None):
        try:
            from weaviate.classes.config import Configure
        except ImportError as e:  # pragma: no cover - optional dependency
            raise ImportError("The 'weaviate-client' package is required for WeaviateVS.") from e
        super().__init__()
        self.client = client
        self.vector_index_config = vector_index_config or Configure.VectorIndex.hnsw()
        self.embedding_dim: int | None = None

    # NOTE: the client is caller-injected and caller-owned; this store never
    # closes it (the reference's __del__ closed shared clients on GC).

    def _collection(self):
        if self.index_dir is None:
            raise ValueError("No collection loaded. Call load_index first.")
        return self.client.collections.get(self.index_dir)

    def index(self, docs: list[str], embeddings: np.ndarray, index_dir: str, **kwargs: Any) -> None:
        from weaviate.classes.config import DataType, Property

        self.index_dir = index_dir
        emb = np.reshape(embeddings, (len(embeddings), -1))
        self.embedding_dim = emb.shape[1]

        if self.client.collections.exists(index_dir):
            self.client.collections.delete(index_dir)

        schema = [Property(name="content", data_type=DataType.TEXT), Property(name="doc_id", data_type=DataType.INT)]
        collection = self.client.collections.create(
            name=index_dir, properties=schema, vectorizer_config=None, vector_index_config=self.vector_index_config
        )
        with collection.batch.dynamic() as batch:
            for pos, (doc, vec) in enumerate(zip(docs, emb)):
                batch.add_object(properties={"content": str(doc), "doc_id": pos}, vector=vec.tolist())

    def load_index(self, index_dir: str) -> None:
        import weaviate

        try:
            self.client.collections.get(index_dir)
        except weaviate.exceptions.UnexpectedStatusCodeException:
            raise ValueError(f"Collection {index_dir} not found")
        self.index_dir = index_dir

    def _one_query(self, collection: Any, qv: np.ndarray, K: int, filters: Any) -> tuple[list[float], list[int]]:
        from weaviate.classes.query import MetadataQuery

        response = collection.query.near_vector(
            near_vector=qv.tolist(), limit=K, return_metadata=MetadataQuery(distance=True), filters=filters
        )
        hits = [
            (
                # Weaviate reports cosine distance; flip to similarity.
                1.0 - (o.metadata.distance if o.metadata and o.metadata.distance is not None else 1.0),
                int(o.properties.get("doc_id", -1)),
            )
            for o in response.objects
        ]
        hits += [_PAD] * (K - len(hits))
        return [h[0] for h in hits], [h[1] for h in hits]

    def __call__(self, query_vectors: np.ndarray, K: int, ids: list[int] | None = None, **kwargs: Any) -> RMOutput:
        from weaviate.classes.query import Filter

        collection = self._collection()
        filters = None
        if ids is not None:
            filters = Filter.any_of([Filter.by_property("doc_id").equal(int(i)) for i in ids])
        per_query = [self._one_query(collection, qv, K, filters) for qv in np.atleast_2d(np.asarray(query_vectors))]
        return RMOutput(distances=[d for d, _ in per_query], indices=[i for _, i in per_query])

    def get_vectors_from_index(self, index_dir: str, ids: list[Any]) -> np.ndarray:
        raise NotImplementedError("Weaviate does not support get_vectors_from_index")
