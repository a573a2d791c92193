"""Weaviate-backed remote vector store (optional dependency).

Counterpart of the reference's WeaviateVS (``lotus/vector_store/weaviate_vs.py:19-123``):
HNSW collection, 1 - distance as similarity, -1/0.0 padding; vector readback
is unsupported by the backend.
"""

from __future__ import annotations

from typing import Any

import numpy as np
from numpy.typing import NDArray

from lotus_tpu.types import RMOutput
from lotus_tpu.vector_store.vs import VS


class WeaviateVS(VS):
    def __init__(self, client: Any, vector_index_config: Any = None):
        try:
            from weaviate.classes.config import Configure  # noqa: F401
        except ImportError as e:  # pragma: no cover - optional dependency
            raise ImportError("The 'weaviate-client' package is required for WeaviateVS.") from e
        super().__init__()
        self.client = client
        if vector_index_config is None:
            from weaviate.classes.config import Configure

            vector_index_config = Configure.VectorIndex.hnsw()
        self.vector_index_config = vector_index_config
        self.embedding_dim: int | None = None

    # NOTE: the client is caller-injected and caller-owned; this store never
    # closes it (the reference's __del__ closed shared clients on GC).

    def index(self, docs: list[str], embeddings: NDArray[np.float64], index_dir: str, **kwargs: Any) -> None:
        from weaviate.classes.config import DataType, Property

        self.index_dir = index_dir
        emb = np.reshape(embeddings, (len(embeddings), -1))
        self.embedding_dim = emb.shape[1]

        if self.client.collections.exists(index_dir):
            self.client.collections.delete(index_dir)

        collection = self.client.collections.create(
            name=index_dir,
            properties=[
                Property(name="content", data_type=DataType.TEXT),
                Property(name="doc_id", data_type=DataType.INT),
            ],
            vectorizer_config=None,
            vector_index_config=self.vector_index_config,
        )
        with collection.batch.dynamic() as batch:
            for idx, (doc, vec) in enumerate(zip(docs, emb)):
                batch.add_object(properties={"content": str(doc), "doc_id": idx}, vector=vec.tolist())

    def load_index(self, index_dir: str) -> None:
        import weaviate

        try:
            self.client.collections.get(index_dir)
        except weaviate.exceptions.UnexpectedStatusCodeException:
            raise ValueError(f"Collection {index_dir} not found")
        self.index_dir = index_dir

    def __call__(
        self, query_vectors: NDArray[np.float64], K: int, ids: list[int] | None = None, **kwargs: Any
    ) -> RMOutput:
        from weaviate.classes.query import Filter, MetadataQuery

        if self.index_dir is None:
            raise ValueError("No collection loaded. Call load_index first.")
        collection = self.client.collections.get(self.index_dir)

        filters = (
            Filter.any_of([Filter.by_property("doc_id").equal(i) for i in ids]) if ids is not None else None
        )
        all_distances: list[list[float]] = []
        all_indices: list[list[int]] = []
        for qv in np.atleast_2d(np.asarray(query_vectors)):
            response = collection.query.near_vector(
                near_vector=qv.tolist(), limit=K,
                return_metadata=MetadataQuery(distance=True), filters=filters,
            )
            distances: list[float] = []
            indices: list[int] = []
            for obj in response.objects:
                indices.append(obj.properties.get("doc_id", -1))
                d = obj.metadata.distance if obj.metadata and obj.metadata.distance is not None else 1.0
                distances.append(1 - d)  # cosine distance -> similarity
            while len(indices) < K:
                indices.append(-1)
                distances.append(0.0)
            all_distances.append(distances)
            all_indices.append(indices)
        return RMOutput(distances=all_distances, indices=all_indices)

    def get_vectors_from_index(self, index_dir: str, ids: list[Any]) -> NDArray[np.float64]:
        raise NotImplementedError("Weaviate does not support get_vectors_from_index")
