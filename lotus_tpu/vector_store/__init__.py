"""Vector stores: the device-resident TPU store plus optional remote stores.

``TpuVS`` replaces the reference's default ``FaissVS``
(``lotus/vector_store/faiss_vs.py``) with an XLA-native engine; the remote
qdrant/weaviate stores keep the same plug-in seam and are import-gated on
their optional client packages.
"""

from lotus_tpu.vector_store.vs import VS
from lotus_tpu.vector_store.tpu_vs import TpuVS

__all__ = ["VS", "TpuVS", "QdrantVS", "WeaviateVS"]


def __getattr__(name: str):
    # Optional remote stores are imported lazily so their client packages
    # stay optional.
    if name == "QdrantVS":
        from lotus_tpu.vector_store.qdrant_vs import QdrantVS

        return QdrantVS
    if name == "WeaviateVS":
        from lotus_tpu.vector_store.weaviate_vs import WeaviateVS

        return WeaviateVS
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
