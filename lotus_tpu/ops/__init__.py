"""TPU-native compute core: pure JAX/XLA/Pallas kernels, no pandas.

This package is the engine that replaces the reference's faiss dependency
(``lotus/vector_store/faiss_vs.py``, ``lotus/utils.py:14-72``):

- :mod:`lotus_tpu.ops.flat` — exact (Flat) index: blocked matmul scoring with
  fused top-k merge and masked-subset search.
- :mod:`lotus_tpu.ops.kmeans` — Lloyd's k-means (assign = distance kernel +
  argmin, update = segment-sum), backing ``sem_cluster_by`` and the IVF
  coarse quantizer.
- :mod:`lotus_tpu.ops.ivf` — IVF-Flat: coarse quantize, sorted CSR storage,
  probe kernels.
- :mod:`lotus_tpu.ops.pallas_ivf` — Pallas grouped-probe kernel
  (scalar-prefetched block DMA), the large-batch IVF fast path.
- :mod:`lotus_tpu.ops.pairs` — tiled all-pairs kernels for ``sem_sim_join`` /
  ``sem_dedup``.
"""

from lotus_tpu.ops.flat import flat_search
from lotus_tpu.ops.kmeans import kmeans_assign, kmeans_fit

__all__ = ["flat_search", "kmeans_fit", "kmeans_assign"]
