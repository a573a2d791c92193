"""Multi-chip sharding layer: device meshes, sharded search, sharded k-means.

The reference framework has no distributed backend (SURVEY.md §2.10); this
package is the TPU-native equivalent it needs: index shards as
NamedSharding-placed arrays over an ICI mesh, per-shard top-k with an
all-gather merge, and k-means with psum'd centroid statistics
(BASELINE.md config 5).
"""

from lotus_tpu.parallel.mesh import default_mesh, shard_rows
from lotus_tpu.parallel.search import sharded_flat_search
from lotus_tpu.parallel.kmeans import sharded_kmeans_fit
from lotus_tpu.parallel.distributed import (
    hybrid_mesh,
    init_runtime,
    load_index_shard,
    save_index_shards,
    serving_mesh,
)
from lotus_tpu.parallel.ivf import (
    load_sharded_ivf_state,
    plan_ivf_shards,
    save_ivf_shards,
    shard_ivf_state,
    sharded_ivf_search,
    sharded_ivf_search_pallas,
)

__all__ = [
    "default_mesh",
    "shard_rows",
    "sharded_flat_search",
    "sharded_kmeans_fit",
    "shard_ivf_state",
    "sharded_ivf_search",
    "sharded_ivf_search_pallas",
    "plan_ivf_shards",
    "save_ivf_shards",
    "load_sharded_ivf_state",
    "init_runtime",
    "hybrid_mesh",
    "serving_mesh",
    "save_index_shards",
    "load_index_shard",
]
