"""Multi-chip sharded search and k-means over a device mesh.

Run with real chips, or simulate:
    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python sharded_search.py
"""

import jax
import jax.numpy as jnp
import numpy as np

from lotus_tpu.parallel import default_mesh, shard_rows, sharded_flat_search, sharded_kmeans_fit

mesh = default_mesh()
print(f"mesh over {mesh.devices.size} devices")

rng = np.random.default_rng(0)
x = jnp.asarray(rng.standard_normal((4096, 64)), dtype=jnp.float32)
x_sharded, n_rows = shard_rows(x, mesh, block_rows=64)

queries = jnp.asarray(rng.standard_normal((8, 64)), dtype=jnp.float32)
dists, idx = sharded_flat_search(x_sharded, queries, 5, n_rows=n_rows, mesh=mesh, block_rows=64)
print("sharded top-5 ids:", np.asarray(idx)[0])

res = sharded_kmeans_fit(x_sharded, 16, n_rows=n_rows, mesh=mesh, iters=5, key=jax.random.PRNGKey(0))
print("centroids:", res.centroids.shape, "inertia:", float(res.inertia))
