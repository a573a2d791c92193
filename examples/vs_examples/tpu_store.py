"""The TPU vector store directly: flat + IVF, subset search, persistence."""

import tempfile

import numpy as np

from lotus_tpu.vector_store import TpuVS

rng = np.random.default_rng(0)
emb = rng.standard_normal((5000, 128)).astype(np.float32)
emb /= np.linalg.norm(emb, axis=1, keepdims=True)
queries = emb[:4] + 0.02 * rng.standard_normal((4, 128)).astype(np.float32)

with tempfile.TemporaryDirectory() as d:
    flat = TpuVS()  # exact
    flat.index([], emb, f"{d}/flat")
    print("flat:", flat(queries, 3).indices)

    print("subset:", flat(queries, 3, ids=list(range(100))).indices)

    ivf = TpuVS(index_type="ivf", nlist=64, nprobe=8)
    ivf.index([], emb, f"{d}/ivf")
    print("ivf:", ivf(queries, 3).indices)

    # Reload from disk in a fresh store.
    again = TpuVS()
    again.load_index(f"{d}/flat")
    print("reloaded:", again(queries, 3).indices)
