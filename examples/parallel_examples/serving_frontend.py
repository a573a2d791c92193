"""Serving a row-partitioned index from multiple shard servers.

The 100M-row stretch (BASELINE config 5) splits a corpus across hosts that
do not share an ICI domain; each host serves its shard over TCP and a front
end merges per-shard top-k with the native C++ k-way merge.  This demo runs
two shard servers on loopback — the same wiring as separate hosts — and
shows the merged answer matching a single store over the whole corpus.
"""

import tempfile

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/lotus_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np

from lotus_tpu.serving import SearchFrontEnd, ShardServer, vs_search_fn
from lotus_tpu.vector_store import TpuVS

rng = np.random.default_rng(0)
corpus = rng.standard_normal((400, 32)).astype(np.float32)
queries = rng.standard_normal((3, 32)).astype(np.float32)


def shard_store(tmpdir, rows, tag):
    vs = TpuVS(index_type="flat", metric="ip")
    vs.index([f"doc{i}" for i in range(len(rows))], rows, f"{tmpdir}/{tag}")
    return vs


with tempfile.TemporaryDirectory() as d:
    half = len(corpus) // 2
    servers = [
        ShardServer(vs_search_fn(shard_store(d, corpus[:half], "s0"), id_offset=0)).start(),
        ShardServer(vs_search_fn(shard_store(d, corpus[half:], "s1"), id_offset=half)).start(),
    ]
    print("shards:", [s.address for s in servers])

    with SearchFrontEnd([s.address for s in servers]) as fe:
        dists, ids = fe.search(queries, 5)
    print("merged ids:", ids.tolist())

    whole = shard_store(d, corpus, "whole")
    print("single-store ids:", np.asarray(whole(queries, 5).indices).tolist())
    assert ids.tolist() == np.asarray(whole(queries, 5).indices).tolist()
    print("front end == single store: OK")

    # Each shard exposes serving counters over the same wire (op=STATS).
    from lotus_tpu.serving import ShardClient

    for s in servers:
        c = ShardClient(s.address)
        print("shard", s.address[1], "stats:", c.stats())
        c.close()

    for s in servers:
        s.stop()
