"""Serving front end: shard servers over loopback + native batched merge.

Two ShardServers each hold half of a corpus in a TpuVS flat index; the
SearchFrontEnd's merged answer must exactly match one store over the whole
corpus (row partitioning is lossless for exact search).
"""

import numpy as np
import pytest

from lotus_tpu import native
from lotus_tpu.serving import SearchFrontEnd, ShardClient, ShardServer, vs_search_fn
from lotus_tpu.vector_store import TpuVS

RNG = np.random.default_rng(7)
N, D, K = 200, 16, 10
CORPUS = RNG.standard_normal((N, D)).astype(np.float32)
QUERIES = RNG.standard_normal((5, D)).astype(np.float32)


def _make_store(tmp_path, rows: np.ndarray, tag: str) -> TpuVS:
    vs = TpuVS(index_type="flat", metric="ip", device_dtype="float32")
    vs.index([f"doc{i}" for i in range(rows.shape[0])], rows, str(tmp_path / tag))
    return vs


@pytest.fixture(scope="module")
def sharded(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("serving")
    half = N // 2
    servers = [
        ShardServer(vs_search_fn(_make_store(tmp, CORPUS[:half], "s0"), id_offset=0)).start(),
        ShardServer(vs_search_fn(_make_store(tmp, CORPUS[half:], "s1"), id_offset=half)).start(),
    ]
    yield servers
    for s in servers:
        s.stop()


def test_topk_merge_batch_matches_per_query():
    scores = np.sort(RNG.standard_normal((4, 3, 6)).astype(np.float32), axis=-1)[..., ::-1]
    ids = RNG.integers(0, 1000, size=(4, 3, 6)).astype(np.int64)
    bs, bi = native.topk_merge_batch(scores, ids, 5)
    for q in range(4):
        s, i = native.topk_merge(scores[q], ids[q], 5)
        np.testing.assert_array_equal(bs[q], s)
        np.testing.assert_array_equal(bi[q], i)


def test_shard_roundtrip(sharded):
    client = ShardClient(sharded[0].address)
    assert client.ping()
    dists, ids = client.search(QUERIES, K)
    assert dists.shape == (5, K) and ids.shape == (5, K)
    # Shard 0 serves global ids [0, N/2).
    assert ids.min() >= 0 and ids.max() < N // 2
    client.close()


def test_frontend_matches_single_store(sharded, tmp_path):
    whole = _make_store(tmp_path, CORPUS, "whole")
    expected = whole(QUERIES, K)
    exp_ids = np.asarray(expected.indices)

    with SearchFrontEnd([s.address for s in sharded]) as fe:
        dists, ids = fe.search(QUERIES, K)
    np.testing.assert_array_equal(ids, exp_ids)
    np.testing.assert_allclose(dists, np.asarray(expected.distances), rtol=1e-5, atol=1e-5)
    # Scores must come back descending.
    assert np.all(np.diff(dists, axis=1) <= 1e-6)


def test_frontend_k_exceeding_shard_rows(tmp_path):
    """K larger than one shard's row count: -1 padding must not leak into the
    merged result while real candidates remain on other shards."""
    tiny, big = CORPUS[:4], CORPUS[4:64]
    servers = [
        ShardServer(vs_search_fn(_make_store(tmp_path, tiny, "tiny"), id_offset=0)).start(),
        ShardServer(vs_search_fn(_make_store(tmp_path, big, "big"), id_offset=4)).start(),
    ]
    try:
        with SearchFrontEnd([s.address for s in servers]) as fe:
            dists, ids = fe.search(QUERIES[:2], 10)
        assert np.all(ids >= 0)  # 4 + 60 rows >= 10 everywhere
        whole = _make_store(tmp_path, CORPUS[:64], "whole64")
        np.testing.assert_array_equal(ids, np.asarray(whole(QUERIES[:2], 10).indices))
    finally:
        for s in servers:
            s.stop()


def test_error_frame_propagates(sharded):
    def broken(xq, k):
        raise RuntimeError("index not loaded")

    server = ShardServer(broken).start()
    try:
        client = ShardClient(server.address)
        with pytest.raises(RuntimeError, match="index not loaded"):
            client.search(QUERIES, K)
        client.close()
    finally:
        server.stop()


def test_concurrent_clients(sharded):
    """Several clients hammer one shard concurrently; per-connection server
    threads answer all of them correctly (the protocol is stateless)."""
    from concurrent.futures import ThreadPoolExecutor

    def one(i):
        c = ShardClient(sharded[0].address)
        try:
            dists, ids = c.search(QUERIES[i % len(QUERIES)][None, :], 3)
            return ids[0].tolist()
        finally:
            c.close()

    with ThreadPoolExecutor(max_workers=6) as pool:
        results = list(pool.map(one, range(12)))
    # Same query -> same answer, across interleaved connections.
    for i in range(12):
        assert results[i] == results[i % len(QUERIES)]


def test_client_reuses_connection(sharded):
    client = ShardClient(sharded[0].address)
    first = client.search(QUERIES, 3)
    second = client.search(QUERIES, 3)
    np.testing.assert_array_equal(first[1], second[1])
    assert client._conn is not None  # one persistent socket, two requests
    client.close()


def test_stats_op(sharded):
    client = ShardClient(sharded[0].address)
    before = client.stats()
    client.search(QUERIES, 3)
    after = client.stats()
    assert after["searches"] == before["searches"] + 1
    assert after["queries"] == before["queries"] + len(QUERIES)
    client.close()


def test_frontend_stats_aggregation(sharded):
    with SearchFrontEnd([s.address for s in sharded]) as fe:
        before = fe.stats()
        fe.search(QUERIES, 3)
        after = fe.stats()
    assert after["searches"] == before["searches"] + len(sharded)  # one per shard
    assert after["queries"] == before["queries"] + len(QUERIES) * len(sharded)
    assert len(after["shards"]) == len(sharded)


def test_client_reconnects_after_stale_connection(sharded):
    """A persistent connection killed underneath the client (server-side
    reset, idle teardown) must be re-established transparently: each
    request is a self-contained frame, so one resend is safe."""
    client = ShardClient(sharded[0].address)
    d1, i1 = client.search(QUERIES, K)
    # Kill the socket underneath; the next search must reconnect, not raise.
    assert client._conn is not None
    client._conn.close()
    d2, i2 = client.search(QUERIES, K)
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_allclose(d1, d2, rtol=1e-6)
    client.close()


def test_frontend_partial_serving_on_shard_death(sharded, tmp_path):
    """A dead shard raises by default; allow_partial=True serves the live
    shards' merge and records the casualty."""
    half = N // 2
    doomed = ShardServer(
        vs_search_fn(_make_store(tmp_path, CORPUS[half:], "doomed"), id_offset=half)
    ).start()
    doomed_addr = doomed.address
    fe = SearchFrontEnd([sharded[0].address, doomed_addr])
    full_d, full_i = fe.search(QUERIES, K)
    assert fe.last_failed_shards == []

    doomed.stop()
    with pytest.raises(Exception):
        fe.search(QUERIES, K)

    d, i = fe.search(QUERIES, K, allow_partial=True)
    assert fe.last_failed_shards == [doomed_addr]
    # Only shard-0 rows (< half) can appear now.
    assert (i < half).all()
    # Rows the live shard owns keep their scores from the full merge.
    for row_full, row_part, drow in zip(full_i, i, d):
        live = [x for x in row_full if x < half]
        assert list(row_part[: len(live)])[: K // 2] == live[: K // 2]

    # Once every shard is gone, partial serving has nothing to return.
    fe2 = SearchFrontEnd([doomed_addr])
    with pytest.raises(RuntimeError, match="all 1 shards failed"):
        fe2.search(QUERIES, K, allow_partial=True)
    fe.close()
    fe2.close()


def test_stop_kills_established_connections(tmp_path):
    """stop() must terminate PERSISTENT connections, not just the listener:
    a 'dead' shard serving one more request on an open socket breaks the
    partial-serving contract."""
    server = ShardServer(
        vs_search_fn(_make_store(tmp_path, CORPUS[:32], "est"), id_offset=0)
    ).start()
    client = ShardClient(server.address)
    client.search(QUERIES, 3)  # establish the persistent connection
    server.stop()
    with pytest.raises((ConnectionError, OSError, RuntimeError)):
        client.search(QUERIES, 3)
    client.close()


def test_stop_during_inflight_request(tmp_path):
    """A request in flight when stop() lands must fail at the client, and
    stop() must still return (it cannot hang on the busy connection)."""
    import threading as _threading
    import time as _time

    entered = _threading.Event()

    def slow_search(xq, k):
        entered.set()
        _time.sleep(0.5)  # still "on device" while stop() arrives
        return (
            np.zeros((xq.shape[0], k), dtype=np.float32),
            np.zeros((xq.shape[0], k), dtype=np.int64),
        )

    server = ShardServer(slow_search).start()
    client = ShardClient(server.address, timeout=10.0)
    errors: list[BaseException] = []

    def call():
        try:
            client.search(QUERIES, 3)
        except BaseException as e:  # noqa: BLE001 - recording for the assert
            errors.append(e)

    t = _threading.Thread(target=call)
    t.start()
    assert entered.wait(timeout=5)
    t0 = _time.monotonic()
    server.stop()
    assert _time.monotonic() - t0 < 5  # stop() didn't hang on the busy conn
    t.join(timeout=10)
    assert not t.is_alive()
    assert errors, "in-flight request must fail once the shard is stopped"
    client.close()
