"""Sharded search and k-means on an 8-virtual-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lotus_tpu.ops import flat_search, kmeans_fit
from lotus_tpu.parallel import default_mesh, shard_rows, sharded_flat_search, sharded_kmeans_fit


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) == 8, "tests expect 8 virtual CPU devices"
    return default_mesh()


@pytest.mark.parametrize("metric", ["ip", "l2"])
def test_sharded_flat_matches_single_device(mesh, metric):
    rng = np.random.default_rng(0)
    n, d, b, k = 1000, 32, 5, 10
    xb = rng.standard_normal((n, d)).astype(np.float32)
    xq = rng.standard_normal((b, d)).astype(np.float32)

    xb_sharded, n_rows = shard_rows(jnp.asarray(xb), mesh, block_rows=64)
    dists, idx = sharded_flat_search(
        xb_sharded, jnp.asarray(xq), k, n_rows=n_rows, metric=metric, mesh=mesh, block_rows=64
    )
    ref_d, ref_i = flat_search(jnp.asarray(xb), jnp.asarray(xq), k, metric=metric)

    np.testing.assert_allclose(np.asarray(dists), np.asarray(ref_d), rtol=1e-4, atol=1e-4)
    assert (np.asarray(idx) == np.asarray(ref_i)).mean() > 0.99


def test_sharded_flat_with_subset_mask(mesh):
    rng = np.random.default_rng(1)
    n, d, b, k = 600, 16, 3, 5
    xb = rng.standard_normal((n, d)).astype(np.float32)
    xq = rng.standard_normal((b, d)).astype(np.float32)
    valid = rng.random(n) < 0.4

    xb_sharded, n_rows = shard_rows(jnp.asarray(xb), mesh, block_rows=16)
    n_pad = xb_sharded.shape[0]
    valid_pad = np.zeros(n_pad, bool)
    valid_pad[:n] = valid
    valid_sharded, _ = shard_rows(jnp.asarray(valid_pad)[:, None], mesh, block_rows=16)
    valid_sharded = valid_sharded[:, 0]

    dists, idx = sharded_flat_search(
        xb_sharded, jnp.asarray(xq), k, n_rows=n_rows, mesh=mesh,
        valid=valid_sharded, block_rows=16,
    )
    idx = np.asarray(idx)
    assert valid[idx[idx >= 0]].all()

    ref_d, ref_i = flat_search(jnp.asarray(xb), jnp.asarray(xq), k, valid=jnp.asarray(valid))
    np.testing.assert_allclose(np.asarray(dists), np.asarray(ref_d), rtol=1e-4, atol=1e-4)


def test_sharded_kmeans_matches_quality(mesh):
    rng = np.random.default_rng(2)
    k, d, n_per = 6, 16, 300
    centers = rng.standard_normal((k, d)).astype(np.float32) * 3
    x = np.concatenate([c + 0.05 * rng.standard_normal((n_per, d)).astype(np.float32) for c in centers])
    labels = np.repeat(np.arange(k), n_per)

    x_sharded, n_rows = shard_rows(jnp.asarray(x), mesh, block_rows=8)
    res = sharded_kmeans_fit(
        x_sharded, k, n_rows=n_rows, mesh=mesh, iters=10, key=jax.random.PRNGKey(0), block_rows=128
    )
    assign = np.asarray(res.assignments)
    assert assign.shape == (n_rows,)
    for c in range(k):
        _, counts = np.unique(assign[labels == c], return_counts=True)
        assert counts.max() / counts.sum() > 0.99


def test_sharded_ivf_matches_single_device(mesh, tmp_path):
    import jax.numpy as jnp

    from lotus_tpu.ops import io as index_io
    from lotus_tpu.ops.ivf import build_ivf, ivf_search, load_ivf_state
    from lotus_tpu.parallel.ivf import shard_ivf_state, sharded_ivf_search

    rng = np.random.default_rng(5)
    n, d, b, k = 2000, 32, 6, 10
    emb = rng.standard_normal((n, d)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    queries = emb[:b] + 0.02 * rng.standard_normal((b, d)).astype(np.float32)

    idx_dir = str(tmp_path / "ivf")
    meta = build_ivf(idx_dir, emb, nlist=32, metric="ip")
    meta = {"kind": "ivf", "metric": "ip", **meta}
    state = load_ivf_state(idx_dir, meta, jnp.float32)
    state["meta"] = meta

    ref_d, ref_i = ivf_search(state, jnp.asarray(queries), k, nprobe=32, metric="ip")

    sharded = shard_ivf_state(state, mesh)
    got_d, got_i = sharded_ivf_search(sharded, jnp.asarray(queries), k, nprobe=32, metric="ip")

    # nprobe == nlist: both are exhaustive -> same neighbour sets.
    for q in range(b):
        assert set(np.asarray(got_i)[q]) == set(np.asarray(ref_i)[q])
    np.testing.assert_allclose(
        np.sort(np.asarray(got_d)[0]), np.sort(np.asarray(ref_d)[0]), rtol=1e-4, atol=1e-4
    )


def test_sharded_ivf_partial_probe(mesh, tmp_path):
    import jax.numpy as jnp

    from lotus_tpu.ops.ivf import build_ivf, load_ivf_state
    from lotus_tpu.parallel.ivf import shard_ivf_state, sharded_ivf_search

    rng = np.random.default_rng(6)
    n, d, b, k = 1500, 16, 4, 5
    emb = rng.standard_normal((n, d)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    queries = emb[:b]

    idx_dir = str(tmp_path / "ivf2")
    meta = {"kind": "ivf", "metric": "ip", **build_ivf(idx_dir, emb, nlist=24, metric="ip")}
    state = load_ivf_state(idx_dir, meta, jnp.float32)
    state["meta"] = meta
    sharded = shard_ivf_state(state, mesh)
    d_out, i_out = sharded_ivf_search(sharded, jnp.asarray(queries), k, nprobe=6, metric="ip")
    got = np.asarray(i_out)
    # Each query's own row must be found (it lives in the top probed list).
    assert all(q in got[q] for q in range(b))


def test_sharded_ivf_int8_matches_float(mesh, tmp_path):
    import jax.numpy as jnp

    from lotus_tpu.ops.ivf import build_ivf, load_ivf_state
    from lotus_tpu.parallel.ivf import shard_ivf_state, sharded_ivf_search

    rng = np.random.default_rng(7)
    n, d, b, k = 2000, 32, 6, 5
    emb = rng.standard_normal((n, d)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    queries = emb[:b] + 0.01 * rng.standard_normal((b, d)).astype(np.float32)

    idx_dir = str(tmp_path / "ivf8")
    meta = {"kind": "ivf", "metric": "ip", **build_ivf(idx_dir, emb, nlist=16, metric="ip")}
    state_f = load_ivf_state(idx_dir, meta, jnp.float32)
    state_f["meta"] = meta
    state_q = load_ivf_state(idx_dir, meta, jnp.int8)
    state_q["meta"] = meta
    assert state_q["ivf_vectors"].dtype == jnp.int8

    sh_f = shard_ivf_state(state_f, mesh)
    sh_q = shard_ivf_state(state_q, mesh)
    assert "scales" in sh_q and "scales" not in sh_f

    _, i_f = sharded_ivf_search(sh_f, jnp.asarray(queries), k, nprobe=16, metric="ip")
    d_q, i_q = sharded_ivf_search(sh_q, jnp.asarray(queries), k, nprobe=16, metric="ip")
    i_f, i_q = np.asarray(i_f), np.asarray(i_q)
    assert (i_q[:, 0] == i_f[:, 0]).all()
    overlap = np.mean([len(set(i_q[r]) & set(i_f[r])) / k for r in range(b)])
    assert overlap >= 0.9


def test_sharded_int8_store(mesh, tmp_path):
    # Review finding: int8 + mesh used to crash (scales never reached the
    # sharded kernel).
    from lotus_tpu.vector_store import TpuVS

    rng = np.random.default_rng(9)
    emb = rng.standard_normal((600, 32)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    queries = emb[:4] + 0.02 * rng.standard_normal((4, 32)).astype(np.float32)

    vs = TpuVS(device_dtype="int8", mesh=mesh, block_rows=32)
    vs.index([], emb, str(tmp_path / "int8_sharded"))
    out = vs(queries, 5)
    got = np.asarray(out.indices)
    ref = np.argsort(-(queries @ emb.T), axis=1)[:, :5]
    recall = np.mean([len(set(got[i]) & set(ref[i])) / 5 for i in range(4)])
    assert recall >= 0.9


def test_sharded_pallas_probe_matches_single_device(mesh, tmp_path):
    """The Pallas grouped probe under shard_map (interpret mode) returns the
    same neighbour sets as the single-device Pallas probe."""
    from lotus_tpu.ops import io as index_io
    from lotus_tpu.ops.ivf import build_ivf, load_ivf_state
    from lotus_tpu.ops.pallas_ivf import ivf_search_pallas
    from lotus_tpu.parallel.ivf import shard_ivf_state, sharded_ivf_search_pallas

    rng = np.random.default_rng(9)
    n, d, b, k = 6144, 32, 8, 10
    emb = rng.standard_normal((n, d)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    queries = emb[:b] + 0.02 * rng.standard_normal((b, d)).astype(np.float32)

    idx_dir = str(tmp_path / "ivf_blk")
    meta = {"kind": "ivf", "metric": "ip",
            **build_ivf(idx_dir, emb, nlist=8, metric="ip", block_align=512)}
    state = load_ivf_state(idx_dir, meta, jnp.float32)
    state["meta"] = meta

    ref_d, ref_i = ivf_search_pallas(
        state, jnp.asarray(queries), k, nprobe=8, metric="ip", interpret=True
    )
    sharded = shard_ivf_state(state, mesh)
    got_d, got_i = sharded_ivf_search_pallas(
        sharded, jnp.asarray(queries), k, nprobe=8, metric="ip", interpret=True
    )
    for q in range(b):
        assert set(np.asarray(got_i)[q]) == set(np.asarray(ref_i)[q]), q
    np.testing.assert_allclose(
        np.sort(np.asarray(got_d), axis=1), np.sort(np.asarray(ref_d), axis=1),
        rtol=1e-3, atol=1e-3,
    )


def test_sharded_pallas_probe_int8(mesh, tmp_path):
    from lotus_tpu.ops.ivf import build_ivf, load_ivf_state
    from lotus_tpu.parallel.ivf import shard_ivf_state, sharded_ivf_search_pallas

    rng = np.random.default_rng(10)
    n, d, b, k = 6144, 32, 6, 5
    emb = rng.standard_normal((n, d)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    queries = emb[:b] + 0.01 * rng.standard_normal((b, d)).astype(np.float32)

    idx_dir = str(tmp_path / "ivf_blk8")
    meta = {"kind": "ivf", "metric": "ip",
            **build_ivf(idx_dir, emb, nlist=8, metric="ip", block_align=512)}
    state = load_ivf_state(idx_dir, meta, jnp.int8)
    state["meta"] = meta
    sharded = shard_ivf_state(state, mesh)
    d_out, i_out = sharded_ivf_search_pallas(
        sharded, jnp.asarray(queries), k, nprobe=8, metric="ip", interpret=True
    )
    got = np.asarray(i_out)
    assert all(q in got[q] for q in range(b))  # own row always found


def test_hybrid_mesh_single_process():
    from lotus_tpu.parallel.distributed import CHIP_AXIS, HOST_AXIS, hybrid_mesh, init_runtime

    assert init_runtime() is False  # no coordinator env: single-process no-op
    mesh = hybrid_mesh()
    assert mesh.shape[HOST_AXIS] == 1
    assert mesh.shape[CHIP_AXIS] == len(jax.devices())


def test_index_shard_roundtrip(tmp_path):
    from lotus_tpu.parallel.distributed import (
        load_index_shard,
        save_index_shards,
        shard_manifest,
    )

    rng = np.random.default_rng(3)
    root = str(tmp_path / "sharded_idx")
    for sid in range(3):
        save_index_shards(
            root,
            {"vectors": rng.standard_normal((40 + sid, 8)).astype(np.float32),
             "row_ids": np.arange(40 + sid, dtype=np.int32)},
            shard_id=sid, num_shards=3, meta={"metric": "ip"},
        )
    man = shard_manifest(root)
    assert man["num_shards"] == 3 and len(man["shards"]) == 3
    back = load_index_shard(root, 1)
    assert back["vectors"].shape == (41, 8)
    assert back["row_ids"].shape == (41,)

    with pytest.raises(FileNotFoundError):
        load_index_shard(root, 9)


def test_tpu_vs_config5_shard_lifecycle(mesh, tmp_path):
    """BASELINE config-5 structural path through the PRODUCT store: index()
    persists per-host shards, a fresh TpuVS reloads only shard files (no
    monolithic arrays on device), the sharded probe matches a single-device
    store, and ids-subset search avoids the flat-copy fallback."""
    from lotus_tpu.vector_store.tpu_vs import TpuVS

    rng = np.random.default_rng(11)
    n, d, b = 512 * 8, 32, 8
    emb = rng.standard_normal((n, d)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    queries = emb[:b] + 0.01 * rng.standard_normal((b, d)).astype(np.float32)
    idx_dir = str(tmp_path / "cfg5")

    builder = TpuVS(index_type="ivf", metric="ip", device_dtype="int8", nlist=8, mesh=mesh)
    builder.index([f"doc {i}" for i in range(n)], emb, idx_dir)
    assert (tmp_path / "cfg5" / "shards.json").exists()

    server = TpuVS(index_type="ivf", metric="ip", device_dtype="int8", nprobe=8,
                   mesh=mesh, rescore=8)
    server._pallas_interpret = True
    server.load_index(idx_dir)
    out = server(queries, 5)
    state = server._state
    assert state is not None and "ivf_sharded" in state and "ivf_vectors" not in state
    # Persisted shards carry the row->list map, so the server-side sharded
    # rescore branch (TpuVS rescore= on a mesh) is live on this path.
    assert "row_list" in state["ivf_sharded"]

    solo = TpuVS(index_type="ivf", metric="ip", device_dtype="int8", nprobe=8)
    solo._pallas_interpret = True
    solo.load_index(idx_dir)
    ref = solo(queries, 5)
    overlap = np.mean([
        len(set(a) & set(r)) / 5.0 for a, r in zip(out.indices, ref.indices)
    ])
    assert overlap >= 0.9, overlap

    # ids-restricted search on the shard-only state: exact disk-subset path,
    # never a full flat copy (state must stay shard-only afterwards).
    allowed = list(range(0, n, 3))
    sub = server(queries, 5, ids=allowed)
    assert "xb" not in server._state
    allowed_set = set(allowed)
    for row in sub.indices:
        assert all(v in allowed_set or v == -1 for v in row)
    # Exact subset parity with brute force over the allowed rows.
    sims = queries @ emb[allowed].T
    for q in range(b):
        want = {allowed[j] for j in np.argsort(-sims[q])[:5]}
        assert len(want & set(sub.indices[q])) >= 4


def test_save_load_sharded_ivf_state_roundtrip(mesh, tmp_path):
    """plan -> save -> load_sharded round trip preserves the probe result."""
    from lotus_tpu.ops.ivf import build_ivf, load_ivf_state
    from lotus_tpu.parallel import load_sharded_ivf_state, save_ivf_shards, shard_ivf_state
    from lotus_tpu.parallel.ivf import sharded_ivf_search

    rng = np.random.default_rng(12)
    n, d, b, k = 4096, 16, 6, 5
    emb = rng.standard_normal((n, d)).astype(np.float32)
    idx_dir = str(tmp_path / "rt")
    meta = {"kind": "ivf", "metric": "ip", **build_ivf(idx_dir, emb, nlist=8, metric="ip")}
    state = load_ivf_state(idx_dir, meta, jnp.float32)
    state["meta"] = meta
    queries = emb[:b]

    mem = shard_ivf_state(state, mesh)
    d_mem, i_mem = sharded_ivf_search(mem, jnp.asarray(queries), k, nprobe=8, metric="ip")

    host_state = load_ivf_state(idx_dir, meta, jnp.float32, device=False)
    host_state["meta"] = meta
    save_ivf_shards(idx_dir, host_state, mesh.devices.size)
    disk = load_sharded_ivf_state(idx_dir, meta, mesh)
    d_dk, i_dk = sharded_ivf_search(disk, jnp.asarray(queries), k, nprobe=8, metric="ip")

    np.testing.assert_array_equal(np.asarray(i_mem), np.asarray(i_dk))
    np.testing.assert_allclose(np.asarray(d_mem), np.asarray(d_dk), rtol=1e-5)

    # Mesh-size mismatch is rejected up front.
    from jax.sharding import Mesh

    if mesh.devices.size >= 2:
        half = Mesh(mesh.devices.reshape(-1)[: mesh.devices.size // 2], (mesh.axis_names[0],))
        with pytest.raises(ValueError, match="shards"):
            load_sharded_ivf_state(idx_dir, meta, half)


def test_sharded_pallas_rescore_matches_exact(mesh, tmp_path):
    """Shard-local exact rescoring: the sharded int8 probe with rescore
    recovers the f32 brute-force neighbours (quantization rank flips at the
    top-k boundary removed), and query_chunk slicing changes nothing."""
    from lotus_tpu.ops.ivf import build_ivf, load_ivf_state
    from lotus_tpu.parallel.ivf import shard_ivf_state, sharded_ivf_search_pallas

    rng = np.random.default_rng(21)
    n, d, b, k = 6144, 32, 8, 5
    # Clustered corpus so residual coding genuinely survives the load's
    # sample check (uniform data downgrades residual -> plain int8).
    centers = rng.standard_normal((8, d)).astype(np.float32)
    emb = centers[rng.integers(0, 8, n)] + 0.15 * rng.standard_normal((n, d)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    queries = emb[:b] + 0.01 * rng.standard_normal((b, d)).astype(np.float32)
    gt = np.argsort(-(queries @ emb.T), axis=1)[:, :k]

    idx_dir = str(tmp_path / "ivf_rsc")
    meta = {"kind": "ivf", "metric": "ip",
            **build_ivf(idx_dir, emb, nlist=8, metric="ip", block_align=512)}
    meta["encoding"] = "residual_int8"
    state = load_ivf_state(idx_dir, meta, jnp.int8)
    # Keep the load's encoding decision; only fill meta if the load kept it.
    state.setdefault("meta", meta)
    assert state["meta"]["encoding"] == "residual_int8"  # clustered -> kept
    sharded = shard_ivf_state(state, mesh)
    assert "row_list" in sharded

    got_d, got_i = sharded_ivf_search_pallas(
        sharded, jnp.asarray(queries), k, nprobe=8, metric="ip",
        interpret=True, rescore=32,
    )
    got_i = np.asarray(got_i)
    # Parity with the single-device rescored search: both reconstruct the
    # same int8 rows and re-rank with exact f32 dots, so the neighbour sets
    # must match (per-query recall vs gt is corpus-hardness-bound and
    # identical for both — asserted equal, not pinned).
    from lotus_tpu.ops.pallas_ivf import ivf_search_pallas

    ref_d, ref_i = ivf_search_pallas(
        state, jnp.asarray(queries), k, nprobe=8, metric="ip", interpret=True, rescore=32
    )
    for q in range(b):
        assert set(got_i[q]) == set(np.asarray(ref_i)[q]), q
    # Rescored scores are exact f32 dots against the reconstructed rows —
    # within quantization distance of the true similarity.
    np.testing.assert_allclose(
        np.asarray(got_d)[:, 0], np.sum(queries * emb[got_i[:, 0]], axis=1), rtol=3e-2, atol=3e-2
    )

    chunk_d, chunk_i = sharded_ivf_search_pallas(
        sharded, jnp.asarray(queries), k, nprobe=8, metric="ip",
        interpret=True, rescore=32, query_chunk=3,
    )
    np.testing.assert_array_equal(np.asarray(chunk_i), got_i)


def test_sharded_window_probe_rescore(mesh, tmp_path):
    """The small-batch sharded window probe supports the same shard-local
    exact rescoring as the Pallas variant: int8 results recover the order
    of the f32 single-device window probe."""
    from lotus_tpu.ops.ivf import build_ivf, load_ivf_state
    from lotus_tpu.parallel.ivf import shard_ivf_state, sharded_ivf_search

    rng = np.random.default_rng(31)
    n, d, b, k = 4096, 32, 4, 5
    centers = rng.standard_normal((8, d)).astype(np.float32)
    emb = centers[rng.integers(0, 8, n)] + 0.15 * rng.standard_normal((n, d)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    queries = emb[:b] + 0.01 * rng.standard_normal((b, d)).astype(np.float32)

    idx_dir = str(tmp_path / "ivf_wrsc")
    meta = {"kind": "ivf", "metric": "ip",
            **build_ivf(idx_dir, emb, nlist=8, metric="ip")}
    meta["encoding"] = "residual_int8"
    state = load_ivf_state(idx_dir, meta, jnp.int8)
    state.setdefault("meta", meta)
    sharded = shard_ivf_state(state, mesh)

    plain_d, plain_i = sharded_ivf_search(
        sharded, jnp.asarray(queries), k, nprobe=8, metric="ip"
    )
    resc_d, resc_i = sharded_ivf_search(
        sharded, jnp.asarray(queries), k, nprobe=8, metric="ip", rescore=32
    )
    # Full probe modulo window truncation: rescoring must recover the exact
    # top-1 and nearly all of the brute-force set (the window probe reads at
    # most probe_window rows per list, so a tail row can be missing).
    gt = np.argsort(-(queries @ emb.T), axis=1)[:, :k]
    resc_i = np.asarray(resc_i)
    assert (resc_i[:, 0] == gt[:, 0]).all()
    overlap = np.mean([len(set(resc_i[q]) & set(gt[q])) / k for q in range(b)])
    assert overlap >= 0.9, overlap
    plain_overlap = np.mean(
        [len(set(np.asarray(plain_i)[q]) & set(gt[q])) / k for q in range(b)]
    )
    assert overlap >= plain_overlap  # rescoring never hurts
    # Rescored scores are f32 dots on reconstructed rows (near-true sims).
    np.testing.assert_allclose(
        np.asarray(resc_d)[:, 0], np.sum(queries * emb[resc_i[:, 0]], axis=1),
        rtol=3e-2, atol=3e-2,
    )


def test_sharded_ivf_recall_at_scale(mesh, tmp_path):
    """Scale-ish recall gate on the 8-device CPU mesh (VERDICT round-3
    item 5): a clustered 128k-row corpus sharded by IVF list must hold
    recall@10 >= 0.95 vs the exact single-device oracle at a partial
    probe, and every shard must own live lists (skew/balance check)."""
    import jax.numpy as jnp

    from lotus_tpu.ops import flat_search
    from lotus_tpu.ops.ivf import build_ivf, load_ivf_state
    from lotus_tpu.parallel.ivf import shard_ivf_state, sharded_ivf_search

    rng = np.random.default_rng(42)
    n, d, b, k, nlist = 131072, 48, 64, 10, 128
    centers = rng.standard_normal((256, d)).astype(np.float32) * 2
    emb = centers[rng.integers(0, 256, n)] + 0.3 * rng.standard_normal((n, d)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    queries = emb[rng.choice(n, b, replace=False)] + 0.02 * rng.standard_normal((b, d)).astype(
        np.float32
    )

    idx_dir = str(tmp_path / "ivf_scale")
    meta = {"kind": "ivf", "metric": "ip", **build_ivf(idx_dir, emb, nlist=nlist, metric="ip")}
    state = load_ivf_state(idx_dir, meta, jnp.float32)
    state["meta"] = meta

    ref_d, ref_i = flat_search(jnp.asarray(emb), jnp.asarray(queries), k, metric="ip")
    ref = np.asarray(ref_i)

    sharded = shard_ivf_state(state, mesh)
    # Balance: every mesh slot must own a non-trivial share of the rows.
    owned = np.asarray(sharded["owned"])          # (devices, nlist) bool
    sizes = np.asarray(state["ivf_list_size"])
    per_shard_rows = (owned * sizes[None, :]).sum(axis=1)
    assert (per_shard_rows > 0.02 * n).all(), per_shard_rows

    got_d, got_i = sharded_ivf_search(sharded, jnp.asarray(queries), k, nprobe=16, metric="ip")
    got = np.asarray(got_i)
    recall = np.mean([len(set(got[q]) & set(ref[q])) / k for q in range(b)])
    assert recall >= 0.95, f"sharded recall@10 {recall:.4f} < 0.95 at nprobe=16/128"
