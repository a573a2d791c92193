"""Pallas grouped-probe kernel (interpret mode) vs the window probe.

The kernel emits one candidate per 64-row bucket per probed block, so it
is approximate within a list (bucket collisions); tests therefore check
recall and guaranteed-top-1 rather than exact set parity.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from lotus_tpu.ops.ivf import build_ivf, ivf_search, load_ivf_state
from lotus_tpu.ops.pallas_ivf import BL, ivf_search_pallas


def _build(tmp_path, n=16384, d=64, nlist=8, seed=0, metric="ip"):
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((nlist, d)).astype(np.float32) * 3
    emb = centers[rng.integers(0, nlist, n)] + rng.standard_normal((n, d)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    idx_dir = str(tmp_path / "pallas_ivf")
    meta = {
        "kind": "ivf",
        "metric": metric,
        **build_ivf(idx_dir, emb, nlist=nlist, metric=metric, block_align=BL),
    }
    state = load_ivf_state(idx_dir, meta, jnp.float32)
    state["meta"] = meta
    return emb, state


def test_block_aligned_build_layout(tmp_path):
    _, state = _build(tmp_path, n=4096, nlist=4)
    start = np.asarray(state["ivf_list_start"])
    assert (start % BL == 0).all()
    assert state["ivf_vectors"].shape[0] % BL == 0
    assert int(state["meta"]["probe_window"]) % BL == 0


def test_pallas_probe_recall_vs_window_probe(tmp_path):
    emb, state = _build(tmp_path)
    rng = np.random.default_rng(1)
    q_rows = rng.integers(0, len(emb), 32)
    xq = jnp.asarray(emb[q_rows] + 0.02 * rng.standard_normal((32, emb.shape[1])).astype(np.float32))

    k, nprobe = 10, 4
    _, i_ref = ivf_search(state, xq, k, nprobe=nprobe, metric="ip")
    d_pl, i_pl = ivf_search_pallas(state, xq, k, nprobe=nprobe, metric="ip", interpret=True)

    i_ref, i_pl = np.asarray(i_ref), np.asarray(i_pl)
    # Top-1 is its bucket's max, so it survives whenever its list is probed.
    assert (i_pl[:, 0] == i_ref[:, 0]).all()
    recall = np.mean([len(set(i_pl[q]) & set(i_ref[q])) / k for q in range(len(i_ref))])
    assert recall >= 0.9, recall
    # Distances for agreed ids must match the probe's.
    d_ref, _ = ivf_search(state, xq, k, nprobe=nprobe, metric="ip")
    np.testing.assert_allclose(
        np.asarray(d_pl)[:, 0], np.asarray(d_ref)[:, 0], rtol=1e-4, atol=1e-4
    )


def test_pallas_probe_multichunk_units(tmp_path):
    # 512 queries x nprobe 4 over 8 lists -> ~256 pairs per list -> >1 query
    # chunk per list, exercising chunk decode in the unit tables.
    emb, state = _build(tmp_path, n=8192, nlist=8, seed=2)
    rng = np.random.default_rng(3)
    q_rows = rng.integers(0, len(emb), 512)
    xq = jnp.asarray(emb[q_rows])

    _, i_ref = ivf_search(state, xq, 1, nprobe=4, metric="ip")
    _, i_pl = ivf_search_pallas(state, xq, 1, nprobe=4, metric="ip", interpret=True)
    assert (np.asarray(i_pl)[:, 0] == np.asarray(i_ref)[:, 0]).mean() >= 0.999


def test_pallas_probe_requires_block_aligned_index(tmp_path):
    rng = np.random.default_rng(4)
    emb = rng.standard_normal((2048, 32)).astype(np.float32)
    idx_dir = str(tmp_path / "plain")
    meta = {"kind": "ivf", "metric": "ip", **build_ivf(idx_dir, emb, nlist=8, metric="ip")}
    state = load_ivf_state(idx_dir, meta, jnp.float32)
    state["meta"] = meta
    with pytest.raises(ValueError, match="block_align"):
        ivf_search_pallas(state, jnp.asarray(emb[:2]), 5, nprobe=2, metric="ip", interpret=True)


def test_tpu_vs_planner_routes_large_batch_to_pallas(tmp_path):
    from lotus_tpu.vector_store import TpuVS

    rng = np.random.default_rng(9)
    emb = rng.standard_normal((2048, 32)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    vs = TpuVS(index_type="ivf", nlist=2, nprobe=2)
    vs.index([], emb, str(tmp_path / "vsidx"))
    vs._pallas_interpret = True  # CPU backend

    # nlist=2 and n/nlist=1024 >= 512 -> the build is block-aligned.
    from lotus_tpu.ops.io import read_meta

    assert int(read_meta(str(tmp_path / "vsidx"))["block_align"]) == BL

    q = emb[:16] + 0.01 * rng.standard_normal((16, 32)).astype(np.float32)
    out = vs(q, 10)  # 16 * 2 >= 2 -> large-batch regime -> Pallas probe
    got = np.asarray(out.indices)
    ref = np.argsort(-(q @ emb.T), axis=1)[:, :10]
    # nprobe == nlist: full coverage; top-2-per-bucket makes this near-exact.
    recall = np.mean([len(set(got[i]) & set(ref[i])) / 10 for i in range(16)])
    assert recall >= 0.95, recall


def test_small_index_build_not_block_aligned(tmp_path):
    from lotus_tpu.vector_store import TpuVS
    from lotus_tpu.ops.io import read_meta

    rng = np.random.default_rng(10)
    emb = rng.standard_normal((600, 16)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    vs = TpuVS(index_type="ivf", nlist=16, nprobe=4)
    vs.index([], emb, str(tmp_path / "small"))
    # 600 / 16 << 512: block alignment would blow up storage 13x; skipped.
    assert int(read_meta(str(tmp_path / "small"))["block_align"]) == 0
    out = vs(emb[:4], 5)  # falls back to scan path, still correct
    assert (np.asarray(out.indices)[:, 0] == np.arange(4)).all()


def test_pallas_probe_int8_storage(tmp_path):
    emb, state_f32 = _build(tmp_path, n=16384, nlist=8, seed=6)
    idx_dir = str(tmp_path / "pallas_ivf")
    state = load_ivf_state(idx_dir, state_f32["meta"], jnp.int8)
    state["meta"] = state_f32["meta"]
    assert state["ivf_vectors"].dtype == jnp.int8
    assert "ivf_row_scales" in state

    rng = np.random.default_rng(8)
    q_rows = rng.integers(0, len(emb), 32)
    xq = jnp.asarray(emb[q_rows] + 0.02 * rng.standard_normal((32, emb.shape[1])).astype(np.float32))

    d_f, i_f = ivf_search_pallas(state_f32, xq, 10, nprobe=4, metric="ip", interpret=True)
    d_q, i_q = ivf_search_pallas(state, xq, 10, nprobe=4, metric="ip", interpret=True)
    i_f, i_q = np.asarray(i_f), np.asarray(i_q)
    # int8 quantization perturbs near-tied neighbours but not the set much.
    overlap = np.mean([len(set(i_q[r]) & set(i_f[r])) / 10 for r in range(32)])
    assert overlap >= 0.9, overlap
    assert (i_q[:, 0] == i_f[:, 0]).mean() >= 0.95
    # Dequantized distances approximate the float ones.
    np.testing.assert_allclose(np.asarray(d_q)[:, 0], np.asarray(d_f)[:, 0], rtol=0.05, atol=0.05)


def test_window_probe_int8_storage(tmp_path):
    from lotus_tpu.ops.ivf import ivf_search

    emb, state_f32 = _build(tmp_path, n=8192, nlist=8, seed=12)
    idx_dir = str(tmp_path / "pallas_ivf")
    state = load_ivf_state(idx_dir, state_f32["meta"], jnp.int8)
    state["meta"] = state_f32["meta"]

    rng = np.random.default_rng(13)
    xq = jnp.asarray(emb[rng.integers(0, len(emb), 16)])
    _, i_f = ivf_search(state_f32, xq, 5, nprobe=8, metric="ip")
    _, i_q = ivf_search(state, xq, 5, nprobe=8, metric="ip")
    assert (np.asarray(i_q)[:, 0] == np.asarray(i_f)[:, 0]).all()
    overlap = np.mean([
        len(set(np.asarray(i_q)[r]) & set(np.asarray(i_f)[r])) / 5 for r in range(16)
    ])
    assert overlap >= 0.9


def test_grouped_probe_rejects_int8(tmp_path):
    from lotus_tpu.ops.ivf import ivf_search_grouped

    emb, state_f32 = _build(tmp_path, n=4096, nlist=4, seed=14)
    state = load_ivf_state(str(tmp_path / "pallas_ivf"), state_f32["meta"], jnp.int8)
    state["meta"] = state_f32["meta"]
    with pytest.raises(NotImplementedError):
        ivf_search_grouped(state, jnp.asarray(emb[:4]), 5, nprobe=2, metric="ip")


def test_pallas_probe_l2(tmp_path):
    rng = np.random.default_rng(5)
    emb = rng.standard_normal((4096, 32)).astype(np.float32)
    idx_dir = str(tmp_path / "l2idx")
    meta = {"kind": "ivf", "metric": "l2", **build_ivf(idx_dir, emb, nlist=4, metric="l2", block_align=BL)}
    state = load_ivf_state(idx_dir, meta, jnp.float32)
    state["meta"] = meta
    q = jnp.asarray(emb[:16] + 0.01 * rng.standard_normal((16, 32)).astype(np.float32))
    d_ref, i_ref = ivf_search(state, q, 10, nprobe=4, metric="l2")
    d_pl, i_pl = ivf_search_pallas(state, q, 10, nprobe=4, metric="l2", interpret=True)
    i_ref, i_pl = np.asarray(i_ref), np.asarray(i_pl)
    assert (i_pl[:, 0] == i_ref[:, 0]).all()
    overlap = np.mean([len(set(i_pl[r]) & set(i_ref[r])) / 10 for r in range(16)])
    assert overlap >= 0.9, overlap
    # Distances are true squared euclidean distances where ids agree.
    np.testing.assert_allclose(
        np.asarray(d_pl)[:, 0], np.asarray(d_ref)[:, 0], rtol=1e-3, atol=1e-3
    )


def test_pallas_probe_l2_int8(tmp_path):
    rng = np.random.default_rng(15)
    emb = rng.standard_normal((4096, 32)).astype(np.float32)
    idx_dir = str(tmp_path / "l2q")
    meta = {"kind": "ivf", "metric": "l2", **build_ivf(idx_dir, emb, nlist=4, metric="l2", block_align=BL)}
    state = load_ivf_state(idx_dir, meta, jnp.int8)
    state["meta"] = meta
    assert "ivf_norms_sq" in state
    q = jnp.asarray(emb[:8] + 0.01 * rng.standard_normal((8, 32)).astype(np.float32))
    _, i_ref = ivf_search(state, q, 5, nprobe=4, metric="l2")  # int8 window probe
    _, i_pl = ivf_search_pallas(state, q, 5, nprobe=4, metric="l2", interpret=True)
    assert (np.asarray(i_pl)[:, 0] == np.asarray(i_ref)[:, 0]).all()


def test_fold_top1_mode_delivers_same_rescored_sets(tmp_path, monkeypatch):
    """FOLD='top1' with BUCKET=4 (the staged epilogue experiment) must agree
    with the production top2/8 fold after exact rescoring at full probe —
    same candidate count per pair, finer buckets."""
    import jax

    import lotus_tpu.ops.pallas_ivf as pivf
    from lotus_tpu.ops.ivf import build_ivf, load_ivf_state

    rng = np.random.default_rng(17)
    n, d, b, k = 4096, 32, 6, 5
    centers = rng.standard_normal((8, d)).astype(np.float32)
    emb = centers[rng.integers(0, 8, n)] + 0.2 * rng.standard_normal((n, d)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    queries = emb[:b] + 0.01 * rng.standard_normal((b, d)).astype(np.float32)

    idx_dir = str(tmp_path / "fold")
    meta = {"kind": "ivf", "metric": "ip",
            **build_ivf(idx_dir, emb, nlist=8, metric="ip", block_align=512)}
    state = load_ivf_state(idx_dir, meta, jnp.float32)
    state.setdefault("meta", meta)

    monkeypatch.setattr(pivf, "PACKED", False)  # pin the unpacked fold: FOLD is ignored when packed
    jax.clear_caches()
    ref_d, ref_i = pivf.ivf_search_pallas(
        state, jnp.asarray(queries), k, nprobe=8, metric="ip", interpret=True, rescore=64
    )

    monkeypatch.setattr(pivf, "FOLD", "top1")
    monkeypatch.setattr(pivf, "BUCKET", 4)
    jax.clear_caches()  # table construction is inside the jitted wrapper
    try:
        got_d, got_i = pivf.ivf_search_pallas(
            state, jnp.asarray(queries), k, nprobe=8, metric="ip", interpret=True, rescore=64
        )
    finally:
        jax.clear_caches()

    for q in range(b):
        assert set(np.asarray(got_i)[q]) == set(np.asarray(ref_i)[q]), q
    np.testing.assert_allclose(np.asarray(got_d), np.asarray(ref_d), rtol=1e-4, atol=1e-4)


def test_packed_epilogue_parity(tmp_path, monkeypatch):
    """PACKED mode (ids in the score mantissa) must deliver the same
    candidate sets as the production fold once exact rescoring removes the
    10-bit score truncation, on an int8 residual store."""
    import jax

    import lotus_tpu.ops.pallas_ivf as pivf
    from lotus_tpu.ops.ivf import build_ivf, load_ivf_state

    rng = np.random.default_rng(23)
    n, d, b, k = 4096, 32, 6, 5
    centers = rng.standard_normal((8, d)).astype(np.float32)
    emb = centers[rng.integers(0, 8, n)] + 0.2 * rng.standard_normal((n, d)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    queries = emb[:b] + 0.01 * rng.standard_normal((b, d)).astype(np.float32)

    idx_dir = str(tmp_path / "packed")
    meta = {"kind": "ivf", "metric": "ip",
            **build_ivf(idx_dir, emb, nlist=8, metric="ip", block_align=512)}
    meta["encoding"] = "residual_int8"
    state = load_ivf_state(idx_dir, meta, jnp.int8)
    state.setdefault("meta", meta)

    monkeypatch.setattr(pivf, "PACKED", False)  # the unpacked production fold is the oracle
    jax.clear_caches()
    ref_d, ref_i = pivf.ivf_search_pallas(
        state, jnp.asarray(queries), k, nprobe=8, metric="ip", interpret=True, rescore=64
    )

    monkeypatch.setattr(pivf, "PACKED", True)
    jax.clear_caches()
    try:
        got_d, got_i = pivf.ivf_search_pallas(
            state, jnp.asarray(queries), k, nprobe=8, metric="ip", interpret=True, rescore=64
        )
        # And the no-rescore path must bypass packing (exact scores are the
        # return value there): top-1 agreement with the production fold.
        nr_d, nr_i = pivf.ivf_search_pallas(
            state, jnp.asarray(queries), k, nprobe=8, metric="ip", interpret=True
        )
    finally:
        jax.clear_caches()

    for q in range(b):
        assert set(np.asarray(got_i)[q]) == set(np.asarray(ref_i)[q]), q
    np.testing.assert_allclose(np.asarray(got_d), np.asarray(ref_d), rtol=1e-4, atol=1e-4)
    assert (np.asarray(nr_i)[:, 0] == np.asarray(ref_i)[:, 0]).all()


def _residual_store(tmp_path, name, rng, n=4096, d=32, nlist=8, skew=False):
    centers = rng.standard_normal((8, d)).astype(np.float32)
    which = np.zeros(n, np.int64) if skew else rng.integers(0, 8, n)
    emb = centers[which] + 0.2 * rng.standard_normal((n, d)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    idx_dir = str(tmp_path / name)
    meta = {"kind": "ivf", "metric": "ip",
            **build_ivf(idx_dir, emb, nlist=nlist, metric="ip", block_align=512)}
    meta["encoding"] = "residual_int8"
    state = load_ivf_state(idx_dir, meta, jnp.int8)
    state.setdefault("meta", meta)
    return emb, state


@pytest.mark.parametrize("fold,bucket", [("top2", 4), ("top1", 4), ("top1", 8)])
def test_packed_fold_variants_parity(tmp_path, monkeypatch, fold, bucket):
    """Every (FOLD, BUCKET) combination of the PACKED epilogue must deliver
    the same rescored candidate sets as the unpacked top2/8 production fold
    at full probe — the shootout's correctness precondition."""
    import jax

    import lotus_tpu.ops.pallas_ivf as pivf

    rng = np.random.default_rng(31)
    b, k = 6, 5
    emb, state = _residual_store(tmp_path, f"pk_{fold}{bucket}", rng)
    queries = emb[:b] + 0.01 * rng.standard_normal((b, emb.shape[1])).astype(np.float32)

    monkeypatch.setattr(pivf, "PACKED", False)
    jax.clear_caches()
    ref_d, ref_i = pivf.ivf_search_pallas(
        state, jnp.asarray(queries), k, nprobe=8, metric="ip", interpret=True, rescore=64
    )

    monkeypatch.setattr(pivf, "PACKED", True)
    monkeypatch.setattr(pivf, "FOLD", fold)
    monkeypatch.setattr(pivf, "BUCKET", bucket)
    jax.clear_caches()
    try:
        got_d, got_i = pivf.ivf_search_pallas(
            state, jnp.asarray(queries), k, nprobe=8, metric="ip", interpret=True, rescore=64
        )
    finally:
        jax.clear_caches()

    for q in range(b):
        assert set(np.asarray(got_i)[q]) == set(np.asarray(ref_i)[q]), q
    np.testing.assert_allclose(np.asarray(got_d), np.asarray(ref_d), rtol=1e-4, atol=1e-4)


def test_packed_falls_back_when_window_exceeds_id_range(tmp_path, monkeypatch):
    """A store whose probe window exceeds the LOCAL_BITS id range (8192 rows)
    must silently take the unpacked fold under PACKED=True and still match
    the explicit unpacked result — the documented per-call fallback."""
    import jax

    import lotus_tpu.ops.pallas_ivf as pivf

    rng = np.random.default_rng(37)
    b, k = 4, 5
    # One tight cluster split over 2 lists -> each ~ n/2 rows; window > 8192.
    emb, state = _residual_store(tmp_path, "pk_fb", rng, n=18000, nlist=2, skew=True)
    assert int(state["meta"]["probe_window"]) > (1 << pivf.LOCAL_BITS)
    queries = emb[:b] + 0.01 * rng.standard_normal((b, emb.shape[1])).astype(np.float32)

    monkeypatch.setattr(pivf, "PACKED", False)
    jax.clear_caches()
    ref_d, ref_i = pivf.ivf_search_pallas(
        state, jnp.asarray(queries), k, nprobe=2, metric="ip", interpret=True, rescore=32
    )
    monkeypatch.setattr(pivf, "PACKED", True)
    jax.clear_caches()
    try:
        got_d, got_i = pivf.ivf_search_pallas(
            state, jnp.asarray(queries), k, nprobe=2, metric="ip", interpret=True, rescore=32
        )
    finally:
        jax.clear_caches()
    np.testing.assert_array_equal(np.asarray(got_i), np.asarray(ref_i))
    np.testing.assert_allclose(np.asarray(got_d), np.asarray(ref_d), rtol=1e-5)


def test_probe_adapts_to_store_block_alignment(tmp_path):
    """512-aligned and 1024-aligned stores over the same corpus must return
    the same rescored neighbours — the kernel reads the block geometry from
    the store meta (per-call), not from a module constant."""
    import jax

    rng = np.random.default_rng(41)
    n, d, b, k = 8192, 32, 6, 5
    centers = rng.standard_normal((8, d)).astype(np.float32)
    emb = centers[rng.integers(0, 8, n)] + 0.2 * rng.standard_normal((n, d)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    queries = emb[:b] + 0.01 * rng.standard_normal((b, d)).astype(np.float32)

    results = {}
    for align in (512, 1024):
        idx_dir = str(tmp_path / f"al{align}")
        meta = {"kind": "ivf", "metric": "ip",
                **build_ivf(idx_dir, emb, nlist=4, metric="ip", block_align=align)}
        meta["encoding"] = "residual_int8"
        state = load_ivf_state(idx_dir, meta, jnp.int8)
        state.setdefault("meta", meta)
        assert int(state["meta"]["block_align"]) == align
        d_, i_ = ivf_search_pallas(
            state, jnp.asarray(queries), k, nprobe=4, metric="ip",
            interpret=True, rescore=32,
        )
        results[align] = (np.asarray(d_), np.asarray(i_))
        jax.clear_caches()

    np.testing.assert_array_equal(results[512][1], results[1024][1])
    np.testing.assert_allclose(results[512][0], results[1024][0], rtol=1e-5)


def test_spilled_store_dedup_through_pallas_probe(tmp_path):
    """A spilled (SOAR-replicated) store must keep the 2k-headroom + dedup
    path: results are duplicate-free and match the window probe's, while an
    unspilled build of the same corpus takes the fast path (no dedup) and
    still agrees.  Guards the ``spilled`` static flag wiring."""
    rng = np.random.default_rng(33)
    n, d, k = 8192, 32, 8
    centers = rng.standard_normal((8, d)).astype(np.float32)
    emb = centers[rng.integers(0, 8, n)] + 0.3 * rng.standard_normal((n, d)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    queries = jnp.asarray(emb[:6] + 0.01 * rng.standard_normal((6, d)).astype(np.float32))

    got = {}
    for label, spill in (("spilled", 0.2), ("plain", 0.0)):
        idx_dir = str(tmp_path / label)
        meta = {"kind": "ivf", "metric": "ip",
                **build_ivf(idx_dir, emb, nlist=8, metric="ip", block_align=BL,
                            spill_frac=spill)}
        state = load_ivf_state(idx_dir, meta, jnp.float32)
        state["meta"] = meta
        assert (float(meta["spill_frac"]) > 0) == (spill > 0)
        _, i_pl = ivf_search_pallas(state, queries, k, nprobe=8, metric="ip", interpret=True)
        i_pl = np.asarray(i_pl)
        for row in i_pl:  # duplicate-free under replication
            live = [v for v in row if v >= 0]
            assert len(live) == len(set(live))
        got[label] = i_pl
        _, i_ref = ivf_search(state, queries, k, nprobe=8, metric="ip")
        # Full probe (nprobe = nlist): guaranteed-top-1 agreement and high
        # set overlap vs the window probe on the same store.
        assert (i_pl[:, 0] == np.asarray(i_ref)[:, 0]).all()
    # Spill only ever ADDS candidate routes; both stores agree on top-1.
    assert (got["spilled"][:, 0] == got["plain"][:, 0]).all()
