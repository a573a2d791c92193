"""Recall-target autotuning: ops/autotune ladder math and the TpuVS
calibrate/persist/reuse lifecycle (CPU, window probe).

The reference has no counterpart — faiss nprobe is a raw user knob
(`lotus/vector_store/faiss_vs.py`); this is an engine addition.
"""

import json
import os

import numpy as np
import pytest

from lotus_tpu.ops import autotune
from lotus_tpu.vector_store import TpuVS


def test_nprobe_ladder_shape():
    lad = autotune.nprobe_ladder(64)
    assert lad[0] == 1 and lad[-1] == 64
    assert all(b > a for a, b in zip(lad, lad[1:]))
    # ~1.5x steps: no jump more than doubles
    assert all(b <= 2 * a for a, b in zip(lad, lad[1:]))


def test_recall_at_k_ignores_padding():
    got = np.array([[1, 2, -1], [7, 8, 9]])
    want = np.array([[1, 3, -1], [7, 8, 9]])
    # Row 0: hits {1} of the 2 VALID oracle ids {1, 3} -> 1/2 (normalized
    # by valid hits, NOT k: -1 padding must not cap recall below 1.0);
    # row 1: 3/3.
    assert autotune.recall_at_k(got, want, 3) == pytest.approx((1 / 2 + 1.0) / 2)


def test_recall_at_k_reaches_one_with_padded_oracle():
    """A query with fewer than k reachable neighbors (oracle padded with -1)
    must still be able to score recall 1.0 — otherwise recall targets near
    1.0 silently degrade calibration to the full probe."""
    got = np.array([[4, 9, -1, -1]])
    want = np.array([[9, 4, -1, -1]])
    assert autotune.recall_at_k(got, want, 4) == 1.0


def test_calibrate_picks_smallest_sufficient_nprobe():
    # Synthetic monotone search: nprobe p reveals the first p "true" ids.
    want = np.tile(np.arange(10), (4, 1))

    def search_fn(xq, k, nprobe):
        out = np.full((4, k), -1)
        out[:, : min(nprobe, k)] = want[:, : min(nprobe, k)]
        return out

    res = autotune.calibrate_nprobe(
        search_fn, np.zeros((4, 8), np.float32), nlist=64, recall_target=0.55, k=10
    )
    # Ladder 1,2,3,4,6,8,... -> 6 is the first with recall 0.6 >= 0.55.
    assert res["nprobe"] == 6
    assert res["recall"] == pytest.approx(0.6)
    assert res["ladder"][-1][0] == 6


def test_calibrate_falls_back_to_full_probe():
    def search_fn(xq, k, nprobe):
        if nprobe >= 64:  # only the full probe finds anything
            return np.tile(np.arange(k), (2, 1))
        return np.full((2, k), -1)

    res = autotune.calibrate_nprobe(
        search_fn, np.zeros((2, 8), np.float32), nlist=64, recall_target=0.99, k=5
    )
    assert res["nprobe"] == 64
    assert res["recall"] == 1.0


@pytest.fixture
def clustered(tmp_path):
    rng = np.random.default_rng(5)
    centers = rng.standard_normal((16, 48)).astype(np.float32)
    emb = centers[rng.integers(0, 16, 3000)] + 0.15 * rng.standard_normal(
        (3000, 48)
    ).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    d = str(tmp_path / "ivf")
    vs = TpuVS(index_type="ivf", nlist=16, nprobe=1)
    vs.index([], emb, d)
    return vs, emb, d


def test_tpu_vs_calibrate_and_persist(clustered):
    vs, emb, d = clustered
    res = vs.calibrate_nprobe(0.95, k=10, nq=64)
    assert 1 <= res["nprobe"] <= 16
    assert res["recall"] >= 0.95
    assert vs.nprobe == res["nprobe"]
    # On clustered data a partial probe must suffice.
    assert res["nprobe"] < 16

    # Persisted into meta.json.
    with open(os.path.join(d, "meta.json")) as f:
        meta = json.load(f)
    assert meta["calibration"]["0.95@10"]["nprobe"] == res["nprobe"]

    # The calibrated store actually delivers the target recall on real
    # perturbed queries (vs the exhaustive oracle).
    rng = np.random.default_rng(7)
    q = emb[rng.integers(0, len(emb), 32)] + 0.02 * rng.standard_normal(
        (32, 48)
    ).astype(np.float32)
    got = np.asarray(vs(q, 10).indices)
    ref = np.argsort(-(q @ emb.T), axis=1)[:, :10]
    recall = np.mean([len(set(got[i]) & set(ref[i])) / 10 for i in range(32)])
    assert recall >= 0.9


def test_recall_target_reuses_persisted_calibration(clustered, monkeypatch):
    vs, emb, d = clustered
    first = vs.calibrate_nprobe(0.95, k=10, nq=64)

    # A fresh store with recall_target set must adopt the persisted entry
    # without re-measuring (the ladder search would call ops/autotune).
    def boom(*a, **kw):  # pragma: no cover - failure path
        raise AssertionError("calibration should have been reused from meta.json")

    monkeypatch.setattr(autotune, "calibrate_nprobe", boom)
    vs2 = TpuVS(index_type="ivf", nlist=16, recall_target=0.95)
    vs2.load_index(d)
    out = vs2(emb[:4], 10)
    assert np.asarray(out.indices).shape == (4, 10)
    assert vs2.nprobe == first["nprobe"]


def test_exact_oracle_calibration_on_quantized_store(tmp_path):
    """oracle='exact' makes recall_target ABSOLUTE: on a quantized store the
    relative (full-probe) oracle cannot see quantization loss, so a 0.999
    target calibrated relatively can under-deliver vs exact float32.  Exact
    mode must either meet the target against the float32 ground truth or
    loudly flag it unreachable with the store's structural ceiling."""
    rng = np.random.default_rng(11)
    centers = rng.standard_normal((8, 64)).astype(np.float32)
    # Tight clusters -> many near-ties at the top-k boundary, where int8
    # quantization flips ranks.
    emb = centers[rng.integers(0, 8, 4000)] + 0.02 * rng.standard_normal(
        (4000, 64)
    ).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    d = str(tmp_path / "q")
    vs = TpuVS(index_type="ivf", nlist=8, device_dtype="int8", int8_encoding="plain")
    vs.index([], emb, d)

    rel = vs.calibrate_nprobe(0.999, k=10, nq=64)
    assert rel["oracle"] == "full_probe"
    assert rel["recall_abs"] is None and rel["ceiling"] == 1.0

    res = vs.calibrate_nprobe(0.999, k=10, nq=64, oracle="exact")
    assert res["oracle"] == "exact"
    assert res["recall_abs"] is not None
    # Quantization makes even the full probe imperfect vs exact float32.
    assert res["ceiling"] < 1.0
    if res["target_unreachable"]:
        assert res["ceiling"] < 0.999
        assert res["nprobe"] == 8  # serves the best it has: the full probe
    else:
        assert res["recall"] >= 0.999
    # Both entries persist under distinct keys.
    with open(os.path.join(d, "meta.json")) as f:
        cal = json.load(f)["calibration"]
    assert "0.999@10" in cal and "0.999@10/exact" in cal

    # The absolute number must be honest: re-measure the adopted operating
    # point against an independent exact scan.
    got = np.asarray(vs(emb[:64], 10, nprobe=res["nprobe"]).indices)
    ref = np.argsort(-(emb[:64] @ emb.T), axis=1)[:, :10]
    measured = np.mean([len(set(got[i]) & set(ref[i])) / 10 for i in range(64)])
    assert measured >= res["recall"] - 0.05


def test_calibrate_measures_the_served_regime_only(tmp_path):
    """On a Pallas-eligible store __call__ serves EVERY batch size through
    the grouped Pallas probe (round-5 planner), so calibration must measure
    exactly that path — min-ing in the never-served window probe would
    inflate nprobe (the paths only guarantee ~0.9 mutual top-k overlap)."""
    rng = np.random.default_rng(2)
    centers = rng.standard_normal((4, 32)).astype(np.float32)
    emb = centers[rng.integers(0, 4, 4096)] + 0.1 * rng.standard_normal(
        (4096, 32)
    ).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    d = str(tmp_path / "blk")
    vs = TpuVS(index_type="ivf", nlist=4)
    vs._pallas_interpret = True  # CPU stand-in for the on-TPU planner
    vs.index([], emb, d)
    assert vs._pallas_eligible(vs._materialize()["meta"])

    res = vs.calibrate_nprobe(0.9, k=10, nq=32)
    assert res["regimes"] == ["pallas"]
    assert res["recall"] >= 0.9

    # A non-eligible store calibrates on its own serving path: the window
    # probe.
    d2 = str(tmp_path / "noblk")
    vs2 = TpuVS(index_type="ivf", nlist=64)  # avg list 64 rows: unaligned
    vs2.index([], emb, d2)
    assert not vs2._pallas_eligible(vs2._materialize()["meta"])
    res2 = vs2.calibrate_nprobe(0.9, k=10, nq=32)
    assert res2["regimes"] == ["window"]
    assert res2["recall"] >= 0.9


def test_lazy_autotune_warns_on_user_set_nprobe(clustered, caplog):
    """An explicitly constructed nprobe is a user decision — lazy
    calibration repinning it must say so."""
    import logging

    vs, emb, d = clustered
    vs.calibrate_nprobe(0.95, k=10, nq=64)  # persist an entry
    vs2 = TpuVS(index_type="ivf", nlist=16, nprobe=3, recall_target=0.95)
    vs2.load_index(d)
    with caplog.at_level(logging.WARNING, logger="lotus_tpu"):
        vs2(emb[:4], 10)
    if vs2.nprobe != 3:  # calibration picked a different point
        assert any("overriding explicitly constructed" in r.message for r in caplog.records)


def test_lazy_autotune_calibrates_once_across_distinct_k(clustered, monkeypatch):
    """The lazy path keys on a FIXED k: searching with different K values
    must not rerun the full-probe oracle each time."""
    vs, emb, d = clustered
    calls = {"n": 0}
    real = autotune.calibrate_nprobe

    def counting(*a, **kw):
        calls["n"] += 1
        return real(*a, **kw)

    monkeypatch.setattr(autotune, "calibrate_nprobe", counting)
    vs2 = TpuVS(index_type="ivf", nlist=16, recall_target=0.95)
    vs2.load_index(d)
    vs2(emb[:4], 5)
    vs2(emb[:4], 20)
    vs2(emb[:4], 7)
    assert calls["n"] <= 1  # 0 if a persisted entry existed, never per-K


def test_calibrate_requires_ivf(tmp_path):
    emb = np.eye(8, 32, dtype=np.float32)
    vs = TpuVS()
    vs.index([], emb, str(tmp_path / "flat"))
    with pytest.raises(ValueError, match="IVF"):
        vs.calibrate_nprobe(0.9)


def test_calibrate_on_sharded_store(tmp_path):
    """Autotune must work on a mesh-sharded store (config-5 deployments):
    the ladder probes ride the sharded path and the chosen point persists."""
    import jax

    if jax.device_count() < 2:
        pytest.skip("needs the multi-device CPU mesh")
    from lotus_tpu.parallel import default_mesh

    rng = np.random.default_rng(3)
    centers = rng.standard_normal((16, 32)).astype(np.float32)
    emb = centers[rng.integers(0, 16, 4096)] + 0.15 * rng.standard_normal(
        (4096, 32)
    ).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    d = str(tmp_path / "sh")
    mesh = default_mesh()
    vs = TpuVS(index_type="ivf", nlist=16, nprobe=1, mesh=mesh)
    vs.index([], emb, d)

    res = vs.calibrate_nprobe(0.95, k=10, nq=64)
    assert res["recall"] >= 0.95
    assert 1 <= res["nprobe"] < 16
    assert vs.nprobe == res["nprobe"]
    with open(os.path.join(d, "meta.json")) as f:
        assert "calibration" in json.load(f)


def test_multi_regime_fallback_reports_worst_regime_and_unreachable():
    """When no ladder point meets the target, the fallback must report the
    MIN-across-regimes recall of the full probe and flag the target
    unreachable — not the anchor's self-recall (1.0 in relative mode),
    which would silently pin nprobe=nlist with a fictitious recall."""
    rng = np.random.default_rng(5)
    truth = rng.integers(0, 1000, size=(32, 10)).astype(np.int64)

    def anchor_fn(xq, k, nprobe):
        return truth

    def window_fn(xq, k, nprobe):
        # Disagrees with the anchor on 3 of 10 ids at EVERY nprobe: its
        # recall vs the anchor's full probe is capped at 0.7.
        out = truth.copy()
        out[:, :3] = truth[:, :3] + 100000
        return out

    res = autotune.calibrate_nprobe(
        {"pallas": anchor_fn, "window": window_fn},
        np.zeros((32, 8), np.float32),
        nlist=64, recall_target=0.95, k=10, oracle_regime="pallas",
    )
    assert res["nprobe"] == 64  # fallback: full probe
    assert res["target_unreachable"] is True
    # duplicate ids within a truth row shift the set-based recall slightly
    assert res["recall"] == pytest.approx(0.7, abs=0.02)
    assert res["ceiling"] == pytest.approx(0.7, abs=0.02)


def test_calibration_drops_regime_that_cannot_reach_target(tmp_path):
    """Regime-aware recovery: when one serving path's structural ceiling is
    below the target but another's is not, calibration must DROP the failing
    regime (recording it in the result) and __call__ must route around it —
    not serve a path that cannot meet the contract."""
    import numpy as _np

    from lotus_tpu.ops import autotune as _at

    rng = np.random.default_rng(9)
    centers = rng.standard_normal((4, 32)).astype(np.float32)
    emb = centers[rng.integers(0, 4, 2048)] + 0.1 * rng.standard_normal(
        (2048, 32)
    ).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    d = str(tmp_path / "drop")
    vs = TpuVS(index_type="ivf", nlist=4)
    vs._pallas_interpret = True
    vs.index([], emb, d)
    assert vs._pallas_eligible(vs._materialize()["meta"])

    # Force a pallas-only ceiling below the target by corrupting the pallas
    # regime's results inside calibrate (simulating the fold's candidate-cap
    # collisions on degenerate corpora, cheap enough for CPU interpret).
    real_calibrate = _at.calibrate_nprobe

    def wrapped(fns, xq, **kw):
        if isinstance(fns, dict) and "pallas" in fns:
            inner = fns["pallas"]

            def bad_pallas(q, k, nprobe):
                out = _np.asarray(inner(q, k, nprobe)).copy()
                out[:, : max(1, out.shape[1] // 2)] = -1  # half the hits gone
                return out

            fns = {**fns, "pallas": bad_pallas}
        return real_calibrate(fns, xq, **kw)

    import unittest.mock as mock

    with mock.patch.object(_at, "calibrate_nprobe", side_effect=wrapped):
        # exact oracle: the corrupted pallas regime's ceiling is measured
        # against float32 ground truth, not against its own output.
        res = vs.calibrate_nprobe(0.9, k=10, nq=32, oracle="exact")

    assert res["regimes_dropped"] == ["pallas"]
    assert res["regimes"] == ["window"]
    assert res["recall"] >= 0.9
    assert vs._regimes_dropped == {"pallas"}

    # Large batch (b*nprobe >= nlist) must now avoid the Pallas path: the
    # exhaustive scan serves it instead, and results stay accurate.
    out = vs(emb[:64], 10)
    got = np.asarray(out.indices)
    scores = emb[:64] @ emb.T
    truth = np.argsort(-scores, axis=1)[:, :10]
    rec = np.mean([len(set(got[i]) & set(truth[i])) / 10 for i in range(64)])
    assert rec >= 0.9
