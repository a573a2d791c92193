"""On-device deterministic bench corpus + IVF build (ops/bench_data.py)."""

import numpy as np
import jax.numpy as jnp
import pytest

from lotus_tpu.ops.bench_data import synth_ivf_device_build
from lotus_tpu.ops.ivf import plan_block_aligned_layout
from lotus_tpu.ops.pallas_ivf import ivf_search_pallas

CFG = dict(n=1 << 14, d=64, nlist=32, n_clusters=24, chunk=1 << 13, queries_b=64, gt_queries=16, k=10, seed=5)


@pytest.fixture(scope="module")
def built():
    return synth_ivf_device_build(**CFG)


def test_layout_plan_roundtrip():
    rng = np.random.default_rng(0)
    assign = rng.integers(0, 7, 1000).astype(np.int32)
    plan = plan_block_aligned_layout(assign, 7, block_align=16)
    # Every original row appears exactly once in row_ids; padding is NO_HIT.
    live = plan["row_ids"][plan["row_ids"] >= 0]
    assert sorted(live.tolist()) == list(range(1000))
    # Each list's rows sit inside [start, start + size) and lists are aligned.
    assert (plan["list_start"] % 16 == 0).all()
    for lst in range(7):
        lo, sz = plan["list_start"][lst], plan["list_size"][lst]
        rows = plan["row_ids"][lo : lo + sz]
        assert (rows >= 0).all() and (assign[rows] == lst).all()


def test_build_shapes_and_store(built):
    st = built["state"]
    n, d = CFG["n"], CFG["d"]
    assert built["queries"].shape == (CFG["queries_b"], d)
    assert built["gt"].shape == (CFG["gt_queries"], CFG["k"])
    assert st["ivf_vectors"].dtype == jnp.int8
    assert st["ivf_vectors"].shape[0] % 512 == 0
    rid = np.asarray(st["ivf_row_ids"])
    live = rid[rid >= 0]
    counts = np.bincount(live, minlength=n)
    # Spilled (boundary) rows appear in exactly two lists, everyone else once.
    assert counts.min() >= 1 and counts.max() <= 2
    assert (counts == 2).sum() == live.size - n
    assert built["build_vecs_per_s"] > 0


def test_probe_recall_vs_f32_oracle(built):
    st = built["state"]
    dists, idx = ivf_search_pallas(st, jnp.asarray(built["queries"]), CFG["k"], nprobe=CFG["nlist"], metric="ip", interpret=True)
    got = np.asarray(idx)[: CFG["gt_queries"]]
    gt = built["gt"]
    recall = np.mean([len(set(got[i]) & set(gt[i])) / CFG["k"] for i in range(len(gt))])
    # Full probe: only int8 quantisation separates us from the f32 oracle.
    assert recall >= 0.9, recall


def test_spill_branch_layout_and_recall():
    """spill_frac > 0 plans on host (replicated entries); every row keeps a
    primary copy and exactly the spilled fraction appears twice."""
    cfg = dict(CFG, spill_frac=0.1)
    b = synth_ivf_device_build(**cfg)
    st = b["state"]
    n = cfg["n"]
    rid = np.asarray(st["ivf_row_ids"])
    live = rid[rid >= 0]
    counts = np.bincount(live, minlength=n)
    assert counts.min() >= 1 and counts.max() <= 2
    dup = (counts == 2).sum()
    assert abs(dup - 0.1 * n) <= 0.02 * n, dup
    # inv_perm points at a slot that really holds that row (the primary copy)
    inv = np.asarray(st["ivf_inv_perm"])
    assert (rid[inv] == np.arange(n)).all()
    _, idx = ivf_search_pallas(st, jnp.asarray(b["queries"]), cfg["k"], nprobe=cfg["nlist"], metric="ip", interpret=True)
    got = np.asarray(idx)[: cfg["gt_queries"]]
    gt = b["gt"]
    recall = np.mean([len(set(got[i]) & set(gt[i])) / cfg["k"] for i in range(len(gt))])
    assert recall >= 0.9, recall


def test_deterministic_rebuild(built):
    again = synth_ivf_device_build(**CFG)
    assert np.array_equal(again["gt"], built["gt"])
    assert np.array_equal(again["queries"], built["queries"])
    assert np.array_equal(
        np.asarray(again["state"]["ivf_vectors"]), np.asarray(built["state"]["ivf_vectors"])
    )
