"""Randomized property sweep over probe configurations (CPU interpret).

The targeted kernel tests in test_pallas_ivf.py pin specific mechanisms;
this sweep drives random (shape, alignment, spill, rescore) combinations
through the grouped Pallas probe and checks the invariants every
configuration must satisfy against the window probe on the same store:

- top-1 agreement (the max of a probed list always survives the fold)
- high top-k set overlap
- duplicate-free results (incl. spilled stores)
- scores sorted non-increasing, -1 padding only after all real hits
"""

import jax.numpy as jnp
import numpy as np
import pytest

from lotus_tpu.ops.ivf import build_ivf, ivf_search, load_ivf_state
from lotus_tpu.ops.pallas_ivf import ivf_search_pallas

CONFIGS = [
    # (seed, n, d, nlist, block_align, spill_frac, rescore)
    (0, 3072, 32, 8, 512, 0.0, None),
    (1, 4096, 48, 16, 1024, 0.0, 8),
    (2, 4096, 24, 8, 512, 0.15, None),
    (3, 2048, 64, 4, 1024, 0.15, 8),
]


@pytest.mark.parametrize("seed,n,d,nlist,block_align,spill,rescore", CONFIGS)
def test_probe_invariants(tmp_path, seed, n, d, nlist, block_align, spill, rescore):
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((max(nlist * 2, 8), d)).astype(np.float32)
    emb = centers[rng.integers(0, len(centers), n)] + 0.2 * rng.standard_normal(
        (n, d)
    ).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    b, k = 12, 10
    xq = jnp.asarray(
        emb[rng.integers(0, n, b)] + 0.02 * rng.standard_normal((b, d)).astype(np.float32)
    )
    nprobe = max(2, nlist // 2)

    idx_dir = str(tmp_path / "idx")
    meta = {
        "kind": "ivf", "metric": "ip",
        **build_ivf(idx_dir, emb, nlist=nlist, metric="ip",
                    block_align=block_align, spill_frac=spill, seed=seed),
    }
    state = load_ivf_state(idx_dir, meta, jnp.float32)
    state["meta"] = meta

    d_pl, i_pl = ivf_search_pallas(
        state, xq, k, nprobe=nprobe, metric="ip", interpret=True, rescore=rescore
    )
    d_pl, i_pl = np.asarray(d_pl), np.asarray(i_pl)
    _, i_ref = ivf_search(state, xq, k, nprobe=nprobe, metric="ip", rescore=rescore)
    i_ref = np.asarray(i_ref)

    assert (i_pl[:, 0] == i_ref[:, 0]).all(), "top-1 must agree with the window probe"
    overlap = np.mean(
        [len(set(i_pl[q]) & set(i_ref[q])) / k for q in range(b)]
    )
    assert overlap >= 0.9, f"overlap {overlap} at {CONFIGS}"

    for q in range(b):
        live = [int(x) for x in i_pl[q] if x >= 0]
        assert len(live) == len(set(live)), "duplicate row ids in results"
        # -1 padding only after the last real hit.
        tail = i_pl[q][len(live):]
        assert (tail == -1).all()
        real = d_pl[q][: len(live)]
        assert (np.diff(real) <= 1e-5).all(), "scores must be non-increasing"
        assert all(0 <= x < n for x in live), "row ids must be in range"
