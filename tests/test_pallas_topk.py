"""Pallas fused bucket kernel vs numpy oracle (interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np

from lotus_tpu.ops.pallas_topk import pallas_bucketed_search


def test_pallas_bucketed_search_recall():
    rng = np.random.default_rng(0)
    n, d, b, k = 4096, 128, 64, 10
    xb = rng.standard_normal((n, d)).astype(np.float32)
    xb /= np.linalg.norm(xb, axis=1, keepdims=True)
    xq = xb[:b] + 0.02 * rng.standard_normal((b, d)).astype(np.float32)

    # Expected recall loss ~ C(k,2) * bucket / n (bucket collisions):
    # 45 * 16 / 4096 ~ 0.18 lost pairs -> recall ~ 0.98.
    s, i = pallas_bucketed_search(
        jnp.asarray(xb), jnp.asarray(xq), k, tq=32, tn=512, bucket=16, interpret=True
    )
    got = np.asarray(i)
    gt = np.argsort(-(xq @ xb.T), axis=1)[:, :k]
    recall = np.mean([len(set(got[q]) & set(gt[q])) / k for q in range(b)])
    assert recall >= 0.95
    # Top-1 is always exact: the best row is its bucket's max.
    assert (got[:, 0] == gt[:, 0]).mean() == 1.0


def test_pallas_bucketed_search_pads_queries():
    rng = np.random.default_rng(1)
    n, d, b, k = 1024, 64, 5, 3  # b smaller than the query tile
    xb = rng.standard_normal((n, d)).astype(np.float32)
    xq = rng.standard_normal((b, d)).astype(np.float32)
    s, i = pallas_bucketed_search(
        jnp.asarray(xb), jnp.asarray(xq), k, tq=8, tn=256, bucket=32, interpret=True
    )
    assert s.shape == (b, k) and i.shape == (b, k)
    gt1 = np.argmax(xq @ xb.T, axis=1)
    assert (np.asarray(i)[:, 0] == gt1).all()
