"""Streaming Pallas flat scan (ops/pallas_flat.py), interpret mode."""

import numpy as np
import jax.numpy as jnp

from lotus_tpu.ops.pallas_flat import flat_search_pallas
from lotus_tpu.ops.quant import quantize_rows


def _data(n=4096, d=128, b=300, seed=0):
    rng = np.random.default_rng(seed)
    xb = rng.standard_normal((n, d)).astype(np.float32)
    xb /= np.linalg.norm(xb, axis=1, keepdims=True)
    xq = xb[rng.integers(0, n, b)] + 0.05 * rng.standard_normal((b, d)).astype(np.float32)
    xq /= np.linalg.norm(xq, axis=1, keepdims=True)
    gt = np.argsort(-(xq @ xb.T), axis=1)[:, :10]
    return xb, xq, gt


def test_bf16_recall():
    xb, xq, gt = _data()
    s, i = flat_search_pallas(jnp.asarray(xb, jnp.bfloat16), jnp.asarray(xq), 10, interpret=True)
    got = np.asarray(i)
    rec = np.mean([len(set(got[r]) & set(gt[r])) / 10 for r in range(len(gt))])
    assert rec >= 0.98, rec
    # Scores are descending, indices valid.
    assert bool((np.asarray(s)[:, :-1] >= np.asarray(s)[:, 1:]).all())
    assert got.min() >= 0 and got.max() < xb.shape[0]


def test_int8_paths():
    xb, xq, gt = _data(seed=1)
    q8, s8 = quantize_rows(jnp.asarray(xb))
    for int8q in (True, False):
        s, i = flat_search_pallas(q8, jnp.asarray(xq), 10, xb_scales=s8, int8_queries=int8q, interpret=True)
        got = np.asarray(i)
        rec = np.mean([len(set(got[r]) & set(gt[r])) / 10 for r in range(len(gt))])
        assert rec >= 0.95, (int8q, rec)


def test_row_padding_masked():
    xb, xq, gt = _data(seed=2)
    xb_pad = jnp.pad(jnp.asarray(xb, jnp.bfloat16), ((0, 1024), (0, 0)))
    s, i = flat_search_pallas(xb_pad, jnp.asarray(xq), 10, n_rows=xb.shape[0], interpret=True)
    assert bool((np.asarray(i) < xb.shape[0]).all())
