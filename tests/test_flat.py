"""Flat search kernels vs numpy brute-force oracle."""

import jax.numpy as jnp
import numpy as np
import pytest

from lotus_tpu.ops import flat_search


def numpy_topk(xb, xq, k, metric):
    if metric in ("ip", "cosine"):
        scores = xq @ xb.T
        order = np.argsort(-scores, axis=1, kind="stable")[:, :k]
        dists = np.take_along_axis(scores, order, axis=1)
    else:
        d2 = ((xq[:, None, :] - xb[None, :, :]) ** 2).sum(-1)
        order = np.argsort(d2, axis=1, kind="stable")[:, :k]
        dists = np.take_along_axis(d2, order, axis=1)
    return dists, order


@pytest.mark.parametrize("metric", ["ip", "l2"])
@pytest.mark.parametrize("n,block", [(100, 8192), (1000, 256), (4096, 512)])
def test_flat_exact_matches_numpy(metric, n, block):
    rng = np.random.default_rng(0)
    d, b, k = 32, 7, 10
    xb = rng.standard_normal((n, d)).astype(np.float32)
    xq = rng.standard_normal((b, d)).astype(np.float32)

    dists, idx = flat_search(jnp.asarray(xb), jnp.asarray(xq), k, metric=metric, block_rows=block)
    ref_d, ref_i = numpy_topk(xb, xq, k, metric)

    # Indices may differ on exact ties; compare via score sets.
    np.testing.assert_allclose(np.asarray(dists), ref_d, rtol=1e-4, atol=1e-4)
    assert (np.asarray(idx) >= 0).all()
    # Overwhelmingly the indices should agree (random data -> no ties).
    assert (np.asarray(idx) == ref_i).mean() > 0.99


def test_flat_masked_subset():
    rng = np.random.default_rng(1)
    n, d, b, k = 500, 16, 3, 5
    xb = rng.standard_normal((n, d)).astype(np.float32)
    xq = rng.standard_normal((b, d)).astype(np.float32)
    valid = rng.random(n) < 0.3

    dists, idx = flat_search(
        jnp.asarray(xb), jnp.asarray(xq), k, metric="ip",
        valid=jnp.asarray(valid), block_rows=128,
    )
    idx = np.asarray(idx)
    assert valid[idx[idx >= 0]].all()

    sub_ids = np.where(valid)[0]
    ref_d, ref_local = numpy_topk(xb[sub_ids], xq, k, "ip")
    np.testing.assert_allclose(np.asarray(dists), ref_d, rtol=1e-4, atol=1e-4)
    assert (idx == sub_ids[ref_local]).mean() > 0.99


def test_flat_k_exceeds_valid_rows():
    rng = np.random.default_rng(2)
    n, d, k = 8, 4, 12
    xb = rng.standard_normal((n, d)).astype(np.float32)
    xq = rng.standard_normal((2, d)).astype(np.float32)

    dists, idx = flat_search(jnp.asarray(xb), jnp.asarray(xq), k, metric="ip")
    idx = np.asarray(idx)
    assert (idx[:, :n] >= 0).all()
    assert (idx[:, n:] == -1).all()


def test_flat_k_exceeds_subset_size():
    rng = np.random.default_rng(3)
    n, d, k = 300, 8, 20
    xb = rng.standard_normal((n, d)).astype(np.float32)
    xq = rng.standard_normal((1, d)).astype(np.float32)
    valid = np.zeros(n, bool)
    valid[[5, 50, 100]] = True

    _, idx = flat_search(jnp.asarray(xb), jnp.asarray(xq), k, valid=jnp.asarray(valid), block_rows=64)
    idx = np.asarray(idx)[0]
    hits = idx[idx >= 0]
    assert set(hits) == {5, 50, 100}
    assert (idx[3:] == -1).all()


def test_flat_bf16_database_recall():
    rng = np.random.default_rng(4)
    n, d, b, k = 2048, 64, 16, 10
    xb = rng.standard_normal((n, d)).astype(np.float32)
    xb /= np.linalg.norm(xb, axis=1, keepdims=True)
    xq = xb[:b] + 0.01 * rng.standard_normal((b, d)).astype(np.float32)
    xq /= np.linalg.norm(xq, axis=1, keepdims=True)

    _, idx = flat_search(jnp.asarray(xb, dtype=jnp.bfloat16), jnp.asarray(xq), k, metric="ip", block_rows=512)
    _, ref_i = numpy_topk(xb, xq, k, "ip")
    recall = np.mean([
        len(set(np.asarray(idx)[i]) & set(ref_i[i])) / k for i in range(b)
    ])
    assert recall >= 0.95


def test_flat_1d_query():
    rng = np.random.default_rng(5)
    xb = rng.standard_normal((50, 8)).astype(np.float32)
    q = rng.standard_normal(8).astype(np.float32)
    dists, idx = flat_search(jnp.asarray(xb), jnp.asarray(q), 3)
    assert dists.shape == (3,) and idx.shape == (3,)


def test_flat_l2_distances_are_true_squared_l2():
    rng = np.random.default_rng(6)
    xb = rng.standard_normal((100, 8)).astype(np.float32)
    xq = rng.standard_normal((4, 8)).astype(np.float32)
    dists, idx = flat_search(jnp.asarray(xb), jnp.asarray(xq), 5, metric="l2")
    dists, idx = np.asarray(dists), np.asarray(idx)
    for qi in range(4):
        for j in range(5):
            true = ((xq[qi] - xb[idx[qi, j]]) ** 2).sum()
            assert abs(dists[qi, j] - true) < 1e-3


def test_flat_int8_database_recall():
    from lotus_tpu.ops.quant import quantize_rows

    rng = np.random.default_rng(7)
    n, d, b, k = 2048, 64, 16, 10
    xb = rng.standard_normal((n, d)).astype(np.float32)
    xb /= np.linalg.norm(xb, axis=1, keepdims=True)
    xq = xb[:b] + 0.01 * rng.standard_normal((b, d)).astype(np.float32)

    q, scales = quantize_rows(jnp.asarray(xb))
    _, idx = flat_search(q, jnp.asarray(xq), k, metric="ip", block_rows=512, xb_scales=scales)
    _, ref_i = numpy_topk(xb, xq, k, "ip")
    recall = np.mean([len(set(np.asarray(idx)[i]) & set(ref_i[i])) / k for i in range(b)])
    assert recall >= 0.95


def test_flat_int8_requires_scales():
    rng = np.random.default_rng(8)
    xb = (rng.integers(-127, 127, (64, 8))).astype(np.int8)
    with pytest.raises(ValueError, match="xb_scales"):
        flat_search(jnp.asarray(xb), jnp.asarray(rng.standard_normal((2, 8)).astype(np.float32)), 3)


def test_flat_rescore_exact_reranking():
    """flat_rescore re-ranks int8 candidates at exact f32: the final top-k
    equals brute force whenever the candidate pool contains the true top-k."""
    import jax.numpy as jnp

    from lotus_tpu.ops.flat import flat_rescore, flat_search
    from lotus_tpu.ops.quant import quantize_rows

    rng = np.random.default_rng(17)
    n, d, b, k = 4096, 48, 6, 5
    xb = rng.standard_normal((n, d)).astype(np.float32)
    xb /= np.linalg.norm(xb, axis=1, keepdims=True)
    xq = xb[:b] + 0.01 * rng.standard_normal((b, d)).astype(np.float32)

    q, scales = quantize_rows(jnp.asarray(xb))
    # Approximate pass with headroom, then exact rescore down to k.
    _, cand = flat_search(q, jnp.asarray(xq), 32, metric="ip", xb_scales=scales)
    top_s, top_i = flat_rescore(q, jnp.asarray(xq), cand, k, xb_scales=scales)

    sims = xq @ xb.T
    for row in range(b):
        want = set(np.argsort(-sims[row])[:k])
        got = set(np.asarray(top_i)[row])
        assert len(want & got) >= k - 1, (row, want, got)
        # Scores are f32-exact for the reconstructed (quantized) rows.
        rec = np.asarray(q, np.float32) * np.asarray(scales)[:, None]
        for col, idx in enumerate(np.asarray(top_i)[row]):
            np.testing.assert_allclose(
                float(np.asarray(top_s)[row, col]), float(xq[row] @ rec[idx]), rtol=1e-4
            )


def test_int4_refinement_roundtrip():
    """quantize_refinement_int4 + unpack recovers residuals to half-step
    accuracy: the refined reconstruction must beat plain int8 by ~8x."""
    import numpy as np
    import jax.numpy as jnp

    from lotus_tpu.ops.quant import quantize_refinement_int4, quantize_rows, unpack_int4

    rng = np.random.default_rng(3)
    x = rng.standard_normal((64, 16)).astype(np.float32)
    q, s = quantize_rows(jnp.asarray(x))
    recon8 = np.asarray(q, np.float32) * np.asarray(s)[:, None]
    resid = x - recon8
    packed, s4 = quantize_refinement_int4(jnp.asarray(resid))
    recon4 = np.asarray(unpack_int4(packed), np.float32) * np.asarray(s4)[:, None]
    err8 = np.abs(resid).mean()
    err_refined = np.abs(resid - recon4).mean()
    assert err_refined < err8 / 4, (err8, err_refined)
    # Packing is 2 int4 per byte.
    assert packed.shape == (64, 8)


def test_flat_int8_with_validity_mask():
    """Masked subset search on a quantized store: only allowed rows return,
    with dequantized scores ranking correctly."""
    import jax.numpy as jnp

    from lotus_tpu.ops.flat import flat_search
    from lotus_tpu.ops.quant import quantize_rows

    rng = np.random.default_rng(13)
    n, d, b, k = 512, 16, 4, 5
    xb = rng.standard_normal((n, d)).astype(np.float32)
    xb /= np.linalg.norm(xb, axis=1, keepdims=True)
    xq = xb[:b] + 0.01 * rng.standard_normal((b, d)).astype(np.float32)
    valid = rng.random(n) < 0.5
    valid[:b] = True  # self-matches allowed

    q, scales = quantize_rows(jnp.asarray(xb))
    dists, idx = flat_search(
        q, jnp.asarray(xq), k, metric="ip", n_rows=n,
        valid=jnp.asarray(valid), xb_scales=scales,
    )
    idx = np.asarray(idx)
    assert valid[idx[idx >= 0]].all()
    assert (idx[:, 0] == np.arange(b)).all()  # self-match survives quantization
