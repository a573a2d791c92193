"""k-means trainer vs numpy Lloyd's oracle and clustering-quality checks."""

import jax
import jax.numpy as jnp
import numpy as np

from lotus_tpu.ops import kmeans_assign, kmeans_fit


def make_blobs(rng, n_per, k, d, spread=0.05):
    centers = rng.standard_normal((k, d)).astype(np.float32) * 3
    pts = np.concatenate([
        centers[i] + spread * rng.standard_normal((n_per, d)).astype(np.float32)
        for i in range(k)
    ])
    labels = np.repeat(np.arange(k), n_per)
    return pts, labels, centers


def test_kmeans_recovers_blobs():
    rng = np.random.default_rng(0)
    x, labels, _ = make_blobs(rng, 200, 5, 16)
    res = kmeans_fit(jnp.asarray(x), 5, iters=15, key=jax.random.PRNGKey(0))
    assign = np.asarray(res.assignments)
    # Each true cluster should map to exactly one learned cluster.
    for c in range(5):
        vals, counts = np.unique(assign[labels == c], return_counts=True)
        assert counts.max() / counts.sum() > 0.99


def test_kmeans_inertia_decreases():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2000, 32)).astype(np.float32)
    r1 = kmeans_fit(jnp.asarray(x), 16, iters=1, key=jax.random.PRNGKey(1))
    r10 = kmeans_fit(jnp.asarray(x), 16, iters=10, key=jax.random.PRNGKey(1))
    assert float(r10.inertia) <= float(r1.inertia) + 1e-3


def test_kmeans_assign_matches_numpy():
    rng = np.random.default_rng(2)
    x = rng.standard_normal((500, 8)).astype(np.float32)
    c = rng.standard_normal((7, 8)).astype(np.float32)
    assign, dists = kmeans_assign(jnp.asarray(x), jnp.asarray(c))
    d2 = ((x[:, None, :] - c[None, :, :]) ** 2).sum(-1)
    np.testing.assert_array_equal(np.asarray(assign), d2.argmin(1))
    np.testing.assert_allclose(np.asarray(dists), d2.min(1), rtol=1e-3, atol=1e-3)


def test_kmeans_blocked_matches_unblocked():
    rng = np.random.default_rng(3)
    x = rng.standard_normal((1000, 16)).astype(np.float32)
    r_small = kmeans_fit(jnp.asarray(x), 8, iters=5, key=jax.random.PRNGKey(3), block_rows=128)
    r_big = kmeans_fit(jnp.asarray(x), 8, iters=5, key=jax.random.PRNGKey(3), block_rows=100000)
    np.testing.assert_allclose(
        np.asarray(r_small.centroids), np.asarray(r_big.centroids), rtol=1e-4, atol=1e-4
    )


def test_kmeans_spherical_normalizes():
    rng = np.random.default_rng(4)
    x = rng.standard_normal((300, 12)).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    res = kmeans_fit(jnp.asarray(x), 4, iters=5, metric="ip", spherical=True, key=jax.random.PRNGKey(4))
    norms = np.linalg.norm(np.asarray(res.centroids), axis=1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-3)


def test_kmeanspp_robust_across_seeds():
    # Random init regularly splits/merges well-separated blobs; k-means++
    # seeding should recover all 8 blobs for every seed.
    rng = np.random.default_rng(7)
    x, labels, _ = make_blobs(rng, 200, 8, 32)
    for seed in range(3):
        res = kmeans_fit(jnp.asarray(x), 8, iters=10, key=jax.random.PRNGKey(seed))
        assign = np.asarray(res.assignments)
        purity = np.mean(
            [np.bincount(assign[labels == c]).max() / 200 for c in range(8)]
        )
        assert purity > 0.99, f"seed {seed}: purity {purity}"


def test_kmeans_random_init_still_available():
    rng = np.random.default_rng(8)
    x = rng.standard_normal((500, 16)).astype(np.float32)
    res = kmeans_fit(jnp.asarray(x), 8, iters=5, key=jax.random.PRNGKey(0), init="random")
    assert res.centroids.shape == (8, 16)


def test_kmeans_subsampled_training():
    rng = np.random.default_rng(5)
    x, labels, _ = make_blobs(rng, 400, 4, 8)
    res = kmeans_fit(jnp.asarray(x), 4, iters=10, key=jax.random.PRNGKey(5), max_points=256)
    assign = np.asarray(res.assignments)
    for c in range(4):
        vals, counts = np.unique(assign[labels == c], return_counts=True)
        assert counts.max() / counts.sum() > 0.99
