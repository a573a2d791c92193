"""Shared kernel helpers: dedup_topk (spill dedup), distance conversion."""

import jax.numpy as jnp
import numpy as np

from lotus_tpu.ops.common import MASK_SCORE, NO_HIT, as_distance, dedup_topk


def test_dedup_topk_keeps_best_copy():
    scores = jnp.asarray([[9.0, 8.0, 7.5, 7.0]])
    ids = jnp.asarray([[5, 3, 5, 2]], dtype=jnp.int32)  # id 5 appears twice
    s, i = dedup_topk(scores, ids, 3)
    assert np.asarray(i)[0].tolist() == [5, 3, 2]  # best copy of 5 kept
    assert np.asarray(s)[0].tolist() == [9.0, 8.0, 7.0]


def test_dedup_topk_aux_rides_along_and_pads():
    scores = jnp.asarray([[4.0, 3.0]])
    ids = jnp.asarray([[7, 7]], dtype=jnp.int32)
    rows = jnp.asarray([[11, 22]], dtype=jnp.int32)
    s, i, a = dedup_topk(scores, ids, 4, aux=rows)
    got_i = np.asarray(i)[0]
    assert got_i[0] == 7 and np.asarray(a)[0][0] == 11  # best copy's aux
    assert (got_i[1:] == NO_HIT).all()  # dup removed + padding
    assert np.asarray(s)[0][1] <= MASK_SCORE / 2


def test_dedup_topk_masked_entries_stay_last():
    scores = jnp.asarray([[MASK_SCORE, 5.0, MASK_SCORE, 1.0]])
    ids = jnp.asarray([[NO_HIT, 1, NO_HIT, 2]], dtype=jnp.int32)
    s, i = dedup_topk(scores, ids, 4)
    assert np.asarray(i)[0].tolist()[:2] == [1, 2]
    assert (np.asarray(i)[0][2:] == NO_HIT).all()


def test_as_distance_metric_conventions():
    sims = jnp.asarray([[0.5, -0.25]])
    np.testing.assert_allclose(np.asarray(as_distance(sims, "ip")), [[0.5, -0.25]])
    np.testing.assert_allclose(np.asarray(as_distance(sims, "cosine")), [[0.5, -0.25]])
    # l2 scores are negated squared-distance halves internally; just check
    # monotonicity is preserved (bigger similarity -> smaller distance).
    d = np.asarray(as_distance(sims, "l2"))
    assert d[0, 0] < d[0, 1]
