"""Edge cases for the rewritten operator layer: empty/degenerate frames,
mixed dtypes, degenerate cascade splits, parser fallbacks, plan costing.

The round-2 rewrite changed the cascade router (proxy pass + routing in
sem_filter), the join plan costing (_PlanOutcome / join_optimizer) and the
ComparisonEngine; these tests pin the new code's branches the way the
reference pins its operator edge cases (SURVEY.md §4).
"""

import numpy as np
import pandas as pd
import pytest

import lotus_tpu
from lotus_tpu.models import HashRM, make_fake_lm
from lotus_tpu.types import CascadeArgs, ProxyModel
from lotus_tpu.vector_store import TpuVS


@pytest.fixture(autouse=True)
def reset_settings():
    yield
    lotus_tpu.settings.configure(lm=None, helper_lm=None, rm=None, vs=None, enable_cache=False)


def lm_true():
    return make_fake_lm(responder=lambda p, m, **kw: "Answer: True")


# ---------------------------------------------------------------- empty frames


def test_sem_filter_empty_frame():
    lotus_tpu.settings.configure(lm=lm_true())
    df = pd.DataFrame({"text": pd.Series([], dtype=str)})
    out = df.sem_filter("{text} ok")
    assert len(out) == 0
    assert list(out.columns) == ["text"]


def test_sem_map_empty_frame():
    lotus_tpu.settings.configure(lm=lm_true())
    df = pd.DataFrame({"text": pd.Series([], dtype=str)})
    out = df.sem_map("summarize {text}")
    assert len(out) == 0
    assert "_map" in out.columns


def test_sem_topk_k_exceeds_rows():
    calls = []

    def responder(p, m, **kw):
        calls.append(p)
        return "Answer: Document 1"

    lotus_tpu.settings.configure(lm=make_fake_lm(responder=responder))
    df = pd.DataFrame({"text": ["a", "b"]})
    out = df.sem_topk("best {text}", K=10)
    assert len(out) == 2  # clamped to the frame


def test_sem_join_empty_right():
    lotus_tpu.settings.configure(lm=lm_true())
    left = pd.DataFrame({"a": ["x"]})
    right = pd.DataFrame({"b": pd.Series([], dtype=str)})
    out = left.sem_join(right, "{a} relates to {b}")
    assert len(out) == 0


def test_sem_agg_empty_frame_single_call():
    lotus_tpu.settings.configure(lm=make_fake_lm(responder=lambda p, m, **kw: "SUMMARY"))
    df = pd.DataFrame({"text": pd.Series([], dtype=str)})
    out = df.sem_agg("summarize {text}")
    # Mirrors the reference: aggregation over nothing still yields one row.
    assert len(out) <= 1


# ---------------------------------------------------------------- mixed dtypes


def test_sem_filter_mixed_dtype_columns():
    seen = []

    def responder(p, m, **kw):
        seen.append(str(p))
        return "Answer: True" if "42" in str(p) else "Answer: False"

    lotus_tpu.settings.configure(lm=make_fake_lm(responder=responder))
    df = pd.DataFrame({"num": [42, 7], "text": ["alpha", "beta"]})
    out = df.sem_filter("is {num} the answer to {text}?")
    assert out["num"].tolist() == [42]
    assert any("alpha" in s for s in seen)  # both columns serialized


def test_sem_map_numeric_column_serialization():
    lotus_tpu.settings.configure(lm=make_fake_lm(responder=lambda p, m, **kw: "ok"))
    df = pd.DataFrame({"price": [1.5, np.nan]})
    out = df.sem_map("describe {price}")
    assert len(out) == 2  # NaN rows still serialize (as text) and map


# ----------------------------------------------------- degenerate cascade splits


def test_filter_cascade_explicit_thresholds_skip_learning():
    """With both thresholds given, no oracle sampling happens; confident
    rows resolve from the helper only."""
    oracle_calls = []

    def oracle(p, m, **kw):
        oracle_calls.append(p)
        return "Answer: True"

    helper = make_fake_lm(
        responder=lambda p, m, **kw: "Answer: True" if "keep" in str(p) else "Answer: False",
        positive_prob=lambda p: 0.95 if "keep" in p else 0.05,
    )
    lotus_tpu.settings.configure(lm=make_fake_lm(responder=oracle), helper_lm=helper)
    df = pd.DataFrame({"text": ["keep a", "drop b", "keep c", "drop d"] * 4})
    args = CascadeArgs(
        proxy_model=ProxyModel.HELPER_LM,
        filter_pos_cascade_threshold=0.6,
        filter_neg_cascade_threshold=0.4,
        cascade_num_calibration_quantiles=4,
    )
    out, stats = df.sem_filter("retain {text}", cascade_args=args, return_stats=True)
    assert not oracle_calls, "explicit thresholds must not trigger oracle learning"
    assert stats["filters_resolved_by_large_model"] == 0
    assert stats["filters_resolved_by_helper_model"] == len(df)
    assert set(out["text"]) == {"keep a", "keep c"}


def test_filter_cascade_band_routes_to_oracle():
    """Three proxy-confidence bands: confident-positive rows take the
    helper's verdict, confident-negative rows are dropped without an oracle
    call, and ONLY the uncertain band reaches the oracle LM."""
    def prob(p):  # three distinct levels -> quantile calibration spreads them
        if "sure keep" in p:
            return 0.9
        if "maybe" in p:
            return 0.5
        return 0.1

    helper = make_fake_lm(responder=lambda p, m, **kw: "Answer: True", positive_prob=prob)
    oracle_seen = []

    def oracle(p, m, **kw):
        oracle_seen.append(str(p))
        return "Answer: True" if "maybe yes" in str(p) else "Answer: False"

    lotus_tpu.settings.configure(lm=make_fake_lm(responder=oracle), helper_lm=helper)
    df = pd.DataFrame({"text": ["sure keep a", "maybe yes b", "maybe no c", "drop d"] * 2})
    args = CascadeArgs(
        proxy_model=ProxyModel.HELPER_LM,
        filter_pos_cascade_threshold=0.99,
        filter_neg_cascade_threshold=0.01,
        cascade_num_calibration_quantiles=2,
    )
    out, stats = df.sem_filter("retain {text}", cascade_args=args, return_stats=True)
    # Only the mid-confidence band (the "maybe" rows) hit the oracle.
    assert stats["filters_resolved_by_large_model"] == 4
    assert all("maybe" in p for p in oracle_seen)
    assert set(out["text"]) == {"sure keep a", "maybe yes b"}


def test_importance_sampling_constant_scores():
    from lotus_tpu.sem_ops.cascade_utils import importance_sampling

    args = CascadeArgs(sampling_percentage=0.5, cascade_IS_random_seed=0)
    picked, corr = importance_sampling([0.5] * 20, args)
    assert len(picked) == 10
    # Uniform scores -> uniform weights -> correction factors all ~1.
    np.testing.assert_allclose(corr, np.ones(20), rtol=1e-9)


def test_calibrate_llm_logprobs_identical_probs():
    from lotus_tpu.sem_ops.cascade_utils import calibrate_llm_logprobs

    args = CascadeArgs(cascade_num_calibration_quantiles=10)
    out = calibrate_llm_logprobs([0.7] * 8, args)
    assert len(out) == 8
    assert all(0.0 <= v <= 1.0 for v in out)
    assert len(set(out)) == 1  # identical inputs stay identical


def test_learn_cascade_thresholds_perfect_proxy():
    from lotus_tpu.sem_ops.cascade_utils import learn_cascade_thresholds

    scores = [0.99, 0.98, 0.97, 0.9, 0.1, 0.05, 0.04, 0.02]
    oracle = [True, True, True, True, False, False, False, False]
    args = CascadeArgs(recall_target=0.8, precision_target=0.8, failure_probability=0.2)
    (pos_t, neg_t), calls = learn_cascade_thresholds(
        scores, oracle, np.ones(len(scores)), args
    )
    assert 0.0 <= neg_t <= pos_t <= 1.0
    assert calls == sum(1 for s in scores if neg_t < s < pos_t)


def test_learn_cascade_thresholds_all_negative_oracle():
    from lotus_tpu.sem_ops.cascade_utils import learn_cascade_thresholds

    scores = [0.9, 0.8, 0.7, 0.6]
    oracle = [False, False, False, False]
    args = CascadeArgs(recall_target=0.9, precision_target=0.9)
    (pos_t, neg_t), _ = learn_cascade_thresholds(scores, oracle, np.ones(4), args)
    # Nothing is acceptably precise: tau_+ stays at 1.0 (proxy never accepts).
    assert pos_t == 1.0


# ------------------------------------------------------------- parser fallbacks


def test_filter_postprocess_unparseable_uses_default():
    from lotus_tpu.sem_ops.postprocessors import filter_postprocess

    lm = lm_true()
    out_t = filter_postprocess(["complete gibberish"], lm, True)
    out_f = filter_postprocess(["complete gibberish"], lm, False)
    assert out_t.outputs == [True]
    assert out_f.outputs == [False]


def test_filter_postprocess_first_token_wins_over_trailing_explanation():
    """Real models append explanations after the verdict — 'Answer: False\\n
    ...the claim that the text is a true statement is false.' mentions
    'true' later, and substring priority would mask the actual answer."""
    from lotus_tpu.sem_ops.postprocessors import filter_postprocess

    lm = lm_true()
    out = filter_postprocess(
        [
            "Answer: False\n\nThe claim that the text is a true statement is false.",
            "Answer: True. It would be false to say otherwise.",
        ],
        lm,
        True,
    )
    assert out.outputs == [False, True]


def test_parse_ans_binary_garbage_defaults_to_first():
    from lotus_tpu.sem_ops.sem_topk import parse_ans_binary

    verdict, _ = parse_ans_binary("no document number here")
    assert verdict is True  # unparseable -> first document wins (ref semantics)


def test_parse_ans_binary_verdict_first_with_trailing_explanation():
    """Real models lead with the label then explain, often naming the LOSER
    last — 'Document 1\\n\\n…Document 2 has no overlap…' must parse as 1
    (found live: last-mention parsing flipped quicksort comparisons)."""
    from lotus_tpu.sem_ops.sem_topk import parse_ans_binary

    assert parse_ans_binary(
        "Document 1\n\nWhile neither directly addresses the query, "
        "Document 2's passage has no terminological overlap."
    )[0] is True
    assert parse_ans_binary("Answer: Document 2\n\nDocument 1 was weaker.")[0] is False
    # Reasoning-first without a marker still reads the conclusion (last).
    assert parse_ans_binary(
        "The first document misses the point; overall Document 2 answers better."
    )[0] is False
    # A comparative verdict LINE names both: the conclusion comes last.
    assert parse_ans_binary(
        "Answer: Document 1 is less relevant than Document 2, so Document 2 wins."
    )[0] is False
    assert parse_ans_binary("<think>1 seems off</think>Answer: Document 2")[0] is False


# ------------------------------------------------------------- join plan costing


def test_join_optimizer_picks_cheaper_plan(tmp_path):
    """Both plans are costed; the winner is the one with the smaller
    uncertain band (fewer oracle calls)."""
    from lotus_tpu.sem_ops._accessor import FewShot
    from lotus_tpu.sem_ops.sem_join import join_optimizer

    lotus_tpu.settings.configure(
        lm=make_fake_lm(responder=lambda p, m, **kw: "Answer: True"),
        rm=HashRM(dim=32),
        vs=TpuVS(),
    )
    l1 = pd.Series(["cat", "dog"], name="word")
    l2 = pd.Series(["animal", "plant", "tool"], name="kind")
    args = CascadeArgs(
        join_cascade_pos_threshold=0.95,
        join_cascade_neg_threshold=-1.0,  # nothing rejected; band = uncertain
        cascade_IS_random_seed=0,
    )
    accepted, band, rejected, planning, chosen = join_optimizer(
        l1, l2, "word:left", "kind:right",
        lotus_tpu.settings.lm, "the {word:left} is a {kind:right}", args,
        shots=FewShot(),
    )
    assert chosen.join_cascade_strategy in ("search_filter", "map_search_filter")
    assert len(accepted) + len(band) + rejected == len(l1) * len(l2)
    assert planning >= 0


def test_learn_join_cascade_threshold_falls_back_to_full_join():
    """Oracle failure during threshold learning -> (1.0, 0.0): a full join,
    the reference's forgiving posture (sem_join.py:615-618)."""
    from lotus_tpu.sem_ops.sem_join import learn_join_cascade_threshold

    def explode(p, m, **kw):
        raise RuntimeError("provider down")

    lm = make_fake_lm(responder=explode)
    helper_join = pd.DataFrame(
        {"word:left": ["a", "b"], "kind:right": ["x", "y"], "_scores": [0.9, 0.2]}
    )
    args = CascadeArgs(sampling_percentage=1.0, cascade_IS_random_seed=0)
    pos_t, neg_t, _ = learn_join_cascade_threshold(
        helper_join, "word:left", "kind:right", lm, "match {word:left} {kind:right}", args
    )
    assert (pos_t, neg_t) == (1.0, 0.0)


# ------------------------------------------------------------- accessor base


def test_accessor_missing_column_raises():
    lotus_tpu.settings.configure(lm=lm_true())
    df = pd.DataFrame({"text": ["x"]})
    with pytest.raises(ValueError, match="not found"):
        df.sem_filter("{nonexistent} ok")


def test_accessor_requires_lm_configured():
    lotus_tpu.settings.configure(lm=None)
    df = pd.DataFrame({"text": ["x"]})
    with pytest.raises(ValueError):
        df.sem_filter("{text} ok")


def test_safe_mode_prints_preflight_estimate(monkeypatch, capsys):
    import lotus_tpu.utils as utils_mod

    monkeypatch.setattr(utils_mod.time, "sleep", lambda s: None)
    lotus_tpu.settings.configure(lm=make_fake_lm(responder=lambda p, m, **kw: "ok"))
    df = pd.DataFrame({"text": ["alpha", "beta"]})
    out = df.sem_map("Summarize {text}", safe_mode=True)
    printed = capsys.readouterr().out
    assert "Estimated cost" in printed and "Estimated LM calls: 2" in printed
    assert len(out) == 2
