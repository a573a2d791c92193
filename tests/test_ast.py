"""LazyFrame AST: building, execution, caching, optimizers, persistence."""

import pandas as pd
import pytest

import lotus_tpu
from lotus_tpu.ast import CascadeOptimizer, LazyFrame, PredicatePushdownOptimizer
from lotus_tpu.ast.nodes import PandasFilterNode, SemFilterNode, SemMapNode
from lotus_tpu.models import HashRM, make_fake_lm
from lotus_tpu.vector_store import TpuVS


@pytest.fixture(autouse=True)
def reset_settings():
    yield
    lotus_tpu.settings.configure(lm=None, helper_lm=None, rm=None, vs=None, enable_cache=False)


def make_lm(responder=None):
    return make_fake_lm(responder=responder or (lambda p, m, **kw: "Answer: True"))


def test_lazyframe_builds_nodes():
    lf = LazyFrame().sem_filter("{text} ok").sem_map("summarize {text}")
    assert len(lf) == 3  # source + 2 ops
    assert isinstance(lf._nodes[1], SemFilterNode)
    assert isinstance(lf._nodes[2], SemMapNode)


def test_lazyframe_execute():
    lotus_tpu.settings.configure(lm=make_lm(lambda p, m, **kw: "Answer: True" if "keep" in str(p) else "Answer: False"))
    df = pd.DataFrame({"text": ["keep a", "drop b"]})
    lf = LazyFrame().sem_filter("retain {text}")
    out = lf.execute(df)
    assert out["text"].tolist() == ["keep a"]


def test_lazyframe_pandas_passthrough():
    lotus_tpu.settings.configure(lm=make_lm())
    df = pd.DataFrame({"x": [3, 1, 2]})
    lf = LazyFrame().sort_values("x").head(2)
    out = lf.execute(df)
    assert out["x"].tolist() == [1, 2]


def test_lazyframe_getitem_and_filter():
    df = pd.DataFrame({"x": [1, 2, 3], "y": ["a", "b", "c"]})
    lf = LazyFrame()[lambda d: d["x"] > 1][["y"]]
    out = lf.execute(df)
    assert out["y"].tolist() == ["b", "c"]
    assert list(out.columns) == ["y"]


def test_run_cache_hits():
    lotus_tpu.settings.configure(lm=make_lm())
    df = pd.DataFrame({"x": [1, 2]})
    lf = LazyFrame().sort_values("x")
    run = lf.run(df)
    run.execute()
    assert run.cache_stats["misses"] > 0
    run2 = lf.run(df, cache=run.cache)
    run2.execute()
    assert run2.cache_stats["hits"] >= 2  # source + op both cached


def test_predicate_pushdown_reorders():
    lf = (
        LazyFrame()
        .sem_filter("{text} relevant")
        .filter(lambda d: d["x"] > 0)
    )
    optimized = lf.optimize()
    kinds = [type(n).__name__ for n in optimized._nodes]
    assert kinds.index("PandasFilterNode") < kinds.index("SemFilterNode")


def test_save_load_roundtrip(tmp_path):
    lf = LazyFrame().sem_filter("{text} ok").head(3)
    path = tmp_path / "pipeline.pkl"
    lf.save(path)
    loaded = LazyFrame.load(path)
    assert len(loaded) == len(lf)
    assert isinstance(loaded._nodes[1], SemFilterNode)


def test_show_tree():
    lf = LazyFrame().sem_filter("{text} ok").sem_map("summ {text}")
    tree = lf.show()
    assert "sem_filter" in tree and "sem_map" in tree and "Source" in tree


def test_join_with_nested_lazyframe():
    def responder(p, m, **kw):
        text = str(p)
        return "Answer: True" if ("cat" in text and "animal" in text) else "Answer: False"

    lotus_tpu.settings.configure(lm=make_lm(responder))
    left = pd.DataFrame({"word": ["cat", "rock"]})
    right = pd.DataFrame({"kind": ["animal", "mineral"]})

    right_lf = LazyFrame(df=right)
    lf = LazyFrame().sem_join(right_lf, "{word} is a {kind}")
    out = lf.execute(left)
    assert set(zip(out["word"], out["kind"])) == {("cat", "animal")}


def test_concat_and_from_fn():
    df = pd.DataFrame({"x": [1]})
    lf1 = LazyFrame(df=pd.DataFrame({"x": [1]}))
    lf2 = LazyFrame(df=pd.DataFrame({"x": [2]}))
    lf = LazyFrame.concat([lf1, lf2], ignore_index=True)
    out = lf.execute({})
    assert out["x"].tolist() == [1, 2]


def test_mark_optimizable_validates():
    lf = LazyFrame().sem_filter("{text} ok")
    lf2 = lf.mark_optimizable(1, ["user_instruction"])
    assert lf2._nodes[1].optimizable_params == frozenset({"user_instruction"})
    with pytest.raises(ValueError):
        lf.mark_optimizable(1, ["nonexistent_param"])


def test_copy_preserves_source_refs():
    df = pd.DataFrame({"x": [1]})
    lf = LazyFrame().sort_values("x")
    copied = lf.copy()
    assert copied._nodes[0].lazyframe_ref is lf._nodes[0].lazyframe_ref
    out = copied.execute(df)
    assert out["x"].tolist() == [1]


def test_retrieval_pipeline_through_ast(tmp_path):
    lotus_tpu.settings.configure(rm=HashRM(dim=32), vs=TpuVS(), lm=make_lm())
    df = pd.DataFrame({"title": ["machine learning", "cooking pasta", "deep learning"]})
    lf = (
        LazyFrame()
        .sem_index("title", str(tmp_path / "idx"))
        .sem_search("title", "learning algorithms", K=2)
    )
    out = lf.execute(df)
    assert len(out) == 2
    assert all("learning" in t for t in out["title"])


def test_cascade_optimizer_prewarms_thresholds():
    from lotus_tpu.types import CascadeArgs, ProxyModel

    helper_lm = make_fake_lm(
        responder=lambda p, m, **kw: "Answer: True" if "keep" in str(p) else "Answer: False",
        positive_prob=lambda p: 0.99 if "keep" in p else 0.01,
    )
    lotus_tpu.settings.configure(
        lm=make_lm(lambda p, m, **kw: "Answer: True" if "keep" in str(p) else "Answer: False"),
        helper_lm=helper_lm,
    )
    df = pd.DataFrame({"text": (["keep x", "drop y"] * 30)})
    args = CascadeArgs(proxy_model=ProxyModel.HELPER_LM, sampling_percentage=0.3,
                       cascade_IS_random_seed=0)
    lf = LazyFrame().sem_filter("retain {text}", cascade_args=args)

    node = lf._nodes[1]
    assert node.cascade_args.filter_pos_cascade_threshold is None
    optimized = lf.optimize([CascadeOptimizer()], train_data=df)
    # The node self-updated with learned thresholds during the pre-warm run.
    assert lf._nodes[1].cascade_args.filter_pos_cascade_threshold is not None


def test_prompt_hill_climb_improves_metric(tmp_path):
    """End-to-end: the hill-climber measurably improves the pipeline metric.

    The fake LM filters correctly only when the instruction mentions
    "sentiment"; asked to rewrite a prompt, it proposes exactly that wording.
    The optimizer must adopt the proposal and lift accuracy from ~chance to 1.
    """
    from lotus_tpu.ast.optimizer.prompt_optimizer import PromptHillClimbOptimizer

    GOOD = {"great film", "loved it"}

    def responder(prompt, msgs, **kw):
        text = str(prompt)
        if "Return ONLY the rewritten instruction" in text:
            return "the review {text} expresses positive sentiment"
        if "sentiment" in text:  # the good instruction: answer correctly
            return "Answer: True" if any(g in text for g in GOOD) else "Answer: False"
        return "Answer: True"  # the bad instruction: keep everything

    lotus_tpu.settings.configure(lm=make_lm(responder), enable_cache=False)
    df = pd.DataFrame({"text": ["great film", "loved it", "terrible", "boring mess"]})

    def eval_fn(output, example):
        kept = set(output["text"]) if len(output) else set()
        wanted = GOOD
        correct = len(wanted & kept) + len(set(example["text"]) - wanted - kept)
        return correct / len(example)

    lf = LazyFrame().sem_filter("keep the good {text}")
    baseline = eval_fn(lf.execute(df), df)
    assert baseline < 1.0  # bad instruction keeps everything

    opt = PromptHillClimbOptimizer(eval_fn, n_rounds=1, proposals_per_target=1)
    tuned_nodes = opt.optimize(lf._nodes, train_data=df)
    tuned = LazyFrame(_nodes=tuned_nodes)
    assert eval_fn(tuned.execute(df), df) == 1.0
    # The winning instruction is the LM's proposal.
    from lotus_tpu.ast.nodes import SemFilterNode
    filt = next(n for n in tuned._nodes if isinstance(n, SemFilterNode))
    assert "sentiment" in filt.user_instruction


def test_prompt_evolution_optimizer_nested_lazyframe():
    """GEPA-style evolutionary search fixes an instruction INSIDE a nested
    LazyFrame (the join's right side), proving path-addressed candidate
    application plus Pareto/mutation search end-to-end."""
    from lotus_tpu.ast.optimizer.prompt_optimizer import PromptEvolutionOptimizer

    def responder(prompt, msgs, **kw):
        text = str(prompt)
        if "Return ONLY the rewritten instruction" in text:
            return "keep rows where {desc} names an animal"
        if "animal" in text:  # good nested-filter instruction
            return "Answer: True" if ("cat" in text or "dog" in text) else "Answer: False"
        if "Answer: True or Answer: False" in text or "True or False" in text:
            return "Answer: True"  # bad instruction: keep everything
        return "Answer: True"

    lotus_tpu.settings.configure(lm=make_lm(responder), enable_cache=False)

    left = pd.DataFrame({"name": ["pet"]})
    right_df = pd.DataFrame({"desc": ["cat", "dog", "chair", "spoon"]})

    # The right side is its own (bound) LazyFrame whose filter instruction
    # is the thing that needs fixing — a nested, path-addressed target.
    right_lf = LazyFrame(right_df).sem_filter("keep the good {desc}")
    lf = LazyFrame().sem_join(right_lf, "does {name:left} match {desc:right}?")

    from lotus_tpu.ast.optimizer.prompt_optimizer import collect_targets

    targets = collect_targets(lf._nodes)
    assert [t for t in targets if t.lf_path], "expected a nested target"

    def eval_fn(output, example):
        got = set(output["desc"]) if "desc" in output else set()
        want = {"cat", "dog"}
        return (len(got & want) - len(got - want)) / 2

    baseline = eval_fn(lf.execute(left), left)
    assert baseline < 1.0  # bad nested instruction keeps chair/spoon too

    opt = PromptEvolutionOptimizer(eval_fn, max_evals=6, merge_prob=0.0, seed=0)
    tuned_nodes = opt.optimize(lf._nodes, train_data=left)
    tuned = LazyFrame(_nodes=tuned_nodes)
    assert eval_fn(tuned.execute(left), left) == 1.0


def test_prompt_evolution_pareto_frontier():
    from lotus_tpu.ast.optimizer.prompt_optimizer import PromptEvolutionOptimizer

    archive = [
        {"scores": [1.0, 0.0]},
        {"scores": [0.0, 1.0]},
        {"scores": [0.5, 0.5]},  # not dominated: no member beats it on both
        {"scores": [0.0, 0.0]},  # dominated by every other member
        {"scores": [1.0, 0.0]},  # duplicate vector: equal, not dominated
    ]
    frontier = PromptEvolutionOptimizer._pareto_frontier(archive)
    assert archive[3] not in frontier
    assert {id(m) for m in frontier} == {id(archive[0]), id(archive[1]), id(archive[2]), id(archive[4])}


def test_predicate_pushdown_blocked_by_non_filter_node():
    """Pandas filters hoist only past the contiguous sem_filter run directly
    above them — never past a map (whose output they might reference)."""
    lf = (
        LazyFrame()
        .sem_map("Summarize {text}")
        .sem_filter("{text} relevant")
        .filter(lambda d: d["_map"].str.len() > 0)  # depends on the map
    )
    kinds = [type(n).__name__ for n in lf.optimize()._nodes]
    # Hoisted past the sem_filter but stopped at the map.
    assert kinds.index("SemMapNode") < kinds.index("PandasFilterNode") < kinds.index("SemFilterNode")


def test_helper_instruction_target_gated_on_proxy_model():
    """The cascade helper-instruction is an optimizer target only when the
    cascade actually uses a helper LM (reference gepa tests:
    filter_helper_instruction_target_{enabled,not_enabled})."""
    from lotus_tpu.ast.optimizer.prompt_optimizer import collect_targets
    from lotus_tpu.types import CascadeArgs, ProxyModel

    helper = LazyFrame().sem_filter(
        "{text} ok", cascade_args=CascadeArgs(proxy_model=ProxyModel.HELPER_LM)
    )
    params = {t.param for t in collect_targets(helper._nodes)}
    assert "cascade_args.helper_filter_instruction" in params

    embed = LazyFrame().sem_filter(
        "{text} ok", cascade_args=CascadeArgs(proxy_model=ProxyModel.EMBEDDING_MODEL)
    )
    params = {t.param for t in collect_targets(embed._nodes)}
    assert "cascade_args.helper_filter_instruction" not in params
    assert "user_instruction" in params

    plain = LazyFrame().sem_filter("{text} ok")  # no cascade at all
    params = {t.param for t in collect_targets(plain._nodes)}
    assert "cascade_args.helper_filter_instruction" not in params


def test_helper_instruction_explicit_override_resolves():
    """An explicit helper_filter_instruction is what the optimizer sees and
    mutates; without one, the target falls back to the user instruction."""
    from lotus_tpu.ast.optimizer.prompt_optimizer import collect_targets
    from lotus_tpu.types import CascadeArgs, ProxyModel

    lf = LazyFrame().sem_filter(
        "{text} ok",
        cascade_args=CascadeArgs(
            proxy_model=ProxyModel.HELPER_LM,
            helper_filter_instruction="helper view of {text}",
        ),
    )
    node = lf._nodes[1]
    assert node.resolve_optimizable_param_value(
        "cascade_args.helper_filter_instruction"
    ) == "helper view of {text}"
    node2 = node.apply_optimizable_param_value(
        "cascade_args.helper_filter_instruction", "evolved {text}"
    )
    assert node2.cascade_args.helper_filter_instruction == "evolved {text}"
    # The oracle instruction is untouched.
    assert node2.user_instruction == "{text} ok"

    bare = LazyFrame().sem_filter(
        "{text} ok", cascade_args=CascadeArgs(proxy_model=ProxyModel.HELPER_LM)
    )
    assert bare._nodes[1].resolve_optimizable_param_value(
        "cascade_args.helper_filter_instruction"
    ) == "{text} ok"
