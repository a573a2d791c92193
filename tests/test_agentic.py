"""Agentic map-reduce with scripted completers (no network; house pattern of
the reference: inject fakes at the Completer protocol seam)."""

import json

import pytest

from lotus_tpu.agentic import Plan, normalize_ops, run_agent, run_pipeline
from lotus_tpu.agentic.loop import AgentStep, ToolCall
from lotus_tpu.corpus import Corpus, Unit
from lotus_tpu.tools import PythonREPLTool, tool


class StatelessCompleter:
    """Returns a fixed answer derived from the last user message."""

    def __init__(self, fn):
        self.fn = fn
        self.calls = 0

    def __call__(self, messages, *, tools_enabled=True):
        self.calls += 1
        user = next(m["content"] for m in reversed(messages) if m["role"] == "user")
        return AgentStep(content=self.fn(user), usage={"total_tokens": 10})


class ScriptedToolCompleter:
    """First turn requests a tool call; second returns the final answer."""

    def __init__(self):
        self.turn = 0

    def __call__(self, messages, *, tools_enabled=True):
        self.turn += 1
        if self.turn == 1 and tools_enabled:
            return AgentStep(tool_calls=[ToolCall(id="1", name="add", arguments={"a": 2, "b": 3})])
        tool_result = next((m["content"] for m in messages if m.get("role") == "tool"), "")
        return AgentStep(content=f"final: {tool_result}")


def test_normalize_ops():
    assert normalize_ops(None) == ["map", "reduce"]
    assert normalize_ops("map") == ["map"]
    assert normalize_ops(["filter", "map", "reduce"]) == ["filter", "map", "reduce"]
    with pytest.raises(ValueError):
        normalize_ops(["reduce", "map"])  # terminal not last
    with pytest.raises(ValueError):
        normalize_ops(["map", "map"])  # duplicate
    with pytest.raises(ValueError):
        normalize_ops(["fly"])  # unknown


def test_run_agent_with_tool():
    @tool(description="Add two integers.")
    def add(a: int, b: int) -> str:
        return str(a + b)

    res = run_agent(ScriptedToolCompleter(), [add], "system", "compute 2+3")
    assert res.output == "final: 5"
    assert res.trace[0]["tool"] == "add"
    assert res.trace[0]["result"] == "5"
    assert not res.truncated


def test_run_agent_tool_error_fed_back():
    @tool(description="Always fails.")
    def boom() -> str:
        raise RuntimeError("nope")

    class C:
        turn = 0

        def __call__(self, messages, *, tools_enabled=True):
            self.turn += 1
            if self.turn == 1:
                return AgentStep(tool_calls=[ToolCall(id="1", name="boom", arguments={})])
            tool_msg = next(m["content"] for m in messages if m.get("role") == "tool")
            return AgentStep(content=tool_msg)

    res = run_agent(C(), [boom], "s", "u")
    assert "ERROR: RuntimeError: nope" in res.output


def test_run_agent_max_steps_forces_final():
    class AlwaysTools:
        def __call__(self, messages, *, tools_enabled=True):
            if not tools_enabled:
                return AgentStep(content="forced final")
            return AgentStep(tool_calls=[ToolCall(id="1", name="missing", arguments={})])

    res = run_agent(AlwaysTools(), [], "s", "u", max_steps=2)
    assert res.output == "forced final"
    assert res.truncated


def test_pipeline_map_reduce():
    corpus = Corpus.from_documents(["alpha doc", "beta doc"])

    def respond(user):
        if "PER-SHARD FINDINGS" in user:
            return "REDUCED ANSWER"
        return "mapped:" + ("alpha" if "alpha" in user else "beta")

    completer = StatelessCompleter(respond)
    result = run_pipeline(
        corpus, "summarize", plan=Plan(), lm=object(),
        completer_factory=lambda tools: completer,
    )
    assert result.output == "REDUCED ANSWER"
    assert result.findings == ["mapped:alpha", "mapped:beta"]
    assert result.usage["total_tokens"] > 0


def test_pipeline_filter_verdicts():
    corpus = Corpus.from_documents(["keep me", "drop me"])

    def respond(user):
        return "VERDICT: KEEP" if "keep me" in user else "VERDICT: DROP"

    result = run_pipeline(
        corpus, "filter it", ops=["filter"], plan=Plan(ops=["filter"]), lm=object(),
        completer_factory=lambda tools: StatelessCompleter(respond),
    )
    assert result.corpus is not None
    assert [u.content for u in result.corpus.units] == ["keep me"]


def test_pipeline_batched_strategy_json():
    corpus = Corpus.from_documents(["one", "two", "three", "four"], ids=["a", "b", "c", "d"])

    def respond(user):
        if "PER-SHARD FINDINGS" in user:
            return "done"
        # Batched: emit one output per unit id present in the shard text.
        entries = [
            {"id": uid, "output": f"out-{uid}"}
            for uid in ("a", "b", "c", "d")
            if f"[unit {uid}]" in user
        ]
        return "reasoning...\n" + json.dumps(entries)

    plan = Plan(ops=["map", "reduce"], strategies={"map": "batched"}, shard_size=2)
    result = run_pipeline(
        corpus, "task", plan=plan, lm=object(),
        completer_factory=lambda tools: StatelessCompleter(respond),
    )
    assert result.findings == ["out-a", "out-b", "out-c", "out-d"]


def test_pipeline_batched_missing_unit_defaults():
    corpus = Corpus.from_documents(["one", "two"], ids=["a", "b"])

    def respond(user):
        if "PER-SHARD FINDINGS" in user:
            return "done"
        return json.dumps([{"id": "a", "output": "got-a"}])  # b missing

    plan = Plan(ops=["map", "reduce"], strategies={"map": "batched"}, shard_size=2)
    result = run_pipeline(
        corpus, "task", plan=plan, lm=object(),
        completer_factory=lambda tools: StatelessCompleter(respond),
    )
    assert result.findings[0] == "got-a"
    assert result.findings[1] == "two"  # map default = original content


def test_corpus_loaders(tmp_path):
    (tmp_path / "x.txt").write_text("hello")
    (tmp_path / "y.txt").write_text("world")
    c = Corpus.from_files(str(tmp_path / "*.txt"))
    assert len(c) == 2
    c2 = Corpus.from_text("ab" * 5000, chunk_chars=4000)
    assert len(c2) == 3
    assert c.shard(1) and len(c.shard(5)) == 1


def test_repl_tool_runs_code():
    out = PythonREPLTool().run(code="print(6*7)")
    assert out.strip() == "42"


def test_repl_tool_timeout():
    out = PythonREPLTool(timeout=1).run(code="import time; time.sleep(5)")
    assert "timed out" in out


def test_derive_plan_falls_back_without_lm():
    import lotus_tpu
    from lotus_tpu.agentic.planner import derive_plan

    lotus_tpu.settings.configure(lm=None)
    corpus = Corpus.from_documents(["alpha", "beta"])
    plan = derive_plan("summarize the docs", corpus, ops=["map", "reduce"])
    assert plan.ops == ["map", "reduce"]
    assert "summarize the docs" in plan.instructions["map"]
    assert plan.shard_size == 1 and 1 <= plan.parallelism <= 4


def test_derive_plan_survives_planner_error():
    from lotus_tpu.agentic.planner import derive_plan

    class ExplodingLM:
        def get_completion(self, *a, **kw):
            raise RuntimeError("planner transport down")

    corpus = Corpus.from_documents(["alpha"])
    plan = derive_plan("do the thing", corpus, ops=["map"], lm=ExplodingLM())
    assert "do the thing" in plan.instructions["map"]  # heuristic plan kept


def test_derive_plan_respects_overrides_without_lm_call():
    from lotus_tpu.agentic.planner import derive_plan

    calls = []

    class CountingLM:
        def get_completion(self, *a, **kw):
            calls.append(1)
            raise AssertionError("must not be called when fully overridden")

    corpus = Corpus.from_documents(["alpha"])
    plan = derive_plan(
        "task", corpus, ops=["map", "reduce"],
        lm=CountingLM(),
        overrides={"map": "custom map", "reduce": "custom reduce"},
    )
    assert not calls
    assert plan.instructions == {"map": "custom map", "reduce": "custom reduce"}


def test_derive_plan_grafts_draft_and_caps_parallelism():
    from lotus_tpu.agentic.planner import _Draft, _OpDraft, derive_plan

    class DraftLM:
        def get_completion(self, *a, **kw):
            return _Draft(
                map=_OpDraft(instruction="count the words", strategy="batched"),
                reduce=_OpDraft(instruction="sum the counts"),
                shard_size=3,
                parallelism=999,
            )

    corpus = Corpus.from_documents(["alpha two", "beta"])
    plan = derive_plan("count words", corpus, ops=["map", "reduce"], lm=DraftLM(), parallelism_cap=5)
    assert plan.instructions["map"] == "count the words"
    assert plan.strategies["map"] == "batched"
    assert plan.shard_size == 3
    assert plan.parallelism == 5  # capped


def test_corpus_from_text_chunks_and_ids():
    corpus = Corpus.from_text("x" * 9000, chunk_chars=4000)
    assert len(corpus) == 3
    assert [len(u.content) for u in corpus.units] == [4000, 4000, 1000]
    assert len({u.id for u in corpus.units}) == 3  # unique unit ids


def test_corpus_from_dataframe_roundtrip():
    import pandas as pd

    df = pd.DataFrame({"title": ["a", "b"], "body": ["one", "two"]})
    corpus = Corpus.from_dataframe(df)
    assert len(corpus) == 2
    assert "one" in corpus.units[0].content and "two" in corpus.units[1].content
