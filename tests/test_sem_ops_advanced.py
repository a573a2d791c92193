"""Advanced operator paths: join cascade, quick-sem topk, group_by pools,
embedding-proxy filter cascade, extract quotes."""

import json

import numpy as np
import pandas as pd
import pytest

import lotus_tpu
from lotus_tpu.models import HashRM, make_fake_lm
from lotus_tpu.types import CascadeArgs, ProxyModel, ReasoningStrategy
from lotus_tpu.vector_store import TpuVS


@pytest.fixture(autouse=True)
def reset_settings(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)  # join cascade writes an index dir in cwd
    yield
    lotus_tpu.settings.configure(lm=None, helper_lm=None, rm=None, vs=None, enable_cache=False)


def oracle_animals(prompt, messages, **kw):
    text = str(prompt)
    pairs = [("cat", "animal"), ("dog", "animal"), ("rose", "plant"), ("oak", "plant")]
    return f"Answer: {any(a in text and b in text for a, b in pairs)}"


def test_sem_join_cascade_search_filter():
    lotus_tpu.settings.configure(
        lm=make_fake_lm(responder=oracle_animals),
        rm=HashRM(dim=48),
        vs=TpuVS(),
    )
    left = pd.DataFrame({"word": ["cat", "dog", "rose", "oak"] * 4})
    right = pd.DataFrame({"kind": ["animal", "plant"] * 4})
    args = CascadeArgs(
        recall_target=0.8,
        precision_target=0.8,
        sampling_percentage=0.5,
        min_join_cascade_size=10,
        cascade_IS_random_seed=0,
        join_cascade_strategy="search_filter",
        # HashRM proxy scores are uninformative for these word pairs, so keep
        # the whole band between the thresholds -> everything goes to the
        # oracle; this pins the plumbing (sim-join proxy, routing, remap).
        join_cascade_pos_threshold=0.99,
        join_cascade_neg_threshold=-1.0,
    )
    out, stats = left.sem_join(right, "the {word} is a {kind}", cascade_args=args, return_stats=True)
    assert stats["total_LM_calls"] >= 0
    pairs = set(zip(out["word"], out["kind"]))
    # All true pairs recovered
    assert ("cat", "animal") in pairs and ("rose", "plant") in pairs
    assert ("cat", "plant") not in pairs


def test_sem_topk_quick_sem(tmp_path):
    import re

    def responder(prompt, messages, **kw):
        # Extract the two serialized values («...») regardless of content framing.
        d1, d2 = re.findall(r"«([^»]*)»", str(prompt))[:2]
        return "Document 1" if len(d1) < len(d2) else "Document 2"

    lotus_tpu.settings.configure(
        lm=make_fake_lm(responder=responder), rm=HashRM(dim=32), vs=TpuVS()
    )
    df = pd.DataFrame({"title": ["aaa bbb ccc extra words", "aaa", "aaa bbb"]})
    out = df.sem_topk("Rank {title} by brevity", K=1, method="quick-sem")
    assert out["title"].tolist() == ["aaa"]


def test_sem_topk_group_by():
    def responder(prompt, messages, **kw):
        text = str(prompt)
        d1 = text.split("Document 1:")[1].split("Document 2:")[0]
        d2 = text.split("Document 2:")[1]
        return "Document 1" if d1 < d2 else "Document 2"

    lotus_tpu.settings.configure(lm=make_fake_lm(responder=responder))
    df = pd.DataFrame(
        {"name": ["zz", "aa", "mm", "bb"], "grp": ["x", "x", "y", "y"]}
    )
    out = df.sem_topk("Rank {name} alphabetically", K=1, group_by=["grp"])
    assert sorted(out["name"].tolist()) == ["aa", "bb"]


def test_sem_agg_group_by():
    lotus_tpu.settings.configure(lm=make_fake_lm(responder=lambda p, m, **kw: "SUM"))
    df = pd.DataFrame({"note": ["a", "b", "c"], "grp": ["g1", "g1", "g2"]})
    out = df.sem_agg("Summarize {note}", group_by=["grp"])
    assert len(out) == 2
    assert set(out["grp"]) == {"g1", "g2"}
    assert out["_output"].tolist() == ["SUM", "SUM"]


def test_sem_extract_quotes():
    def responder(prompt, messages, **kw):
        return json.dumps({"color": "red", "color_quote": "the red balloon"})

    lotus_tpu.settings.configure(lm=make_fake_lm(responder=responder))
    df = pd.DataFrame({"text": ["I saw the red balloon"]})
    out = df.sem_extract(["text"], {"color": None}, extract_quotes=True)
    assert out["color"].iloc[0] == "red"
    assert out["color_quote"].iloc[0] == "the red balloon"


def test_filter_cascade_embedding_proxy(tmp_path):
    import re

    # Embedding proxy: rows similar to the instruction text score high.
    oracle_calls = []

    def oracle(prompt, messages, **kw):
        oracle_calls.append(prompt)
        row_value = re.findall(r"«([^»]*)»", str(prompt))[0]
        return f"Answer: {'sports' in row_value}"

    lotus_tpu.settings.configure(
        lm=make_fake_lm(responder=oracle), rm=HashRM(dim=48), vs=TpuVS()
    )
    df = pd.DataFrame(
        {"text": ["sports game tonight", "sports match result", "cooking pasta", "garden tips"] * 5}
    )
    df = df.sem_index("text", str(tmp_path / "idx"))
    args = CascadeArgs(
        proxy_model=ProxyModel.EMBEDDING_MODEL,
        filter_pos_cascade_threshold=0.9,
        filter_neg_cascade_threshold=0.05,
    )
    out, stats = df.sem_filter("{text} is about sports", cascade_args=args, return_stats=True)
    assert "num_routed_to_helper_model" in stats
    # Everything kept must actually be sports (oracle backs the uncertain band).
    assert all("sports" in t for t in out["text"])


def test_sem_map_cot_strategy_explanations():
    def responder(prompt, messages, **kw):
        return "Reasoning:\nbecause reasons\n\nAnswer: DONE"

    lotus_tpu.settings.configure(lm=make_fake_lm(responder=responder))
    df = pd.DataFrame({"text": ["x"]})
    out = df.sem_map("{text}", strategy=ReasoningStrategy.ZS_COT, return_explanations=True)
    assert out["_map"].iloc[0] == "DONE"
    assert out["explanation_map"].iloc[0] == "because reasons"


def _deepseek_lm(answer_fn):
    """Fake LM whose model name dispatches the DeepSeek <think> postprocessor
    (mirrors the reference's deepseek_cot_tests: the reasoning block must be
    stripped into the explanation and never leak into answers)."""
    from lotus_tpu.models.fake import FakeTransport
    from lotus_tpu.models.lm import LM

    return LM(model="ollama/deepseek-r1:7b", transport=FakeTransport(responder=answer_fn))


def test_deepseek_think_block_map():
    def responder(prompt, messages, **kw):
        return "<think>chain of thought here</think>\nAnswer: POEM"

    lotus_tpu.settings.configure(lm=_deepseek_lm(responder))
    df = pd.DataFrame({"text": ["write me a poem"]})
    out = df.sem_map("{text}", strategy=ReasoningStrategy.ZS_COT, return_explanations=True)
    assert out["_map"].iloc[0] == "POEM"
    assert "chain of thought" in out["explanation_map"].iloc[0]
    assert "<think>" not in out["_map"].iloc[0]


def test_deepseek_think_block_filter():
    def responder(prompt, messages, **kw):
        text = str(messages)
        verdict = "True" if "sports" in text and "basketball" in text else "False"
        return f"<think>weighing the evidence</think>\nAnswer: {verdict}"

    lotus_tpu.settings.configure(lm=_deepseek_lm(responder))
    df = pd.DataFrame({"text": ["basketball is sports", "a cooking show"]})
    out = df.sem_filter(
        "{text} is about sports", strategy=ReasoningStrategy.ZS_COT,
        return_explanations=True,
    )
    assert list(out["text"]) == ["basketball is sports"]
    assert "weighing the evidence" in out["explanation_filter"].iloc[0]
