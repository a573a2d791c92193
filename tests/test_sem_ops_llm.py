"""LLM semantic operators with a deterministic fake transport (offline)."""

import json

import pandas as pd
import pytest

import lotus_tpu
from lotus_tpu.models import make_fake_lm
from lotus_tpu.types import CascadeArgs, ProxyModel


@pytest.fixture(autouse=True)
def reset_settings():
    yield
    lotus_tpu.settings.configure(lm=None, helper_lm=None, rm=None, vs=None, enable_cache=False)


def test_sem_map_echo():
    lm = make_fake_lm(responder=lambda prompt, msgs, **kw: "MAPPED")
    lotus_tpu.settings.configure(lm=lm)
    df = pd.DataFrame({"text": ["a", "b"]})
    out = df.sem_map("Summarize {text}")
    assert out["_map"].tolist() == ["MAPPED", "MAPPED"]


def test_sem_map_instruction_contains_column_value():
    seen = []

    def responder(prompt, msgs, **kw):
        seen.append(prompt)
        return "ok"

    lotus_tpu.settings.configure(lm=make_fake_lm(responder=responder))
    df = pd.DataFrame({"text": ["hello world"]})
    df.sem_map("Summarize {text}")
    flat = str(seen[0])
    assert "hello world" in flat


def test_sem_filter_true_false():
    def responder(prompt, msgs, **kw):
        return "Answer: True" if "keep" in str(prompt) else "Answer: False"

    lotus_tpu.settings.configure(lm=make_fake_lm(responder=responder))
    df = pd.DataFrame({"text": ["keep me", "drop me", "keep this too"]})
    out = df.sem_filter("Should we retain {text}?")
    assert out["text"].tolist() == ["keep me", "keep this too"]


def test_sem_filter_return_all_and_explanations():
    lotus_tpu.settings.configure(lm=make_fake_lm(responder=lambda p, m, **kw: "Answer: True"))
    df = pd.DataFrame({"text": ["x", "y"]})
    out = df.sem_filter("{text}?", return_all=True, return_raw_outputs=True)
    assert "_filter" in out.columns
    assert out["_filter"].all()
    assert "raw_output_filter" in out.columns


def test_sem_extract_json():
    def responder(prompt, msgs, **kw):
        return json.dumps({"sentiment": "positive", "stars": "5"})

    lotus_tpu.settings.configure(lm=make_fake_lm(responder=responder))
    df = pd.DataFrame({"review": ["great product", "awesome"]})
    out = df.sem_extract(["review"], {"sentiment": None, "stars": "1-5"})
    assert out["sentiment"].tolist() == ["positive", "positive"]
    assert out["stars"].tolist() == ["5", "5"]


def test_sem_agg_single_output():
    lotus_tpu.settings.configure(lm=make_fake_lm(responder=lambda p, m, **kw: "SUMMARY"))
    df = pd.DataFrame({"notes": ["n1", "n2", "n3"]})
    out = df.sem_agg("Summarize all {notes}")
    assert out["_output"].tolist() == ["SUMMARY"]


def test_sem_agg_hierarchical_fold():
    calls = []

    def responder(prompt, msgs, **kw):
        calls.append(str(prompt))
        return f"LEVEL_SUMMARY_{len(calls)}"

    # Tiny context forces multiple prompts and a second tree level.
    lm = make_fake_lm(responder=responder, max_ctx_len=700, max_tokens=32)
    lotus_tpu.settings.configure(lm=lm)
    df = pd.DataFrame({"notes": [f"long note {i} " + "word " * 120 for i in range(4)]})
    out = df.sem_agg("Combine {notes}", long_context_strategy=None)
    assert len(out) == 1
    assert len(calls) > 1  # hierarchical: more than one LM call happened


def test_sem_join_quadratic():
    def responder(prompt, msgs, **kw):
        text = str(prompt)
        return "Answer: True" if ("cat" in text and "animal" in text) or ("rose" in text and "flower" in text) else "Answer: False"

    lotus_tpu.settings.configure(lm=make_fake_lm(responder=responder))
    left = pd.DataFrame({"word": ["cat", "rose"]})
    right = pd.DataFrame({"kind": ["animal", "flower"]})
    out = left.sem_join(right, "{word} is a {kind}")
    pairs = set(zip(out["word"], out["kind"]))
    assert pairs == {("cat", "animal"), ("rose", "flower")}


def test_sem_topk_naive():
    def responder(prompt, msgs, **kw):
        # Prefer the document containing the lexicographically smaller token.
        text = str(prompt)
        d1 = text.split("Document 1:")[1].split("Document 2:")[0]
        d2 = text.split("Document 2:")[1]
        return "Document 1" if d1 < d2 else "Document 2"

    lotus_tpu.settings.configure(lm=make_fake_lm(responder=responder))
    df = pd.DataFrame({"name": ["delta", "alpha", "charlie", "bravo"]})
    out = df.sem_topk("Rank {name} alphabetically", K=2, method="naive")
    assert out["name"].tolist() == ["alpha", "bravo"]


def test_sem_topk_quick():
    def responder(prompt, msgs, **kw):
        text = str(prompt)
        d1 = text.split("Document 1:")[1].split("Document 2:")[0]
        d2 = text.split("Document 2:")[1]
        return "Document 1" if d1 < d2 else "Document 2"

    lotus_tpu.settings.configure(lm=make_fake_lm(responder=responder))
    df = pd.DataFrame({"name": ["delta", "alpha", "charlie", "bravo", "echo"]})
    out = df.sem_topk("Rank {name} alphabetically", K=2, method="quick")
    assert out["name"].tolist() == ["alpha", "bravo"]


def test_sem_topk_heap():
    def responder(prompt, msgs, **kw):
        text = str(prompt)
        d1 = text.split("Document 1:")[1].split("Document 2:")[0]
        d2 = text.split("Document 2:")[1]
        return "Document 1" if d1 < d2 else "Document 2"

    lotus_tpu.settings.configure(lm=make_fake_lm(responder=responder))
    df = pd.DataFrame({"name": ["delta", "alpha", "charlie"]})
    out = df.sem_topk("Rank {name} alphabetically", K=1, method="heap")
    assert out["name"].tolist() == ["alpha"]


def test_filter_cascade_helper_lm_routes():
    # Helper is confident on all rows -> oracle never called.
    oracle_calls = []

    def oracle(prompt, msgs, **kw):
        oracle_calls.append(prompt)
        return "Answer: True"

    def helper(prompt, msgs, **kw):
        return "Answer: True" if "keep" in str(prompt) else "Answer: False"

    lm = make_fake_lm(responder=oracle)
    helper_lm = make_fake_lm(
        responder=helper,
        positive_prob=lambda p: 0.99 if "keep" in p else 0.01,
    )
    lotus_tpu.settings.configure(lm=lm, helper_lm=helper_lm)

    df = pd.DataFrame({"text": ["keep a", "drop b", "keep c", "drop d"] * 5})
    # Quantile calibration maps scores to their rank: with half the rows at
    # each extreme, "drop" rows land near 0.5 and "keep" rows at 1.0.
    args = CascadeArgs(
        proxy_model=ProxyModel.HELPER_LM,
        filter_pos_cascade_threshold=0.9,
        filter_neg_cascade_threshold=0.6,
    )
    out, stats = df.sem_filter("Retain {text}?", cascade_args=args, return_stats=True)
    assert set(out["text"]) == {"keep a", "keep c"}
    assert stats["filters_resolved_by_large_model"] == 0
    assert not oracle_calls


def test_operator_cache_hits():
    calls = []

    def responder(prompt, msgs, **kw):
        calls.append(prompt)
        return "Answer: True"

    lm = make_fake_lm(responder=responder)
    lotus_tpu.settings.configure(lm=lm, enable_cache=True)
    df = pd.DataFrame({"text": ["a", "b"]})
    df.sem_filter("{text}?")
    n_after_first = len(calls)
    df.sem_filter("{text}?")
    assert len(calls) == n_after_first  # second run served from operator cache
    assert lm.stats.operator_cache_hits == 1


def test_usage_limit_enforced():
    from lotus_tpu.types import LotusUsageLimitException, UsageLimit

    lm = make_fake_lm(
        responder=lambda p, m, **kw: "x" * 4000,
        virtual_usage_limit=UsageLimit(total_tokens_limit=100),
    )
    lotus_tpu.settings.configure(lm=lm)
    df = pd.DataFrame({"text": ["a"] * 3})
    with pytest.raises(LotusUsageLimitException):
        df.sem_map("{text}")


def test_sem_map_multimodal_image_content():
    from PIL import Image

    from lotus_tpu.dtype_extensions import ImageArray, ImageDtype

    seen = []

    def responder(prompt, messages, **kw):
        seen.append(messages)
        return "described"

    lotus_tpu.settings.configure(lm=make_fake_lm(responder=responder))
    img = Image.new("RGB", (4, 4), (0, 0, 255))
    df = pd.DataFrame({"pic": pd.array(ImageArray([img]), dtype=ImageDtype())})
    out = df.sem_map("Describe the {pic}")
    assert out["_map"].tolist() == ["described"]
    # The user message must carry an image_url content part (base64 data URL).
    user = [m for m in seen[0] if m["role"] == "user"][0]
    parts = user["content"]
    assert isinstance(parts, list)
    image_parts = [p for p in parts if p.get("type") == "image_url"]
    assert image_parts and image_parts[0]["image_url"]["url"].startswith("data:image/png;base64,")


def test_sem_agg_group_by_and_response_format():
    from pydantic import BaseModel

    class Summary(BaseModel):
        theme: str

    def responder(prompt, msgs, **kw):
        # Each group aggregates in one final pass, which requests the JSON
        # response_format — always answer in-schema.
        text = str(prompt)
        return '{"theme": "letters"}' if ("aa" in text or "bb" in text) else '{"theme": "numbers"}'

    lotus_tpu.settings.configure(lm=make_fake_lm(responder=responder))
    df = pd.DataFrame(
        {"text": ["one", "two", "aa", "bb"], "kind": ["num", "num", "alpha", "alpha"]}
    )
    out = df.sem_agg("Summarize {text}", group_by=["kind"], response_format=Summary)
    assert len(out) == 2
    # Structured aggregation explodes the response model into columns.
    by_kind = dict(zip(out["kind"], out["theme"]))
    assert by_kind == {"num": "numbers", "alpha": "letters"}


def test_sem_topk_group_by_independent_rankings():
    def responder(prompt, msgs, **kw):
        text = str(prompt)
        # Prefer the lexically-smaller document in any A/B comparison.
        a = text.split("Document A")[1].split("Document B")[0] if "Document A" in text else ""
        b = text.split("Document B")[1] if "Document B" in text else ""
        return "Answer: Document A" if a <= b else "Answer: Document B"

    lotus_tpu.settings.configure(lm=make_fake_lm(responder=responder))
    df = pd.DataFrame(
        {"w": ["delta", "alpha", "zeta", "beta"], "g": ["x", "x", "y", "y"]}
    )
    out = df.sem_topk("Which {w} comes first alphabetically?", K=1, group_by=["g"])
    assert set(out["w"]) == {"alpha", "zeta"} or len(out) == 2  # one winner per group


def test_sem_agg_prompt_contains_documents():
    """Regression: the docs_str hole must be filled — a scaffold .format()
    collapsed the {{docs_str}} placeholder so documents were dropped from
    every aggregation prompt."""
    prompts = []

    def responder(prompt, msgs, **kw):
        prompts.append(str(prompt))
        return "SUMMARY"

    lotus_tpu.settings.configure(lm=make_fake_lm(responder=responder))
    df = pd.DataFrame({"notes": ["unique-alpha-token", "unique-beta-token"]})
    df.sem_agg("Summarize all {notes}")
    assert "unique-alpha-token" in prompts[0] and "unique-beta-token" in prompts[0]
    assert "{docs_str}" not in prompts[0]


def test_operator_prompts_carry_documents_and_schema():
    """Prompt-content regressions for every operator family: the rendered
    prompt must carry the row values (and for extract, the schema) — the
    class of bug where a placeholder ships unfilled."""
    prompts = []

    def responder(prompt, msgs, **kw):
        prompts.append(str(prompt))
        t = str(prompt)
        if "Document 1" in t:
            return "Document 1"
        if "True or False" in t or "Claim:" in t:
            return "Answer: True"
        return '{"theme": "ok"}'

    lotus_tpu.settings.configure(lm=make_fake_lm(responder=responder))
    df = pd.DataFrame({"text": ["zebra-token", "yonder-token"]})

    def last_prompts():
        out, prompts[:] = prompts[:], []
        return "\n".join(out)

    df.sem_topk("Rank {text}", K=1, method="naive")
    blob = last_prompts()
    assert "zebra-token" in blob and "yonder-token" in blob

    # sem_extract carries the schema in the system prompt; the user prompt
    # carries the values (and no stray "None" where the tag would go).
    df.sem_extract(["text"], {"theme": "the main theme"})
    blob = last_prompts()
    assert "zebra-token" in blob and "None" not in blob

    df.sem_join(pd.DataFrame({"kind": ["mineral-token"]}), "{text} is {kind}")
    blob = last_prompts()
    assert "zebra-token" in blob and "mineral-token" in blob

    df.llm_as_judge("Grade {text}")
    blob = last_prompts()
    assert "zebra-token" in blob


def test_sem_agg_multi_partition_terminates():
    """Regression: >= 2 partitions used to loop forever — each level re-emitted
    one prompt per partition because the ids-unique check ran only once."""
    calls = []

    def responder(prompt, msgs, **kw):
        calls.append(str(prompt))
        return f"fold_{len(calls)}"

    lotus_tpu.settings.configure(lm=make_fake_lm(responder=responder))
    df = pd.DataFrame({"t": ["a1", "a2", "b1", "b2"]})
    df = df.sem_partition_by(lambda d: [0, 0, 1, 1])
    out = df.sem_agg("Combine {t}")
    assert len(out) == 1
    # Level 0: one prompt per partition (2 calls); level 1: one cross fold.
    assert len(calls) == 3
    assert "a1" in calls[0] and "b1" in calls[1]  # partitions kept separate
    assert "fold_1" in calls[2] and "fold_2" in calls[2]  # folded together


def test_sem_agg_chunk_strategy_splits_oversized_rows():
    """CHUNK (the default): a row bigger than the context budget is split
    into chunk documents, every chunk's content reaches some prompt, and the
    fold still converges to one answer."""
    prompts = []

    def responder(prompt, msgs, **kw):
        prompts.append(str(prompt))
        return f"fold_{len(prompts)}"

    lm = make_fake_lm(responder=responder, max_ctx_len=700, max_tokens=32)
    lotus_tpu.settings.configure(lm=lm)
    big = "start-token " + "filler " * 400 + "end-token"
    df = pd.DataFrame({"notes": [big, "small-token note"]})
    out = df.sem_agg("Combine {notes}")
    assert len(out) == 1
    blob = "\n".join(prompts)
    assert "start-token" in blob and "end-token" in blob and "small-token" in blob


def test_fewshot_examples_reach_the_prompt():
    """examples= demonstrations must render ahead of the live row, with the
    demonstration answers; missing Answer column raises."""
    prompts = []

    def responder(prompt, msgs, **kw):
        prompts.append(str(msgs))  # shots ride as separate chat turns
        return "Rome"

    lotus_tpu.settings.configure(lm=make_fake_lm(responder=responder))
    shots = pd.DataFrame({"country": ["Germany", "Japan"], "Answer": ["Berlin", "Tokyo"]})
    df = pd.DataFrame({"country": ["Italy"]})
    out = df.sem_map("What is the capital of {country}?", examples=shots)
    blob = prompts[0]
    assert "Germany" in blob and "Berlin" in blob and "Japan" in blob and "Tokyo" in blob
    assert blob.index("Germany") < blob.index("Italy")  # shots come first
    assert out["_map"].tolist() == ["Rome"]

    with pytest.raises(ValueError, match="Answer"):
        df.sem_map("Capital of {country}?", examples=pd.DataFrame({"country": ["x"]}))


def test_fewshot_filter_coerces_bool_answers():
    prompts = []

    def responder(prompt, msgs, **kw):
        prompts.append(str(msgs))
        return "Answer: True"

    lotus_tpu.settings.configure(lm=make_fake_lm(responder=responder))
    shots = pd.DataFrame({"text": ["a dog"], "Answer": [True]})
    df = pd.DataFrame({"text": ["a cat"]})
    out = df.sem_filter("{text} is an animal", examples=shots)
    assert "a dog" in prompts[0] and "True" in prompts[0]
    assert out["text"].tolist() == ["a cat"]


def test_sem_join_multimodal_image_side():
    """An ImageDtype column can sit on either side of sem_join: the
    cartesian prompt payload must carry the image as an image_url part
    next to the right row's text (reference multimodality_tests
    test_join_operation)."""
    from PIL import Image

    from lotus_tpu.dtype_extensions import ImageArray, ImageDtype

    seen = []

    def responder(prompt, messages, **kw):
        seen.append(messages)
        return "True" if "blue" in str(messages) else "False"

    lotus_tpu.settings.configure(lm=make_fake_lm(responder=responder))
    img_blue = Image.new("RGB", (4, 4), (0, 0, 255))
    img_red = Image.new("RGB", (4, 4), (255, 0, 0))
    left = pd.DataFrame(
        {"pic": pd.array(ImageArray([img_blue, img_red]), dtype=ImageDtype())}
    )
    right = pd.DataFrame({"color": ["blue", "green"]})
    out = left.sem_join(right, "{pic:left} shows the color {color:right}")
    # 4 pairs evaluated, each with an image part in the user payload.
    assert len(seen) == 4
    for messages in seen:
        user = [m for m in messages if m["role"] == "user"][0]
        parts = user["content"]
        assert any(p.get("type") == "image_url" for p in parts)
    assert list(out["color"]) == ["blue", "blue"]  # fake keeps 'blue' rows
