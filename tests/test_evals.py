"""llm_as_judge and pairwise_judge with fake transports."""

import pandas as pd
import pytest
from pydantic import BaseModel

import lotus_tpu
from lotus_tpu.models import make_fake_lm


@pytest.fixture(autouse=True)
def reset_settings():
    yield
    lotus_tpu.settings.configure(lm=None, helper_lm=None, rm=None, vs=None, enable_cache=False)


def test_llm_as_judge_trials():
    lotus_tpu.settings.configure(lm=make_fake_lm(responder=lambda p, m, **kw: "4"))
    df = pd.DataFrame({"answer": ["resp one", "resp two"]})
    out = df.llm_as_judge("Grade the {answer} from 1-5", n_trials=3)
    for i in range(3):
        assert out[f"_judge_{i}"].tolist() == ["4", "4"]


def test_llm_as_judge_response_format():
    class Grade(BaseModel):
        score: int
        comment: str

    lotus_tpu.settings.configure(
        lm=make_fake_lm(responder=lambda p, m, **kw: '{"score": 5, "comment": "great"}')
    )
    df = pd.DataFrame({"answer": ["resp"]})
    out = df.llm_as_judge("Grade the {answer}", response_format=Grade, n_trials=1)
    assert out["_judge_0"].iloc[0].score == 5


def test_llm_as_judge_trials_bypass_cache():
    calls = []

    def responder(prompt, msgs, **kw):
        calls.append(prompt)
        return "3"

    lotus_tpu.settings.configure(lm=make_fake_lm(responder=responder), enable_cache=True)
    df = pd.DataFrame({"answer": ["one"]})
    df.llm_as_judge("Grade the {answer}", n_trials=3)
    assert len(calls) == 3  # cache disabled during trials -> all trials hit the model


def test_pairwise_judge_basic():
    def responder(prompt, msgs, **kw):
        # Prefer the longer response.
        text = str(prompt)
        return "Answer: A" if "longer answer text" in text else "Answer: B"

    lotus_tpu.settings.configure(lm=make_fake_lm(responder=responder))
    df = pd.DataFrame(
        {"left": ["longer answer text", "short"], "right": ["short", "short"]}
    )
    out = df.pairwise_judge("left", "right", "Which of {left} and {right} is more detailed?")
    assert out["_judge_0"].tolist() == ["A", "B"]


def test_pairwise_judge_permuted():
    def responder(prompt, msgs, **kw):
        # Always prefer the document containing "gold", regardless of position.
        text = str(prompt)
        a_part = text.split("[A]:")[1].split("[B]:")[0] if "[A]:" in text else ""
        return "Answer: A" if "gold" in a_part else "Answer: B"

    lotus_tpu.settings.configure(lm=make_fake_lm(responder=responder))
    df = pd.DataFrame({"left": ["gold response"], "right": ["plain response"]})
    out = df.pairwise_judge(
        "left", "right", "Which of {left} and {right} is golden?", n_trials=2, permute_cols=True
    )
    judge_cols = [c for c in out.columns if c.startswith("_judge")]
    assert len(judge_cols) == 2
    # After permutation re-mapping, "A" must mean col1 (the gold one) in both.
    for c in judge_cols:
        assert out[c].tolist() == ["A"]


def test_judge_inside_settings_context_does_not_leak():
    """Regression: judging inside settings.context() must not clobber the base
    enable_cache (the old save/restore wrote the overlay value into the base),
    and the scoped judge lm must actually be used by the pool workers."""
    prod_lm = make_fake_lm(responder=lambda p, m, **kw: "prod")
    judge_lm = make_fake_lm(responder=lambda p, m, **kw: "7")
    lotus_tpu.settings.configure(lm=prod_lm, enable_cache=True)
    df = pd.DataFrame({"answer": ["resp"]})
    with lotus_tpu.settings.context(lm=judge_lm, enable_cache=False):
        out = df.llm_as_judge("Grade the {answer} from 1-10", n_trials=2)
    assert out["_judge_0"].tolist() == ["7"]  # workers saw the scoped lm
    assert lotus_tpu.settings.enable_cache is True
    assert lotus_tpu.settings.lm is prod_lm

    with lotus_tpu.settings.context(lm=judge_lm, enable_cache=False):
        df2 = pd.DataFrame({"left": ["alpha"], "right": ["beta"]})
        df2.pairwise_judge("left", "right", "Compare {left} and {right}", n_trials=1)
    assert lotus_tpu.settings.enable_cache is True
