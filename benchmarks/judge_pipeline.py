"""LLM-as-judge benchmark (protocol of the reference's llm_as_judge suite):
judge accuracy against gold labels; supports prompt optimization.

Offline smoke mode uses the deterministic fake LM; set
``LOTUS_TPU_BENCH_MODEL`` to use a real provider.
"""

from __future__ import annotations

import os
from typing import Any

import pandas as pd

import lotus_tpu
from lotus_tpu.ast import LazyFrame
from lotus_tpu.models import LM, make_fake_lm

SUPPORTS_CASCADE = False

_ROWS = [
    ("The service was excellent and fast.", "good"),
    ("Terrible, broke after one day.", "bad"),
    ("Absolutely love it, works perfectly.", "good"),
    ("Worst purchase I have ever made.", "bad"),
    ("Solid quality, would recommend.", "good"),
    ("Disappointing and overpriced.", "bad"),
]


def configure_models() -> tuple[LM, LM]:
    model = os.getenv("LOTUS_TPU_BENCH_MODEL")
    if model:
        lm = LM(model=model)
    else:
        def responder(prompt, messages, **kw):
            text = str(prompt).lower()
            positive = any(w in text for w in ("excellent", "love", "solid", "recommend"))
            return "good" if positive else "bad"

        lm = make_fake_lm(responder=responder)
    lotus_tpu.settings.configure(lm=lm, helper_lm=lm)
    return lm, lm


def load_data() -> tuple[pd.DataFrame, pd.DataFrame]:
    df = pd.DataFrame({"review": [r for r, _ in _ROWS], "label": [l for _, l in _ROWS]})
    return df.iloc[:3].reset_index(drop=True), df.iloc[3:].reset_index(drop=True)


def build_pipeline() -> LazyFrame:
    return LazyFrame().llm_as_judge(
        "Judge whether this {review} reflects a good or bad experience. Answer 'good' or 'bad'.",
        n_trials=1,
    )


from benchmarks.common import first_word as _verdict


def make_eval_fn(train_df: pd.DataFrame):
    def eval_fn(output_df, example):
        correct = sum(
            _verdict(j) == l for j, l in zip(output_df["_judge_0"], output_df["label"])
        )
        return correct / max(len(output_df), 1)

    return eval_fn


def optimize_pipeline(lf: LazyFrame, train_df: pd.DataFrame, eval_fn, max_metric_calls: int) -> LazyFrame:
    from lotus_tpu.ast import PromptHillClimbOptimizer

    return lf.optimize([PromptHillClimbOptimizer(eval_fn, n_rounds=1, proposals_per_target=1)], train_data=train_df)


def evaluate(result: pd.DataFrame, test_df: pd.DataFrame, oracle_lm: LM, helper_lm: LM) -> dict[str, Any]:
    correct = sum(
        _verdict(j) == l for j, l in zip(result["_judge_0"], result["label"])
    )
    usage = oracle_lm.stats.virtual_usage
    return {
        "accuracy": correct / max(len(result), 1),
        "total_tokens": usage.total_tokens,
        "cost_usd": usage.total_cost,
    }
