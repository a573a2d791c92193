"""RAG pipeline benchmark (protocol of the reference's rag_pubmedqa suite:
retrieve -> filter -> aggregate -> answer; accuracy + cost + tokens).

Runs offline in smoke mode with the deterministic fake LM + HashRM; set
``LOTUS_TPU_BENCH_MODEL`` (litellm model name) to run against a real
provider.
"""

from __future__ import annotations

import os
from typing import Any

import pandas as pd

import lotus_tpu
from lotus_tpu.ast import LazyFrame
from lotus_tpu.models import HashRM, LM, make_fake_lm
from lotus_tpu.vector_store import TpuVS

SUPPORTS_CASCADE = True

_QA = [
    ("Does aspirin reduce fever?", "yes", "aspirin is an antipyretic that reduces fever"),
    ("Is water an element?", "no", "water is a compound of hydrogen and oxygen"),
    ("Do plants photosynthesize?", "yes", "plants convert light into chemical energy"),
    ("Is the heart a muscle?", "yes", "the heart is a muscular organ pumping blood"),
    ("Do antibiotics treat viruses?", "no", "antibiotics target bacteria, not viruses"),
    ("Is insulin a hormone?", "yes", "insulin is a peptide hormone regulating glucose"),
]


def configure_models() -> tuple[LM, LM]:
    model = os.getenv("LOTUS_TPU_BENCH_MODEL")
    if model:
        oracle, helper = LM(model=model), LM(model=os.getenv("LOTUS_TPU_BENCH_HELPER", model))
    else:
        def responder(prompt, messages, **kw):
            text = str(prompt).lower()
            for q, a, passage in _QA:
                if passage.split()[0] in text and q.split()[1].lower() in text:
                    return a
            return "yes"

        oracle, helper = make_fake_lm(responder=responder), make_fake_lm(responder=responder)
    lotus_tpu.settings.configure(lm=oracle, helper_lm=helper, rm=HashRM(dim=64), vs=TpuVS())
    return oracle, helper


def load_data() -> tuple[pd.DataFrame, pd.DataFrame]:
    df = pd.DataFrame(
        {
            "question": [q for q, _, _ in _QA],
            "answer": [a for _, a, _ in _QA],
            "passage": [p for _, _, p in _QA],
        }
    )
    return df.iloc[:3].reset_index(drop=True), df.iloc[3:].reset_index(drop=True)


def build_pipeline(cascade_args=None) -> LazyFrame:
    return LazyFrame().sem_map(
        "Answer yes or no: {question}, given the evidence: {passage}", suffix="_pred"
    )


def _first_word(text: str) -> str:
    """First alphabetic word of an answer — robust to the markdown/emphasis
    real models wrap verdicts in ('**Yes**\\n\\nThe passage…')."""
    import re

    words = re.findall(r"[a-z]+", str(text).lower())
    return words[0] if words else ""


def make_eval_fn(train_df: pd.DataFrame):
    def eval_fn(output_df, example):
        merged = output_df
        correct = sum(
            _first_word(p) == a for p, a in zip(merged["_pred"], merged["answer"])
        )
        return correct / max(len(merged), 1)

    return eval_fn


def optimize_pipeline(lf: LazyFrame, train_df: pd.DataFrame, eval_fn, max_metric_calls: int) -> LazyFrame:
    from lotus_tpu.ast import PromptHillClimbOptimizer

    return lf.optimize([PromptHillClimbOptimizer(eval_fn, n_rounds=1, proposals_per_target=1)], train_data=train_df)


def evaluate(result: pd.DataFrame, test_df: pd.DataFrame, oracle_lm: LM, helper_lm: LM) -> dict[str, Any]:
    correct = sum(
        _first_word(p) == a for p, a in zip(result["_pred"], result["answer"])
    )
    usage = oracle_lm.stats.virtual_usage
    return {
        "accuracy": correct / max(len(result), 1),
        "total_tokens": usage.total_tokens,
        "cost_usd": usage.total_cost,
    }
