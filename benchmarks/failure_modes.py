"""Failure-mode discovery benchmark (protocol of the reference's
failure_mode_discovery suite, /root/reference/benchmarks/failure_mode_discovery/
pipeline.py + evaluate.py): filter a corpus of agent traces down to the
failures, aggregate them into a short list of generic failure modes, and
score the list by COVERAGE — the fraction of failed traces an LLM judge
says are described by at least one generated mode.

Offline smoke mode runs on a frozen synthetic trace corpus with the
deterministic fake LM (each failed trace embeds one of six marker
behaviours; the fake aggregator surfaces the corresponding mode names and
the fake coverage judge string-matches them).  Set
``LOTUS_TPU_BENCH_MODEL`` for a real-provider run on the same protocol.
"""

from __future__ import annotations

import os
import re
from typing import Any

import pandas as pd

import lotus_tpu
from lotus_tpu.ast import LazyFrame
from lotus_tpu.models import LM, make_fake_lm

SUPPORTS_CASCADE = True

# Marker behaviour embedded in a failed trace -> the generic failure mode
# it instantiates (a compact taxonomy in the spirit of agent-failure
# surveys; the smoke corpus exercises every mode).
_MODES = {
    "repeated the same search step": "step repetition",
    "called the calculator tool with a url": "tool misuse",
    "ignored the required json output format": "task specification violation",
    "ended the session before running the checks": "premature termination",
    "cited a file that does not exist": "fabricated information",
    "asked what the original task was": "context loss",
}

_SUCCESS_TRACES = [
    "step 1: planned the work. step 2: ran the query. step 3: verified the "
    "output against the spec and delivered the answer.",
    "the agent decomposed the task, used the search tool correctly, and "
    "double-checked the result before finishing.",
    "retrieved the document, extracted the table, validated row counts, "
    "and returned the requested summary.",
]


def _make_traces() -> pd.DataFrame:
    rows = []
    tid = 0
    for marker, mode in _MODES.items():
        for variant in range(3):
            rows.append(
                {
                    "trace_id": f"t{tid:03d}",
                    "agent_trace": (
                        f"run {variant}: the agent started the task, then {marker} "
                        "and the task was not completed."
                    ),
                    "failed": True,
                    "true_mode": mode,
                }
            )
            tid += 1
    for i, trace in enumerate(_SUCCESS_TRACES * 2):
        rows.append(
            {"trace_id": f"s{i:03d}", "agent_trace": trace, "failed": False, "true_mode": ""}
        )
    return pd.DataFrame(rows)


def parse_failure_modes(text: str) -> list[str]:
    """Parse the aggregation output into a clean list of mode strings
    (strip bullets/numbering — same post-processing contract as the
    reference suite's parser)."""
    if not isinstance(text, str):
        return []
    modes = []
    for line in text.splitlines():
        line = re.sub(r"^\s*(?:\d+[.)]|[-•*–—])\s*", "", line).strip()
        if line:
            modes.append(line)
    return modes


def configure_models() -> tuple[LM, LM]:
    model = os.getenv("LOTUS_TPU_BENCH_MODEL")
    if model:
        lm = LM(model=model)
        lotus_tpu.settings.configure(lm=lm, helper_lm=lm)
        return lm, lm

    def responder(prompt: str, messages: Any, **kw: Any) -> str:
        text = str(prompt).lower()
        if "bullet point list of failure modes" in text:
            found = [mode for marker, mode in _MODES.items() if marker in text]
            return "\n".join(f"- {m}" for m in dict.fromkeys(found)) or "- none"
        if "described by at least one mode" in text:
            # Coverage judge: the trace's marker maps to a mode name that
            # must appear in the generated failure list.
            for marker, mode in _MODES.items():
                if marker in text:
                    return "True" if mode in text else "False"
            return "False"
        # Failure filter: a trace failed iff it embeds a marker behaviour.
        return "True" if any(marker in text for marker in _MODES) else "False"

    lm = make_fake_lm(responder=responder)
    lotus_tpu.settings.configure(lm=lm, helper_lm=lm)
    return lm, lm


def load_data() -> tuple[pd.DataFrame, pd.DataFrame]:
    df = _make_traces()
    # Deterministic interleaved split, both halves seeing every mode.
    train = df.iloc[::2].reset_index(drop=True)
    test = df.iloc[1::2].reset_index(drop=True)
    return train, test


def _parse_modes_column(d: pd.DataFrame) -> pd.Series:
    # Module-level (not a lambda) so the optimized pipeline pickles into a
    # shippable benchmarks/artifacts/ file.
    return d["_failure_modes"].map(parse_failure_modes)


def build_pipeline(cascade_args: Any = None) -> LazyFrame:
    lf = (
        LazyFrame()
        .sem_filter("the agent failed in {agent_trace}", cascade_args=cascade_args)
        .sem_agg(
            "given each agent's {agent_trace}, create a bullet point list of "
            "failure modes. each failure mode should be a few words, generic "
            "(not trace specific). Only output the list, no other text.",
            suffix="_failure_modes",
        )
        .assign(failure_modes=_parse_modes_column)
        .explode("failure_modes")
    )
    return lf


def _coverage(output_df: pd.DataFrame, eval_df: pd.DataFrame) -> dict[str, Any]:
    modes = (
        [str(m).strip() for m in output_df["failure_modes"].dropna()]
        if "failure_modes" in output_df.columns
        else []
    )
    failure_list = "\n".join(f"- {m}" for m in dict.fromkeys(modes)) or "(none)"
    failed = eval_df[eval_df["failed"]].reset_index(drop=True)
    check = failed[["trace_id", "agent_trace"]].copy()
    check["failure_list"] = failure_list
    covered = check.sem_filter(
        "{agent_trace} contains a failure that is described by at least one "
        "mode in {failure_list}"
    )
    n_total = len(check)
    return {
        "coverage": len(covered) / n_total if n_total else 0.0,
        "n_covered": len(covered),
        "n_total": n_total,
        "n_modes": len(set(modes)),
    }


def make_eval_fn(train_df: pd.DataFrame):
    def eval_fn(output_df: pd.DataFrame, example: Any = None) -> float:
        return _coverage(output_df, train_df)["coverage"]

    return eval_fn


def optimize_pipeline(
    lf: LazyFrame, train_df: pd.DataFrame, eval_fn, max_metric_calls: int
) -> LazyFrame:
    from lotus_tpu.ast import PromptHillClimbOptimizer
    from lotus_tpu.ast.optimizer import CascadeOptimizer

    return lf.optimize(
        [
            PromptHillClimbOptimizer(eval_fn, n_rounds=1, proposals_per_target=1),
            CascadeOptimizer(),
        ],
        train_data=train_df,
    )


def evaluate(
    result: pd.DataFrame, test_df: pd.DataFrame, oracle_lm: LM, helper_lm: LM
) -> dict[str, Any]:
    info = _coverage(result, test_df)
    usage = oracle_lm.stats.virtual_usage
    return {**info, "total_tokens": usage.total_tokens, "cost_usd": usage.total_cost}
