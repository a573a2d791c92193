"""pairwise_judge: row-wise A-vs-B comparison, built on the filter operator.

Role parity with ``lotus/evals/pairwise_judge.py``: n-trial A/B judging with
optional order permutation (half the trials see the columns swapped, and
their answers are re-mapped so "A" always denotes ``col1``), collision-safe
A/B label columns, and optional cascade acceleration via ``CascadeArgs``.

Rebuilt here as three separate concerns: label/instruction preparation
(:func:`_ab_labels`, :func:`_ab_instruction`), the single-order trial runner
(:meth:`_judge_one_order`), and the permutation wrapper
(:meth:`_judge_both_orders`) which recurses through the public accessor with
swapped columns and inverted thresholds.
"""

from __future__ import annotations

import copy
import contextvars
from concurrent.futures import ThreadPoolExecutor
from typing import Any

import pandas as pd

from lotus_tpu.cache import operator_cache
from lotus_tpu.sem_ops._accessor import SemAccessor
from lotus_tpu.types import CascadeArgs

_FREE_TEXT_PREFIXES = ("raw_output", "explanation")  # never remapped A<->B


def _ab_labels(taken: pd.Index) -> tuple[str, str]:
    """Two label column names guaranteed absent from the frame."""
    n = 0
    while True:
        a, b = ("A", "B") if n == 0 else (f"A{n}", f"B{n}")
        if a not in taken and b not in taken:
            return a, b
        n += 1


def _ab_instruction(judge_instruction: str, col1: str, col2: str, a: str, b: str) -> tuple[str, str]:
    """(system prompt, filter instruction) for one A/B direction."""
    system = (
        "You are an expert evaluator. You will be given two responses and must judge "
        f"which is better based on specified criteria. Output {a} if the first response "
        f"is better than the second, {b} otherwise."
    )
    criteria = judge_instruction.replace(f"{{{col1}}}", f"{{{a}}}").replace(f"{{{col2}}}", f"{{{b}}}")
    ask = (
        f"{{{a}}} is better than {{{b}}} given the criteria: {criteria}. "
        f"Output {a} if {{{a}}} is better than {{{b}}}, {b} otherwise."
    )
    return system, ask


def _invert_cascade(args: CascadeArgs | None) -> CascadeArgs | None:
    """Thresholds for the swapped direction (proxy polarity flips)."""
    if args is None:
        return None
    flipped = args.model_copy(deep=True)
    if flipped.filter_pos_cascade_threshold is not None and flipped.filter_neg_cascade_threshold is not None:
        flipped.filter_pos_cascade_threshold = 1 - flipped.filter_pos_cascade_threshold
        flipped.filter_neg_cascade_threshold = 1 - flipped.filter_neg_cascade_threshold
    return flipped


def _split_stats(out: "pd.DataFrame | tuple[pd.DataFrame, Any]") -> tuple[pd.DataFrame, Any]:
    return out if isinstance(out, tuple) else (out, None)


def _remap_verdicts(df: pd.DataFrame, mapping: dict) -> None:
    """Remap verdict columns in place, skipping free-text companions."""
    for name in df.columns:
        if not str(name).startswith(_FREE_TEXT_PREFIXES):
            df[name] = df[name].map(mapping)


@pd.api.extensions.register_dataframe_accessor("pairwise_judge")
class PairwiseJudgeDataframe(SemAccessor):
    """Judge col1 vs col2 per row: outputs "A" (col1 wins) or "B" per trial."""

    @operator_cache
    def __call__(
        self, col1: str, col2: str, judge_instruction: str, n_trials: int = 1,
        permute_cols: bool = False, system_prompt: str | None = None,
        return_raw_outputs: bool = False, return_explanations: bool = False,
        default_to_col1: bool = True, suffix: str = "_judge",
        examples: pd.DataFrame | None = None, helper_examples: pd.DataFrame | None = None,
        strategy: Any = None, cascade_args: CascadeArgs | None = None,
        return_stats: bool = False, safe_mode: bool = False,
        progress_bar_desc: str = "Evaluating", additional_cot_instructions: str = "",
        **model_kwargs: Any,
    ) -> "pd.DataFrame | tuple[pd.DataFrame, Any]":
        self._lm()  # fail fast if unconfigured

        shared = dict(
            judge_instruction=judge_instruction, system_prompt=system_prompt,
            return_raw_outputs=return_raw_outputs, return_explanations=return_explanations,
            examples=examples, helper_examples=helper_examples, strategy=strategy,
            return_stats=return_stats, safe_mode=safe_mode, progress_bar_desc=progress_bar_desc,
            additional_cot_instructions=additional_cot_instructions, **model_kwargs,
        )
        if permute_cols:
            if n_trials % 2:
                raise ValueError("Number of trials should be even when permute cols is True")
            return self._judge_both_orders(
                col1, col2, n_trials, default_to_col1, suffix, cascade_args, **shared
            )
        return self._judge_one_order(
            col1, col2, n_trials, default_to_col1, suffix, cascade_args, **shared
        )

    # ------------------------------------------------------------ one order
    def _judge_one_order(
        self, col1: str, col2: str, n_trials: int, default_to_col1: bool, suffix: str,
        cascade_args: CascadeArgs | None, *, judge_instruction: str, system_prompt: str | None,
        **filter_kwargs: Any,
    ) -> "pd.DataFrame | tuple[pd.DataFrame, Any]":
        from lotus_tpu.settings import settings

        a, b = _ab_labels(self._obj.columns)
        default_system, ask = _ab_instruction(judge_instruction, col1, col2, a, b)
        return_stats = filter_kwargs.get("return_stats", False)

        def one_trial(i: int):
            relabeled = copy.deepcopy(self._obj).rename(columns={col1: a, col2: b})
            return relabeled.sem_filter(
                ask, return_all=True, default=default_to_col1, suffix=f"{suffix}_{i}",
                cascade_args=cascade_args, system_prompt=system_prompt or default_system,
                output_tokens=(a, b), **filter_kwargs,
            )

        # Worker threads start with a fresh context, so snapshot the caller's
        # context (plus the cache suspension) per trial and run inside it —
        # no global mutation to leak if the caller is inside settings.context().
        with settings.context(enable_cache=False):
            snapshots = [contextvars.copy_context() for _ in range(n_trials)]
        with ThreadPoolExecutor(max_workers=settings.parallel_groupby_max_threads) as pool:
            trials = list(pool.map(lambda job: job[0].run(one_trial, job[1]), zip(snapshots, range(n_trials))))

        carried = set(self._obj.rename(columns={col1: a, col2: b}).columns)
        stats_log, verdict_frames = [], []
        for out in trials:
            frame, stats = _split_stats(out)
            if stats is not None:
                stats_log.append(stats)
            frame = frame.drop(columns=[c for c in carried if c in frame.columns])
            _remap_verdicts(frame, {True: "A", False: "B"})
            verdict_frames.append(frame)

        merged = pd.concat([self._obj.copy(), *verdict_frames], axis=1)
        return (merged, stats_log) if return_stats else merged

    # ---------------------------------------------------------- both orders
    def _judge_both_orders(
        self, col1: str, col2: str, n_trials: int, default_to_col1: bool, suffix: str,
        cascade_args: CascadeArgs | None, **shared: Any,
    ) -> "pd.DataFrame | tuple[pd.DataFrame, Any]":
        return_stats = shared.get("return_stats", False)
        stats_log: list[Any] = []
        verdict_frames: list[pd.DataFrame] = []

        for c1, c2 in ((col1, col2), (col2, col1)):
            forward = c1 == col1
            out = self._obj.pairwise_judge(
                col1=c1, col2=c2, n_trials=n_trials // 2, permute_cols=False,
                suffix=f"{suffix}_{c1}_{c2}",
                default_to_col1=default_to_col1 if forward else not default_to_col1,
                cascade_args=cascade_args if forward else _invert_cascade(cascade_args),
                **shared,
            )
            frame, stats = _split_stats(out)
            if stats is not None:
                stats_log.extend(stats)
            frame = frame.drop(columns=self._obj.columns)
            if not forward:
                # Swapped trials: re-map so "A" always denotes col1.
                _remap_verdicts(frame, {"A": "B", "B": "A"})
            verdict_frames.append(frame)

        merged = self._obj.copy()
        k = 0
        for frame in verdict_frames:
            frame = frame.rename(columns={c: f"{suffix}_{k + i}" for i, c in enumerate(frame.columns)})
            merged = pd.concat([merged, frame], axis=1)
            k += len(frame.columns)
        return (merged, stats_log) if return_stats else merged
