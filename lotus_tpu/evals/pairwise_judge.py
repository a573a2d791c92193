"""pairwise_judge: A-vs-B comparison judging built on sem_filter.

Parity target: ``lotus/evals/pairwise_judge.py:27-251`` — n-trial A/B
judging, optional column permutation across trials (answers re-mapped so "A"
always refers to col1), collision-safe A/B label columns, and optional
filter-cascade via CascadeArgs.
"""

from __future__ import annotations

import copy
from concurrent.futures import ThreadPoolExecutor
from typing import Any

import pandas as pd

from lotus_tpu.cache import operator_cache
from lotus_tpu.types import CascadeArgs, ReasoningStrategy


def _unique_col_names(existing_columns: pd.Index) -> tuple[str, str]:
    """Pick A / B column names that don't collide with existing columns."""
    if "A" not in existing_columns and "B" not in existing_columns:
        return "A", "B"
    i = 1
    while True:
        a, b = f"A{i}", f"B{i}"
        if a not in existing_columns and b not in existing_columns:
            return a, b
        i += 1


@pd.api.extensions.register_dataframe_accessor("pairwise_judge")
class PairwiseJudgeDataframe:
    """Judge col1 vs col2 per row: outputs "A" (col1 wins) or "B" per trial."""

    def __init__(self, pandas_obj: Any):
        self._validate(pandas_obj)
        self._obj = pandas_obj

    @staticmethod
    def _validate(obj: Any) -> None:
        if not isinstance(obj, pd.DataFrame):
            raise AttributeError("Must be a DataFrame")

    @operator_cache
    def __call__(
        self,
        col1: str,
        col2: str,
        judge_instruction: str,
        n_trials: int = 1,
        permute_cols: bool = False,
        system_prompt: str | None = None,
        return_raw_outputs: bool = False,
        return_explanations: bool = False,
        default_to_col1: bool = True,
        suffix: str = "_judge",
        examples: pd.DataFrame | None = None,
        helper_examples: pd.DataFrame | None = None,
        strategy: ReasoningStrategy | None = None,
        cascade_args: CascadeArgs | None = None,
        return_stats: bool = False,
        safe_mode: bool = False,
        progress_bar_desc: str = "Evaluating",
        additional_cot_instructions: str = "",
        **model_kwargs: Any,
    ) -> pd.DataFrame | tuple[pd.DataFrame, Any]:
        from lotus_tpu.settings import settings

        if settings.lm is None:
            raise ValueError("Configure a language model via lotus_tpu.settings.configure(lm=...)")

        if permute_cols:
            if n_trials % 2:
                raise ValueError("Number of trials should be even when permute cols is True")
            outputs: list[pd.DataFrame] = []
            all_stats: list[Any] = []
            for c1, c2 in ((col1, col2), (col2, col1)):
                trial_args = cascade_args.model_copy(deep=True) if cascade_args is not None else None
                if (
                    c1 != col1
                    and trial_args is not None
                    and trial_args.filter_pos_cascade_threshold is not None
                    and trial_args.filter_neg_cascade_threshold is not None
                ):
                    # Swapped columns invert the proxy's positive direction.
                    trial_args.filter_pos_cascade_threshold = 1 - trial_args.filter_pos_cascade_threshold
                    trial_args.filter_neg_cascade_threshold = 1 - trial_args.filter_neg_cascade_threshold

                out = self._obj.pairwise_judge(
                    col1=c1,
                    col2=c2,
                    judge_instruction=judge_instruction,
                    n_trials=n_trials // 2,
                    permute_cols=False,
                    system_prompt=system_prompt,
                    return_raw_outputs=return_raw_outputs,
                    return_explanations=return_explanations,
                    suffix=f"{suffix}_{c1}_{c2}",
                    examples=examples,
                    strategy=strategy,
                    safe_mode=safe_mode,
                    progress_bar_desc=progress_bar_desc,
                    default_to_col1=default_to_col1 if c1 == col1 else not default_to_col1,
                    helper_examples=helper_examples,
                    cascade_args=trial_args,
                    return_stats=return_stats,
                    additional_cot_instructions=additional_cot_instructions,
                    **model_kwargs,
                )
                if isinstance(out, tuple):
                    out_df, stats = out
                    all_stats.extend(stats)
                else:
                    out_df = out
                out_df = out_df.drop(columns=self._obj.columns)
                if c1 != col1:
                    # Re-map so "A" always refers to col1.  Raw-output and
                    # explanation columns hold free text — remapping them
                    # would turn them into NaN.
                    for col_name in out_df.columns:
                        if col_name.startswith(("raw_output", "explanation")):
                            continue
                        out_df[col_name] = out_df[col_name].map({"A": "B", "B": "A"})
                outputs.append(out_df)

            new_df = self._obj.copy()
            offset = 0
            for out_df in outputs:
                out_df = out_df.rename(
                    columns={c: f"{suffix}_{offset + i}" for i, c in enumerate(out_df.columns)}
                )
                new_df = pd.concat([new_df, out_df], axis=1)
                offset += len(out_df.columns)
            if return_stats:
                return new_df, all_stats
            return new_df

        name_a, name_b = _unique_col_names(self._obj.columns)
        effective_system_prompt = system_prompt or (
            "You are an expert evaluator. You will be given two responses and must judge "
            f"which is better based on specified criteria. Output {name_a} if the first response "
            f"is better than the second, {name_b} otherwise."
        )
        renamed_instr = judge_instruction.replace(f"{{{col1}}}", f"{{{name_a}}}").replace(
            f"{{{col2}}}", f"{{{name_b}}}"
        )
        user_instruction = (
            f"{{{name_a}}} is better than {{{name_b}}} given the criteria: "
            f"{renamed_instr}. Output {name_a} if {{{name_a}}} is better "
            f"than {{{name_b}}}, {name_b} otherwise."
        )

        def run_trial(i: int):
            df_copy = copy.deepcopy(self._obj).rename(columns={col1: name_a, col2: name_b})
            return df_copy.sem_filter(
                user_instruction,
                return_raw_outputs=return_raw_outputs,
                return_explanations=return_explanations,
                return_all=True,
                default=default_to_col1,
                suffix=f"{suffix}_{i}",
                examples=examples,
                helper_examples=helper_examples,
                strategy=strategy,
                cascade_args=cascade_args,
                return_stats=return_stats,
                safe_mode=safe_mode,
                progress_bar_desc=progress_bar_desc,
                additional_cot_instructions=additional_cot_instructions,
                system_prompt=effective_system_prompt,
                output_tokens=(name_a, name_b),
                **model_kwargs,
            )

        # Global (not ContextVar) toggle so worker threads see it too.
        original_enable_cache = settings.enable_cache
        settings.enable_cache = False
        try:
            with ThreadPoolExecutor(max_workers=settings.parallel_groupby_max_threads) as ex:
                trial_outputs = list(ex.map(run_trial, range(n_trials)))
        finally:
            settings.enable_cache = original_enable_cache

        renamed_cols = set(self._obj.rename(columns={col1: name_a, col2: name_b}).columns)
        all_stats = []
        all_out_dfs: list[pd.DataFrame] = []
        for out in trial_outputs:
            if isinstance(out, tuple):
                out_df, stats = out
                all_stats.append(stats)
            else:
                out_df = out
            out_df = out_df.drop(columns=[c for c in renamed_cols if c in out_df.columns])
            for col_name in out_df.columns:
                if col_name.startswith(("raw_output", "explanation")):
                    continue
                out_df[col_name] = out_df[col_name].map({True: "A", False: "B"})
            all_out_dfs.append(out_df)

        new_df = pd.concat([self._obj.copy(), *all_out_dfs], axis=1)
        if return_stats:
            return new_df, all_stats
        return new_df
