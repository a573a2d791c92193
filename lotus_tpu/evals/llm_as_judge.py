"""llm_as_judge: n-trial judging built on sem_map.

Parity target: ``lotus/evals/llm_as_judge.py:16-275``.  Trials run in a
thread pool; the message cache is disabled during trials so repeated trials
actually differ.
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor
from typing import Any, Callable

import pandas as pd
from pydantic import BaseModel

from lotus_tpu.cache import operator_cache
from lotus_tpu.models import LM
from lotus_tpu.nl_expression import nle2str, parse_cols
from lotus_tpu.sem_ops.postprocessors import map_postprocess
from lotus_tpu.sem_ops.sem_map import sem_map
from lotus_tpu.templates import task_instructions
from lotus_tpu.types import ReasoningStrategy, SemanticMapOutput, SemanticMapPostprocessOutput

DEFAULT_JUDGE_SYSTEM_PROMPT = (
    "You are an intelligent, rigorous, and fair evaluator."
    "The user will provide the judging criteria, the relevant context and the grading scale."
    "Your job is to judge the output given the criteria, context and grading scale."
)


def llm_as_judge(
    docs: list[dict[str, Any]],
    model: LM,
    judge_instruction: str,
    response_format: type[BaseModel] | None = None,
    n_trials: int = 1,
    system_prompt: str | None = None,
    postprocessor: Callable[..., SemanticMapPostprocessOutput] = map_postprocess,
    examples_multimodal_data: list[dict[str, Any]] | None = None,
    examples_answers: list[str] | None = None,
    cot_reasoning: list[str] | None = None,
    strategy: ReasoningStrategy | None = None,
    safe_mode: bool = False,
    progress_bar_desc: str = "Evaluating",
    **model_kwargs: Any,
) -> list[SemanticMapOutput | list[BaseModel]]:
    """Run n_trials independent judging passes over the docs.

    Returns a list of per-trial outputs: SemanticMapOutput, or parsed
    response_format models when one is given.
    """
    from lotus_tpu.settings import settings

    system_prompt = system_prompt or DEFAULT_JUDGE_SYSTEM_PROMPT
    if response_format is not None and strategy in (ReasoningStrategy.COT, ReasoningStrategy.ZS_COT):
        raise ValueError(
            "Response format is not supported for COT or ZS_COT strategies. Use a "
            "non-COT strategy with a reasoning field in the response format instead."
        )

    def one_trial(_: int) -> SemanticMapOutput:
        return sem_map(
            docs,
            model,
            judge_instruction,
            system_prompt=system_prompt,
            postprocessor=postprocessor,
            examples_multimodal_data=examples_multimodal_data,
            examples_answers=examples_answers,
            cot_reasoning=cot_reasoning,
            strategy=strategy,
            safe_mode=safe_mode,
            progress_bar_desc=progress_bar_desc,
            response_format=response_format,
            **model_kwargs,
        )

    # Disable the message cache during trials: otherwise every trial would
    # replay the first trial's answers.  Direct (global) mutation on purpose:
    # a ContextVar overlay would not reach the pool's worker threads.
    original_enable_cache = settings.enable_cache
    settings.enable_cache = False
    try:
        with ThreadPoolExecutor(max_workers=settings.parallel_groupby_max_threads) as ex:
            trial_outputs = list(ex.map(one_trial, range(n_trials)))
    finally:
        settings.enable_cache = original_enable_cache

    outputs: list[SemanticMapOutput | list[BaseModel]] = []
    for out in trial_outputs:
        if response_format is None:
            outputs.append(out)
        else:
            outputs.append([response_format.model_validate_json(raw) for raw in out.raw_outputs])
    return outputs


@pd.api.extensions.register_dataframe_accessor("llm_as_judge")
class LLMAsJudgeDataframe:
    """Judge rows against criteria: ``df.llm_as_judge("Grade the {answer} 1-5")``."""

    def __init__(self, pandas_obj: pd.DataFrame):
        self._validate(pandas_obj)
        self._obj = pandas_obj

    @staticmethod
    def _validate(obj: pd.DataFrame) -> None:
        if not isinstance(obj, pd.DataFrame):
            raise AttributeError("Must be a DataFrame")

    @operator_cache
    def __call__(
        self,
        judge_instruction: str,
        response_format: type[BaseModel] | None = None,
        n_trials: int = 1,
        system_prompt: str | None = None,
        postprocessor: Callable[..., SemanticMapPostprocessOutput] = map_postprocess,
        return_raw_outputs: bool = False,
        return_explanations: bool = False,
        suffix: str = "_judge",
        examples: pd.DataFrame | None = None,
        cot_reasoning: list[str] | None = None,
        strategy: ReasoningStrategy | None = None,
        extra_cols_to_include: list[str] | None = None,
        safe_mode: bool = False,
        progress_bar_desc: str = "Evaluating",
        **model_kwargs: Any,
    ) -> pd.DataFrame:
        from lotus_tpu.settings import settings

        if settings.lm is None:
            raise ValueError("Configure a language model via lotus_tpu.settings.configure(lm=...)")
        if response_format is not None and strategy in (ReasoningStrategy.COT, ReasoningStrategy.ZS_COT):
            raise ValueError(
                "Response format is not supported for COT or ZS_COT strategies."
            )

        col_li = parse_cols(judge_instruction)
        for column in col_li:
            if column not in self._obj.columns:
                raise ValueError(f"Column {column} not found in DataFrame")
        if extra_cols_to_include is not None:
            for column in extra_cols_to_include:
                if column not in self._obj.columns:
                    raise ValueError(f"Column {column} not found in DataFrame")
            col_li = [c for c in col_li if c not in extra_cols_to_include] + extra_cols_to_include

        multimodal_data = task_instructions.df2multimodal_info(self._obj, col_li)
        formatted_instr = nle2str(judge_instruction, col_li)

        ex_data = ex_answers = ex_cot = None
        if examples is not None:
            assert "Answer" in examples.columns, "Answer must be a column in examples dataframe"
            ex_data = task_instructions.df2multimodal_info(examples, col_li)
            ex_answers = examples["Answer"].tolist()
            if strategy in (ReasoningStrategy.COT, ReasoningStrategy.ZS_COT):
                ex_cot = examples["Reasoning"].tolist()

        output = llm_as_judge(
            multimodal_data,
            settings.lm,
            formatted_instr,
            response_format=response_format,
            n_trials=n_trials,
            system_prompt=system_prompt,
            postprocessor=postprocessor,
            examples_multimodal_data=ex_data,
            examples_answers=ex_answers,
            cot_reasoning=ex_cot,
            strategy=strategy,
            safe_mode=safe_mode,
            progress_bar_desc=progress_bar_desc,
            **model_kwargs,
        )

        new_df = self._obj.copy()
        for i, trial in enumerate(output):
            if isinstance(trial, SemanticMapOutput):
                new_df[f"{suffix}_{i}"] = trial.outputs
                if return_raw_outputs:
                    new_df[f"raw_output{suffix}_{i}"] = trial.raw_outputs
                if return_explanations:
                    new_df[f"explanation{suffix}_{i}"] = trial.explanations
            else:
                new_df[f"{suffix}_{i}"] = trial
        return new_df
