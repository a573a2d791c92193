"""llm_as_judge: n independent judging trials built on sem_map.

Role parity with ``lotus/evals/llm_as_judge.py``. Trials run on a thread
pool with the message cache suspended (otherwise every trial would replay
the first trial's answers); structured grading goes through
``response_format`` pydantic models.
"""

from __future__ import annotations

import contextvars
from concurrent.futures import ThreadPoolExecutor
from typing import Any, Callable

import pandas as pd
from pydantic import BaseModel

from lotus_tpu.cache import operator_cache
from lotus_tpu.models import LM
from lotus_tpu.sem_ops._accessor import FewShot, SemAccessor, unpack_examples, uses_cot
from lotus_tpu.sem_ops.postprocessors import map_postprocess
from lotus_tpu.sem_ops.sem_map import sem_map
from lotus_tpu.templates import task_instructions
from lotus_tpu.types import ReasoningStrategy, SemanticMapOutput, SemanticMapPostprocessOutput

DEFAULT_JUDGE_SYSTEM_PROMPT = (
    "You are an intelligent, rigorous, and fair evaluator."
    "The user will provide the judging criteria, the relevant context and the grading scale."
    "Your job is to judge the output given the criteria, context and grading scale."
)


def _reject_format_with_cot(response_format: type[BaseModel] | None, strategy: ReasoningStrategy | None) -> None:
    if response_format is not None and uses_cot(strategy):
        raise ValueError(
            "Response format is not supported for COT or ZS_COT strategies. Use a "
            "non-COT strategy with a reasoning field in the response format instead."
        )


def llm_as_judge(
    docs: list[dict[str, Any]], model: LM, judge_instruction: str,
    response_format: type[BaseModel] | None = None, n_trials: int = 1,
    system_prompt: str | None = None,
    postprocessor: Callable[..., SemanticMapPostprocessOutput] = map_postprocess,
    shots: FewShot | None = None, strategy: ReasoningStrategy | None = None,
    safe_mode: bool = False, progress_bar_desc: str = "Evaluating",
    **model_kwargs: Any,
) -> list[SemanticMapOutput | list[BaseModel]]:
    """Judge every doc ``n_trials`` times.

    Each element of the returned list is one trial: a SemanticMapOutput, or
    a list of parsed ``response_format`` models when a format is given.
    """
    from lotus_tpu.settings import settings

    system_prompt = system_prompt or DEFAULT_JUDGE_SYSTEM_PROMPT
    _reject_format_with_cot(response_format, strategy)

    def one_trial(_: int) -> SemanticMapOutput:
        return sem_map(
            docs, model, judge_instruction,
            system_prompt=system_prompt, postprocessor=postprocessor,
            shots=shots, strategy=strategy, safe_mode=safe_mode,
            progress_bar_desc=progress_bar_desc, response_format=response_format,
            **model_kwargs,
        )

    # Suspend the message cache during trials so trials actually differ.
    # Pool worker threads start with a fresh context (they would miss both
    # this override and any settings.context(...) the caller is inside), so
    # snapshot the caller's context per trial and run each trial inside it.
    with settings.context(enable_cache=False):
        snapshots = [contextvars.copy_context() for _ in range(n_trials)]
    with ThreadPoolExecutor(max_workers=settings.parallel_groupby_max_threads) as pool:
        trials = list(pool.map(lambda job: job[0].run(one_trial, job[1]), zip(snapshots, range(n_trials))))

    if response_format is None:
        return list(trials)
    return [[response_format.model_validate_json(raw) for raw in t.raw_outputs] for t in trials]


@pd.api.extensions.register_dataframe_accessor("llm_as_judge")
class LLMAsJudgeDataframe(SemAccessor):
    """Judge rows against criteria: ``df.llm_as_judge("Grade the {answer} 1-5")``."""

    @operator_cache
    def __call__(
        self, judge_instruction: str,
        response_format: type[BaseModel] | None = None, n_trials: int = 1,
        system_prompt: str | None = None,
        postprocessor: Callable[..., SemanticMapPostprocessOutput] = map_postprocess,
        return_raw_outputs: bool = False, return_explanations: bool = False,
        suffix: str = "_judge", examples: pd.DataFrame | None = None,
        cot_reasoning: list[str] | None = None,
        strategy: ReasoningStrategy | None = None,
        extra_cols_to_include: list[str] | None = None, safe_mode: bool = False,
        progress_bar_desc: str = "Evaluating", **model_kwargs: Any,
    ) -> pd.DataFrame:
        model = self._lm()
        _reject_format_with_cot(response_format, strategy)

        cols, rendered = self._parse_instruction(judge_instruction)
        if extra_cols_to_include is not None:
            self._check_cols(extra_cols_to_include)
            cols = [c for c in cols if c not in extra_cols_to_include] + extra_cols_to_include

        trials = llm_as_judge(
            task_instructions.df2multimodal_info(self._obj, cols), model, rendered,
            response_format=response_format, n_trials=n_trials,
            system_prompt=system_prompt, postprocessor=postprocessor,
            shots=unpack_examples(examples, cols, strategy), strategy=strategy,
            safe_mode=safe_mode, progress_bar_desc=progress_bar_desc, **model_kwargs,
        )

        out = self._obj.copy()
        for i, trial in enumerate(trials):
            if isinstance(trial, SemanticMapOutput):
                out[f"{suffix}_{i}"] = trial.outputs
                if return_raw_outputs:
                    out[f"raw_output{suffix}_{i}"] = trial.raw_outputs
                if return_explanations:
                    out[f"explanation{suffix}_{i}"] = trial.explanations
            else:
                out[f"{suffix}_{i}"] = trial
        return out
