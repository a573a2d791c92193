"""sem_map: row -> text transform via LM.

Parity target: ``lotus/sem_ops/sem_map.py:14-279`` — free function over
multimodal docs plus a pandas accessor with few-shot examples
("Answer"/"Reasoning" columns), CoT strategies, and explanation/raw-output
columns.
"""

from __future__ import annotations

from typing import Any, Callable

import pandas as pd

import lotus_tpu
from lotus_tpu.cache import operator_cache
from lotus_tpu.models import LM
from lotus_tpu.nl_expression import nle2str, parse_cols
from lotus_tpu.sem_ops.postprocessors import map_postprocess
from lotus_tpu.templates import task_instructions
from lotus_tpu.types import LMOutput, ReasoningStrategy, SemanticMapOutput, SemanticMapPostprocessOutput
from lotus_tpu.utils import show_safe_mode


def sem_map(
    docs: list[dict[str, Any]],
    model: LM,
    user_instruction: str,
    system_prompt: str | None = None,
    postprocessor: Callable[..., SemanticMapPostprocessOutput] = map_postprocess,
    examples_multimodal_data: list[dict[str, Any]] | None = None,
    examples_answers: list[str] | None = None,
    cot_reasoning: list[str] | None = None,
    strategy: ReasoningStrategy | None = None,
    safe_mode: bool = False,
    progress_bar_desc: str = "Mapping",
    **model_kwargs: Any,
) -> SemanticMapOutput:
    """Apply a natural-language instruction to each document.

    Args:
        docs: multimodal row payloads ({"text": ..., "image": {...}}).
        model: the LM to call.
        user_instruction: the rendered instruction text.
        postprocessor: fn(outputs, model, use_cot) -> SemanticMapPostprocessOutput.
        examples_*: few-shot example payloads/answers, optional CoT reasoning.
        strategy: None | COT | ZS_COT.
        safe_mode: print a cost estimate and 5s abort window first.
    """
    inputs = [
        task_instructions.map_formatter(
            model,
            doc,
            user_instruction,
            examples_multimodal_data,
            examples_answers,
            cot_reasoning,
            strategy=strategy,
            system_prompt=system_prompt,
        )
        for doc in docs
    ]
    if safe_mode:
        show_safe_mode(sum(model.count_tokens(i) for i in inputs), len(docs))

    lm_output: LMOutput = model(inputs, progress_bar_desc=progress_bar_desc, **model_kwargs)
    post = postprocessor(
        lm_output.outputs, model, strategy in (ReasoningStrategy.COT, ReasoningStrategy.ZS_COT)
    )
    if safe_mode:
        model.print_total_usage()
    return SemanticMapOutput(
        raw_outputs=post.raw_outputs, outputs=post.outputs, explanations=post.explanations
    )


@pd.api.extensions.register_dataframe_accessor("sem_map")
class SemMapDataframe:
    """Semantic map accessor: ``df.sem_map("Summarize the {text}")``.

    Few-shot examples are passed as a DataFrame with the instruction's
    columns plus an "Answer" column (and "Reasoning" for CoT).
    """

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
        user_instruction: str,
        system_prompt: str | None = None,
        postprocessor: Callable[..., SemanticMapPostprocessOutput] = map_postprocess,
        return_explanations: bool = False,
        return_raw_outputs: bool = False,
        suffix: str = "_map",
        examples: pd.DataFrame | None = None,
        strategy: ReasoningStrategy | None = None,
        safe_mode: bool = False,
        progress_bar_desc: str = "Mapping",
        **model_kwargs: Any,
    ) -> pd.DataFrame:
        from lotus_tpu.settings import settings

        if settings.lm is None:
            raise ValueError(
                "Configure a language model via lotus_tpu.settings.configure(lm=...)"
            )

        col_li = parse_cols(user_instruction)
        for column in col_li:
            if column not in self._obj.columns:
                raise ValueError(f"Column {column} not found in DataFrame")

        multimodal_data = task_instructions.df2multimodal_info(self._obj, col_li)
        formatted_instr = nle2str(user_instruction, col_li)

        examples_multimodal_data = examples_answers = cot_reasoning = None
        if examples is not None:
            assert "Answer" in examples.columns, "Answer must be a column in examples dataframe"
            examples_multimodal_data = task_instructions.df2multimodal_info(examples, col_li)
            examples_answers = examples["Answer"].tolist()
            if strategy in (ReasoningStrategy.COT, ReasoningStrategy.ZS_COT):
                return_explanations = True
                if "Reasoning" not in examples.columns:
                    raise ValueError("CoT strategies require a 'Reasoning' column in examples")
                cot_reasoning = examples["Reasoning"].tolist()

        output = sem_map(
            multimodal_data,
            settings.lm,
            formatted_instr,
            system_prompt=system_prompt,
            postprocessor=postprocessor,
            examples_multimodal_data=examples_multimodal_data,
            examples_answers=examples_answers,
            cot_reasoning=cot_reasoning,
            strategy=strategy,
            safe_mode=safe_mode,
            progress_bar_desc=progress_bar_desc,
            **model_kwargs,
        )

        new_df = self._obj.copy()
        new_df[suffix] = output.outputs
        if return_explanations:
            new_df["explanation" + suffix] = output.explanations
        if return_raw_outputs:
            new_df["raw_output" + suffix] = output.raw_outputs
        return new_df
