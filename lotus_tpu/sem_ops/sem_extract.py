"""sem_extract: structured attribute extraction via LM JSON mode.

Parity target: ``lotus/sem_ops/sem_extract.py:15-256`` — per-row JSON-mode
calls (disabled under CoT so reasoning text survives), per-key columns
written back into the DataFrame, optional supporting quotes.
"""

from __future__ import annotations

from typing import Any, Callable

import pandas as pd

from lotus_tpu.cache import operator_cache
from lotus_tpu.models import LM
from lotus_tpu.sem_ops.postprocessors import extract_postprocess
from lotus_tpu.templates import task_instructions
from lotus_tpu.types import (
    LMOutput,
    ReasoningStrategy,
    SemanticExtractOutput,
    SemanticExtractPostprocessOutput,
)
from lotus_tpu.utils import show_safe_mode


def sem_extract(
    docs: list[dict[str, Any]],
    model: LM,
    output_cols: dict[str, str | None],
    extract_quotes: bool = False,
    postprocessor: Callable[..., SemanticExtractPostprocessOutput] = extract_postprocess,
    safe_mode: bool = False,
    progress_bar_desc: str = "Extracting",
    return_explanations: bool = False,
    strategy: ReasoningStrategy | None = None,
) -> SemanticExtractOutput:
    """Extract ``output_cols`` (name -> optional description) from each doc."""
    inputs = [
        task_instructions.extract_formatter(model, doc, output_cols, extract_quotes, strategy)
        for doc in docs
    ]
    if safe_mode:
        show_safe_mode(sum(model.count_tokens(i) for i in inputs), len(docs))

    use_cot = strategy in (ReasoningStrategy.COT, ReasoningStrategy.ZS_COT)
    if use_cot:
        # JSON mode would suppress the reasoning text.
        lm_output: LMOutput = model(inputs, progress_bar_desc=progress_bar_desc)
    else:
        lm_output = model(
            inputs, response_format={"type": "json_object"}, progress_bar_desc=progress_bar_desc
        )

    post = postprocessor(lm_output.outputs, model, use_cot)
    if safe_mode:
        model.print_total_usage()
    return SemanticExtractOutput(
        raw_outputs=post.raw_outputs, outputs=post.outputs, explanations=post.explanations
    )


@pd.api.extensions.register_dataframe_accessor("sem_extract")
class SemExtractDataFrame:
    """Extract structured fields: ``df.sem_extract(["text"], {"sentiment": None})``."""

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
        input_cols: list[str],
        output_cols: dict[str, str | None],
        extract_quotes: bool = False,
        postprocessor: Callable[..., SemanticExtractPostprocessOutput] = extract_postprocess,
        return_raw_outputs: bool = False,
        safe_mode: bool = False,
        progress_bar_desc: str = "Extracting",
        return_explanations: bool = False,
        strategy: ReasoningStrategy | None = None,
    ) -> pd.DataFrame:
        from lotus_tpu.settings import settings

        if settings.lm is None:
            raise ValueError(
                "Configure a language model via lotus_tpu.settings.configure(lm=...)"
            )
        for column in input_cols:
            if column not in self._obj.columns:
                raise ValueError(f"Column {column} not found in DataFrame")

        multimodal_data = task_instructions.df2multimodal_info(self._obj, input_cols)
        out = sem_extract(
            docs=multimodal_data,
            model=settings.lm,
            output_cols=output_cols,
            extract_quotes=extract_quotes,
            postprocessor=postprocessor,
            safe_mode=safe_mode,
            progress_bar_desc=progress_bar_desc,
            return_explanations=return_explanations,
            strategy=strategy,
        )

        new_df = self._obj.copy()
        indices = new_df.index.to_list()
        for i, output_dict in enumerate(out.outputs):
            if i >= len(indices):
                break
            for key, value in output_dict.items():
                if key not in new_df.columns:
                    new_df[key] = None
                new_df.loc[indices[i], key] = value
        if return_raw_outputs:
            new_df["raw_output"] = out.raw_outputs
        if return_explanations:
            new_df["explanation"] = out.explanations
        return new_df
