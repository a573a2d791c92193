"""sem_extract: structured attribute extraction via LM JSON mode.

Role parity with ``lotus/sem_ops/sem_extract.py:15-256``: one JSON-mode LM
call per row over ``output_cols`` ({name: optional description}), with JSON
mode suppressed under CoT so the reasoning text survives, and the parsed
keys written back as DataFrame columns (creating them as needed).
"""

from __future__ import annotations

from typing import Any, Callable

import pandas as pd

from lotus_tpu.cache import operator_cache
from lotus_tpu.models import LM
from lotus_tpu.sem_ops._accessor import SemAccessor, uses_cot
from lotus_tpu.sem_ops.postprocessors import extract_postprocess
from lotus_tpu.templates import task_instructions
from lotus_tpu.types import ReasoningStrategy, SemanticExtractOutput, SemanticExtractPostprocessOutput
from lotus_tpu.utils import show_safe_mode


def sem_extract(
    docs: list[dict[str, Any]], model: LM, output_cols: dict[str, str | None],
    extract_quotes: bool = False,
    postprocessor: Callable[..., SemanticExtractPostprocessOutput] = extract_postprocess,
    safe_mode: bool = False, progress_bar_desc: str = "Extracting",
    return_explanations: bool = False, strategy: ReasoningStrategy | None = None,
) -> SemanticExtractOutput:
    """Pull ``output_cols`` out of every doc as a dict per row."""
    prompts = [
        task_instructions.extract_formatter(model, doc, output_cols, extract_quotes, strategy)
        for doc in docs
    ]
    if safe_mode:
        show_safe_mode(sum(model.count_tokens(p) for p in prompts), len(docs))

    cot = uses_cot(strategy)
    # JSON mode would swallow the chain-of-thought, so only request it outside CoT.
    mode_kwargs = {} if cot else {"response_format": {"type": "json_object"}}
    reply = model(prompts, progress_bar_desc=progress_bar_desc, **mode_kwargs)

    parsed = postprocessor(reply.outputs, model, cot)
    if safe_mode:
        model.print_total_usage()
    return SemanticExtractOutput(
        raw_outputs=parsed.raw_outputs, outputs=parsed.outputs, explanations=parsed.explanations
    )


def _merge_extracted(df: pd.DataFrame, records: list[dict[str, str]]) -> pd.DataFrame:
    """Write per-row extraction dicts into ``df``, adding columns on demand."""
    merged = df.copy()
    rows = merged.index[: len(records)]
    for key in {k for rec in records for k in rec}:
        if key not in merged.columns:
            merged[key] = None
        values = [rec[key] for rec in records if key in rec]
        hit_rows = [row for row, rec in zip(rows, records) if key in rec]
        merged.loc[hit_rows, key] = values
    return merged


@pd.api.extensions.register_dataframe_accessor("sem_extract")
class SemExtractDataFrame(SemAccessor):
    """Extract structured fields: ``df.sem_extract(["text"], {"sentiment": None})``."""

    @operator_cache
    def __call__(
        self, input_cols: list[str], output_cols: dict[str, str | None],
        extract_quotes: bool = False,
        postprocessor: Callable[..., SemanticExtractPostprocessOutput] = extract_postprocess,
        return_raw_outputs: bool = False, safe_mode: bool = False,
        progress_bar_desc: str = "Extracting", return_explanations: bool = False,
        strategy: ReasoningStrategy | None = None,
    ) -> pd.DataFrame:
        model = self._lm()
        self._check_cols(input_cols)

        result = sem_extract(
            task_instructions.df2multimodal_info(self._obj, input_cols),
            model,
            output_cols,
            extract_quotes=extract_quotes, postprocessor=postprocessor,
            safe_mode=safe_mode, progress_bar_desc=progress_bar_desc,
            return_explanations=return_explanations, strategy=strategy,
        )

        merged = _merge_extracted(self._obj, result.outputs)
        if return_raw_outputs:
            merged["raw_output"] = result.raw_outputs
        if return_explanations:
            merged["explanation"] = result.explanations
        return merged
