"""Shared foundation for the ``df.sem_*`` pandas accessors.

The reference repeats the same boilerplate in every operator file
(DataFrame validation, settings lookups, column checking, few-shot example
unpacking). Here that lives once: every accessor derives from
:class:`SemAccessor`, and the instruction/example plumbing is a pair of
helpers the operators share.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import TYPE_CHECKING, Any

import pandas as pd

from lotus_tpu.nl_expression import nle2str, parse_cols
from lotus_tpu.types import ReasoningStrategy

if TYPE_CHECKING:  # pragma: no cover
    from lotus_tpu.models import LM, RM, Reranker
    from lotus_tpu.vector_store import VS

_COT_STRATEGIES = (ReasoningStrategy.COT, ReasoningStrategy.ZS_COT)

#: Column written by sem_partition_by and consumed by sem_agg's fold order.
PARTITION_COLUMN = "_lotus_partition_id"


def uses_cot(strategy: ReasoningStrategy | None) -> bool:
    return strategy in _COT_STRATEGIES


class SemAccessor:
    """Base class for semantic DataFrame accessors.

    Subclasses get ``self._obj`` (the validated DataFrame) plus the
    settings/column helpers below; they only implement ``__call__``.
    """

    def __init__(self, pandas_obj: Any):
        if not isinstance(pandas_obj, pd.DataFrame):
            raise AttributeError("Must be a DataFrame")
        self._obj: pd.DataFrame = pandas_obj

    # --------------------------------------------------- configured models
    @staticmethod
    def _require(slot: str, hint: str) -> Any:
        from lotus_tpu.settings import settings

        value = getattr(settings, slot)
        if value is None:
            raise ValueError(f"Configure a {hint} via lotus_tpu.settings.configure({slot}=...)")
        return value

    def _lm(self) -> "LM":
        return self._require("lm", "language model")

    def _rm(self) -> "RM":
        return self._require("rm", "retrieval (embedding) model")

    def _vs(self) -> "VS":
        return self._require("vs", "vector store")

    def _reranker(self) -> "Reranker":
        return self._require("reranker", "reranker")

    # ------------------------------------------------------------- columns
    def _check_cols(self, cols: list[str], df: pd.DataFrame | None = None) -> None:
        frame = self._obj if df is None else df
        for col in cols:
            if col not in frame.columns:
                raise ValueError(f"Column {col} not found in DataFrame")

    def _parse_instruction(self, instruction: str) -> tuple[list[str], str]:
        """Extract the {column} references and render the instruction text."""
        cols = parse_cols(instruction)
        self._check_cols(cols)
        return cols, nle2str(instruction, cols)

    def _render_instruction(self, instruction: str, cols: list[str]) -> str:
        """Render with an explicit column list (e.g. all_cols aggregation)."""
        return nle2str(instruction, cols)


@dataclass
class FewShot:
    """Unpacked few-shot examples ready for a task formatter."""

    multimodal_data: list[dict[str, Any]] | None = None
    answers: list[Any] | None = None
    reasoning: list[str] | None = None
    forced_explanations: bool = False  # CoT examples imply explanation output


def unpack_examples(
    examples: pd.DataFrame | None,
    cols: list[str],
    strategy: ReasoningStrategy | None,
    *,
    answer_col: str = "Answer",
    coerce_answer: Any = None,
) -> FewShot:
    """Split an examples DataFrame into formatter-ready pieces.

    The frame must carry ``answer_col``; CoT strategies additionally require
    a ``Reasoning`` column. ``coerce_answer`` (e.g. ``bool``) is applied to
    each answer when given.
    """
    if examples is None:
        return FewShot()
    from lotus_tpu.templates import task_instructions

    if answer_col not in examples.columns:
        raise ValueError(f"'{answer_col}' must be a column in the examples dataframe")
    answers = examples[answer_col].tolist()
    if coerce_answer is not None:
        answers = [coerce_answer(a) for a in answers]

    shot = FewShot(
        multimodal_data=task_instructions.df2multimodal_info(examples, cols),
        answers=answers,
    )
    if uses_cot(strategy):
        shot.forced_explanations = True
        if "Reasoning" not in examples.columns:
            raise ValueError("CoT strategies require a 'Reasoning' column in examples")
        shot.reasoning = examples["Reasoning"].tolist()
    return shot
