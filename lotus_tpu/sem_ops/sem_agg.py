"""sem_agg: hierarchical aggregation of many documents into one answer.

Role parity with ``lotus/sem_ops/sem_agg.py:62-487``. Documents are packed
into as few prompts as fit in ``max_ctx_len - max_tokens``; each level's
answers become the next level's documents until a single answer remains.
Rows sharing a ``_lotus_partition_id`` are kept in the same prompt (unless
every id is unique, in which case packing ignores partitions), and a
``response_format`` is only requested on the final single-prompt pass.
"""

from __future__ import annotations

import json
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass, field
from typing import Any

import pandas as pd
from pydantic import BaseModel

import lotus_tpu
from lotus_tpu.cache import operator_cache
from lotus_tpu.long_context_strategy import ChunkedDocument, create_chunked_documents
from lotus_tpu.models import LM
from lotus_tpu.sem_ops._accessor import PARTITION_COLUMN, SemAccessor
from lotus_tpu.templates import task_instructions
from lotus_tpu.types import LongContextStrategy, SemanticAggOutput

# ---------------------------------------------------------------------------
# Level prompts. Level 0 folds raw documents; deeper levels fold answers
# produced by previous passes, which need extra guidance about conflicting,
# heterogeneous sources. Wording is original; the Context/Instruction/Answer
# scaffold matches the reference's aggregation protocol.
# ---------------------------------------------------------------------------

_SHARED_SCAFFOLD = (
    "\n\n---\n\nUse this format.\n\nContext: the supporting material\n\n"
    "Instruction: what the user asked for\n\nAnswer: your answer\n\n---\n\n"
    "Context: {{docs_str}}\n\nInstruction:  {instruction}\n\nAnswer:\n"
)

_LEAF_PREAMBLE = (
    "Answer the user's instruction using the documents provided as context below.\n"
    "Pull together every piece of relevant information across all of the documents "
    "and weave it into one coherent answer.\n"
    "Do not mimic how the documents are laid out — organise the answer however best "
    "serves the instruction.\n"
    "Space is limited, so keep the answer tight."
)

_INNER_PREAMBLE = (
    "Answer the user's instruction using the sources provided as context below.\n"
    "Each source is itself a digest of several documents and may be formatted "
    "differently from the others; some may overlap, complement, or contradict one "
    "another.\n"
    "Draw on ALL of the relevant sources — connect them where needed — and produce "
    "one coherent answer rather than echoing any source's layout.\n"
    "Space is limited, so keep the answer tight."
)


def _level_prompt(level: int, instruction: str) -> tuple[str, str]:
    """(document label, prompt template with a {docs_str} hole) for a level.

    The scaffold spells the hole ``{{docs_str}}`` so the instruction-filling
    ``.format`` below leaves it behind as ``{docs_str}`` for the packer."""
    preamble = _LEAF_PREAMBLE if level == 0 else _INNER_PREAMBLE
    label = "Document" if level == 0 else "Source"
    return label, preamble + _SHARED_SCAFFOLD.format(instruction=instruction)


@dataclass
class _Bin:
    """One prompt being packed: rendered pieces plus their token total."""

    pid: int
    pieces: list[str] = field(default_factory=list)
    tokens: int = 0

    def render(self, template: str) -> list[dict[str, str]]:
        # The scaffold's {{docs_str}} was collapsed to {docs_str} by the
        # .format() that filled the instruction in (_level_prompt).
        return [{"role": "user", "content": template.replace("{docs_str}", "".join(self.pieces))}]


def _pack_level(
    texts: list[str], pids: list[int], model: LM, label: str, template: str, respect_pids: bool
) -> tuple[list[list[dict[str, str]]], list[int]]:
    """Greedily pack texts into prompts under the model's context budget.

    Returns the rendered message batch plus one partition id per prompt.
    A new prompt starts when the next piece would overflow the budget, or
    (when ``respect_pids``) when the partition id changes.
    """
    budget = model.max_ctx_len - model.max_tokens - model.count_tokens(template)
    prompts: list[list[dict[str, str]]] = []
    prompt_pids: list[int] = []
    bin_ = _Bin(pid=pids[0])

    def flush() -> None:
        if bin_.pieces:
            prompts.append(bin_.render(template))
            prompt_pids.append(bin_.pid)

    for text, pid in zip(texts, pids):
        piece = f"\n\t{label} {len(bin_.pieces) + 1}: {text}"
        cost = model.count_tokens(piece)
        if bin_.pieces and (bin_.tokens + cost > budget or (respect_pids and pid != bin_.pid)):
            flush()
            bin_ = _Bin(pid=pid)
            piece = f"\n\t{label} 1: {text}"
            cost = model.count_tokens(piece)
        bin_.pieces.append(piece)
        bin_.tokens += cost
    flush()
    return prompts, prompt_pids


def sem_agg(
    docs: list[str] | ChunkedDocument, model: LM, user_instruction: str, partition_ids: list[int],
    safe_mode: bool = False, progress_bar_desc: str = "Aggregating", response_format: Any = None,
) -> SemanticAggOutput:
    """Hierarchically fold documents into a single answer."""
    if safe_mode:
        lotus_tpu.logger.warning("Safe mode is not implemented for sem_agg yet")

    texts = docs.docs if isinstance(docs, ChunkedDocument) else list(docs)
    if not texts:
        # Aggregating nothing: no LM call, one empty answer (keeps the
        # one-row output contract without inventing content).
        return SemanticAggOutput(outputs=[""])
    level = 0
    while True:
        # Unique ids mean partitions carry no grouping signal: pure fold.
        # Recomputed EVERY level — once each partition has folded to one
        # answer, ids become unique and the cross-partition fold may pack
        # freely (a once-only check loops forever at >= 2 partitions).
        respect_pids = len(partition_ids) != len(set(partition_ids))
        label, template = _level_prompt(level, user_instruction)
        prompts, partition_ids = _pack_level(
            texts, partition_ids, model, label, template, respect_pids
        )
        final = len(prompts) == 1 and response_format is not None
        reply = model(
            prompts,
            progress_bar_desc=progress_bar_desc,
            **({"response_format": response_format} if final else {}),
        )
        texts = reply.outputs
        level += 1
        if safe_mode:
            model.print_total_usage()
        if len(texts) == 1:
            return SemanticAggOutput(outputs=texts)


@pd.api.extensions.register_dataframe_accessor("sem_agg")
class SemAggDataframe(SemAccessor):
    """Aggregate rows into one answer: ``df.sem_agg("Summarize all {notes}")``."""

    def _partitioned(self) -> tuple[pd.DataFrame, list[int]]:
        """DataFrame ordered by partition, with one id per row."""
        if PARTITION_COLUMN in self._obj.columns:
            ordered = self._obj.sort_values(by=PARTITION_COLUMN)
            return ordered, ordered[PARTITION_COLUMN].tolist()
        return self._obj, [0] * len(self._obj)

    def _split_structured(self, text: str, response_format: Any, suffix: str) -> pd.DataFrame:
        """Turn a structured final answer into one row of typed columns."""
        parsed: Any = text
        if isinstance(response_format, type) and issubclass(response_format, BaseModel):
            parsed = response_format.model_validate_json(text).model_dump()
        else:
            try:
                parsed = json.loads(text)
            except json.JSONDecodeError:
                lotus_tpu.logger.warning(f"Failed to parse response format: {text}")
        if isinstance(parsed, dict):
            return pd.DataFrame([parsed])
        return pd.DataFrame([parsed], columns=[suffix])

    @operator_cache
    def __call__(
        self, user_instruction: str, all_cols: bool = False, suffix: str = "_output",
        group_by: list[str] | None = None, safe_mode: bool = False,
        progress_bar_desc: str = "Aggregating",
        long_context_strategy: LongContextStrategy | None = LongContextStrategy.CHUNK,
        split_fields_into_cols: bool = True,
        response_format: type[BaseModel] | dict | None = None,
    ) -> pd.DataFrame:
        from lotus_tpu.settings import settings

        model = self._lm()
        cols = list(self._obj.columns) if all_cols else self._parse_instruction(user_instruction)[0]

        if group_by:
            def agg_one(item: tuple[Any, pd.DataFrame]) -> pd.DataFrame:
                name, frame = item
                piece = frame.sem_agg(
                    user_instruction, all_cols=all_cols, suffix=suffix, group_by=None,
                    progress_bar_desc=progress_bar_desc,
                    long_context_strategy=long_context_strategy,
                    response_format=response_format,
                )
                keys = name if isinstance(name, tuple) else (name,)
                for col, val in zip(group_by, keys):
                    piece[col] = val
                return piece

            with ThreadPoolExecutor(max_workers=settings.parallel_groupby_max_threads) as pool:
                return pd.concat(list(pool.map(agg_one, self._obj.groupby(group_by))))

        frame, partition_ids = self._partitioned()
        instruction = self._render_instruction(user_instruction, cols)

        payload: list[str] | ChunkedDocument
        if long_context_strategy in (LongContextStrategy.TRUNCATE, LongContextStrategy.CHUNK):
            _, leaf_template = _level_prompt(0, instruction)
            payload = create_chunked_documents(
                frame, cols, model, long_context_strategy, model.count_tokens(leaf_template)
            )
            if PARTITION_COLUMN in frame.columns:
                partition_ids = [payload.get_value(i, PARTITION_COLUMN) for i in range(len(payload))]
            else:
                partition_ids = [0] * len(payload)
        else:
            payload = task_instructions.df2text(frame, cols)

        answer = sem_agg(
            payload, model, instruction, partition_ids,
            safe_mode=safe_mode, progress_bar_desc=progress_bar_desc,
            response_format=response_format,
        ).outputs[0]

        if response_format is not None and split_fields_into_cols:
            return self._split_structured(answer, response_format, suffix)
        return pd.DataFrame([answer], columns=[suffix])
