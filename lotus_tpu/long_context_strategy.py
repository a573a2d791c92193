"""Long-context document fitting: TRUNCATE and CHUNK strategies.

Parity target: ``lotus/long_context_strategy.py:11-261``.  TRUNCATE cuts each
document token-exactly (with ellipsis) to the model's budget; CHUNK finds the
largest-token column, splits it token-exactly, and replicates the other
columns per chunk, keeping per-chunk provenance so sem_agg can fold
partial documents.
"""

from __future__ import annotations

import typing
from typing import Any, Iterator, NamedTuple

import pandas as pd

from lotus_tpu.templates import task_instructions
from lotus_tpu.types import LongContextStrategy

if typing.TYPE_CHECKING:  # pragma: no cover
    from lotus_tpu.models import LM


class ChunkInfo(NamedTuple):
    """Provenance of one chunk back to its source row.

    ``chunked_column`` is None unless the CHUNK strategy split that column.
    """

    original_row_idx: int
    chunk_idx: int
    total_chunks: int
    chunked_column: str | None = None


class ChunkedDocument:
    """Serialized docs + per-doc provenance, replacing a plain list[str]."""

    __slots__ = ("strategy", "docs", "chunk_info", "original_df")

    def __init__(
        self, strategy: LongContextStrategy, docs: list[str], chunk_info: list[ChunkInfo], original_df: pd.DataFrame
    ) -> None:
        self.strategy = strategy
        self.docs = docs
        self.chunk_info = chunk_info
        self.original_df = original_df

    def __len__(self) -> int:
        return len(self.docs)

    def get_row(self, index: int) -> pd.Series:
        src = self.chunk_info[index]
        row = self.original_df.iloc[src.original_row_idx]
        if src.chunked_column is None:
            return row
        patched = row.copy()
        patched[src.chunked_column] = self.docs[index]
        return patched

    def get_value(self, index: int, column: str) -> Any:
        return self.get_row(index)[column]


def _token_budget(model: "LM", extra_tokens: int) -> int:
    room = model.max_ctx_len - model.max_tokens - extra_tokens
    if room <= 0:
        raise ValueError("Max document tokens is less than or equal to 0")
    return room


def _serialize_one(row: pd.Series, cols: list[str]) -> str:
    return task_instructions.df2text(pd.DataFrame([row]), cols)[0]


def _clip_to_tokens(doc: str, budget: int, model: "LM") -> str:
    """Token-exact truncation with a trailing ellipsis when anything was cut."""
    tail = "..."
    keep = budget - model.count_tokens(tail)
    if keep <= 0:
        tail, keep = "", budget
    return model.decode_tokens(model.encode_text(doc)[:keep]) + tail


def _explode_row(
    row: pd.Series, row_pos: int, cols: list[str], budget: int, model: "LM"
) -> Iterator[tuple[str, ChunkInfo]]:
    """Split one oversized row into chunk documents (CHUNK strategy)."""
    # The column carrying the most tokens is the one that gets split.
    counts = {c: model.count_tokens(str(row[c])) for c in cols if c in row.index}
    if not counts:
        raise ValueError("No valid columns found for long_context")
    fat_col = max(counts, key=counts.get)  # type: ignore[arg-type]

    hollow = row.copy()
    hollow[fat_col] = ""
    room = budget - model.count_tokens(_serialize_one(hollow, cols))
    if room <= 0:
        raise ValueError(
            f"Cannot fit document even after emptying column {fat_col!r} at row position "
            f"{row_pos}: the remaining structure exceeds the context window "
            f"(available={room}, budget={budget})."
        )

    pieces = split_text_by_tokens(str(row[fat_col]), room, model)
    for j, piece in enumerate(pieces):
        part = row.copy()
        part[fat_col] = piece
        yield _serialize_one(part, cols), ChunkInfo(row_pos, j, len(pieces), fat_col)


def create_chunked_documents(
    df: pd.DataFrame, cols: list[str], model: "LM", strategy: LongContextStrategy, extra_tokens: int
) -> ChunkedDocument:
    """Fit each row's serialized document to the model's context budget."""
    if strategy not in (LongContextStrategy.TRUNCATE, LongContextStrategy.CHUNK):
        raise ValueError(f"Unknown long_context strategy: {strategy}")
    budget = _token_budget(model, extra_tokens)

    docs: list[str] = []
    info: list[ChunkInfo] = []
    whole_docs = task_instructions.df2text(df, cols)
    for pos, doc in enumerate(whole_docs):
        if model.count_tokens(doc) <= budget:
            docs.append(doc)
            info.append(ChunkInfo(pos, 0, 1))
        elif strategy == LongContextStrategy.TRUNCATE:
            docs.append(_clip_to_tokens(doc, budget, model))
            info.append(ChunkInfo(pos, 0, 1))
        else:
            for piece_doc, piece_info in _explode_row(df.iloc[pos], pos, cols, budget, model):
                docs.append(piece_doc)
                info.append(piece_info)
    return ChunkedDocument(strategy, docs, info, df)


def split_text_by_tokens(text: str, max_tokens: int, model: "LM") -> list[str]:
    """Token-exact splitting into <= max_tokens chunks."""
    ids = model.encode_text(text)
    if len(ids) <= max_tokens:
        return [text]
    return [model.decode_tokens(ids[lo : lo + max_tokens]) for lo in range(0, len(ids), max_tokens)]


# Back-compat alias for callers using the reference-style private name.
_split_text_by_tokens = split_text_by_tokens
