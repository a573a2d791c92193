"""Long-context document fitting: TRUNCATE and CHUNK strategies.

Parity target: ``lotus/long_context_strategy.py:11-261``.  TRUNCATE cuts each
document token-exactly (with ellipsis) to the model's budget; CHUNK finds the
largest-token column, splits it token-exactly, and replicates the other
columns per chunk, keeping per-chunk provenance so sem_agg can fold
partial documents.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import TYPE_CHECKING, Any

import pandas as pd

from lotus_tpu.templates import task_instructions
from lotus_tpu.types import LongContextStrategy

if TYPE_CHECKING:  # pragma: no cover
    from lotus_tpu.models import LM


@dataclass
class ChunkInfo:
    """Provenance of one chunk back to its source row."""

    original_row_idx: int
    chunk_idx: int
    total_chunks: int
    chunked_column: str | None = None  # set only by the CHUNK strategy


@dataclass
class ChunkedDocument:
    """Chunked documents plus restoration info (replaces a plain list[str])."""

    strategy: LongContextStrategy
    docs: list[str]
    chunk_info: list[ChunkInfo]
    original_df: pd.DataFrame

    def __len__(self) -> int:
        return len(self.docs)

    def get_row(self, index: int) -> pd.Series:
        info = self.chunk_info[index]
        row = self.original_df.iloc[info.original_row_idx]
        if info.chunked_column is not None:
            row = row.copy()
            row[info.chunked_column] = self.docs[index]
        return row

    def get_value(self, index: int, column: str) -> Any:
        return self.get_row(index)[column]


def create_chunked_documents(
    df: pd.DataFrame,
    cols: list[str],
    model: "LM",
    strategy: LongContextStrategy,
    extra_tokens: int,
) -> ChunkedDocument:
    """Fit each row's serialized document to the model's context budget."""
    if strategy == LongContextStrategy.TRUNCATE:
        return _truncate(df, cols, model, extra_tokens)
    if strategy == LongContextStrategy.CHUNK:
        return _chunk(df, cols, model, extra_tokens)
    raise ValueError(f"Unknown long_context strategy: {strategy}")


def _budget(model: "LM", extra_tokens: int) -> int:
    max_doc_tokens = model.max_ctx_len - model.max_tokens - extra_tokens
    if max_doc_tokens <= 0:
        raise ValueError("Max document tokens is less than or equal to 0")
    return max_doc_tokens


def _truncate(df: pd.DataFrame, cols: list[str], model: "LM", extra_tokens: int) -> ChunkedDocument:
    max_doc_tokens = _budget(model, extra_tokens)
    docs, info = [], []
    for i, doc in enumerate(task_instructions.df2text(df, cols)):
        if model.count_tokens(doc) <= max_doc_tokens:
            docs.append(doc)
        else:
            ellipsis = "..."
            available = max_doc_tokens - model.count_tokens(ellipsis)
            if available <= 0:
                ellipsis, available = "", max_doc_tokens
            tokens = model.encode_text(doc)
            docs.append(model.decode_tokens(tokens[:available]) + ellipsis)
        info.append(ChunkInfo(original_row_idx=i, chunk_idx=0, total_chunks=1))
    return ChunkedDocument(
        strategy=LongContextStrategy.TRUNCATE, docs=docs, chunk_info=info, original_df=df
    )


def _chunk(df: pd.DataFrame, cols: list[str], model: "LM", extra_tokens: int) -> ChunkedDocument:
    max_doc_tokens = _budget(model, extra_tokens)
    docs, info = [], []
    for i, (row_idx, row) in enumerate(df.iterrows()):
        doc = task_instructions.df2text(df.iloc[[i]], cols)[0]
        if model.count_tokens(doc) <= max_doc_tokens:
            docs.append(doc)
            info.append(ChunkInfo(original_row_idx=i, chunk_idx=0, total_chunks=1))
            continue

        # Find the column carrying the most tokens; it gets split.
        big_col, big_count = None, 0
        for col in cols:
            if col in df.columns:
                n = model.count_tokens(str(row[col]))
                if n > big_count:
                    big_col, big_count = col, n
        if big_col is None:
            raise ValueError("No valid columns found for long_context")

        row_empty = row.copy()
        row_empty[big_col] = ""
        empty_doc = task_instructions.df2text(pd.DataFrame([row_empty]), cols)[0]
        available = max_doc_tokens - model.count_tokens(empty_doc)
        if available <= 0:
            raise ValueError(
                f"Cannot fit document even after emptying column {big_col!r} for row "
                f"{row_idx}: the remaining structure exceeds the context window "
                f"(available={available}, budget={max_doc_tokens})."
            )

        chunks = _split_text_by_tokens(str(row[big_col]), available, model)
        for chunk_idx, chunk in enumerate(chunks):
            row_chunk = row.copy()
            row_chunk[big_col] = chunk
            docs.append(task_instructions.df2text(pd.DataFrame([row_chunk]), cols)[0])
            info.append(
                ChunkInfo(
                    original_row_idx=i,
                    chunk_idx=chunk_idx,
                    total_chunks=len(chunks),
                    chunked_column=big_col,
                )
            )
    return ChunkedDocument(
        strategy=LongContextStrategy.CHUNK, docs=docs, chunk_info=info, original_df=df
    )


def _split_text_by_tokens(text: str, max_tokens: int, model: "LM") -> list[str]:
    """Token-exact splitting into <= max_tokens chunks."""
    tokens = model.encode_text(text)
    if len(tokens) <= max_tokens:
        return [text]
    return [
        model.decode_tokens(tokens[i : i + max_tokens])
        for i in range(0, len(tokens), max_tokens)
    ]
