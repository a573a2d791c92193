"""Corpus: the unit-of-work container for agentic map-reduce.

Role parity with ``lotus/corpus`` — normalise any body of text (documents,
files, a DataFrame, one long string) into addressable :class:`Unit`s that can
be grouped into shards for parallel agents — with its own construction style:
every loader funnels through :meth:`Corpus.build`, and sharding is a
generator (:func:`batched`) shared with the pipeline layer.

    corpus = Corpus.from_files("repo/**/*.py")
    answer = corpus.agent(task="Find every use of foo() and rank by risk.")
"""

from __future__ import annotations

from dataclasses import dataclass, field
from pathlib import Path
from typing import TYPE_CHECKING, Any, Iterable, Iterator, Sequence

if TYPE_CHECKING:  # pragma: no cover
    import pandas as pd

    from lotus_tpu.agentic.pipeline import Result


@dataclass
class Unit:
    """One addressable piece of a corpus (id + text + provenance)."""

    id: str
    content: str
    metadata: dict[str, Any] = field(default_factory=dict)


def batched(items: Sequence[Unit], size: int) -> Iterator[list[Unit]]:
    """Yield consecutive groups of at most ``size`` units (always >= 1 group)."""
    size = max(1, size)
    if not items:
        yield []
        return
    for start in range(0, len(items), size):
        yield list(items[start : start + size])


class Corpus:
    """An ordered collection of :class:`Unit`s with loaders and sharding."""

    def __init__(self, units: Iterable[Unit]):
        self.units: list[Unit] = list(units)

    # ------------------------------------------------------------ container
    def __len__(self) -> int:
        return len(self.units)

    def __iter__(self) -> Iterator[Unit]:
        return iter(self.units)

    def __getitem__(self, i: int) -> Unit:
        return self.units[i]

    def __repr__(self) -> str:
        return f"Corpus({len(self.units)} units)"

    # -------------------------------------------------------------- loaders
    @classmethod
    def build(cls, pairs: Iterable[tuple[str, str]], **meta_common: Any) -> "Corpus":
        """Construct from (id, content) pairs; ``meta_common`` is stamped on all."""
        return cls(Unit(id=i, content=c, metadata=dict(meta_common)) for i, c in pairs)

    @classmethod
    def from_documents(cls, docs: Sequence[str], ids: Sequence[str] | None = None) -> "Corpus":
        """One unit per document; ids default to positional indices."""
        keys = [str(k) for k in ids] if ids is not None else [str(n) for n in range(len(docs))]
        return cls.build(zip(keys, docs))

    @classmethod
    def from_text(cls, text: str, chunk_chars: int = 4000) -> "Corpus":
        """Fixed-width character chunking of a single long document."""
        step = max(1, chunk_chars)
        spans = range(0, max(len(text), 1), step)
        return cls(
            Unit(id=str(n), content=text[lo : lo + step], metadata={"chunk": n})
            for n, lo in enumerate(spans)
        )

    @classmethod
    def from_files(
        cls,
        pattern: str,
        encoding: str = "utf-8",
        recursive: bool = True,
    ) -> "Corpus":
        """One unit per file matching a glob pattern (id = path)."""
        import glob as _g

        def read_or_note(path: str) -> str:
            try:
                return Path(path).read_text(encoding=encoding, errors="replace")
            except OSError as err:
                return f"<unreadable: {err}>"

        matches = sorted(p for p in _g.glob(pattern, recursive=recursive) if Path(p).is_file())
        return cls(Unit(id=p, content=read_or_note(p), metadata={"path": p}) for p in matches)

    @classmethod
    def from_dataframe(
        cls,
        df: "pd.DataFrame",
        content_cols: Sequence[str] | None = None,
    ) -> "Corpus":
        """One unit per row, rendered as ``col: value`` lines."""
        use = list(df.columns) if content_cols is None else list(content_cols)
        rows = (df.iloc[pos] for pos in range(len(df)))
        return cls(
            Unit(
                id=str(pos),
                content="\n".join(f"{c}: {row[c]}" for c in use),
                metadata={"row": pos},
            )
            for pos, row in enumerate(rows)
        )

    # ------------------------------------------------------------- sharding
    def sample(self, n: int = 3) -> list[Unit]:
        """A small deterministic preview (used by the planner)."""
        return list(self.units[:n])

    def shard(self, shard_size: int | None = 1) -> list[list[Unit]]:
        """Group units into bounded batches for parallel workers."""
        return list(batched(self.units, shard_size or 1))

    # ------------------------------------------------------------- pipeline
    def agent(
        self,
        task: str,
        *,
        ops: "str | list[str] | None" = None,
        **kwargs: Any,
    ) -> "Result":
        """Run an agentic op pipeline (map/filter/reduce) over this corpus."""
        from lotus_tpu.agentic.pipeline import run_pipeline

        return run_pipeline(self, task, ops=ops, **kwargs)


__all__ = ["Unit", "Corpus", "batched"]
