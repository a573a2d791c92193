"""The agentic op algebra: what can run, and in what order.

Role parity with ``lotus/agentic/ops.py``, expressed as a typed spec table
instead of bare string tuples: each op declares what it *yields* — another
corpus (chainable) or a single answer (must close the pipeline). Validation
reads the table, so adding an op is one registry line.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Sequence


@dataclass(frozen=True)
class OpSpec:
    """Static description of one pipeline op."""

    name: str
    yields: str  # "corpus" (chainable) | "answer" (closes the pipeline)
    doc: str

    @property
    def closes_pipeline(self) -> bool:
        return self.yields == "answer"


_REGISTRY: dict[str, OpSpec] = {
    spec.name: spec
    for spec in (
        OpSpec("map", "corpus", "transform each shard with an agent"),
        OpSpec("filter", "corpus", "keep/drop each unit by an agent's verdict"),
        OpSpec("reduce", "answer", "aggregate all shard outputs into one answer"),
    )
}

# Convenience names (public API).
MAP = "map"
FILTER = "filter"
REDUCE = "reduce"
OPS: tuple[str, ...] = tuple(_REGISTRY)
CORPUS_OPS: tuple[str, ...] = tuple(s.name for s in _REGISTRY.values() if not s.closes_pipeline)
TERMINAL_OPS: tuple[str, ...] = tuple(s.name for s in _REGISTRY.values() if s.closes_pipeline)
DEFAULT_OPS: tuple[str, ...] = (MAP, REDUCE)


def spec_of(op: str) -> OpSpec:
    """Look up an op's spec; raises ``ValueError`` for unknown names."""
    try:
        return _REGISTRY[op]
    except KeyError:
        known = ", ".join(_REGISTRY)
        raise ValueError(f"unknown op {op!r}; known ops: {known}") from None


def normalize_ops(ops: str | Sequence[str] | None) -> list[str]:
    """Canonicalise a user-supplied ops argument into a valid ordered list.

    Rules enforced from the spec table: names must be known, appear at most
    once, and an answer-yielding op can only be the final step.
    """
    if ops is None:
        return list(DEFAULT_OPS)
    names = [ops] if isinstance(ops, str) else list(ops)
    if not names:
        raise ValueError("ops must name at least one op")

    seen: set[str] = set()
    plan: list[str] = []
    for raw in names:
        if not isinstance(raw, str):
            raise TypeError(f"op names must be strings, got {type(raw).__name__}: {raw!r}")
        op = raw.strip().lower()
        spec = spec_of(op)  # raises on unknown
        if op in seen:
            raise ValueError(f"op {op!r} appears twice; each op may run at most once")
        seen.add(op)
        if plan and spec_of(plan[-1]).closes_pipeline:
            raise ValueError(
                f"{plan[-1]!r} yields a single answer and closes the pipeline; "
                f"{op!r} cannot follow it"
            )
        plan.append(op)
    return plan


__all__ = [
    "OpSpec",
    "spec_of",
    "normalize_ops",
    "MAP",
    "FILTER",
    "REDUCE",
    "OPS",
    "CORPUS_OPS",
    "TERMINAL_OPS",
    "DEFAULT_OPS",
]
