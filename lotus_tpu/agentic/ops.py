"""Agentic op algebra (parity: ``lotus/agentic/ops.py:17-69``).

Corpus ops (``map``, ``filter``) are Corpus -> Corpus and chainable;
terminal ops (``reduce``) collapse the corpus to one answer and must be last.
"""

from __future__ import annotations

from typing import Sequence

MAP = "map"
FILTER = "filter"
REDUCE = "reduce"

OPS: tuple[str, ...] = (MAP, FILTER, REDUCE)
TERMINAL_OPS: tuple[str, ...] = (REDUCE,)
CORPUS_OPS: tuple[str, ...] = (MAP, FILTER)
DEFAULT_OPS: tuple[str, ...] = (MAP, REDUCE)


def normalize_ops(ops: str | Sequence[str] | None) -> list[str]:
    """Validate/normalize an ops argument into an ordered op-name list."""
    if ops is None:
        return list(DEFAULT_OPS)
    if isinstance(ops, str):
        ops = [ops]

    out: list[str] = []
    for op in ops:
        if not isinstance(op, str):
            raise TypeError(f"ops must be strings (one of {', '.join(OPS)}); got {op!r}")
        key = op.strip().lower()
        if key not in OPS:
            raise ValueError(f"unknown op {op!r}; expected one of {', '.join(OPS)}")
        out.append(key)

    if not out:
        raise ValueError("ops must be a non-empty list")
    if len(set(out)) != len(out):
        raise ValueError(f"duplicate ops are not supported; got {out}")
    for i, op in enumerate(out):
        if op in TERMINAL_OPS and i != len(out) - 1:
            raise ValueError(
                f"'{op}' collapses the corpus to a single answer and must be the last op; got {out}"
            )
    return out


__all__ = ["MAP", "FILTER", "REDUCE", "OPS", "TERMINAL_OPS", "CORPUS_OPS", "DEFAULT_OPS", "normalize_ops"]
