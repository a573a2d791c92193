"""Fingerprints for plan-level caching.

Role parity with ``lotus/ast/cache.py`` (content-addressed keys for the
LazyFrame runner), with its own encoding scheme: every value is lowered to a
canonical printable form by a *type-dispatch table* (:data:`_LOWERING`), then
digested with blake2b. DataFrames fingerprint by content; callables and
LazyFrame references by identity (so shared objects reuse entries within a
session); node configs by their normalised field map.

Keys are session-scoped — they never leave the process, so the scheme is
free to change between versions.
"""

from __future__ import annotations

import dataclasses
import enum
import hashlib
import pickle
from typing import Any, Callable

import pandas as pd
from pydantic import BaseModel as _Model

from lotus_tpu.ast.nodes import BaseNode

_DIGEST_CHARS = 16


def _digest(payload: bytes) -> str:
    return hashlib.blake2b(payload, digest_size=16).hexdigest()[:_DIGEST_CHARS]


def hash_dataframe(df: pd.DataFrame) -> str:
    """Content fingerprint covering values, dtypes, labels, order, attrs."""
    return _digest(pickle.dumps(df, protocol=pickle.HIGHEST_PROTOCOL))


# ---------------------------------------------------------------- lowering
# Ordered (predicate, encoder) table; first match wins. Encoders return a
# canonical repr-able value, recursing through ``_lower`` for containers.


def _lower(value: Any) -> Any:
    for matches, encode in _LOWERING:
        if matches(value):
            return encode(value)
    # Last resort: identity (stable within the session, which is all we need).
    return ("?", type(value).__name__, id(value))


def _lower_mapping(d: dict) -> tuple:
    entries = ((_lower(k), _lower(v)) for k, v in d.items())
    return ("dict",) + tuple(sorted(entries, key=repr))


def _is_dataclass_obj(v: Any) -> bool:
    return dataclasses.is_dataclass(v) and not isinstance(v, type)


def _is_lazyframe(v: Any) -> bool:
    from lotus_tpu.ast.lazyframe import LazyFrame

    return isinstance(v, LazyFrame)


_LOWERING: list[tuple[Callable[[Any], bool], Callable[[Any], Any]]] = [
    (lambda v: v is None, lambda v: None),
    # bool before int (bool is an int subclass) — scalars pass through.
    (lambda v: isinstance(v, (bool, int, float, str)), lambda v: v),
    (lambda v: isinstance(v, enum.Enum), lambda v: ("enum", type(v).__name__, v.name)),
    (lambda v: isinstance(v, _Model), lambda v: ("model", type(v).__name__, _lower(v.model_dump(mode="python")))),
    (_is_dataclass_obj, lambda v: ("dc", type(v).__name__, _lower(dataclasses.asdict(v)))),
    (_is_lazyframe, lambda v: ("lf@", id(v))),
    (lambda v: isinstance(v, BaseNode), lambda v: ("node", hash_node(v))),
    (lambda v: isinstance(v, pd.DataFrame), lambda v: ("df", hash_dataframe(v))),
    (lambda v: callable(v) and not isinstance(v, type), lambda v: ("fn@", id(v))),
    (lambda v: isinstance(v, (set, frozenset)), lambda v: ("set",) + tuple(sorted((_lower(x) for x in v), key=repr))),
    (lambda v: isinstance(v, (list, tuple)), lambda v: ("seq",) + tuple(_lower(x) for x in v)),
    (lambda v: isinstance(v, dict), _lower_mapping),
]


# ----------------------------------------------------------------- surface
def hash_node(node: BaseNode) -> str:
    """Fingerprint of a node's configuration (field names + lowered values)."""
    lowered = sorted((name, _lower(v)) for name, v in node.model_dump().items())
    return _digest(repr(lowered).encode())


def compute_cache_key(node: BaseNode, input_hash: str) -> str:
    """The runner's cache key: node type, node config, and input lineage."""
    return f"{type(node).__name__}:{hash_node(node)}:{input_hash}"


def hash_result(result: Any) -> str:
    """Fingerprint an execution result (DataFrame, Series-like, or scalar)."""
    if isinstance(result, pd.DataFrame):
        return hash_dataframe(result)
    if hasattr(result, "__len__") and not isinstance(result, str):
        try:
            rowhash = pd.util.hash_pandas_object(result, index=True).sum()
            return _digest(f"{type(result).__name__}={rowhash}".encode())
        except (TypeError, AttributeError):
            pass
    return _digest(repr(result).encode())
