"""Content-addressable cache keys for LazyFrame execution.

Parity target: ``lotus/ast/cache.py:17-92``: DataFrames hash by content,
callables and LazyFrames by identity, nodes by normalized field values; the
runner's key is ``NodeType:node_hash:input_hash``.
"""

from __future__ import annotations

import dataclasses
import enum
import hashlib
import pickle
from typing import Any

import pandas as pd
from pydantic import BaseModel as PydanticBaseModel

from lotus_tpu.ast.nodes import BaseNode


def hash_dataframe(df: pd.DataFrame) -> str:
    """Stable content hash (values, dtypes, labels, ordering, attrs)."""
    payload = pickle.dumps(df, protocol=pickle.HIGHEST_PROTOCOL)
    return hashlib.md5(payload).hexdigest()[:16]


def _hashable_value(value: Any) -> Any:
    from lotus_tpu.ast.lazyframe import LazyFrame

    if value is None:
        return None
    if isinstance(value, enum.Enum):
        return ("_enum", type(value).__name__, value.name)
    if isinstance(value, PydanticBaseModel):
        return ("_pydantic", type(value).__name__, _hashable_value(value.model_dump(mode="python")))
    if dataclasses.is_dataclass(value) and not isinstance(value, type):
        return ("_dataclass", type(value).__name__, _hashable_value(dataclasses.asdict(value)))
    if callable(value) and not isinstance(value, type):
        return ("_id", id(value))
    if isinstance(value, LazyFrame):
        return ("_lf", id(value))
    if isinstance(value, BaseNode):
        return ("_node", hash_node(value))
    if isinstance(value, pd.DataFrame):
        return ("_df", hash_dataframe(value))
    if isinstance(value, (str, int, float, bool)):
        return value
    if isinstance(value, (set, frozenset)):
        return ("_set", tuple(sorted((_hashable_value(v) for v in value), key=repr)))
    if isinstance(value, (list, tuple)):
        return tuple(_hashable_value(v) for v in value)
    if isinstance(value, dict):
        items = [(_hashable_value(k), _hashable_value(v)) for k, v in value.items()]
        return tuple(sorted(items, key=lambda kv: repr(kv[0])))
    return ("_other", type(value).__name__, id(value))


def hash_node(node: BaseNode) -> str:
    """Stable hash of a node's configuration."""
    parts = [(name, _hashable_value(value)) for name, value in node.model_dump().items()]
    return hashlib.md5(str(sorted(parts)).encode()).hexdigest()[:16]


def compute_cache_key(node: BaseNode, input_hash: str) -> str:
    return f"{type(node).__name__}:{hash_node(node)}:{input_hash}"


def hash_result(result: Any) -> str:
    if isinstance(result, pd.DataFrame):
        return hash_dataframe(result)
    if hasattr(result, "__len__") and not isinstance(result, str):
        try:
            h = pd.util.hash_pandas_object(result, index=True).sum()
            return hashlib.md5(f"{type(result).__name__}:{h}".encode()).hexdigest()[:16]
        except (TypeError, AttributeError):
            pass
    return hashlib.md5(str(hash(str(result))).encode()).hexdigest()[:16]
