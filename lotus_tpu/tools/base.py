"""Tool interface for agentic operators.

Parity target: ``lotus/tools/base.py:29-107``.  A Tool is a pydantic-described
callable serializable to the OpenAI function-tool schema:

    @tool(description="Add two integers.")
    def add(a: int, b: int) -> str:
        return str(a + b)
"""

from __future__ import annotations

import inspect
from typing import Any, Callable

from pydantic import BaseModel, create_model


class Tool:
    """Base class: set ``name``, ``description``, ``args_schema``; implement run()."""

    name: str = ""
    description: str = ""
    args_schema: type[BaseModel] | None = None

    def run(self, **kwargs: Any) -> str:  # pragma: no cover - overridden
        raise NotImplementedError("Tool subclasses must implement run().")

    def to_openai_schema(self) -> dict[str, Any]:
        if not self.name:
            raise ValueError("Tool.name must be set.")
        parameters = (
            self.args_schema.model_json_schema()
            if self.args_schema is not None
            else {"type": "object", "properties": {}}
        )
        return {
            "type": "function",
            "function": {"name": self.name, "description": self.description, "parameters": parameters},
        }

    def __repr__(self) -> str:
        return f"Tool(name={self.name!r})"


class _FunctionTool(Tool):
    def __init__(self, fn: Callable[..., Any], name: str, description: str, args_schema: type[BaseModel]):
        self._fn = fn
        self.name = name
        self.description = description
        self.args_schema = args_schema

    def run(self, **kwargs: Any) -> str:
        result = self._fn(**kwargs)
        return result if isinstance(result, str) else str(result)


def _schema_from_signature(fn: Callable[..., Any], model_name: str) -> type[BaseModel]:
    fields: dict[str, Any] = {}
    for pname, param in inspect.signature(fn).parameters.items():
        if pname == "self" or param.kind in (
            inspect.Parameter.VAR_POSITIONAL,
            inspect.Parameter.VAR_KEYWORD,
        ):
            continue
        annotation = param.annotation if param.annotation is not inspect.Parameter.empty else str
        default = param.default if param.default is not inspect.Parameter.empty else ...
        fields[pname] = (annotation, default)
    return create_model(model_name, **fields)  # type: ignore[call-overload]


def tool(fn: Callable[..., Any] | None = None, *, name: str | None = None, description: str | None = None):
    """Decorator turning a function into a Tool (schema from type hints)."""

    def wrap(func: Callable[..., Any]) -> _FunctionTool:
        tool_name = name or func.__name__
        tool_desc = description or (inspect.getdoc(func) or "").strip()
        return _FunctionTool(func, tool_name, tool_desc, _schema_from_signature(func, f"{tool_name}_Args"))

    return wrap(fn) if fn is not None else wrap
