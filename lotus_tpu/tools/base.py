"""Tool abstraction for agentic operators.

Role parity with ``lotus/tools/base.py`` (a callable the model can invoke via
the OpenAI function-tool wire format), but organised differently: the schema
is derived once at registration time by :func:`signature_model`, and both the
decorator path and the subclass path funnel through :meth:`Tool.describe`.

Two ways to define a tool::

    @tool(description="Add two integers.")
    def add(a: int, b: int) -> str:
        return str(a + b)

    class Search(Tool):
        name = "search"
        description = "Search the corpus."
        args_schema = SearchArgs      # a pydantic model
        def run(self, query: str) -> str: ...
"""

from __future__ import annotations

import inspect
from typing import Any, Callable

from pydantic import BaseModel, create_model

_EMPTY_PARAMS: dict[str, Any] = {"type": "object", "properties": {}}

# Parameter kinds that cannot be expressed in a function-tool schema.
_SKIPPED_KINDS = (inspect.Parameter.VAR_POSITIONAL, inspect.Parameter.VAR_KEYWORD)


def signature_model(fn: Callable[..., Any], title: str) -> type[BaseModel]:
    """Build a pydantic model describing ``fn``'s keyword interface.

    Untyped parameters are treated as strings; parameters without defaults
    become required fields.
    """
    spec: dict[str, Any] = {}
    for arg in inspect.signature(fn).parameters.values():
        if arg.name == "self" or arg.kind in _SKIPPED_KINDS:
            continue
        kind = str if arg.annotation is inspect.Parameter.empty else arg.annotation
        spec[arg.name] = (kind, ... if arg.default is inspect.Parameter.empty else arg.default)
    return create_model(title, **spec)  # type: ignore[call-overload]


class Tool:
    """A named, schema-described action an agent may take.

    Subclasses fill in the three class attributes and implement :meth:`run`,
    which receives keyword arguments matching ``args_schema`` and returns the
    observation text fed back to the model.
    """

    name: str = ""
    description: str = ""
    args_schema: type[BaseModel] | None = None

    def run(self, **kwargs: Any) -> str:  # pragma: no cover - abstract
        raise NotImplementedError(f"{type(self).__name__} does not implement run()")

    def describe(self) -> dict[str, Any]:
        """The tool as an OpenAI ``function`` entry (used by completers)."""
        if not self.name:
            raise ValueError(f"{type(self).__name__}: a tool must have a non-empty name")
        schema = _EMPTY_PARAMS if self.args_schema is None else self.args_schema.model_json_schema()
        return {
            "type": "function",
            "function": {
                "name": self.name,
                "description": self.description,
                "parameters": schema,
            },
        }

    # Back-compat alias; some call sites use the wire-format name.
    to_openai_schema = describe

    def __repr__(self) -> str:
        return f"<Tool {self.name or '?'}>"


class FunctionTool(Tool):
    """A plain function promoted to a :class:`Tool` by :func:`tool`."""

    def __init__(self, fn: Callable[..., Any], *, name: str, description: str):
        self.name = name
        self.description = description
        self.args_schema = signature_model(fn, f"{name}_args")
        self._call = fn

    def run(self, **kwargs: Any) -> str:
        out = self._call(**kwargs)
        return out if isinstance(out, str) else str(out)


def tool(
    fn: Callable[..., Any] | None = None,
    *,
    name: str | None = None,
    description: str | None = None,
) -> Any:
    """Decorator: promote a function into a :class:`Tool`.

    The argument schema comes from the signature's type hints; the
    description defaults to the docstring. Works bare or with arguments.
    """

    def promote(func: Callable[..., Any]) -> FunctionTool:
        return FunctionTool(
            func,
            name=name or func.__name__,
            description=description if description is not None else (inspect.getdoc(func) or "").strip(),
        )

    return promote if fn is None else promote(fn)
