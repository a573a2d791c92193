"""The single-agent tool loop.

Role parity with ``lotus/agentic/loop.py`` (drive one model+tools session to
a text answer), built here as an explicit state machine: a :class:`Transcript`
owns the OpenAI-wire message list, a :class:`ToolBelt` owns dispatch and
error capture, and :class:`AgentSession` advances turn by turn until the
model stops asking for tools or the step budget runs out. ``run_agent`` is
the one-shot convenience wrapper the pipeline uses.

The model is reached only through the :class:`Completer` protocol, so the
whole loop runs offline under scripted fakes in tests.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from typing import Any, Iterable, Protocol

from lotus_tpu.tools.base import Tool

_WRAP_UP = "Provide your final answer now."


@dataclass
class ToolCall:
    id: str
    name: str
    arguments: dict[str, Any]


@dataclass
class AgentStep:
    """One model turn: final content, or tool calls to execute."""

    content: str | None = None
    tool_calls: list[ToolCall] = field(default_factory=list)
    usage: dict[str, int] = field(default_factory=dict)


class Completer(Protocol):
    """Sends the running message list to the model; returns the next step.

    Implementations bind a fixed tool-schema list at construction;
    ``tools_enabled=False`` forces a tool-free turn.
    """

    def __call__(self, messages: list[dict[str, Any]], *, tools_enabled: bool = True) -> AgentStep: ...


@dataclass
class AgentResult:
    output: str
    trace: list[dict[str, Any]]
    steps: int
    truncated: bool
    usage: dict[str, int]


class Transcript:
    """The conversation so far, in OpenAI wire format."""

    def __init__(self, system: str, user: str):
        self.messages: list[dict[str, Any]] = [
            {"role": "system", "content": system},
            {"role": "user", "content": user},
        ]

    def record_request(self, step: AgentStep) -> None:
        """Append the assistant turn that asked for tools (so the model sees it)."""
        wire_calls = [
            {
                "id": c.id,
                "type": "function",
                "function": {"name": c.name, "arguments": json.dumps(c.arguments)},
            }
            for c in step.tool_calls
        ]
        self.messages.append({"role": "assistant", "content": step.content or "", "tool_calls": wire_calls})

    def record_observation(self, call: ToolCall, observation: str) -> None:
        self.messages.append(
            {"role": "tool", "tool_call_id": call.id, "name": call.name, "content": observation}
        )

    def with_nudge(self, text: str) -> list[dict[str, Any]]:
        """A copy of the transcript with one extra user message appended."""
        return self.messages + [{"role": "user", "content": text}]


class ToolBelt:
    """Name-indexed tool set; every failure becomes observation text."""

    def __init__(self, tools: Iterable[Tool]):
        self._by_name = {t.name: t for t in tools}

    def invoke(self, call: ToolCall) -> str:
        tool = self._by_name.get(call.name)
        if tool is None:
            return f"ERROR: unknown tool '{call.name}'"
        try:
            return tool.run(**call.arguments)
        except Exception as err:  # observations, never exceptions
            return f"ERROR: {type(err).__name__}: {err}"


class AgentSession:
    """Turn-by-turn driver. ``advance()`` runs one model turn; ``result``
    is set once the session is closed."""

    def __init__(self, completer: Completer, tools: Iterable[Tool], system: str, user: str, max_steps: int = 6):
        self.completer = completer
        self.belt = ToolBelt(tools)
        self.transcript = Transcript(system, user)
        self.max_steps = max_steps
        self.trace: list[dict[str, Any]] = []
        self.usage: dict[str, int] = {}
        self.turns = 0
        self.result: AgentResult | None = None

    @property
    def open(self) -> bool:
        return self.result is None

    def _meter(self, step: AgentStep) -> None:
        for key, n in (step.usage or {}).items():
            self.usage[key] = self.usage.get(key, 0) + n

    def _close(self, text: str, *, truncated: bool) -> None:
        self.result = AgentResult(text, self.trace, self.turns, truncated, self.usage)

    def advance(self) -> None:
        """One turn: ask the model; either finish, or execute its tool calls."""
        if not self.open:
            return
        if self.turns >= self.max_steps:
            # Out of budget — demand a text answer with tools switched off.
            step = self.completer(self.transcript.with_nudge(_WRAP_UP), tools_enabled=False)
            self._meter(step)
            self._close(step.content or "", truncated=True)
            return

        self.turns += 1
        step = self.completer(self.transcript.messages)
        self._meter(step)
        if not step.tool_calls:
            self._close(step.content or "", truncated=False)
            return

        self.transcript.record_request(step)
        for call in step.tool_calls:
            observation = self.belt.invoke(call)
            self.trace.append({"tool": call.name, "arguments": call.arguments, "result": observation})
            self.transcript.record_observation(call, str(observation))


def run_agent(
    completer: Completer,
    tools: list[Tool],
    system_prompt: str,
    user_content: str,
    max_steps: int = 6,
) -> AgentResult:
    """Run one agent session to completion and return its result."""
    session = AgentSession(completer, tools, system_prompt, user_content, max_steps)
    while session.open:
        session.advance()
    assert session.result is not None
    return session.result


def _decode_wire_step(resp: Any) -> AgentStep:
    """Translate a litellm completion response into an AgentStep."""
    msg = resp.choices[0].message
    calls: list[ToolCall] = []
    for tc in getattr(msg, "tool_calls", None) or []:
        try:
            args = json.loads(tc.function.arguments or "{}")
        except json.JSONDecodeError:
            args = {}
        calls.append(ToolCall(id=tc.id, name=tc.function.name, arguments=args))
    usage_obj = getattr(resp, "usage", None)
    usage = (
        {}
        if usage_obj is None
        else {
            "prompt_tokens": usage_obj.prompt_tokens or 0,
            "completion_tokens": usage_obj.completion_tokens or 0,
            "total_tokens": usage_obj.total_tokens or 0,
        }
    )
    return AgentStep(content=msg.content, tool_calls=calls, usage=usage)


class LiteLLMCompleter:
    """Production Completer over litellm native tool calling (optional dep).

    Inherits the configured LM's model id and generation kwargs.
    """

    _FORWARDED = ("temperature", "max_completion_tokens")

    def __init__(self, lm: Any, tools: list[Tool] | None = None):
        self.lm = lm
        self.tool_schemas = [t.describe() for t in (tools or [])] or None

    def __call__(self, messages: list[dict[str, Any]], *, tools_enabled: bool = True) -> AgentStep:
        import litellm

        gen = getattr(self.lm, "kwargs", {}) or {}
        extra: dict[str, Any] = {k: gen[k] for k in self._FORWARDED if k in gen}
        if tools_enabled and self.tool_schemas:
            extra.update(tools=self.tool_schemas, tool_choice="auto")
        resp = litellm.completion(model=self.lm.model, messages=messages, drop_params=True, **extra)
        return _decode_wire_step(resp)
