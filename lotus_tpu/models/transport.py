"""Provider transport seam for the LM client.

The reference binds its LM directly to litellm
(``lotus/models/lm.py:296-299``).  Here the provider is behind a small
protocol so (a) litellm stays an optional dependency and (b) tests inject
deterministic fakes — the same seam-based testability discipline the
reference applies to its agent loop (``lotus/agentic/loop.py:38-46``).
"""

from __future__ import annotations

import concurrent.futures
from dataclasses import dataclass, field
from typing import Any, Protocol, runtime_checkable

from lotus_tpu.types import TokenLogprob


@dataclass
class CompletionUsage:
    prompt_tokens: int = 0
    completion_tokens: int = 0
    total_tokens: int = 0
    cached_prompt_tokens: int = 0
    cache_creation_tokens: int = 0


@dataclass
class Completion:
    """Normalized provider response."""

    text: str
    usage: CompletionUsage = field(default_factory=CompletionUsage)
    logprobs: list[TokenLogprob] | None = None
    finish_reason: str | None = None
    model: str = ""
    cost: float | None = None  # provider-computed cost; None -> pricing table


@runtime_checkable
class Transport(Protocol):
    """Executes a batch of chat completions."""

    def complete_batch(
        self,
        model: str,
        messages_batch: list[list[dict[str, Any]]],
        max_workers: int = 64,
        **kwargs: Any,
    ) -> list[Completion]: ...


class LiteLLMTransport:
    """Production transport over litellm (optional dependency)."""

    def __init__(self) -> None:
        try:
            import litellm  # noqa: F401
        except ImportError as e:  # pragma: no cover - environment dependent
            raise ImportError(
                "litellm is not installed. Install the 'llm' extra or inject a "
                "custom transport: LM(model=..., transport=my_transport)."
            ) from e

    def complete_batch(
        self,
        model: str,
        messages_batch: list[list[dict[str, Any]]],
        max_workers: int = 64,
        **kwargs: Any,
    ) -> list[Completion]:
        from litellm import batch_completion

        responses = batch_completion(
            model, messages_batch, drop_params=True, max_workers=max_workers, **kwargs
        )
        return [self._normalize(r) for r in responses]

    @staticmethod
    def _normalize(response: Any) -> Completion:
        if isinstance(response, Exception):
            raise response
        choice = response.choices[0]
        if choice.message.content is None:
            raise ValueError(f"No content in response: {response}")

        usage = CompletionUsage()
        if getattr(response, "usage", None):
            u = response.usage
            usage.prompt_tokens = u.prompt_tokens or 0
            usage.completion_tokens = u.completion_tokens or 0
            usage.total_tokens = u.total_tokens or 0
            details = getattr(u, "prompt_tokens_details", None)
            if details is not None:
                get = details.get if isinstance(details, dict) else lambda k, d=None: getattr(details, k, d)
                usage.cached_prompt_tokens = get("cached_tokens", 0) or 0
                usage.cache_creation_tokens = get("cache_creation_tokens", 0) or 0

        logprobs = None
        if getattr(choice, "logprobs", None) is not None:
            content = choice.logprobs["content"] if isinstance(choice.logprobs, dict) else choice.logprobs.content
            if content:
                from lotus_tpu.types import TopLogprob

                logprobs = [
                    TokenLogprob(
                        token=lp.token,
                        logprob=lp.logprob,
                        top_logprobs=[
                            TopLogprob(token=t.token, logprob=t.logprob)
                            for t in (lp.top_logprobs or [])
                        ],
                    )
                    for lp in content
                ]

        from lotus_tpu.pricing import calculate_cost_from_response

        return Completion(
            text=choice.message.content,
            usage=usage,
            logprobs=logprobs,
            finish_reason=getattr(choice, "finish_reason", None),
            model=getattr(response, "model", ""),
            cost=calculate_cost_from_response(response),
        )


class CallableTransport:
    """Adapts a per-message function ``fn(messages, **kwargs) -> Completion | str``
    into a batch transport (thread-pooled, preserving order)."""

    def __init__(self, fn: Any, parallel: bool = True):
        self.fn = fn
        self.parallel = parallel

    def complete_batch(
        self,
        model: str,
        messages_batch: list[list[dict[str, Any]]],
        max_workers: int = 64,
        **kwargs: Any,
    ) -> list[Completion]:
        def run_one(messages: list[dict[str, Any]]) -> Completion:
            out = self.fn(messages, **kwargs)
            if isinstance(out, str):
                return Completion(text=out, model=model)
            return out

        if not self.parallel or len(messages_batch) <= 1:
            return [run_one(m) for m in messages_batch]
        with concurrent.futures.ThreadPoolExecutor(max_workers=max_workers) as ex:
            return list(ex.map(run_one, messages_batch))
