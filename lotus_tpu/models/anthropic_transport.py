"""Anthropic Messages API transport (stdlib-only, no SDK required).

The reference reaches Anthropic models through litellm
(``lotus/models/lm.py:296-299`` routes every provider through
``litellm.batch_completion``).  This environment has no litellm and no
``anthropic`` SDK, but the Transport seam (``models/transport.py``) means a
~150-line stdlib HTTP client is all that's needed to run REAL models through
the full semantic-operator stack — used by the executed real-model quality
lane (``benchmarks/test_real_model.py``).

Differences from the OpenAI-shaped providers the cascades assume:

- No token logprobs: the Messages API does not return them, so requesting
  ``logprobs=True`` raises instead of silently returning None — cascade
  proxies must use ``ProxyModel.EMBEDDING_MODEL`` with this transport.
- System turns: OpenAI-style ``{"role": "system"}`` messages are lifted
  into the top-level ``system`` field.
"""

from __future__ import annotations

import concurrent.futures
import json
import os
import threading
import time
import urllib.error
import urllib.request
from typing import Any

from lotus_tpu.models.transport import Completion, CompletionUsage

_RETRYABLE = {408, 409, 429, 500, 502, 503, 504, 529}


class AnthropicTransport:
    """Chat-completion transport over the Anthropic Messages API.

    Args:
        base_url: API root; defaults to ``$ANTHROPIC_BASE_URL`` or the
            public endpoint.
        api_key: defaults to ``$ANTHROPIC_API_KEY``.
        max_retries: retry budget per request for retryable HTTP statuses
            (429/5xx/529) with exponential backoff + jitterless cap.
        timeout: per-request socket timeout in seconds.
    """

    def __init__(
        self,
        base_url: str | None = None,
        api_key: str | None = None,
        max_retries: int = 5,
        timeout: float = 120.0,
    ) -> None:
        self.base_url = (base_url or os.environ.get("ANTHROPIC_BASE_URL") or "https://api.anthropic.com").rstrip("/")
        self.api_key = api_key or os.environ.get("ANTHROPIC_API_KEY")
        if not self.api_key:
            # ValueError, not ImportError: this is a configuration problem,
            # and callers treat ImportError as "optional dependency missing"
            # (the LiteLLMTransport convention).
            raise ValueError(
                "AnthropicTransport needs an API key: pass api_key= or set ANTHROPIC_API_KEY."
            )
        self.max_retries = max_retries
        self.timeout = timeout
        self._stats_lock = threading.Lock()
        self.request_count = 0
        self.retry_count = 0
        self._warned_kwargs: set[str] = set()

    # ------------------------------------------------------------ transport
    def complete_batch(
        self,
        model: str,
        messages_batch: list[list[dict[str, Any]]],
        max_workers: int = 64,
        **kwargs: Any,
    ) -> list[Completion]:
        if kwargs.get("logprobs"):
            raise ValueError(
                "The Anthropic Messages API does not return token logprobs; "
                "logprob-based cascades need an OpenAI-shaped provider or "
                "ProxyModel.EMBEDDING_MODEL."
            )
        if model.startswith("anthropic/"):  # litellm-style provider prefix
            model = model.split("/", 1)[1]
        if len(messages_batch) == 1:
            return [self._complete_one(model, messages_batch[0], kwargs)]
        with concurrent.futures.ThreadPoolExecutor(max_workers=min(max_workers, 16)) as ex:
            return list(ex.map(lambda m: self._complete_one(model, m, kwargs), messages_batch))

    # ------------------------------------------------------------- internals
    @staticmethod
    def _to_anthropic(messages: list[dict[str, Any]]) -> tuple[str | None, list[dict[str, Any]]]:
        """Lift system turns; convert OpenAI multimodal parts to Anthropic's."""
        system_parts: list[str] = []
        out: list[dict[str, Any]] = []
        for m in messages:
            role, content = m.get("role", "user"), m.get("content", "")
            if role == "system":
                system_parts.append(content if isinstance(content, str) else json.dumps(content))
                continue
            if isinstance(content, list):  # multimodal part list
                parts: list[dict[str, Any]] = []
                for p in content:
                    if not isinstance(p, dict):
                        parts.append({"type": "text", "text": str(p)})
                    elif p.get("type") == "image_url":
                        url = p.get("image_url", {}).get("url", "")
                        if url.startswith("data:"):  # data:<mt>;base64,<payload>
                            head, _, payload = url.partition(",")
                            media = head.split(":", 1)[1].split(";", 1)[0] or "image/png"
                            parts.append({"type": "image", "source": {
                                "type": "base64", "media_type": media, "data": payload}})
                        else:
                            parts.append({"type": "image", "source": {"type": "url", "url": url}})
                    else:
                        parts.append({"type": "text", "text": p.get("text", "")})
                out.append({"role": role, "content": parts})
            else:
                out.append({"role": role, "content": content})
        return ("\n".join(system_parts) or None), out

    def _complete_one(
        self, model: str, messages: list[dict[str, Any]], kwargs: dict[str, Any]
    ) -> Completion:
        system, msgs = self._to_anthropic(messages)
        body: dict[str, Any] = {
            "model": model,
            "messages": msgs,
            "max_tokens": int(kwargs.get("max_completion_tokens") or kwargs.get("max_tokens") or 1024),
        }
        if system:
            body["system"] = system
        if kwargs.get("temperature") is not None:
            body["temperature"] = kwargs["temperature"]
        # Forward the sampling params the Messages API understands (OpenAI
        # names mapped where they differ); warn ONCE per unknown kwarg
        # instead of silently changing decoding behavior vs LiteLLMTransport.
        for src_key, dst_key in (("top_p", "top_p"), ("top_k", "top_k"),
                                 ("stop", "stop_sequences"), ("stop_sequences", "stop_sequences"),
                                 ("metadata", "metadata")):
            if kwargs.get(src_key) is not None:
                val = kwargs[src_key]
                body[dst_key] = [val] if dst_key == "stop_sequences" and isinstance(val, str) else val
        known = {"max_completion_tokens", "max_tokens", "temperature", "logprobs",
                 "top_logprobs", "top_p", "top_k", "stop", "stop_sequences", "metadata"}
        for extra in set(kwargs) - known:
            if extra not in self._warned_kwargs:
                self._warned_kwargs.add(extra)
                import lotus_tpu

                lotus_tpu.logger.warning(
                    "AnthropicTransport: dropping unsupported completion kwarg %r", extra
                )
        data = json.dumps(body).encode()

        last: Exception | None = None
        for attempt in range(self.max_retries + 1):
            req = urllib.request.Request(
                self.base_url + "/v1/messages",
                data=data,
                headers={
                    "x-api-key": self.api_key or "",
                    "anthropic-version": "2023-06-01",
                    "content-type": "application/json",
                },
            )
            try:
                with self._stats_lock:
                    self.request_count += 1
                with urllib.request.urlopen(req, timeout=self.timeout) as r:
                    return self._normalize(json.loads(r.read()))
            except urllib.error.HTTPError as e:
                last = e
                if e.code not in _RETRYABLE or attempt == self.max_retries:
                    detail = ""
                    try:
                        detail = e.read().decode()[:500]
                    except Exception:
                        pass
                    raise RuntimeError(f"Anthropic API error {e.code}: {detail}") from e
            except (urllib.error.URLError, TimeoutError, OSError) as e:
                last = e
                if attempt == self.max_retries:
                    raise
            with self._stats_lock:
                self.retry_count += 1
            time.sleep(min(2.0**attempt, 30.0))
        raise RuntimeError(f"Anthropic request failed after retries: {last}")  # pragma: no cover

    @staticmethod
    def _normalize(resp: dict[str, Any]) -> Completion:
        text = "".join(p.get("text", "") for p in resp.get("content", []) if p.get("type") == "text")
        u = resp.get("usage") or {}
        usage = CompletionUsage(
            prompt_tokens=int(u.get("input_tokens") or 0),
            completion_tokens=int(u.get("output_tokens") or 0),
            total_tokens=int(u.get("input_tokens") or 0) + int(u.get("output_tokens") or 0),
            cached_prompt_tokens=int(u.get("cache_read_input_tokens") or 0),
            cache_creation_tokens=int(u.get("cache_creation_input_tokens") or 0),
        )
        return Completion(
            text=text,
            usage=usage,
            logprobs=None,
            finish_reason=resp.get("stop_reason"),
            model=resp.get("model", ""),
            cost=None,  # resolved by the pricing table when registered
        )
