"""LM client: batched chat completions with caching, rate limiting, usage
accounting, and logprob extraction for cascades.

Behavioral parity with the reference LM (``lotus/models/lm.py:81-689``):
message-level SHA-256 caching, RPM limiter, TPM limiter with a sliding 60 s
token window and 5% safety buffer, virtual-vs-physical usage stats with
UsageLimit enforcement, normalized True/False probability extraction for
filter cascades, and token count/encode/decode.  The provider sits behind a
``Transport`` (litellm in production, fakes in tests).
"""

from __future__ import annotations

import hashlib
import math
import time
from collections import deque
from typing import Any, Optional

from tqdm import tqdm

import lotus_tpu
from lotus_tpu.cache import Cache, CacheFactory
from lotus_tpu.models.tokenizer import ApproxTokenizer, TokenizerLike, wrap_tokenizer
from lotus_tpu.models.transport import Completion, LiteLLMTransport, Transport
from lotus_tpu.pricing import calculate_cost
from lotus_tpu.types import (
    LMOutput,
    LMStats,
    LogprobsForCascade,
    LogprobsForFilterCascade,
    LotusUsageLimitException,
    TokenLogprob,
    UsageLimit,
)

DEFAULT_MAX_TOKENS = 512
DEFAULT_REASONING_MAX_TOKENS = 8192

_REASONING_PREFIXES = ("o1", "o3", "o4", "gpt-5", "deepseek-r1", "deepseek-reasoner")


class LM:
    """Unified chat-completion client.

    Args:
        model: provider model name (litellm-style, e.g. "gpt-4o-mini").
        temperature: sampling temperature.
        max_ctx_len: provider context window (tokens).
        max_tokens: completion budget; defaults to 512, or 8192 for reasoning
            models whose hidden reasoning spends from the same budget.
        max_batch_size: concurrent requests per burst.
        rate_limit: requests/minute cap (adds inter-batch delays).
        tpm_limit: tokens/minute cap (sliding 60 s window, 5% buffer).
        tokenizer: optional tokenizer (HF tokenizers Tokenizer or anything
            with encode/decode); default is a consistent approximate
            tokenizer.
        transport: provider transport; defaults to litellm.
        cache: message-level cache backend.
    """

    def __init__(
        self,
        model: str = "gpt-4o-mini",
        temperature: float = 0.0,
        max_ctx_len: int = 128000,
        max_tokens: int | None = None,
        max_batch_size: int = 64,
        rate_limit: int | None = None,
        tpm_limit: int | None = None,
        tokenizer: Any = None,
        transport: Optional[Transport] = None,
        cache: Optional[Cache] = None,
        physical_usage_limit: UsageLimit = UsageLimit(),
        virtual_usage_limit: UsageLimit = UsageLimit(),
        **kwargs: Any,
    ) -> None:
        # Identity & budgets.  Reasoning models spend hidden thinking tokens
        # from the completion budget, hence the larger default.
        self.model, self.max_ctx_len = model, max_ctx_len
        self.max_tokens = max_tokens if max_tokens is not None else (
            DEFAULT_REASONING_MAX_TOKENS if self.is_reasoning_model() else DEFAULT_MAX_TOKENS
        )

        # Throttling. An RPM cap also bounds the burst size.
        self.rate_limit, self.tpm_limit = rate_limit, tpm_limit
        self.max_batch_size = max_batch_size if rate_limit is None else min(rate_limit, max_batch_size)
        self._token_usage_history: deque[tuple[float, int]] = deque()

        # Pluggable seams: tokenizer, provider transport, message cache.
        self.tokenizer: TokenizerLike = ApproxTokenizer() if tokenizer is None else wrap_tokenizer(tokenizer)
        self.transport: Transport = transport if transport is not None else self._default_transport(model)
        self.cache = cache if cache is not None else CacheFactory.create_default_cache()

        # Accounting.
        self.stats = LMStats()
        self.physical_usage_limit, self.virtual_usage_limit = physical_usage_limit, virtual_usage_limit
        self.kwargs: dict[str, Any] = dict(temperature=temperature, max_completion_tokens=self.max_tokens, **kwargs)

    @staticmethod
    def _default_transport(model: str) -> Transport:
        """litellm when installed; otherwise the stdlib Anthropic transport
        for claude models with a key in the environment, so ``LM("claude-…")``
        works in SDK-free environments."""
        try:
            return LiteLLMTransport()
        except ImportError:
            import os

            name = model.split("/", 1)[-1]
            if name.startswith("claude") and os.environ.get("ANTHROPIC_API_KEY"):
                from lotus_tpu.models.anthropic_transport import AnthropicTransport

                return AnthropicTransport()
            raise

    # ------------------------------------------------------------------ call
    def __call__(
        self,
        messages: list[list[dict[str, Any]]],
        show_progress_bar: bool = True,
        progress_bar_desc: str = "Processing uncached messages",
        **kwargs: Any,
    ) -> LMOutput:
        from lotus_tpu.settings import settings

        all_kwargs = {**self.kwargs, **kwargs}
        if all_kwargs.get("logprobs", False):
            all_kwargs.setdefault("top_logprobs", 10)

        use_cache = settings.enable_cache
        if use_cache:
            hashes = [self._hash_messages(m, all_kwargs) for m in messages]
            cached: list[Completion | None] = []
            for h in hashes:
                entry = self.cache.get(h)
                cached.append(entry if isinstance(entry, Completion) else None)
            uncached = [(m, h) for m, h, c in zip(messages, hashes, cached) if c is None]
        else:
            hashes, cached = [], []
            uncached = [(m, "no-cache") for m in messages]

        self.stats.cache_hits += len(messages) - len(uncached)

        fresh = self._complete_uncached(
            [m for m, _ in uncached], all_kwargs, show_progress_bar, progress_bar_desc
        )

        for comp, (_, h) in zip(fresh, uncached):
            self._update_stats(comp, is_cached=False)
            if use_cache:
                self.cache.insert(h, comp)
        if use_cache:
            for comp in cached:
                if comp is not None:
                    self._update_stats(comp, is_cached=True)

        if use_cache:
            fresh_iter = iter(fresh)
            ordered = [c if c is not None else next(fresh_iter) for c in cached]
        else:
            ordered = fresh

        outputs = [self._extract_text(c) for c in ordered]
        logprobs = [c.logprobs or [] for c in ordered] if all_kwargs.get("logprobs") else None
        return LMOutput(outputs=outputs, logprobs=logprobs)

    def get_completion(
        self,
        system_prompt: str,
        user_prompt: str,
        show_progress_bar: bool = True,
        progress_bar_desc: str = "Processing uncached messages",
        response_format: Any = None,
        **kwargs: Any,
    ) -> Any:
        """One system+user completion; parses into `response_format` if given."""
        messages = [[
            {"role": "system", "content": system_prompt},
            {"role": "user", "content": user_prompt},
        ]]
        out = self(
            messages,
            show_progress_bar=show_progress_bar,
            progress_bar_desc=progress_bar_desc,
            response_format=response_format,
            **kwargs,
        ).outputs[0]
        if response_format is not None:
            return response_format.model_validate_json(out)
        return out

    # ------------------------------------------------------------- batching
    def _complete_uncached(
        self,
        batch: list[list[dict[str, Any]]],
        all_kwargs: dict[str, Any],
        show_progress_bar: bool,
        progress_bar_desc: str,
    ) -> list[Completion]:
        if not batch:
            return []
        pbar = tqdm(
            total=len(batch),
            desc=progress_bar_desc,
            disable=not show_progress_bar,
            bar_format="{l_bar}{bar} {n}/{total} LM calls [{elapsed}<{remaining}, {rate_fmt}{postfix}]",
        )
        try:
            if self.tpm_limit is not None:
                return self._run_tpm_limited(batch, all_kwargs, pbar)
            if self.rate_limit is not None:
                return self._run_rate_limited(batch, all_kwargs, pbar)
            out = self.transport.complete_batch(
                self.model, batch, max_workers=self.max_batch_size, **all_kwargs
            )
            pbar.update(len(batch))
            return out
        finally:
            pbar.close()

    def _run_rate_limited(self, batch, all_kwargs, pbar) -> list[Completion]:
        assert self.rate_limit is not None
        interval = 60.0 / self.rate_limit
        out: list[Completion] = []
        num_batches = math.ceil(len(batch) / self.max_batch_size)
        for i in range(num_batches):
            start = time.time()
            sub = batch[i * self.max_batch_size : (i + 1) * self.max_batch_size]
            out.extend(self.transport.complete_batch(self.model, sub, max_workers=self.max_batch_size, **all_kwargs))
            pbar.update(len(sub))
            if i < num_batches - 1:
                to_sleep = len(sub) * interval - (time.time() - start)
                if to_sleep > 0:
                    time.sleep(to_sleep)
        return out

    def _tokens_in_last_minute(self) -> int:
        now = time.time()
        while self._token_usage_history and self._token_usage_history[0][0] < now - 60:
            self._token_usage_history.popleft()
        return sum(t for _, t in self._token_usage_history)

    def _run_tpm_limited(self, batch, all_kwargs, pbar) -> list[Completion]:
        assert self.tpm_limit is not None
        budget_cap = int(self.tpm_limit * 0.95)  # 5% safety buffer
        estimates = []
        for i, msgs in enumerate(batch):
            est = self.count_tokens(msgs) + self.max_tokens
            if est > budget_cap:
                raise ValueError(
                    f"Row {i} estimated at {est} tokens exceeds the TPM limit with "
                    f"safety buffer ({budget_cap}); it can never be sent at this tier."
                )
            estimates.append(est)

        out: list[Completion] = []
        i = 0
        while i < len(batch):
            available = max(0, budget_cap - self._tokens_in_last_minute())
            sub, sub_est = [], 0
            while i < len(batch) and len(sub) < self.max_batch_size:
                if sub_est + estimates[i] <= available:
                    sub.append(batch[i])
                    sub_est += estimates[i]
                    i += 1
                else:
                    break
            if sub:
                start = time.time()
                comps = self.transport.complete_batch(self.model, sub, max_workers=len(sub), **all_kwargs)
                out.extend(comps)
                self._token_usage_history.append(
                    (start, sum(c.usage.total_tokens for c in comps))
                )
                pbar.update(len(sub))
                if self.rate_limit is not None:
                    to_sleep = len(sub) * (60.0 / self.rate_limit) - (time.time() - start)
                    if to_sleep > 0:
                        time.sleep(to_sleep)
            else:
                wait = 1.0
                if self._token_usage_history:
                    wait = max(0.1, self._token_usage_history[0][0] + 60.1 - time.time())
                pbar.set_postfix_str(f"TPM limit reached, waiting {wait:.1f}s")
                time.sleep(wait)
                pbar.set_postfix_str("")
        return out

    # ------------------------------------------------------------------ misc
    def _hash_messages(self, messages: list[dict[str, Any]], kwargs: dict[str, Any]) -> str:
        return hashlib.sha256((str(self.model) + str(messages) + str(kwargs)).encode()).hexdigest()

    def _extract_text(self, comp: Completion) -> str:
        if comp.finish_reason == "length":
            hint = (
                f'Raise the budget: settings.configure(lm=LM(model="{self.model}", '
                f"max_tokens={self.max_tokens * 2}))"
            )
            lotus_tpu.logger.warning(
                f"Completion from {self.model} truncated at max_tokens={self.max_tokens}. "
                + (
                    "This is a reasoning model: hidden reasoning tokens share this budget, "
                    f"so exhaustion can yield an empty answer. {hint}, or pass "
                    'reasoning_effort="minimal".'
                    if self.is_reasoning_model()
                    else hint
                )
            )
        return comp.text

    _LIMIT_FIELDS = (
        ("prompt_tokens", "prompt_tokens_limit"),
        ("completion_tokens", "completion_tokens_limit"),
        ("total_tokens", "total_tokens_limit"),
        ("total_cost", "total_cost_limit"),
    )

    def _check_limit(self, usage: LMStats.TotalUsage, limit: UsageLimit, kind: str) -> None:
        over = any(getattr(usage, u) > getattr(limit, cap) for u, cap in self._LIMIT_FIELDS)
        if over:
            raise LotusUsageLimitException(
                f"Usage limit exceeded. Current {kind} usage: {usage}, Limit: {limit}"
            )

    def _accumulate(self, total: LMStats.TotalUsage, comp: Completion) -> None:
        u = comp.usage
        total.prompt_tokens += u.prompt_tokens
        total.completion_tokens += u.completion_tokens
        total.total_tokens += u.total_tokens
        total.cached_prompt_tokens += u.cached_prompt_tokens
        total.cache_creation_tokens += u.cache_creation_tokens
        cost = comp.cost
        if cost is None:
            cost = calculate_cost(
                comp.model or self.model, u.prompt_tokens, u.completion_tokens, u.cached_prompt_tokens
            )
        if cost is not None:
            total.total_cost += cost

    def _update_stats(self, comp: Completion, is_cached: bool) -> None:
        self._accumulate(self.stats.virtual_usage, comp)
        self._check_limit(self.stats.virtual_usage, self.virtual_usage_limit, "virtual")
        if not is_cached:
            self._accumulate(self.stats.physical_usage, comp)
            self._check_limit(self.stats.physical_usage, self.physical_usage_limit, "physical")

    # -------------------------------------------------------------- logprobs
    def format_logprobs_for_cascade(self, logprobs: list[list[TokenLogprob]]) -> LogprobsForCascade:
        all_tokens, all_conf = [], []
        for resp in logprobs:
            all_tokens.append([lp.token for lp in resp])
            all_conf.append([math.exp(lp.logprob) for lp in resp])
        return LogprobsForCascade(tokens=all_tokens, confidences=all_conf)

    def format_logprobs_for_filter_cascade(
        self,
        logprobs: list[list[TokenLogprob]],
        output_tokens: tuple[str, str] = ("True", "False"),
    ) -> LogprobsForFilterCascade:
        pos_tok, neg_tok = output_tokens
        base = self.format_logprobs_for_cascade(logprobs)
        positive_probs: list[float] = []
        for resp_idx, resp in enumerate(logprobs):
            pos_prob: float | None = None
            for lp in resp:
                probs = {t.token: math.exp(t.logprob) for t in lp.top_logprobs}
                if pos_tok in probs and neg_tok in probs:
                    pos_prob = probs[pos_tok] / (probs[pos_tok] + probs[neg_tok])
                    break
            if pos_prob is None:
                pos_prob = 1.0 if pos_tok in base.tokens[resp_idx] else 0.0
            positive_probs.append(pos_prob)
        return LogprobsForFilterCascade(
            positive_probs=positive_probs, tokens=base.tokens, confidences=base.confidences
        )

    # ----------------------------------------------------------- tokenization
    def count_tokens(self, messages: list[dict[str, Any]] | str) -> int:
        if isinstance(messages, str):
            return self.tokenizer.count(messages)
        parts: list[str] = []
        for m in messages:
            content = m.get("content", "")
            if isinstance(content, str):
                parts.append(content)
            elif isinstance(content, list):
                # Multimodal content: count only text parts — stringifying
                # image parts would count base64 payloads as text and
                # inflate estimates ~1000x (breaking TPM limiting).
                for p in content:
                    if isinstance(p, dict) and p.get("type") == "text":
                        parts.append(str(p.get("text", "")))
            else:
                parts.append(str(content))
        return self.tokenizer.count("".join(parts))

    def encode_text(self, text: str) -> list[Any]:
        return self.tokenizer.encode(text)

    def decode_tokens(self, tokens: list[Any]) -> str:
        return self.tokenizer.decode(tokens)

    # ----------------------------------------------------------------- stats
    def print_total_usage(self) -> None:
        v, p = self.stats.virtual_usage, self.stats.physical_usage
        lines = [
            "",
            "=== Usage Statistics ===",
            "Virtual  = Total usage if no caching was used",
            "Physical = Actual usage with caching applied",
            "",
            f"Virtual Cost:     ${v.total_cost:,.6f}",
            f"Physical Cost:    ${p.total_cost:,.6f}",
            f"Virtual Tokens:   {v.total_tokens:,}",
            f"Physical Tokens:  {p.total_tokens:,}",
            f"Cache Hits:       {self.stats.cache_hits:,}",
            "",
        ]
        print("\n".join(lines))

    def reset_stats(self) -> None:
        self.stats = LMStats()

    def reset_cache(self, max_size: int | None = None) -> None:
        self.cache.reset(max_size)

    # ------------------------------------------------------------ model info
    def get_model_name(self) -> str:
        name = self.model.split("/")[-1] if self.model else ""
        return name.split(":")[0].lower()

    def is_deepseek(self) -> bool:
        return self.get_model_name().startswith("deepseek-r1")

    def is_reasoning_model(self) -> bool:
        name = self.get_model_name()
        return any(name.startswith(p) for p in _REASONING_PREFIXES)
