"""Deterministic fakes for offline tests and benchmarks.

The reference's house testing pattern injects scripted models at protocol
seams (SURVEY.md §4, e.g. ``tests/test_agentic_map_reduce.py:20-33``); these
fakes serve the same role for the LM transport and RM interfaces.
"""

from __future__ import annotations

import hashlib
import math
import re
from typing import Any, Callable, Optional

import numpy as np
from numpy.typing import NDArray

from lotus_tpu.models.lm import LM
from lotus_tpu.models.rm import RM
from lotus_tpu.models.transport import Completion, CompletionUsage
from lotus_tpu.types import TokenLogprob, TopLogprob


def _default_usage(messages: list[dict[str, Any]], text: str) -> CompletionUsage:
    p = sum(len(str(m.get("content", ""))) // 4 for m in messages)
    c = max(1, len(text) // 4)
    return CompletionUsage(prompt_tokens=p, completion_tokens=c, total_tokens=p + c)


class FakeTransport:
    """Scriptable transport.

    Args:
        responder: fn(prompt_text, messages, **kwargs) -> str | Completion.
            Defaults to echoing the last user message.
        positive_prob: if set, attach True/False top-logprobs with this
            positive probability (for filter-cascade tests).
    """

    def __init__(
        self,
        responder: Optional[Callable[..., Any]] = None,
        positive_prob: Optional[Callable[[str], float] | float] = None,
    ):
        self.responder = responder
        self.positive_prob = positive_prob
        self.calls: list[list[dict[str, Any]]] = []

    def _one(self, messages: list[dict[str, Any]], **kwargs: Any) -> Completion:
        self.calls.append(messages)
        prompt = ""
        for m in messages:
            if m.get("role") == "user":
                content = m.get("content", "")
                prompt = content if isinstance(content, str) else str(content)
        if self.responder is not None:
            out = self.responder(prompt, messages, **kwargs)
        else:
            out = prompt
        if isinstance(out, Completion):
            comp = out
        else:
            comp = Completion(text=str(out), model="fake")
        if comp.usage.total_tokens == 0:
            comp.usage = _default_usage(messages, comp.text)

        if kwargs.get("logprobs") and comp.logprobs is None:
            p = self.positive_prob
            if callable(p):
                p = p(prompt)
            if p is None:
                p = 0.9 if comp.text.strip().lower().startswith("true") else 0.1
            p = min(max(float(p), 1e-6), 1 - 1e-6)
            comp.logprobs = [
                TokenLogprob(
                    token=comp.text.split()[0] if comp.text.split() else "",
                    logprob=math.log(max(p, 1 - p)),
                    top_logprobs=[
                        TopLogprob(token="True", logprob=math.log(p)),
                        TopLogprob(token="False", logprob=math.log(1 - p)),
                    ],
                )
            ]
        return comp

    def complete_batch(
        self, model: str, messages_batch: list[list[dict[str, Any]]], max_workers: int = 64, **kwargs: Any
    ) -> list[Completion]:
        return [self._one(m, **kwargs) for m in messages_batch]


def make_fake_lm(
    responder: Optional[Callable[..., Any]] = None,
    positive_prob: Any = None,
    **lm_kwargs: Any,
) -> LM:
    """LM wired to a FakeTransport — no network, fully deterministic."""
    transport = FakeTransport(responder=responder, positive_prob=positive_prob)
    lm = LM(model="fake/offline", transport=transport, **lm_kwargs)
    return lm


class HashRM(RM):
    """Deterministic pseudo-embedding model.

    Each document maps to a fixed random unit vector seeded by its SHA-256,
    plus a bag-of-words component so *similar texts get similar vectors* —
    enough structure for retrieval-operator tests without any model weights.
    """

    def __init__(self, dim: int = 64, word_weight: float = 1.0):
        self.dim = dim
        self.word_weight = word_weight

    def _word_vec(self, word: str) -> NDArray[np.float64]:
        seed = int.from_bytes(hashlib.sha256(word.lower().encode()).digest()[:8], "little")
        rng = np.random.default_rng(seed)
        v = rng.standard_normal(self.dim)
        return v / np.linalg.norm(v)

    def _embed(self, docs: list[str]) -> NDArray[np.float64]:
        out = np.zeros((len(docs), self.dim), dtype=np.float32)
        for i, doc in enumerate(docs):
            words = re.findall(r"\w+", str(doc).lower())
            if not words:
                words = [""]
            v = np.sum([self._word_vec(w) for w in words], axis=0)
            norm = np.linalg.norm(v)
            out[i] = v / norm if norm > 0 else v
        return out
