"""Tokenizer seam for the LM client.

The reference counts/encodes/decodes through litellm's tokenizer registry
(``lotus/models/lm.py:613-640``).  Without litellm we guarantee a weaker but
sufficient contract: ``decode(encode(text)[:n])`` is a prefix of ``text`` and
``count(text) == len(encode(text))`` — which is exactly what the
long-context truncate/chunk machinery needs to be correct.  Users can pass a
real HF ``tokenizers.Tokenizer`` for provider-exact counts.
"""

from __future__ import annotations

import re
from typing import Any, Protocol, runtime_checkable


@runtime_checkable
class TokenizerLike(Protocol):
    def encode(self, text: str) -> list[Any]: ...
    def decode(self, tokens: list[Any]) -> str: ...
    def count(self, text: str) -> int: ...


class ApproxTokenizer:
    """Deterministic approximate tokenizer: word pieces capped at ~4 chars.

    Splits on whitespace boundaries and breaks long words into 4-char
    chunks — roughly matching BPE token counts for English text, with an
    exact encode/decode round trip.
    """

    _pattern = re.compile(r"\s+|\S{1,4}")

    def encode(self, text: str) -> list[str]:
        return self._pattern.findall(text)

    def decode(self, tokens: list[str]) -> str:
        return "".join(tokens)

    def count(self, text: str) -> int:
        return len(self.encode(text))


class HFTokenizerAdapter:
    """Wraps a HuggingFace ``tokenizers.Tokenizer``."""

    def __init__(self, tokenizer: Any):
        self._tok = tokenizer

    def encode(self, text: str) -> list[int]:
        return list(self._tok.encode(text, add_special_tokens=False).ids)

    def decode(self, tokens: list[int]) -> str:
        return self._tok.decode(list(tokens))

    def count(self, text: str) -> int:
        return len(self.encode(text))


class TransformersTokenizerAdapter:
    """Wraps a transformers PreTrainedTokenizer(Fast)."""

    def __init__(self, tokenizer: Any):
        self._tok = tokenizer

    def encode(self, text: str) -> list[int]:
        return list(self._tok.encode(text, add_special_tokens=False))

    def decode(self, tokens: list[int]) -> str:
        return self._tok.decode(list(tokens))

    def count(self, text: str) -> int:
        return len(self.encode(text))


def wrap_tokenizer(tokenizer: Any) -> TokenizerLike:
    """Adapt a user-provided tokenizer into the TokenizerLike protocol."""
    if isinstance(tokenizer, TokenizerLike) and not hasattr(tokenizer, "encode_batch"):
        # Already conforms (and is not a raw HF tokenizers.Tokenizer, which
        # would pass the structural check but returns Encoding objects).
        if hasattr(tokenizer, "count"):
            return tokenizer
    # HF tokenizers.Tokenizer: encode() returns an Encoding with .ids
    if hasattr(tokenizer, "encode") and hasattr(tokenizer, "decode"):
        try:
            enc = tokenizer.encode("probe", add_special_tokens=False)
        except TypeError:
            enc = tokenizer.encode("probe")
        if hasattr(enc, "ids"):
            return HFTokenizerAdapter(tokenizer)
        if isinstance(enc, list):
            return TransformersTokenizerAdapter(tokenizer)
    raise TypeError(f"Cannot adapt tokenizer of type {type(tokenizer)}")
