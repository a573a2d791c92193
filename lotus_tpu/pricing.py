"""Model pricing: cost per completion.

The reference delegates to litellm's pricing DB (``lotus/pricing.py:10-34``).
Here litellm is optional, so we keep a small static table for common models
(USD per 1M tokens), allow user registration, and fall back to litellm's
``completion_cost`` when it is installed and knows the model.
"""

from __future__ import annotations

from typing import Any, Optional

# (input $/1M, cached-input $/1M, output $/1M)
_PRICES: dict[str, tuple[float, float, float]] = {
    "gpt-4o": (2.50, 1.25, 10.00),
    "gpt-4o-mini": (0.15, 0.075, 0.60),
    "gpt-4.1": (2.00, 0.50, 8.00),
    "gpt-4.1-mini": (0.40, 0.10, 1.60),
    "gpt-4.1-nano": (0.10, 0.025, 0.40),
    "gpt-5": (1.25, 0.125, 10.00),
    "gpt-5-mini": (0.25, 0.025, 2.00),
    "gpt-5-nano": (0.05, 0.005, 0.40),
    "o3": (2.00, 0.50, 8.00),
    "o4-mini": (1.10, 0.275, 4.40),
    "claude-3-5-haiku": (0.80, 0.08, 4.00),
    "claude-haiku-4-5": (1.00, 0.10, 5.00),
    "claude-sonnet-4": (3.00, 0.30, 15.00),
    "claude-sonnet-4-5": (3.00, 0.30, 15.00),
    "claude-opus-4": (15.00, 1.50, 75.00),
    "gemini-2.5-flash": (0.30, 0.075, 2.50),
    "gemini-2.5-pro": (1.25, 0.31, 10.00),
}


def register_model_pricing(
    model: str, input_per_m: float, output_per_m: float, cached_input_per_m: Optional[float] = None
) -> None:
    """Register or override pricing for a model (USD per 1M tokens)."""
    if cached_input_per_m is None:
        cached_input_per_m = input_per_m / 2
    _PRICES[_normalize(model)] = (input_per_m, cached_input_per_m, output_per_m)


def _normalize(model: str) -> str:
    name = model.split("/")[-1].lower()
    if ":" in name:
        name = name.split(":")[0]
    return name


def _lookup(model: str) -> Optional[tuple[float, float, float]]:
    name = _normalize(model)
    if name in _PRICES:
        return _PRICES[name]
    # Prefix match handles dated releases like gpt-4o-mini-2024-07-18.
    for key, price in sorted(_PRICES.items(), key=lambda kv: -len(kv[0])):
        if name.startswith(key):
            return price
    return None


def calculate_cost(
    model: str,
    prompt_tokens: int,
    completion_tokens: int,
    cached_prompt_tokens: int = 0,
) -> Optional[float]:
    """Cost in USD, or None if the model's pricing is unknown."""
    price = _lookup(model)
    if price is None:
        return None
    in_p, cached_p, out_p = price
    uncached = max(prompt_tokens - cached_prompt_tokens, 0)
    return (uncached * in_p + cached_prompt_tokens * cached_p + completion_tokens * out_p) / 1e6


def calculate_cost_from_response(response: Any) -> Optional[float]:
    """Cost for a provider response object; tries litellm first."""
    try:
        from litellm import completion_cost  # type: ignore

        cost = completion_cost(completion_response=response)
        if cost:
            return float(cost)
    except Exception:
        pass
    usage = getattr(response, "usage", None)
    model = getattr(response, "model", "") or ""
    if usage is None:
        return None
    details = getattr(usage, "prompt_tokens_details", None)
    cached = 0
    if details is not None:
        cached = (details.get("cached_tokens", 0) if isinstance(details, dict)
                  else getattr(details, "cached_tokens", 0)) or 0
    return calculate_cost(
        model,
        getattr(usage, "prompt_tokens", 0) or 0,
        getattr(usage, "completion_tokens", 0) or 0,
        cached,
    )
