"""The shared type vocabulary of lotus_tpu.

Covers the same public surface as the reference framework's ``lotus/types.py``
(every name an operator or model returns or accepts), organised differently:
the per-operator output payloads derive from small shared bases instead of
repeating field triples, usage accounting does its arithmetic generically
over dataclass fields, and nothing here depends on litellm — token-logprob
payloads use our own :class:`TokenLogprob`, duck-type compatible with
litellm's ``ChatCompletionTokenLogprob``.
"""

from __future__ import annotations

import dataclasses
import operator
from dataclasses import dataclass, field
from enum import Enum, auto
from typing import Any, Callable, Literal

import pandas as pd
from pydantic import BaseModel, ConfigDict, model_validator

# =========================================================================
# Token-level LM outputs
# =========================================================================


@dataclass
class TopLogprob:
    token: str
    logprob: float


@dataclass
class TokenLogprob:
    """One generated token: its logprob plus the top alternatives."""

    token: str
    logprob: float
    top_logprobs: list[TopLogprob] = field(default_factory=list)


@dataclass
class LMOutput:
    outputs: list[str]
    logprobs: list[list[TokenLogprob]] | None = None


@dataclass
class LogprobsForCascade:
    tokens: list[list[str]]
    confidences: list[list[float]]


@dataclass
class LogprobsForFilterCascade:
    positive_probs: list[float]
    tokens: list[list[str]]
    confidences: list[list[float]]


# =========================================================================
# Usage accounting
# =========================================================================


def _fieldwise(a: Any, b: Any, op: Callable[[Any, Any], Any]) -> Any:
    """Apply ``op`` to every dataclass field pairwise (same type in and out)."""
    merged = {f.name: op(getattr(a, f.name), getattr(b, f.name)) for f in dataclasses.fields(a)}
    return type(a)(**merged)


@dataclass
class LMStats:
    """Token/cost accounting, split into virtual vs physical views.

    *Virtual* usage counts every request as if nothing were cached — the
    cost the workload represents. *Physical* usage is what actually hit the
    provider after cache hits. (Same split as the reference's LMStats.)
    """

    @dataclass
    class TotalUsage:
        prompt_tokens: int = 0
        completion_tokens: int = 0
        total_tokens: int = 0
        total_cost: float = 0.0
        cached_prompt_tokens: int = 0  # prompt-cache hits, billed cheaper
        cache_creation_tokens: int = 0  # one-time cache-write tokens

        def __add__(self, other: "LMStats.TotalUsage") -> "LMStats.TotalUsage":
            return _fieldwise(self, other, operator.add)

        def __sub__(self, other: "LMStats.TotalUsage") -> "LMStats.TotalUsage":
            return _fieldwise(self, other, operator.sub)

    virtual_usage: TotalUsage = field(default_factory=TotalUsage)
    physical_usage: TotalUsage = field(default_factory=TotalUsage)
    cache_hits: int = 0
    operator_cache_hits: int = 0

    def __add__(self, other: "LMStats") -> "LMStats":
        return _fieldwise(self, other, operator.add)


@dataclass
class UsageLimit:
    prompt_tokens_limit: float = float("inf")
    completion_tokens_limit: float = float("inf")
    total_tokens_limit: float = float("inf")
    total_cost_limit: float = float("inf")


# =========================================================================
# Operator output payloads
# =========================================================================
# Map/extract/filter postprocessing all produce the same (raw, parsed,
# explanation) triple; only the parsed element type differs. The *Output
# and *PostprocessOutput pairs are kept as distinct names for API parity.


@dataclass
class _TextTriple:
    raw_outputs: list[str]
    outputs: list[str]
    explanations: list[str | None]


@dataclass
class _ExtractTriple:
    raw_outputs: list[str]
    outputs: list[dict[str, str]]
    explanations: list[str | None]


@dataclass
class _BoolTriple:
    raw_outputs: list[str]
    outputs: list[bool]
    explanations: list[str | None]


class SemanticMapPostprocessOutput(_TextTriple):
    pass


class SemanticMapOutput(_TextTriple):
    pass


class SemanticExtractPostprocessOutput(_ExtractTriple):
    pass


class SemanticExtractOutput(_ExtractTriple):
    pass


class SemanticFilterPostprocessOutput(_BoolTriple):
    pass


@dataclass
class SemanticFilterOutput(_BoolTriple):
    stats: dict[str, Any] | None = None
    logprobs: list[list[TokenLogprob]] | None = None


@dataclass
class SemanticAggOutput:
    outputs: list[str]


@dataclass
class SemanticJoinOutput:
    join_results: list[tuple[int, int, str | None]]
    filter_outputs: list[bool]
    all_raw_outputs: list[str]
    all_explanations: list[str | None]
    stats: dict[str, Any] | None = None


@dataclass
class SemanticTopKOutput:
    indexes: list[int]
    stats: dict[str, Any] | None = None


# =========================================================================
# Retrieval / reranking payloads
# =========================================================================


@dataclass
class RMOutput:
    """K-NN search payload: per-query scores and row positions.

    Indices are row positions in the indexed collection; ``-1`` marks a
    missing / padded hit (same contract as the reference).
    """

    distances: list[list[float]]
    indices: list[list[int]]


@dataclass
class RerankerOutput:
    indices: list[int]


# =========================================================================
# Strategy / configuration enums
# =========================================================================


class ReasoningStrategy(Enum):
    DEFAULT = auto()
    COT = auto()
    ZS_COT = auto()
    FEW_SHOT = auto()


class LongContextStrategy(Enum):
    """How aggregation fits over-long documents into the context window."""

    TRUNCATE = auto()
    CHUNK = auto()


class SerializationFormat(Enum):
    JSON = "json"
    XML = "xml"
    DEFAULT = "default"


class ProxyModel(Enum):
    HELPER_LM = "helper_lm"
    EMBEDDING_MODEL = "embedding_model"


# =========================================================================
# Cascade configuration
# =========================================================================


def _paired_thresholds(pos: float | None, neg: float | None, label: str) -> None:
    """Both-or-neither, and positive >= negative."""
    if (pos is None) != (neg is None):
        raise ValueError(f"{label}_pos_cascade_threshold and {label}_neg_cascade_threshold must be provided together.")
    if pos is not None and neg is not None and pos < neg:
        raise ValueError(f"{label}_pos_cascade_threshold must be >= {label}_neg_cascade_threshold.")


class CascadeArgs(BaseModel):
    """Every knob a model cascade reads (filter and join variants).

    Keyword-constructed; grouped below by which stage consumes them.
    """

    model_config = ConfigDict(arbitrary_types_allowed=True)

    # Accuracy guarantees the learned thresholds must satisfy.
    recall_target: float = 0.8
    precision_target: float = 0.8
    failure_probability: float = 0.2

    # Threshold-learning sample.
    sampling_percentage: float = 0.1
    cascade_IS_weight: float = 0.9
    cascade_IS_max_sample_range: int = 200
    cascade_IS_random_seed: int | None = None
    cascade_num_calibration_quantiles: int = 50

    # Proxy scorer selection + its optional prompt overrides.
    proxy_model: ProxyModel = ProxyModel.HELPER_LM
    helper_filter_instruction: str | None = None
    map_instruction: str | None = None
    map_examples: pd.DataFrame | None = None

    # Pre-learned filter thresholds (both or neither).
    filter_pos_cascade_threshold: float | None = None
    filter_neg_cascade_threshold: float | None = None

    # Join-specific: plan pinning, size gate, pre-learned thresholds.
    join_cascade_strategy: Literal["search_filter", "map_search_filter"] | None = None
    min_join_cascade_size: int = 100
    join_cascade_pos_threshold: float | None = None
    join_cascade_neg_threshold: float | None = None

    @model_validator(mode="after")
    def _validate_thresholds(self) -> "CascadeArgs":
        _paired_thresholds(self.filter_pos_cascade_threshold, self.filter_neg_cascade_threshold, "filter")
        if self.join_cascade_strategy is not None:
            if self.join_cascade_pos_threshold is None or self.join_cascade_neg_threshold is None:
                raise ValueError(
                    "join_cascade_strategy requires join_cascade_pos_threshold and join_cascade_neg_threshold."
                )
            if self.join_cascade_pos_threshold < self.join_cascade_neg_threshold:
                raise ValueError("join_cascade_pos_threshold must be >= join_cascade_neg_threshold.")
        return self


# =========================================================================
# Exceptions
# =========================================================================


class LotusException(Exception):
    """Base class for all lotus_tpu exceptions."""


class LotusUsageLimitException(LotusException):
    """Raised when a usage limit is exceeded."""
