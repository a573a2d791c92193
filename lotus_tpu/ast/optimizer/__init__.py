"""LazyFrame optimizers."""

from lotus_tpu.ast.optimizer.base import BaseOptimizer
from lotus_tpu.ast.optimizer.cascade import CascadeOptimizer
from lotus_tpu.ast.optimizer.predicate_pushdown import PredicatePushdownOptimizer
from lotus_tpu.ast.optimizer.prompt_optimizer import GEPAOptimizer, PromptHillClimbOptimizer

DEFAULT_OPTIMIZERS: list[BaseOptimizer] = [PredicatePushdownOptimizer()]

__all__ = [
    "BaseOptimizer",
    "CascadeOptimizer",
    "DEFAULT_OPTIMIZERS",
    "GEPAOptimizer",
    "PromptHillClimbOptimizer",
    "PredicatePushdownOptimizer",
]
