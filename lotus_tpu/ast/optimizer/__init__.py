"""LazyFrame optimizers.

``DEFAULT_OPTIMIZERS`` is what ``LazyFrame.optimize()`` applies when the
caller passes none; training-dependent optimizers (cascade pre-warm, prompt
search) are opt-in.
"""

from lotus_tpu.ast.optimizer.base import BaseOptimizer
from lotus_tpu.ast.optimizer.cascade import CascadeOptimizer
from lotus_tpu.ast.optimizer.predicate_pushdown import PredicatePushdownOptimizer
from lotus_tpu.ast.optimizer.prompt_optimizer import (
    GEPAOptimizer,
    PromptEvolutionOptimizer,
    PromptHillClimbOptimizer,
)

__all__ = [name for name in dir() if name.endswith("Optimizer")] + ["DEFAULT_OPTIMIZERS"]

DEFAULT_OPTIMIZERS: "list[BaseOptimizer]" = [PredicatePushdownOptimizer()]
