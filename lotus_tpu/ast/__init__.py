"""Lazy AST: LazyFrame builder, node types, runner, and optimizers."""

from lotus_tpu.ast.lazyframe import LazyFrame
from lotus_tpu.ast.run import LazyFrameRun
from lotus_tpu.ast import nodes
from lotus_tpu.ast.optimizer import (
    BaseOptimizer,
    CascadeOptimizer,
    DEFAULT_OPTIMIZERS,
    GEPAOptimizer,
    PredicatePushdownOptimizer,
    PromptHillClimbOptimizer,
)

__all__ = [
    "LazyFrame",
    "LazyFrameRun",
    "nodes",
    "BaseOptimizer",
    "CascadeOptimizer",
    "DEFAULT_OPTIMIZERS",
    "GEPAOptimizer",
    "PredicatePushdownOptimizer",
    "PromptHillClimbOptimizer",
]
