"""Optimizer interface (parity: ``lotus/ast/optimizer/base.py:15-41``)."""

from __future__ import annotations

from abc import ABC, abstractmethod
from typing import TYPE_CHECKING

import pandas as pd

if TYPE_CHECKING:  # pragma: no cover
    from lotus_tpu.ast.lazyframe import LazyFrame
    from lotus_tpu.ast.nodes import BaseNode


class BaseOptimizer(ABC):
    """Transforms a node list to improve cost or quality."""

    requires_train_data: bool = False

    @abstractmethod
    def optimize(
        self,
        nodes: "list[BaseNode]",
        train_data: "dict[LazyFrame, pd.DataFrame] | pd.DataFrame | None" = None,
    ) -> "list[BaseNode]":
        """Return an optimized node list (may be unchanged)."""
