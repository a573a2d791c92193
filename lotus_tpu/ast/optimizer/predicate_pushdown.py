"""Predicate pushdown (parity: ``lotus/ast/optimizer/predicate_pushdown.py:22-88``).

Bubbles cheap pandas filters backwards past consecutive sem_filter nodes —
safe because sem_filter only removes rows, never adds or renames columns.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

import pandas as pd

import lotus_tpu
from lotus_tpu.ast.nodes import BaseNode, PandasFilterNode, SemFilterNode
from lotus_tpu.ast.optimizer.base import BaseOptimizer

if TYPE_CHECKING:  # pragma: no cover
    from lotus_tpu.ast.lazyframe import LazyFrame


class PredicatePushdownOptimizer(BaseOptimizer):
    requires_train_data: bool = False

    def optimize(
        self,
        nodes: "list[BaseNode]",
        train_data: "dict[LazyFrame, pd.DataFrame] | pd.DataFrame | None" = None,
    ) -> "list[BaseNode]":
        nodes = list(nodes)
        pushes = 0
        for i in range(len(nodes)):
            if isinstance(nodes[i], PandasFilterNode):
                j = i
                while j > 0 and isinstance(nodes[j - 1], SemFilterNode):
                    nodes[j], nodes[j - 1] = nodes[j - 1], nodes[j]
                    j -= 1
                    pushes += 1
        if pushes:
            lotus_tpu.logger.debug(f"PredicatePushdownOptimizer: pushed {pushes} filter(s) earlier")
        return nodes
