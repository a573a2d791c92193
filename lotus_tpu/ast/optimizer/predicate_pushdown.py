"""Predicate pushdown (parity: ``lotus/ast/optimizer/predicate_pushdown.py:22-88``).

Cheap pandas filters are hoisted ahead of the run of semantic filters they
follow — safe because sem_filter only removes rows, never adds or renames
columns, so the pandas predicate sees the same columns either way.
"""

from __future__ import annotations

import lotus_tpu
from lotus_tpu.ast.nodes import PandasFilterNode, SemFilterNode
from lotus_tpu.ast.optimizer.base import BaseOptimizer, NodeList, TrainData


class PredicatePushdownOptimizer(BaseOptimizer):
    requires_train_data: bool = False

    def optimize(self, nodes: NodeList, train_data: TrainData = None) -> NodeList:
        out: NodeList = []
        hoisted = 0
        for node in nodes:
            if isinstance(node, PandasFilterNode):
                # Find where the contiguous sem_filter run above us begins and
                # splice the pandas filter in just before it.
                at = len(out)
                while at > 0 and isinstance(out[at - 1], SemFilterNode):
                    at -= 1
                hoisted += len(out) - at
                out.insert(at, node)
            else:
                out.append(node)
        if hoisted:
            lotus_tpu.logger.debug(f"PredicatePushdownOptimizer: hoisted past {hoisted} sem_filter(s)")
        return out
