"""Cascade pre-warm optimizer (parity: ``lotus/ast/optimizer/cascade.py:24-77``).

Runs the pipeline once on training data with ``update_cascade_args=True``;
cascade-capable nodes self-store the thresholds they learn, so later runs
skip the learning sample.
"""

from __future__ import annotations

import lotus_tpu
from lotus_tpu.ast.optimizer.base import BaseOptimizer, NodeList, TrainData


class CascadeOptimizer(BaseOptimizer):
    requires_train_data: bool = True

    def optimize(self, nodes: NodeList, train_data: TrainData = None) -> NodeList:
        from lotus_tpu.ast.lazyframe import LazyFrame
        from lotus_tpu.ast.run import LazyFrameRun

        if train_data is None:
            raise ValueError(
                "CascadeOptimizer requires train_data. Pass it via "
                "lf.optimize([optimizer], train_data=...)."
            )
        tmp = LazyFrame(_nodes=nodes)
        try:
            LazyFrameRun(tmp, train_data, node_runtime_configs={"update_cascade_args": True}).execute()
        except Exception as e:  # forgiving, like the reference
            lotus_tpu.logger.warning(f"CascadeOptimizer: execution failed ({e}), returning nodes unchanged.")
        return nodes
