"""Optimizer interface (parity: ``lotus/ast/optimizer/base.py:15-41``)."""

from __future__ import annotations

import abc
import typing

if typing.TYPE_CHECKING:  # pragma: no cover
    import pandas as pd

    from lotus_tpu.ast.lazyframe import LazyFrame
    from lotus_tpu.ast.nodes import BaseNode

    # Either one training frame, or a mapping of source-LazyFrame -> frame.
    TrainData = dict["LazyFrame", "pd.DataFrame"] | pd.DataFrame | None
    NodeList = list[BaseNode]
else:
    TrainData = object
    NodeList = list


class BaseOptimizer(abc.ABC):
    """Transforms a node list to improve cost or quality."""

    requires_train_data: bool = False

    @abc.abstractmethod
    def optimize(self, nodes: NodeList, train_data: TrainData = None) -> NodeList:
        """Return an optimized node list (may be unchanged)."""
