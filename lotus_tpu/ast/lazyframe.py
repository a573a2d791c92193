"""LazyFrame: immutable lazy pipeline builder.

Parity target: ``lotus/ast/lazyframe.py:83-933``.  Records semantic and
pandas operations as AST nodes; nothing executes until ``.execute()``.
Pandas interop goes through ``__getattr__`` -> PandasOpNode; joins/assign
may reference other LazyFrames, resolved recursively at run time.
"""

from __future__ import annotations

import pickle
from copy import deepcopy
from pathlib import Path
from typing import TYPE_CHECKING, Any, Callable

import pandas as pd

import lotus_tpu
from lotus_tpu.cache import Cache, CacheFactory
from lotus_tpu.types import CascadeArgs, LongContextStrategy, ReasoningStrategy

from lotus_tpu.ast.nodes import (
    ApplyFnNode,
    BaseNode,
    LLMAsJudgeNode,
    LoadSemIndexNode,
    PairwiseJudgeNode,
    PandasFilterNode,
    PandasOpNode,
    SemAggNode,
    SemClusterByNode,
    SemDedupNode,
    SemExtractNode,
    SemFilterNode,
    SemIndexNode,
    SemJoinNode,
    SemMapNode,
    SemPartitionByNode,
    SemSearchNode,
    SemSimJoinNode,
    SemTopKNode,
    SourceNode,
)

if TYPE_CHECKING:  # pragma: no cover
    from lotus_tpu.ast.optimizer.base import BaseOptimizer
    from lotus_tpu.ast.run import LazyFrameRun


class LazyFrame:
    """Immutable lazy DataFrame pipeline.

    Example::

        lf = LazyFrame().sem_filter("{text} is about sports").sem_map("Summarize {text}")
        result = lf.execute(df)
    """

    def __init__(
        self,
        df: pd.DataFrame | None = None,
        *,
        schema: dict[str, str] | None = None,
        _nodes: list[BaseNode] | None = None,
        _source: SourceNode | None = None,
        _default_cache: Cache | None = None,
    ) -> None:
        self._default_cache: Cache = _default_cache or CacheFactory.create_default_cache(max_size=10_000)
        if _nodes is None:
            # Fresh pipeline: a single source bound to this very LazyFrame.
            head = SourceNode(lazyframe_ref=self, df=df, expected_schema=schema)
            self._nodes: list[BaseNode] = [head]
            self._source: SourceNode | None = head
            return
        self._nodes = list(_nodes)
        if _source is not None:
            self._source = _source
        else:
            head = next(iter(self._nodes), None)
            self._source = head if isinstance(head, SourceNode) else None

    # ----------------------------------------------------------- internals
    def _append(self, node: BaseNode) -> "LazyFrame":
        return LazyFrame(_nodes=[*self._nodes, node], _source=self._source, _default_cache=self._default_cache)

    def _append_opt(self, node: BaseNode, mark_optimizable: list[str] | None) -> "LazyFrame":
        if mark_optimizable is not None:
            self._validate_optimizable_paths(node, mark_optimizable)
            node = node.model_copy(update={"optimizable_params": frozenset(mark_optimizable)})
        return self._append(node)

    @staticmethod
    def _split_args(args: tuple[Any, ...]) -> tuple[tuple[Any, ...], dict[str, "LazyFrame"]]:
        clean: list[Any] = []
        lf_args: dict[str, LazyFrame] = {}
        for i, a in enumerate(args):
            if isinstance(a, LazyFrame):
                lf_args[f"_lf_arg_{i}"] = a
                clean.append(None)
            else:
                clean.append(a)
        return tuple(clean), lf_args

    @staticmethod
    def _split_kwargs(kwargs: dict[str, Any]) -> tuple[dict[str, Any], dict[str, "LazyFrame"]]:
        clean: dict[str, Any] = {}
        lf_kwargs: dict[str, LazyFrame] = {}
        for k, v in kwargs.items():
            if isinstance(v, LazyFrame):
                lf_kwargs[f"_lf_kwarg_{k}"] = v
                clean[k] = None
            else:
                clean[k] = v
        return clean, lf_kwargs

    @staticmethod
    def _right_ref(right: "LazyFrame | pd.DataFrame") -> dict[str, Any]:
        """Join-node kwargs for the right side, whichever form it takes."""
        if isinstance(right, LazyFrame):
            return {"right_lf": right, "right_df": None}
        if isinstance(right, pd.DataFrame):
            return {"right_lf": None, "right_df": right}
        raise TypeError(f"right must be LazyFrame or DataFrame, got {type(right)}")

    def copy(self) -> "LazyFrame":
        """Deep copy; SourceNode.lazyframe_ref values are restored so input
        dicts keyed by the original LazyFrames still resolve."""
        copied = LazyFrame(_nodes=deepcopy(self._nodes), _default_cache=self._default_cache)
        self._restore_source_refs(self._nodes, copied._nodes)
        return copied

    @staticmethod
    def _restore_source_refs(original: Any, copied: Any) -> None:
        """Walk the original/copy trees in lockstep, re-pointing every copied
        SourceNode's lazyframe_ref at the original's (deepcopy clones it,
        which would break input dicts keyed by the original LazyFrame)."""

        def children(obj: Any, twin: Any) -> list[tuple[Any, Any]]:
            if isinstance(obj, LazyFrame):
                return [(obj._nodes, twin._nodes)]
            if isinstance(obj, BaseNode):
                return [
                    (getattr(obj, f, None), getattr(twin, f, None))
                    for f in type(obj).model_fields
                ]
            if isinstance(obj, (list, tuple)):
                return list(zip(obj, twin))
            if isinstance(obj, dict):
                return [(obj[k], twin[k]) for k in obj.keys() & twin.keys()]
            return []

        visited: set[tuple[int, int]] = set()
        queue: list[tuple[Any, Any]] = [(original, copied)]
        while queue:
            obj, twin = queue.pop()
            key = (id(obj), id(twin))
            if key in visited:
                continue
            visited.add(key)
            if isinstance(obj, SourceNode) and isinstance(twin, SourceNode):
                twin.lazyframe_ref = obj.lazyframe_ref
                continue
            if type(obj) is type(twin) or (
                isinstance(obj, (list, tuple)) and isinstance(twin, (list, tuple))
            ):
                queue.extend(children(obj, twin))

    # -------------------------------------------------------------- sources
    def add_source(self, df: pd.DataFrame | None = None, schema: dict[str, str] | None = None) -> "LazyFrame":
        """Replace the source node (bind a df and/or add schema validation)."""
        source = SourceNode(lazyframe_ref=self, df=df, expected_schema=schema)
        rest = self._nodes[1:] if len(self._nodes) > 1 else []
        return LazyFrame(_nodes=[source, *rest], _source=source, _default_cache=self._default_cache)

    # -------------------------------------------------- optimizable marking
    def mark_optimizable(self, node_idx: int, params: list[str]) -> "LazyFrame":
        """Mark parameters on a node for prompt optimization (empty list
        excludes the node)."""
        if not (0 <= node_idx < len(self._nodes)):
            raise IndexError(f"node_idx {node_idx} out of range for LazyFrame with {len(self._nodes)} nodes")
        node = self._nodes[node_idx]
        self._validate_optimizable_paths(node, params)
        new_nodes = list(self._nodes)
        new_nodes[node_idx] = node.model_copy(update={"optimizable_params": frozenset(params)})
        return LazyFrame(_nodes=new_nodes, _source=self._source, _default_cache=self._default_cache)

    @staticmethod
    def _validate_optimizable_paths(node: BaseNode, params: list[str]) -> None:
        bad = [p for p in params if not node.supports_optimizable_param(p)]
        if bad:
            raise ValueError(f"Node {type(node).__name__} does not support optimizable parameter path(s): {bad}")

    # ------------------------------------------------------ semantic builders
    def sem_filter(self, user_instruction: str, *, mark_optimizable: list[str] | None = None, **kwargs: Any) -> "LazyFrame":
        """Add a semantic filter operation."""
        return self._append_opt(SemFilterNode(user_instruction=user_instruction, **kwargs), mark_optimizable)

    @staticmethod
    def _build_with_overflow(node_cls: type[BaseNode], kwargs: dict[str, Any], **fixed: Any) -> BaseNode:
        """Instantiate a node, routing unknown kwargs into its model_kwargs."""
        declared = set(node_cls.model_fields) - {"model_kwargs", "optimizable_params"}
        overflow = {k: v for k, v in kwargs.items() if k not in declared}
        recognized = {k: v for k, v in kwargs.items() if k in declared}
        return node_cls(model_kwargs=overflow or None, **fixed, **recognized)

    def sem_map(self, user_instruction: str, *, mark_optimizable: list[str] | None = None, **kwargs: Any) -> "LazyFrame":
        """Add a semantic map operation.  Unknown kwargs become model kwargs."""
        node = self._build_with_overflow(SemMapNode, kwargs, user_instruction=user_instruction)
        return self._append_opt(node, mark_optimizable)

    def sem_extract(
        self, input_cols: list[str], output_cols: dict[str, str | None], *,
        mark_optimizable: list[str] | None = None, **kwargs: Any,
    ) -> "LazyFrame":
        """Add a semantic extract operation."""
        return self._append_opt(
            SemExtractNode(input_cols=input_cols, output_cols=output_cols, **kwargs), mark_optimizable
        )

    def sem_agg(self, user_instruction: str, *, mark_optimizable: list[str] | None = None, **kwargs: Any) -> "LazyFrame":
        """Add a semantic aggregation operation."""
        return self._append_opt(SemAggNode(user_instruction=user_instruction, **kwargs), mark_optimizable)

    def sem_topk(self, user_instruction: str, K: int, *, mark_optimizable: list[str] | None = None, **kwargs: Any) -> "LazyFrame":
        """Add a semantic top-k operation."""
        return self._append_opt(SemTopKNode(user_instruction=user_instruction, K=K, **kwargs), mark_optimizable)

    def sem_join(
        self, right: "LazyFrame | pd.DataFrame", join_instruction: str, *,
        mark_optimizable: list[str] | None = None, **kwargs: Any,
    ) -> "LazyFrame":
        """Add a semantic join; ``right`` may be a DataFrame or LazyFrame."""
        node = SemJoinNode(join_instruction=join_instruction, **self._right_ref(right), **kwargs)
        return self._append_opt(node, mark_optimizable)

    def sem_sim_join(
        self, right: "LazyFrame | pd.DataFrame", left_on: str, right_on: str, K: int, **kwargs: Any
    ) -> "LazyFrame":
        """Add a similarity join operation."""
        node = SemSimJoinNode(
            left_on=left_on, right_on=right_on, K=K, **self._right_ref(right), **kwargs
        )
        return self._append(node)

    def sem_search(self, col_name: str, query: str, *, mark_optimizable: list[str] | None = None, **kwargs: Any) -> "LazyFrame":
        """Add a semantic search operation."""
        return self._append_opt(SemSearchNode(col_name=col_name, query=query, **kwargs), mark_optimizable)

    def sem_index(self, col_name: str, index_dir: str) -> "LazyFrame":
        """Add a semantic index-build operation."""
        return self._append(SemIndexNode(col_name=col_name, index_dir=index_dir))

    def load_sem_index(self, col_name: str, index_dir: str) -> "LazyFrame":
        """Add a semantic index-load operation."""
        return self._append(LoadSemIndexNode(col_name=col_name, index_dir=index_dir))

    def sem_cluster_by(self, col_name: str, ncentroids: int, **kwargs: Any) -> "LazyFrame":
        """Add a semantic clustering operation."""
        return self._append(SemClusterByNode(col_name=col_name, ncentroids=ncentroids, **kwargs))

    def sem_dedup(self, col_name: str, threshold: float) -> "LazyFrame":
        """Add a semantic deduplication operation."""
        return self._append(SemDedupNode(col_name=col_name, threshold=threshold))

    def sem_partition_by(self, partition_fn: Callable[[pd.DataFrame], list[int]]) -> "LazyFrame":
        """Add a semantic partition operation."""
        return self._append(SemPartitionByNode(partition_fn=partition_fn))

    # ---------------------------------------------------------- eval builders
    def llm_as_judge(self, judge_instruction: str, *, mark_optimizable: list[str] | None = None, **kwargs: Any) -> "LazyFrame":
        """Add an LLM-as-judge evaluation."""
        node = self._build_with_overflow(LLMAsJudgeNode, kwargs, judge_instruction=judge_instruction)
        return self._append_opt(node, mark_optimizable)

    def pairwise_judge(
        self, col1: str, col2: str, judge_instruction: str, *,
        mark_optimizable: list[str] | None = None, **kwargs: Any,
    ) -> "LazyFrame":
        """Add a pairwise-judge evaluation."""
        node = self._build_with_overflow(
            PairwiseJudgeNode, kwargs, col1=col1, col2=col2, judge_instruction=judge_instruction
        )
        return self._append_opt(node, mark_optimizable)

    # --------------------------------------------------------- pandas interop
    def filter(self, predicate: Callable[[pd.DataFrame], pd.Series]) -> "LazyFrame":
        """Add a pandas boolean filter."""
        return self._append(PandasFilterNode(predicate=predicate))

    def _record_pandas_call(self, method_name: str, args: tuple[Any, ...], kwargs: dict[str, Any]) -> "LazyFrame":
        """Defer a pandas method call as a PandasOpNode (LazyFrame-valued
        arguments move into the lf_args/lf_kwargs side tables)."""
        clean_args, lf_args = self._split_args(args)
        clean_kwargs, lf_kwargs = self._split_kwargs(kwargs)
        return self._append(
            PandasOpNode(
                op_name=method_name, args=clean_args, kwargs=clean_kwargs or None,
                is_attr=False, lf_args=lf_args or None, lf_kwargs=lf_kwargs or None,
            )
        )

    def __getattr__(self, name: str) -> Any:
        unknown = AttributeError(f"'{type(self).__name__}' object has no attribute '{name}'")
        if name.startswith("_") or not hasattr(pd.DataFrame, name):
            raise unknown
        if not callable(getattr(pd.DataFrame, name)):
            return self._append(PandasOpNode(op_name=name, is_attr=True))

        def defer(*args: Any, **kwargs: Any) -> "LazyFrame":
            return self._record_pandas_call(name, args, kwargs)

        return defer

    def __getitem__(self, key: Any) -> "LazyFrame":
        # A callable key is a predicate (df[lambda d: ...]); anything else is
        # a plain subscript deferred to execution time.
        return self.filter(key) if callable(key) else self._append(
            PandasOpNode(op_name="__getitem__", args=(key,))
        )

    def __setitem__(self, key: str, value: Any) -> None:
        # In-place exception to immutability, mirroring df[col] = value.
        if isinstance(value, LazyFrame):
            node = PandasOpNode(op_name="assign", kwargs={key: None}, lf_kwargs={f"_lf_kwarg_{key}": value})
        else:
            node = PandasOpNode(op_name="assign", kwargs={key: value})
        self._nodes.append(node)

    def assign(self, **kwargs: Any) -> "LazyFrame":
        """Assign columns; values may be scalars, callables, or LazyFrames."""
        clean, lf_kwargs = self._split_kwargs(kwargs)
        return self._append(
            PandasOpNode(op_name="assign", kwargs=clean or None, lf_kwargs=lf_kwargs or None)
        )

    # ------------------------------------------------------------ fn/concat
    @classmethod
    def from_fn(cls, fn: Callable[..., Any], *args: Any, **kwargs: Any) -> "LazyFrame":
        """Create a LazyFrame that applies a callable to resolved inputs."""
        return cls(_nodes=[ApplyFnNode(fn=fn, args=args, kwargs=kwargs or None)], _source=None)

    @classmethod
    def concat(cls, objs: "list[LazyFrame] | LazyFrame", **kwargs: Any) -> "LazyFrame":
        """Concatenate LazyFrame results via pd.concat."""
        objs = [objs] if isinstance(objs, LazyFrame) else list(objs)
        return cls.from_fn(pd.concat, objs, **kwargs)

    # ------------------------------------------------------------- execution
    def run(
        self, inputs: "pd.DataFrame | dict[LazyFrame, pd.DataFrame]", *, cache: Cache | None = None
    ) -> "LazyFrameRun":
        """Create a LazyFrameRun for this pipeline."""
        from lotus_tpu.ast.run import LazyFrameRun

        bound = inputs if isinstance(inputs, dict) else {self: inputs}
        return LazyFrameRun(self, bound, cache=cache or self._default_cache)

    def execute(
        self, inputs: "pd.DataFrame | dict[LazyFrame, pd.DataFrame]", *, cache: Cache | None = None
    ) -> Any:
        """Execute the pipeline and return the result."""
        return self.run(inputs, cache=cache).execute()

    # ------------------------------------------------------------ persistence
    def save(self, path: "str | Path") -> None:
        """Pickle the node list to a file (not portable if custom callables
        are referenced)."""
        target = Path(path)
        target.parent.mkdir(parents=True, exist_ok=True)
        target.write_bytes(pickle.dumps({"nodes": self._nodes, "source": self._source}))

    @classmethod
    def load(cls, path: "str | Path") -> "LazyFrame":
        """Load a pipeline previously written by save()."""
        payload = pickle.loads(Path(path).read_bytes())  # noqa: S301
        return cls(_nodes=payload["nodes"], _source=payload["source"])

    # ------------------------------------------------------------ optimization
    def optimize(
        self,
        optimizers: "list[BaseOptimizer]" = [],
        *,
        inplace: bool = False,
        train_data: "pd.DataFrame | dict[LazyFrame, pd.DataFrame] | None" = None,
        auto_include_default_optimizers: bool = True,
    ) -> "LazyFrame":
        """Apply optimizers (predicate pushdown by default, plus any given)."""
        from lotus_tpu.ast.optimizer import DEFAULT_OPTIMIZERS

        all_optimizers = (DEFAULT_OPTIMIZERS + optimizers) if auto_include_default_optimizers else optimizers
        if not all_optimizers:
            lotus_tpu.logger.warning("LazyFrame.optimize: no optimizers provided, returning original LazyFrame")
            return self if inplace else self.copy()

        nodes = self._nodes[:]
        for opt in all_optimizers:
            nodes = opt.optimize(nodes, train_data=train_data)

        if inplace:
            self._nodes = nodes
            return self
        return LazyFrame(_nodes=nodes, _source=self._source, _default_cache=self._default_cache)

    # --------------------------------------------------------------- display
    def __repr__(self) -> str:
        return f"LazyFrame(nodes={len(self._nodes)})"

    def __len__(self) -> int:
        return len(self._nodes)

    def show(self) -> str:
        """Render the pipeline as an ASCII tree (latest op first)."""
        if not self._nodes:
            return "LazyFrame()"
        step = "    "
        out: list[str] = []

        def emit(text: str, depth: int, bullet: bool) -> None:
            out.append(f"{step * depth}{'-- ' if bullet else ''}{text}")

        def render(idx: int, depth: int) -> None:
            node = self._nodes[idx]
            emit(node.signature(), depth, bullet=depth > 0)
            branches = isinstance(node, (SemJoinNode, SemSimJoinNode))
            if branches and idx > 0:
                emit("current LazyFrame", depth + 1, bullet=True)
                render(idx - 1, depth + 2)
            for label, child in node.child_lfs():
                emit(label, depth + 1, bullet=True)
                if hasattr(child, "show"):
                    out.extend(step * (depth + 2) + row for row in child.show().splitlines())
                elif isinstance(child, SourceNode):
                    emit(child.signature(), depth + 2, bullet=False)
            if not branches and idx > 0:
                render(idx - 1, depth + 1)

        render(len(self._nodes) - 1, 0)
        return "\n".join(out)

    def print_tree(self) -> None:
        print(self.show())
