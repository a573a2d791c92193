"""LazyFrame executor.

Role parity with ``lotus/ast/run.py`` (walk the node chain, memoise node
outputs content-addressably, materialise nested LazyFrame references), with
a different execution shape: the walk threads a single :class:`_Staged`
value (payload + fingerprint) through :meth:`_step`, and every cache
interaction lives in one place (:meth:`_memo`). Nested references resolve
through child runs that *share* this run's cache and hit/miss counters, so
a sub-pipeline referenced twice executes once.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable

import pandas as pd

from lotus_tpu.ast.cache import compute_cache_key, hash_dataframe, hash_result
from lotus_tpu.ast.lazyframe import LazyFrame
from lotus_tpu.ast.nodes import ApplyFnNode, BaseNode, SourceNode
from lotus_tpu.cache import Cache, CacheFactory

_NO_SOURCE = "__no_source__"


@dataclass
class _Staged:
    """The value flowing between nodes, with its content fingerprint."""

    payload: Any = None
    fingerprint: str = ""


class LazyFrameRun:
    """One execution of a LazyFrame: ``lf.run(df).execute()``; hit/miss
    counters are readable afterwards via :attr:`cache_stats`."""

    def __init__(
        self, lazyframe: LazyFrame, inputs: "pd.DataFrame | dict[LazyFrame, pd.DataFrame]", *,
        cache: Cache | None = None, node_runtime_configs: dict[str, Any] | None = None,
        cache_stats: dict[str, int] | None = None,
    ) -> None:
        self._lazyframe = lazyframe
        self._inputs: dict[LazyFrame, pd.DataFrame] = (
            inputs if isinstance(inputs, dict) else {lazyframe: inputs}
        )
        self._memo_store = cache if cache is not None else CacheFactory.create_default_cache(max_size=10_000)
        self._tally = cache_stats if cache_stats is not None else {"hits": 0, "misses": 0}
        self._runtime_configs = node_runtime_configs or {}

    @property
    def cache_stats(self) -> dict[str, int]:
        return dict(self._tally)

    @property
    def cache(self) -> Cache:
        """The content-addressed store backing this run (shareable across runs)."""
        return self._memo_store

    # -------------------------------------------------------------- sources
    def _input_for(self, node: SourceNode) -> pd.DataFrame | None:
        """Which run input feeds this source, if any.

        An explicitly bound df wins over the single-input convenience:
        a nested bound LazyFrame (e.g. a join's right side) must not
        silently receive the outer pipeline's input.
        """
        if node.lazyframe_ref is not None:
            bound = self._inputs.get(node.lazyframe_ref)
            if bound is not None:
                return bound
        if node.df is not None:
            return None
        if len(self._inputs) == 1:
            return next(iter(self._inputs.values()))
        return None

    def _emit_source(self, node: SourceNode) -> pd.DataFrame:
        fed = self._input_for(node)
        if fed is not None:
            return node(fed)
        if node.df is not None:
            return node()
        raise ValueError("No DataFrame provided for source")

    def _source_fingerprint(self, node: SourceNode) -> str:
        fed = self._input_for(node)
        if fed is not None:
            return hash_dataframe(fed)
        return hash_dataframe(node.df) if node.df is not None else _NO_SOURCE

    # ------------------------------------------------------------ resolution
    def _child_run(self, ref: LazyFrame) -> Any:
        """Execute a nested LazyFrame against the same cache + counters."""
        return LazyFrameRun(
            ref,
            self._inputs,
            cache=self._memo_store,
            node_runtime_configs=self._runtime_configs,
            cache_stats=self._tally,
        ).execute()

    def _resolve_ref(self, ref: Any) -> Any:
        """Materialise LazyFrame / SourceNode references, through containers."""
        if isinstance(ref, LazyFrame):
            return self._child_run(ref)
        if isinstance(ref, SourceNode):
            return self._emit_source(ref)
        if isinstance(ref, (list, tuple)):
            resolved = [self._resolve_ref(v) for v in ref]
            return type(ref)(resolved)
        if isinstance(ref, dict):
            return {k: self._resolve_ref(v) for k, v in ref.items()}
        return ref

    # ------------------------------------------------------------- stepping
    def _memo(self, key: str, produce: Callable[[], Any]) -> Any:
        held = self._memo_store.get(key)
        if held is not None:
            self._tally["hits"] += 1
            return held
        self._tally["misses"] += 1
        fresh = produce()
        self._memo_store.insert(key, fresh)
        return fresh

    def _step(self, staged: _Staged, node: BaseNode) -> _Staged:
        if isinstance(node, SourceNode):
            key = compute_cache_key(node, self._source_fingerprint(node))
            out = self._memo(key, lambda: self._emit_source(node))
        else:
            if staged.payload is None and not isinstance(node, ApplyFnNode):
                raise ValueError(
                    "LazyFrame has no source node. Use LazyFrame() so the pipeline "
                    "has a source by default, or ensure the first node is a source."
                )
            key = compute_cache_key(node, staged.fingerprint)
            out = self._memo(key, lambda: node(staged.payload, self._resolve_ref, **self._runtime_configs))
        return _Staged(out, hash_result(out))

    def execute(self) -> Any:
        staged = _Staged()
        for node in self._lazyframe._nodes:
            staged = self._step(staged, node)
        return staged.payload

    # --------------------------------------------------------- conveniences
    def __getattr__(self, name: str) -> Any:
        if name.startswith("_"):
            raise AttributeError(f"'{type(self).__name__}' object has no attribute '{name}'")
        return getattr(self.execute(), name)

    def __getitem__(self, key: Any) -> Any:
        return self.execute()[key]

    def __repr__(self) -> str:
        return f"LazyFrameRun({self._lazyframe!r})"
