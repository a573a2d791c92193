"""LazyFrame execution engine with shared content-addressable caching.

Parity target: ``lotus/ast/run.py:24-176``.  Sequential node walk; a
recursive resolver materialises nested LazyFrame references through
sub-runs that share this run's cache and stats.
"""

from __future__ import annotations

from typing import Any

import pandas as pd

from lotus_tpu.cache import Cache, CacheFactory

from lotus_tpu.ast.cache import compute_cache_key, hash_dataframe, hash_result
from lotus_tpu.ast.lazyframe import LazyFrame
from lotus_tpu.ast.nodes import ApplyFnNode, SourceNode


class LazyFrameRun:
    """One execution of a LazyFrame.

    Example::

        run = lf.run(df)
        out = run.execute()
        run.cache_stats  # {'hits': 2, 'misses': 4}
    """

    def __init__(
        self,
        lazyframe: LazyFrame,
        inputs: "pd.DataFrame | dict[LazyFrame, pd.DataFrame]",
        *,
        cache: Cache | None = None,
        node_runtime_configs: dict[str, Any] | None = None,
        cache_stats: dict[str, int] | None = None,
    ) -> None:
        self._lazyframe = lazyframe
        self._inputs: dict[LazyFrame, pd.DataFrame] = (
            inputs if isinstance(inputs, dict) else {lazyframe: inputs}
        )
        self._content_cache = cache or CacheFactory.create_default_cache(max_size=10_000)
        self._cache_stats = cache_stats if cache_stats is not None else {"hits": 0, "misses": 0}
        self._node_runtime_configs = node_runtime_configs or {}

    @property
    def cache_stats(self) -> dict[str, int]:
        return dict(self._cache_stats)

    # ----------------------------------------------------------- resolution
    def _resolve_ref(self, ref: Any) -> Any:
        """Recursively materialise LazyFrame / SourceNode references."""
        if isinstance(ref, LazyFrame):
            return LazyFrameRun(
                ref,
                self._inputs,
                cache=self._content_cache,
                node_runtime_configs=self._node_runtime_configs,
                cache_stats=self._cache_stats,
            ).execute()
        if isinstance(ref, SourceNode):
            return self._run_source(ref)
        if isinstance(ref, list):
            return [self._resolve_ref(v) for v in ref]
        if isinstance(ref, tuple):
            return tuple(self._resolve_ref(v) for v in ref)
        if isinstance(ref, dict):
            return {k: self._resolve_ref(v) for k, v in ref.items()}
        return ref

    def _source_df(self, node: SourceNode) -> pd.DataFrame | None:
        df = self._inputs.get(node.lazyframe_ref) if node.lazyframe_ref is not None else None
        if df is None and node.df is not None:
            # A bound df beats the single-input convenience — otherwise a
            # nested bound LazyFrame (e.g. a join's right side) would silently
            # receive the outer pipeline's input.
            return None
        if df is None and len(self._inputs) == 1:
            df = next(iter(self._inputs.values()))
        return df

    def _source_hash(self, node: SourceNode) -> str:
        df = self._source_df(node)
        if df is not None:
            return hash_dataframe(df)
        if node.df is not None:
            return hash_dataframe(node.df)
        return "__no_source__"

    def _run_source(self, node: SourceNode) -> pd.DataFrame:
        df = self._source_df(node)
        if df is not None:
            return node(df)
        if node.df is not None:
            return node()
        raise ValueError("No DataFrame provided for source")

    # ------------------------------------------------------------ main loop
    def execute(self) -> Any:
        current: Any = None
        current_hash = ""
        for node in self._lazyframe._nodes:
            input_hash = self._source_hash(node) if isinstance(node, SourceNode) else current_hash
            key = compute_cache_key(node, input_hash)
            cached = self._content_cache.get(key)
            if cached is not None:
                self._cache_stats["hits"] += 1
                current = cached
                current_hash = hash_result(current)
                continue
            self._cache_stats["misses"] += 1

            if isinstance(node, SourceNode):
                current = self._run_source(node)
            else:
                if current is None and not isinstance(node, ApplyFnNode):
                    raise ValueError(
                        "LazyFrame has no source node. Use LazyFrame() so the pipeline "
                        "has a source by default, or ensure the first node is a source."
                    )
                current = node(current, self._resolve_ref, **self._node_runtime_configs)

            self._content_cache.insert(key, current)
            current_hash = hash_result(current)
        return current

    # ----------------------------------------------------------- conveniences
    def __getattr__(self, name: str) -> Any:
        if name.startswith("_"):
            raise AttributeError(f"'{type(self).__name__}' object has no attribute '{name}'")
        return getattr(self.execute(), name)

    def __getitem__(self, key: Any) -> Any:
        return self.execute()[key]

    def __repr__(self) -> str:
        return f"LazyFrameRun({self._lazyframe!r})"
