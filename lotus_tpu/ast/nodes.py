"""Pydantic AST nodes for lotus_tpu LazyFrames.

Parity target: ``lotus/ast/nodes.py:66-1141``.  Architectural difference:
most operator nodes share a declarative dispatch base (``AccessorNode``)
that derives the accessor call from the node's own pydantic fields, instead
of hand-written ``__call__`` bodies per node.  Each node still exposes the
same hooks: ``__call__(df, resolver, **context)``, ``signature()``,
``child_lfs()``, and generic optimizable-parameter addressing with
dot/bracket paths.
"""

from __future__ import annotations

import ast as _pyast
import re
from typing import Any, Callable, ClassVar

import pandas as pd
from pydantic import BaseModel, ConfigDict, Field

import lotus_tpu
from lotus_tpu.types import (
    CascadeArgs,
    LongContextStrategy,
    ProxyModel,
    ReasoningStrategy,
)

Resolver = Callable[[Any], Any]


def _no_resolver(ref: Any) -> Any:
    """Fallback resolver: plain values pass through, lazy refs are an error."""
    from lotus_tpu.ast.lazyframe import LazyFrame

    match ref:
        case LazyFrame():
            raise RuntimeError("Cannot resolve a LazyFrame without a runner.")
        case SourceNode(df=None):
            raise ValueError("SourceNode has no DataFrame specified.")
        case SourceNode():
            return ref.df
        case list() | tuple():
            return type(ref)(_no_resolver(v) for v in ref)
        case dict():
            return {k: _no_resolver(v) for k, v in ref.items()}
        case _:
            return ref


def _truncate(text: str, max_len: int = 50) -> str:
    return text if len(text) <= max_len else text[:max_len] + "..."


_PATH_TOKEN = re.compile(r"\[([^\[\]]*)\]|([^.\[\]]+)")


def split_param_path(param_name: str) -> tuple[Any, ...]:
    """Parse a dotted/bracketed path like ``cascade_args.map_examples[0]``.

    Dotted segments stay strings; bracketed segments are literal-eval'd so
    ``[0]`` indexes and ``['key']`` keys both work.
    """
    if param_name.count("[") != param_name.count("]") or "[]" in param_name:
        raise ValueError(f"Invalid optimizable parameter path: {param_name!r}")

    segments: list[Any] = []
    for bracketed, dotted in _PATH_TOKEN.findall(param_name):
        if dotted:
            segments.append(dotted)
            continue
        expr = bracketed.strip()
        if not expr:
            raise ValueError(f"Invalid optimizable parameter path: {param_name!r}")
        try:
            segments.append(_pyast.literal_eval(expr))
        except (SyntaxError, ValueError):
            segments.append(int(expr) if expr.lstrip("-").isdigit() else expr)
    return tuple(segments)


def _walk_get(container: Any, path: tuple[Any, ...], *, check_only: bool = False) -> Any:
    cur = container
    for part in path:
        if isinstance(cur, BaseModel):
            if not isinstance(part, str) or part not in type(cur).model_fields:
                if check_only:
                    return _MISSING
                raise ValueError(f"No such nested optimizable parameter segment: {part!r}")
            cur = getattr(cur, part)
        elif isinstance(cur, (list, tuple)):
            if not isinstance(part, int) or not (0 <= part < len(cur)):
                if check_only:
                    return _MISSING
                raise ValueError(f"No such nested optimizable parameter segment: {part!r}")
            cur = cur[part]
        elif isinstance(cur, dict):
            if part not in cur:
                if check_only:
                    return _MISSING
                raise ValueError(f"No such nested optimizable parameter segment: {part!r}")
            cur = cur[part]
        else:
            if check_only:
                return _MISSING
            raise ValueError(f"Cannot resolve through {type(cur).__name__}")
    return cur


def _walk_set(container: Any, path: tuple[Any, ...], value: Any) -> Any:
    if not path:
        return value
    part, rest = path[0], path[1:]
    if isinstance(container, BaseModel):
        if not isinstance(part, str) or part not in type(container).model_fields:
            raise ValueError(f"No such nested optimizable parameter segment: {part!r}")
        return container.model_copy(update={part: _walk_set(getattr(container, part), rest, value)})
    if isinstance(container, (list, tuple)):
        if not isinstance(part, int) or not (0 <= part < len(container)):
            raise ValueError(f"No such nested optimizable parameter segment: {part!r}")
        out = list(container)
        out[part] = _walk_set(out[part], rest, value)
        return out if isinstance(container, list) else tuple(out)
    if isinstance(container, dict):
        if part not in container:
            raise ValueError(f"No such nested optimizable parameter segment: {part!r}")
        out = dict(container)
        out[part] = _walk_set(out[part], rest, value)
        return out
    raise ValueError(f"Cannot apply through {type(container).__name__}")


class _Missing:
    pass


_MISSING = _Missing()


class BaseNode(BaseModel):
    """Base AST node: execution + display + optimizable-param addressing."""

    model_config = ConfigDict(arbitrary_types_allowed=True)

    optimizable_params: frozenset[str] | None = None

    def __call__(self, df: pd.DataFrame | None = None, resolver: Resolver = _no_resolver, **context: Any) -> Any:
        raise NotImplementedError(f"{type(self).__name__}.__call__ not implemented")

    # -- optimizable params -------------------------------------------------
    def supports_optimizable_param(self, param_name: str) -> bool:
        try:
            parts = split_param_path(param_name)
        except ValueError:
            return False
        if not parts or not isinstance(parts[0], str) or parts[0] not in type(self).model_fields:
            return False
        if len(parts) == 1:
            return True
        container = getattr(self, parts[0], None)
        if container is None:
            return False
        return _walk_get(container, parts[1:], check_only=True) is not _MISSING

    def resolve_optimizable_param_value(self, param_name: str) -> Any:
        parts = split_param_path(param_name)
        if not parts or not isinstance(parts[0], str) or parts[0] not in type(self).model_fields:
            raise ValueError(f"Node has no optimizable parameter {param_name!r}")
        if len(parts) == 1:
            return getattr(self, parts[0])
        container = getattr(self, parts[0], None)
        if container is None:
            raise ValueError(f"Optimizable parameter root {parts[0]!r} is None")
        return _walk_get(container, parts[1:])

    def apply_optimizable_param_value(self, param_name: str, value: Any) -> "BaseNode":
        parts = split_param_path(param_name)
        if not parts or not isinstance(parts[0], str) or parts[0] not in type(self).model_fields:
            raise ValueError(f"Node has no optimizable parameter {param_name!r}")
        if len(parts) == 1:
            return self.model_copy(update={parts[0]: value})
        container = getattr(self, parts[0], None)
        if container is None:
            raise ValueError(f"Optimizable parameter root {parts[0]!r} is None")
        return self.model_copy(update={parts[0]: _walk_set(container, parts[1:], value)})

    def optimizable_param_description(self, param_name: str) -> str:
        parts = split_param_path(param_name)
        if not parts:
            return ""
        field = type(self).model_fields.get(parts[0]) if isinstance(parts[0], str) else None
        description = field.description if field is not None and field.description else ""
        cur: Any = getattr(self, parts[0], None) if isinstance(parts[0], str) else None
        for part in parts[1:]:
            if not isinstance(cur, BaseModel) or not isinstance(part, str):
                break
            sub = type(cur).model_fields.get(part)
            if sub is None:
                break
            if sub.description:
                description = sub.description
            cur = getattr(cur, part)
        return description

    # -- display ------------------------------------------------------------
    def signature(self) -> str:
        return f"{type(self).__name__}(...)"

    def child_lfs(self) -> list[tuple[str, Any]]:
        return []


class SourceNode(BaseNode):
    """Input data source, optionally bound to a DataFrame and schema."""

    lazyframe_ref: Any = None
    df: pd.DataFrame | None = None
    expected_schema: dict[str, str] | None = None

    def __call__(self, df: pd.DataFrame | None = None, resolver: Resolver = _no_resolver, **context: Any) -> pd.DataFrame:
        out = df if df is not None else self.df
        if out is None:
            raise ValueError("Source node was executed without a DataFrame")
        if self.expected_schema:
            for col, expected in self.expected_schema.items():
                if col not in out.columns:
                    raise ValueError(f"Schema validation failed: column '{col}' not found in DataFrame")
                actual = str(out[col].dtype)
                if actual != expected:
                    raise ValueError(
                        f"Schema validation failed: column '{col}' has dtype '{actual}', expected '{expected}'"
                    )
        return out

    def signature(self) -> str:
        schema_str = f", schema={len(self.expected_schema)} cols" if self.expected_schema else ""
        return f"Source(bound={self.df is not None}{schema_str})"


class AccessorNode(BaseNode):
    """Dispatches to a pandas accessor using this node's fields as kwargs.

    Subclasses set ``_accessor`` (accessor name), ``_positional`` (fields
    passed positionally, in order), and optionally ``_sig_fields`` for the
    display signature.  Fields named in ``_exclude`` and the base-node
    bookkeeping fields are not forwarded.  A ``model_kwargs`` dict field, if
    present and non-empty, is splatted into the call; None-valued optional
    callables (e.g. postprocessor) are skipped so accessor defaults apply.
    """

    _accessor: ClassVar[str] = ""
    _positional: ClassVar[tuple[str, ...]] = ()
    _sig_fields: ClassVar[tuple[str, ...]] = ()
    _skip_if_none: ClassVar[tuple[str, ...]] = ("postprocessor",)
    _not_forwarded: ClassVar[tuple[str, ...]] = ()

    def _call_kwargs(self) -> tuple[list[Any], dict[str, Any]]:
        skip = {"optimizable_params", "model_kwargs", *self._positional, *self._not_forwarded}
        args = [getattr(self, name) for name in self._positional]
        kwargs: dict[str, Any] = {}
        for name in type(self).model_fields:
            if name in skip:
                continue
            value = getattr(self, name)
            if name in self._skip_if_none and value is None:
                continue
            kwargs[name] = value
        extra = getattr(self, "model_kwargs", None)
        if extra:
            kwargs.update(extra)
        return args, kwargs

    def __call__(self, df: pd.DataFrame, resolver: Resolver = _no_resolver, **context: Any) -> Any:
        args, kwargs = self._call_kwargs()
        lotus_tpu.logger.debug(f"{type(self).__name__}: running over {len(df)} rows")
        return getattr(df, self._accessor)(*args, **kwargs)

    def signature(self) -> str:
        shown = self._sig_fields or self._positional
        parts = []
        for name in shown:
            v = getattr(self, name)
            parts.append(repr(_truncate(v)) if isinstance(v, str) else repr(v))
        return f"{self._accessor}({', '.join(parts)})"


class _OutputColumnOpts(BaseModel):
    """Switches for attaching explanation / raw-output columns."""

    model_config = ConfigDict(arbitrary_types_allowed=True)

    return_explanations: bool = False
    return_raw_outputs: bool = False


class _ShotAndStrategyOpts(BaseModel):
    """Few-shot examples, reasoning strategy, and the safe-mode gate —
    the option trio shared by every prompt-building operator."""

    model_config = ConfigDict(arbitrary_types_allowed=True)

    examples: pd.DataFrame | None = None
    strategy: ReasoningStrategy | None = None
    safe_mode: bool = False


class _CascadeSelfUpdateMixin(BaseModel):
    """Cascade-capable nodes: carry the knobs, and self-store thresholds
    learned during a pre-warm run (context flag ``update_cascade_args``)."""

    model_config = ConfigDict(arbitrary_types_allowed=True)

    cascade_args: CascadeArgs | None = None
    return_stats: bool = False

    def _run_with_cascade_learning(
        self,
        run: Callable[[bool], Any],
        threshold_attr: str,
        context: dict[str, Any],
        return_stats: bool,
    ) -> Any:
        cascade_args = getattr(self, "cascade_args", None)
        needs_learning = (
            cascade_args is not None
            and getattr(cascade_args, threshold_attr) is None
            and context.get("update_cascade_args", False)
        )
        result = run(return_stats or needs_learning)
        if needs_learning and isinstance(result, tuple):
            df_out, stats = result
            stats_list = stats if isinstance(stats, list) else [stats]
            learned = next(
                (s.get("cascade_args") for s in stats_list if isinstance(s, dict) and s.get("cascade_args")),
                None,
            )
            if learned is not None:
                self.cascade_args = learned  # type: ignore[attr-defined]
            return (df_out, stats) if return_stats else df_out
        return result


# ---------------------------------------------------------------- LLM op nodes
class SemFilterNode(_CascadeSelfUpdateMixin, _OutputColumnOpts, _ShotAndStrategyOpts, AccessorNode):
    """Filter rows on a natural-language predicate."""

    _accessor = "sem_filter"
    _positional = ("user_instruction",)
    _HELPER_PARAM: ClassVar[str] = "cascade_args.helper_filter_instruction"

    user_instruction: str = Field(
        description="Per-row boolean claim in natural language; wrap column names in braces, e.g. {Title}."
    )
    system_prompt: str | None = Field(
        default=None, description="System prompt applied to each of this filter's LLM calls (optional)."
    )
    progress_bar_desc: str = "Filtering"
    suffix: str = "_filter"
    output_tokens: tuple[str, str] = ("True", "False")
    default: bool = True
    return_all: bool = False
    helper_examples: pd.DataFrame | None = None
    additional_cot_instructions: str = ""

    def supports_optimizable_param(self, param_name: str) -> bool:
        if param_name == self._HELPER_PARAM:
            return self.cascade_args is not None and self.cascade_args.proxy_model == ProxyModel.HELPER_LM
        return super().supports_optimizable_param(param_name)

    def resolve_optimizable_param_value(self, param_name: str) -> Any:
        if param_name == self._HELPER_PARAM:
            if self.cascade_args is None:
                raise ValueError("Resolving the helper instruction requires cascade_args")
            return self.cascade_args.helper_filter_instruction or self.user_instruction
        return super().resolve_optimizable_param_value(param_name)

    def apply_optimizable_param_value(self, param_name: str, value: Any) -> BaseNode:
        if param_name == self._HELPER_PARAM:
            if self.cascade_args is None:
                raise ValueError("Setting the helper instruction requires cascade_args")
            return self.model_copy(
                update={"cascade_args": self.cascade_args.model_copy(update={"helper_filter_instruction": value})}
            )
        return super().apply_optimizable_param_value(param_name, value)

    def optimizable_param_description(self, param_name: str) -> str:
        if param_name == self._HELPER_PARAM:
            return (
                "Predicate given to the cascade's helper model; falls back to "
                "user_instruction when not set."
            )
        return super().optimizable_param_description(param_name)

    def __call__(self, df: pd.DataFrame, resolver: Resolver = _no_resolver, **context: Any) -> Any:
        def run(with_stats: bool) -> Any:
            _, kwargs = self._call_kwargs()
            kwargs["return_stats"] = with_stats
            return df.sem_filter(self.user_instruction, **kwargs)

        return self._run_with_cascade_learning(run, "filter_pos_cascade_threshold", context, self.return_stats)


class SemMapNode(_OutputColumnOpts, _ShotAndStrategyOpts, AccessorNode):
    """Transform each row with a natural-language instruction."""

    _accessor = "sem_map"
    _positional = ("user_instruction",)

    user_instruction: str = Field(
        description="Row-wise rewrite instruction in natural language; wrap column names in braces."
    )
    system_prompt: str | None = Field(
        default=None, description="System prompt applied to each of this map's LLM calls (optional)."
    )
    progress_bar_desc: str = "Mapping"
    suffix: str = "_map"
    postprocessor: Callable | None = None
    model_kwargs: dict[str, Any] | None = None


class SemExtractNode(_OutputColumnOpts, AccessorNode):
    """Extract structured fields into new columns."""

    _accessor = "sem_extract"
    _positional = ("input_cols", "output_cols")

    input_cols: list[str]
    output_cols: dict[str, str | None] = Field(
        description="Output column name -> what to pull out of each row, described in natural language."
    )
    progress_bar_desc: str = "Extracting"
    extract_quotes: bool = False
    postprocessor: Callable | None = None
    strategy: ReasoningStrategy | None = None
    safe_mode: bool = False


class SemAggNode(AccessorNode):
    """Aggregate rows into a single answer."""

    _accessor = "sem_agg"
    _positional = ("user_instruction",)

    user_instruction: str = Field(
        description="How to fold all rows into one answer, in natural language; wrap column names in braces."
    )
    progress_bar_desc: str = "Aggregating"
    suffix: str = "_output"
    group_by: list[str] | None = None
    all_cols: bool = False
    safe_mode: bool = False
    long_context_strategy: LongContextStrategy | None = LongContextStrategy.CHUNK
    response_format: Any = None
    split_fields_into_cols: bool = True


class SemTopKNode(AccessorNode):
    """Rank rows and return the top K."""

    _accessor = "sem_topk"
    _positional = ("user_instruction", "K")
    _sig_fields = ("user_instruction", "K")

    user_instruction: str = Field(
        description="Ranking criterion in natural language; wrap column names in braces."
    )
    K: int
    method: str = "quick"
    group_by: list[str] | None = None
    strategy: ReasoningStrategy | None = None
    cascade_threshold: float | None = None
    safe_mode: bool = False
    return_stats: bool = False
    return_explanations: bool = False


class _JoinMixin(BaseModel):
    """Shared right-side resolution for join nodes."""

    model_config = ConfigDict(arbitrary_types_allowed=True)

    _not_forwarded: ClassVar[tuple[str, ...]] = ("right_source_node", "right_lf", "right_df")

    right_source_node: SourceNode | None = None
    right_lf: Any = None
    right_df: pd.DataFrame | None = None

    def _resolve_right(self, resolver: Resolver) -> pd.DataFrame:
        # Preference order: a bound frame beats a lazy ref beats a source.
        if self.right_df is not None:
            return self.right_df
        candidate = self.right_lf if self.right_lf is not None else self.right_source_node
        if candidate is None:
            raise ValueError("Join node has no right DataFrame specified.")
        return resolver(candidate)

    def _right_child_lfs(self) -> list[tuple[str, Any]]:
        from lotus_tpu.ast.lazyframe import LazyFrame

        return [("right LazyFrame", self.right_lf)] if isinstance(self.right_lf, LazyFrame) else []


class SemJoinNode(_CascadeSelfUpdateMixin, _ShotAndStrategyOpts, _JoinMixin, AccessorNode):
    """Join two DataFrames on a natural-language predicate."""

    _accessor = "sem_join"
    _positional = ("join_instruction",)
    _sig_fields = ("join_instruction", "how", "suffix")

    join_instruction: str = Field(
        description="Predicate relating a left row to a right row; wrap columns in braces, tagging {col:left}/{col:right} when ambiguous."
    )
    progress_bar_desc: str = "Join comparisons"
    suffix: str = "_join"
    how: str = "inner"
    default: bool = True
    return_explanations: bool = False

    def __call__(self, df: pd.DataFrame, resolver: Resolver = _no_resolver, **context: Any) -> Any:
        right = self._resolve_right(resolver)

        def run(with_stats: bool) -> Any:
            _, kwargs = self._call_kwargs()
            kwargs["return_stats"] = with_stats
            return df.sem_join(right, self.join_instruction, **kwargs)

        return self._run_with_cascade_learning(run, "join_cascade_pos_threshold", context, self.return_stats)

    def child_lfs(self) -> list[tuple[str, Any]]:
        return self._right_child_lfs()


class SemSimJoinNode(_JoinMixin, AccessorNode):
    """Embedding-similarity K-NN join."""

    _accessor = "sem_sim_join"
    _sig_fields = ("left_on", "right_on", "K")

    left_on: str
    right_on: str
    K: int
    keep_index: bool = False
    lsuffix: str = ""
    rsuffix: str = ""
    score_suffix: str = ""

    def __call__(self, df: pd.DataFrame, resolver: Resolver = _no_resolver, **context: Any) -> Any:
        _, kwargs = self._call_kwargs()
        return df.sem_sim_join(self._resolve_right(resolver), **kwargs)

    def child_lfs(self) -> list[tuple[str, Any]]:
        return self._right_child_lfs()


class SemSearchNode(AccessorNode):
    """Top-K semantic search over an indexed column."""

    _accessor = "sem_search"
    _positional = ("col_name", "query")

    col_name: str
    query: str = Field(description="Free-text query scored against the indexed column.")
    K: int | None = None
    suffix: str = "_sim_score"
    n_rerank: int | None = None
    return_scores: bool = False


class SemIndexNode(AccessorNode):
    _accessor = "sem_index"
    _positional = ("col_name", "index_dir")

    col_name: str
    index_dir: str


class LoadSemIndexNode(AccessorNode):
    _accessor = "load_sem_index"
    _positional = ("col_name", "index_dir")

    col_name: str
    index_dir: str


class SemClusterByNode(AccessorNode):
    _accessor = "sem_cluster_by"
    _positional = ("col_name", "ncentroids")

    col_name: str
    ncentroids: int
    niter: int = 20
    verbose: bool = False
    return_scores: bool = False
    return_centroids: bool = False


class SemDedupNode(AccessorNode):
    _accessor = "sem_dedup"
    _positional = ("col_name", "threshold")

    col_name: str
    threshold: float


class SemPartitionByNode(AccessorNode):
    _accessor = "sem_partition_by"
    _positional = ("partition_fn",)

    partition_fn: Callable

    def signature(self) -> str:
        return "sem_partition_by(...)"


# ------------------------------------------------------------- pandas nodes
class PandasFilterNode(BaseNode):
    """Boolean row filter via a host predicate."""

    predicate: Callable[[pd.DataFrame], pd.Series]

    def __call__(self, df: pd.DataFrame, resolver: Resolver = _no_resolver, **context: Any) -> pd.DataFrame:
        return df[self.predicate(df)]

    def signature(self) -> str:
        return "filter(...)"


class PandasOpNode(BaseNode):
    """Generic pandas operation: method call, attribute access, subscript,
    or assignment; LazyFrame-valued args are resolved at call time."""

    op_name: str
    is_attr: bool = False
    args: tuple[Any, ...] = ()
    kwargs: dict[str, Any] | None = None
    lf_args: dict[str, Any] | None = None
    lf_kwargs: dict[str, Any] | None = None

    def _materialized_call(self, resolver: Resolver) -> tuple[list[Any], dict[str, Any]]:
        """Args/kwargs with every deferred LazyFrame slot resolved."""
        args, kwargs = list(self.args), dict(self.kwargs or {})
        for slot, lazy in (self.lf_args or {}).items():
            args[int(slot.rsplit("_", 1)[-1])] = resolver(lazy)
        for slot, lazy in (self.lf_kwargs or {}).items():
            kwargs[slot.removeprefix("_lf_kwarg_")] = resolver(lazy)
        return args, kwargs

    def __call__(self, df: pd.DataFrame, resolver: Resolver = _no_resolver, **context: Any) -> Any:
        target = getattr(df, self.op_name)
        if self.is_attr:
            return target
        args, kwargs = self._materialized_call(resolver)
        result = target(*args, **kwargs)
        # In-place pandas methods return None; keep the frame flowing.
        return df if result is None else result

    def signature(self) -> str:
        if self.is_attr:
            return self.op_name
        if self.op_name == "__getitem__":
            return f"[{self.args[0]!r}]"
        if self.op_name == "assign":
            assigned = dict.fromkeys(self.kwargs or {})
            assigned.update(
                dict.fromkeys(k.removeprefix("_lf_kwarg_") for k in self.lf_kwargs or {})
            )
            return f"assign({', '.join(assigned)}=...)"
        rendered = [repr(a) for a in self.args]
        rendered += [f"{k}={v!r}" for k, v in (self.kwargs or {}).items()]
        return f"{self.op_name}({', '.join(rendered)})"

    def child_lfs(self) -> list[tuple[str, Any]]:
        from lotus_tpu.ast.lazyframe import LazyFrame

        deferred = [(f"arg {k}", v) for k, v in (self.lf_args or {}).items()]
        deferred += [
            (f"kwarg {k.removeprefix('_lf_kwarg_')}", v) for k, v in (self.lf_kwargs or {}).items()
        ]
        return [(label, v) for label, v in deferred if isinstance(v, LazyFrame)]


# ------------------------------------------------------------------ eval nodes
class LLMAsJudgeNode(_OutputColumnOpts, _ShotAndStrategyOpts, AccessorNode):
    """Multi-trial LLM judging (sem_map-based)."""

    _accessor = "llm_as_judge"
    _positional = ("judge_instruction",)
    _sig_fields = ("judge_instruction", "n_trials")

    judge_instruction: str = Field(
        description="What the judge should assess, in natural language; wrap column names in braces."
    )
    n_trials: int = 1
    progress_bar_desc: str = "Evaluating"
    suffix: str = "_judge"
    response_format: Any = None
    system_prompt: str | None = None
    postprocessor: Callable | None = None
    cot_reasoning: list[str] | None = None
    extra_cols_to_include: list[str] | None = None
    model_kwargs: dict[str, Any] | None = None


class PairwiseJudgeNode(_CascadeSelfUpdateMixin, _OutputColumnOpts, _ShotAndStrategyOpts, AccessorNode):
    """A-vs-B comparison judging (sem_filter-based)."""

    _accessor = "pairwise_judge"
    _positional = ("col1", "col2", "judge_instruction")
    _HELPER_PARAM: ClassVar[str] = "cascade_args.helper_filter_instruction"

    col1: str
    col2: str
    judge_instruction: str = Field(
        description="The criterion for preferring one column over the other; wrap column names in braces."
    )
    n_trials: int = 1
    permute_cols: bool = False
    default_to_col1: bool = True
    progress_bar_desc: str = "Evaluating"
    suffix: str = "_judge"
    system_prompt: str | None = None
    helper_examples: pd.DataFrame | None = None
    additional_cot_instructions: str = ""
    model_kwargs: dict[str, Any] | None = None

    def _effective_sem_filter_user_instruction(self) -> str:
        # The runtime pairwise_judge renames columns to single-token A/B.
        renamed = self.judge_instruction.replace(f"{{{self.col1}}}", "{A}").replace(f"{{{self.col2}}}", "{B}")
        return f"{{A}} is better than {{B}} given the criteria: {renamed}"

    def supports_optimizable_param(self, param_name: str) -> bool:
        if param_name == self._HELPER_PARAM:
            return self.cascade_args is not None and self.cascade_args.proxy_model == ProxyModel.HELPER_LM
        return super().supports_optimizable_param(param_name)

    def resolve_optimizable_param_value(self, param_name: str) -> Any:
        if param_name == self._HELPER_PARAM:
            if self.cascade_args is None:
                raise ValueError("Resolving the helper instruction requires cascade_args")
            return self.cascade_args.helper_filter_instruction or self._effective_sem_filter_user_instruction()
        return super().resolve_optimizable_param_value(param_name)

    def apply_optimizable_param_value(self, param_name: str, value: Any) -> BaseNode:
        if param_name == self._HELPER_PARAM:
            if self.cascade_args is None:
                raise ValueError("Setting the helper instruction requires cascade_args")
            return self.model_copy(
                update={"cascade_args": self.cascade_args.model_copy(update={"helper_filter_instruction": value})}
            )
        return super().apply_optimizable_param_value(param_name, value)

    def __call__(self, df: pd.DataFrame, resolver: Resolver = _no_resolver, **context: Any) -> Any:
        def run(with_stats: bool) -> Any:
            args, kwargs = self._call_kwargs()
            kwargs["return_stats"] = with_stats
            return df.pairwise_judge(*args, **kwargs)

        return self._run_with_cascade_learning(run, "filter_pos_cascade_threshold", context, self.return_stats)


# ----------------------------------------------------------------- fn nodes
class ApplyFnNode(BaseNode):
    """Apply a callable to resolved inputs (from_fn / concat)."""

    fn: Any
    args: tuple[Any, ...] = ()
    kwargs: dict[str, Any] | None = None

    def __call__(self, df: pd.DataFrame | None = None, resolver: Resolver = _no_resolver, **context: Any) -> Any:
        return self.fn(
            *(resolver(a) for a in self.args),
            **{k: resolver(v) for k, v in (self.kwargs or {}).items()},
        )

    def signature(self) -> str:
        rendered = [repr(a) for a in self.args]
        rendered += [f"{k}={v!r}" for k, v in (self.kwargs or {}).items()]
        return f"{getattr(self.fn, '__name__', repr(self.fn))}({', '.join(rendered)})"

    def child_lfs(self) -> list[tuple[str, Any]]:
        from lotus_tpu.ast.lazyframe import LazyFrame

        # Iterative walk over nested containers, tracking a display label.
        found: list[tuple[str, Any]] = []
        frontier: list[tuple[str, Any]] = [(f"arg {i}", a) for i, a in enumerate(self.args)]
        frontier += [(f"kwarg {k}", v) for k, v in (self.kwargs or {}).items()]
        while frontier:
            label, value = frontier.pop(0)
            if isinstance(value, LazyFrame):
                found.append((label, value))
            elif isinstance(value, (list, tuple)):
                frontier.extend((f"{label}[{i}]", v) for i, v in enumerate(value))
            elif isinstance(value, dict):
                frontier.extend((f"{label}.{k}", v) for k, v in value.items())
        return found
