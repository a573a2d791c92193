"""sem_join: LLM-predicate join with optional cascade optimization.

Role parity with ``lotus/sem_ops/sem_join.py:16-845``. The exact path runs
the predicate over the full cartesian product as one batched filter. The
cascade path scores every pair with a similarity-join proxy over the TPU
index — either directly (search_filter) or after LLM-mapping left values
into the right column's domain (map_search_filter) — costs both plans,
keeps proxy-confident pairs, and sends only the uncertain band to the
oracle LM.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import pandas as pd
from tqdm import tqdm

import lotus_tpu
from lotus_tpu.cache import operator_cache
from lotus_tpu.models import LM
from lotus_tpu.nl_expression import parse_cols
from lotus_tpu.sem_ops._accessor import FewShot, SemAccessor
from lotus_tpu.sem_ops.cascade_utils import (
    calibrate_sem_sim_join,
    importance_sampling,
    learn_cascade_thresholds,
)
from lotus_tpu.sem_ops.sem_filter import sem_filter
from lotus_tpu.templates import task_instructions
from lotus_tpu.types import CascadeArgs, ReasoningStrategy, SemanticJoinOutput
from lotus_tpu.utils import show_safe_mode

_LEFT_TAG, _RIGHT_TAG = ":left", ":right"


# ---------------------------------------------------------------------------
# Column resolution: which {col} in the instruction belongs to which side.
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class JoinColumns:
    """The instruction labels and the underlying column names per side."""

    left_label: str
    right_label: str

    @property
    def left_col(self) -> str:
        return self.left_label.split(_LEFT_TAG)[0] if _LEFT_TAG in self.left_label else self.left_label

    @property
    def right_col(self) -> str:
        return self.right_label.split(_RIGHT_TAG)[0] if _RIGHT_TAG in self.right_label else self.right_label


def resolve_join_columns(instruction: str, left_df: pd.DataFrame, right_df: pd.DataFrame) -> JoinColumns:
    """Pick the left/right column from ``{col:left}``/``{col:right}`` tags,
    falling back to whichever untagged column lives in exactly one side."""
    refs = parse_cols(instruction)
    left = next((c for c in refs if _LEFT_TAG in c), None)
    right = next((c for c in refs if _RIGHT_TAG in c), None)

    def untagged_unique_to(frame: pd.DataFrame, other: pd.DataFrame) -> str | None:
        for c in refs:
            if c in frame.columns:
                if c in other.columns:
                    raise ValueError("Column found in both dataframes")
                return c
        return None

    left = left or untagged_unique_to(left_df, right_df)
    right = right or untagged_unique_to(right_df, left_df)
    assert left is not None, "Column not found in left dataframe"
    assert right is not None, "Column not found in right dataframe"
    return JoinColumns(left, right)


# ---------------------------------------------------------------------------
# Exact join
# ---------------------------------------------------------------------------


def _pair_docs(
    left: pd.Series, right: pd.Series, ids1: list[int], ids2: list[int],
    left_label: str, right_label: str,
) -> tuple[list[dict[str, Any]], list[tuple[int, int]]]:
    """Cartesian multimodal payloads plus the (left_id, right_id) per doc."""
    left_docs = task_instructions.df2multimodal_info(left.to_frame(left_label), [left_label])
    right_docs = task_instructions.df2multimodal_info(right.to_frame(right_label), [right_label])
    docs: list[dict[str, Any]] = []
    pairs: list[tuple[int, int]] = []
    for lid, ldoc in zip(ids1, left_docs):
        docs.extend(task_instructions.merge_multimodal_info([ldoc], right_docs))
        pairs.extend((lid, rid) for rid in ids2)
    return docs, pairs


def sem_join(
    l1: pd.Series, l2: pd.Series, ids1: list[int], ids2: list[int],
    col1_label: str, col2_label: str, model: LM, user_instruction: str, *,
    shots: FewShot | None = None, default: bool = True,
    strategy: ReasoningStrategy | None = None, safe_mode: bool = False,
    show_progress_bar: bool = True, progress_bar_desc: str = "Join comparisons",
) -> SemanticJoinOutput:
    """Exact join: evaluate the predicate over the full cartesian product."""
    shots = shots or FewShot()
    docs, pairs = _pair_docs(l1, l2, ids1, ids2, col1_label, col2_label)

    if safe_mode and docs:
        per_call = model.count_tokens(
            task_instructions.filter_formatter(
                model, docs[0], user_instruction,
                shots.multimodal_data, shots.answers, shots.reasoning, strategy,
            )
        )
        print("Sem_Join:")
        show_safe_mode(per_call * len(docs), len(docs))

    meter = tqdm(
        total=len(docs), desc=progress_bar_desc, disable=not show_progress_bar,
        bar_format="{l_bar}{bar} {n}/{total} LM Calls [{elapsed}<{remaining}, {rate_fmt}{postfix}]",
    )
    verdicts = sem_filter(
        docs, model, user_instruction,
        shots=shots, default=default, strategy=strategy, show_progress_bar=False,
    )
    meter.update(len(docs))
    meter.close()

    matches = [
        (lid, rid, expl)
        for (lid, rid), keep, expl in zip(pairs, verdicts.outputs, verdicts.explanations)
        if keep
    ]
    return SemanticJoinOutput(
        join_results=matches,
        filter_outputs=verdicts.outputs,
        all_raw_outputs=verdicts.raw_outputs,
        all_explanations=verdicts.explanations,
    )


# ---------------------------------------------------------------------------
# Cascade machinery
# ---------------------------------------------------------------------------


def run_sem_sim_join(l1: pd.Series | pd.DataFrame, l2: pd.Series, col1_label: str, col2_label: str) -> pd.DataFrame:
    """Similarity-join proxy: index the right side, K=|right| join, calibrated scores.

    The helper index is transient — it lives in a throwaway temp directory
    (never a cwd-relative path derived from a user column name, which would
    litter the working directory and collide across concurrent joins).
    """
    import shutil
    import tempfile

    left_frame = l1.to_frame(name=col1_label) if isinstance(l1, pd.Series) else l1
    tmp = tempfile.mkdtemp(prefix="lotus_joinproxy_")
    try:
        right_frame = l2.to_frame(name=col2_label).sem_index(col2_label, tmp)
        scored = left_frame.sem_sim_join(
            right_frame, left_on=col1_label, right_on=col2_label, K=len(l2), keep_index=True
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    scored["_scores"] = calibrate_sem_sim_join(scored["_scores"].tolist())
    return scored


def map_l1_to_l2(
    l1: pd.Series, col1_label: str, col2_label: str,
    map_instruction: str | None = None, map_examples: pd.DataFrame | None = None,
) -> tuple[pd.DataFrame, str]:
    """LLM-map left values into the right column's domain (map_search_filter)."""
    base_left = col1_label.split(_LEFT_TAG)[0] if _LEFT_TAG in col1_label else col1_label
    base_right = col2_label.split(_RIGHT_TAG)[0] if _RIGHT_TAG in col2_label else col2_label

    instruction = map_instruction or (
        f"Given {{{base_left}}}, identify the most relevant {base_right}. "
        f"Always write your answer as a list of 2-10 comma-separated {base_right}."
    )
    mapped_label = f"_{col1_label}"
    mapped = l1.to_frame(name=base_left).sem_map(
        instruction, suffix=mapped_label, examples=map_examples, progress_bar_desc="Mapping examples"
    )
    return mapped.rename(columns={base_left: col1_label}), mapped_label


def learn_join_cascade_threshold(
    helper_join: pd.DataFrame, col1_label: str, col2_label: str, model: LM,
    user_instruction: str, cascade_args: CascadeArgs, *,
    shots: FewShot | None = None, default: bool = True,
    strategy: ReasoningStrategy | None = None,
) -> tuple[float, float, int]:
    """Sample the proxy join, label with the oracle, learn (tau_+, tau_-).

    Falls back to a full join (1.0, 0.0) on any failure — the same forgiving
    posture as the reference (sem_join.py:615-618).
    """
    scores = helper_join["_scores"].tolist()
    picked, corrections = importance_sampling(scores, cascade_args)
    lotus_tpu.logger.info(f"Sampled {len(picked)} out of {len(scores)} helper join results.")
    sample = helper_join.iloc[picked]

    try:
        labels = sem_filter(
            task_instructions.df2multimodal_info(sample, [col1_label, col2_label]),
            model, user_instruction,
            shots=shots, default=default, strategy=strategy,
            progress_bar_desc="Running oracle for threshold learning",
        )
        (pos_t, neg_t), _ = learn_cascade_thresholds(
            proxy_scores=sample["_scores"].tolist(),
            oracle_outputs=labels.outputs,
            sample_correction_factors=corrections[picked],
            cascade_args=cascade_args,
        )
        lotus_tpu.logger.info(f"Learned cascade thresholds: {(pos_t, neg_t)}")
        return pos_t, neg_t, len(picked)
    except Exception as exc:
        lotus_tpu.logger.error(f"Error while learning join cascade thresholds: {exc}")
        lotus_tpu.logger.error("Default to full join.")
        return 1.0, 0.0, len(picked)


@dataclass
class _PlanOutcome:
    """One costed cascade plan: proxy-routed pairs plus what planning spent."""

    accepted: pd.DataFrame      # pairs at or above tau_+ (best first)
    band: pd.DataFrame          # uncertain pairs headed to the oracle
    rejected: int               # count of pairs at or below tau_-
    planning_calls: int         # LM calls spent building/learning this plan
    pos: float
    neg: float

    @property
    def oracle_cost(self) -> int:
        return len(self.band)


def join_optimizer(
    l1: pd.Series, l2: pd.Series, col1_label: str, col2_label: str, model: LM,
    user_instruction: str, cascade_args: CascadeArgs, *,
    shots: FewShot | None = None, map_instruction: str | None = None,
    map_examples: pd.DataFrame | None = None, default: bool = True,
    strategy: ReasoningStrategy | None = None,
) -> tuple[pd.DataFrame, pd.DataFrame, int, int, CascadeArgs]:
    """Cost the two cascade plans and pick the one with fewer oracle calls."""
    from lotus_tpu.settings import settings

    if settings.helper_lm is not None:
        lotus_tpu.logger.debug("Helper model is not supported yet. Default to similarity join.")

    def score_plan(name: str) -> _PlanOutcome:
        if name == "search_filter":
            proxy = run_sem_sim_join(l1, l2, col1_label, col2_label)
            spent = 0
        else:
            mapped, mapped_label = map_l1_to_l2(
                l1, col1_label, col2_label, map_instruction=map_instruction, map_examples=map_examples
            )
            proxy = run_sem_sim_join(mapped, l2, mapped_label, col2_label)
            spent = len(l1)

        pos = cascade_args.join_cascade_pos_threshold
        neg = cascade_args.join_cascade_neg_threshold
        if pos is None or neg is None:
            pos, neg, learn_calls = learn_join_cascade_threshold(
                proxy, col1_label, col2_label, model, user_instruction, cascade_args,
                shots=shots, default=default, strategy=strategy,
            )
            spent += learn_calls

        confident_yes = proxy["_scores"] >= pos
        confident_no = proxy["_scores"] <= neg
        return _PlanOutcome(
            accepted=proxy[confident_yes].sort_values(by="_scores", ascending=False),
            band=proxy[~confident_yes & ~confident_no].sort_values(by="_scores", ascending=False),
            rejected=int(confident_no.sum()),
            planning_calls=spent,
            pos=pos,
            neg=neg,
        )

    if cascade_args.join_cascade_strategy is not None:
        outcome = score_plan(cascade_args.join_cascade_strategy)
        return outcome.accepted, outcome.band, outcome.rejected, outcome.planning_calls, cascade_args

    plans = {name: score_plan(name) for name in ("search_filter", "map_search_filter")}
    lotus_tpu.logger.info("Join Optimizer: plan cost analysis:")
    for name, outcome in plans.items():
        lotus_tpu.logger.info(f"    {name}: {outcome.oracle_cost} LLM calls.")
        lotus_tpu.logger.info(
            f"    {name}: accept {len(outcome.accepted)} helper positive results, "
            f"{outcome.rejected} helper negative results."
        )

    winner_name = min(plans, key=lambda name: plans[name].oracle_cost)
    winner = plans[winner_name]
    lotus_tpu.logger.info(f"Proceeding with {winner_name}")
    chosen = cascade_args.model_copy(deep=True)
    chosen.join_cascade_strategy = winner_name  # type: ignore[assignment]
    chosen.join_cascade_pos_threshold = winner.pos
    chosen.join_cascade_neg_threshold = winner.neg
    total_planning = sum(o.planning_calls for o in plans.values())
    return winner.accepted, winner.band, winner.rejected, total_planning, chosen


def sem_join_cascade(
    l1: pd.Series, l2: pd.Series, ids1: list[int], ids2: list[int],
    col1_label: str, col2_label: str, model: LM, user_instruction: str,
    cascade_args: CascadeArgs, *, shots: FewShot | None = None,
    map_instruction: str | None = None, map_examples: pd.DataFrame | None = None,
    default: bool = True, strategy: ReasoningStrategy | None = None,
    safe_mode: bool = False,
) -> SemanticJoinOutput:
    """Cascade join: proxy-confident pairs accepted/rejected, band to oracle."""
    accepted, band, rejected, planning_calls, cascade_args = join_optimizer(
        l1, l2, col1_label, col2_label, model, user_instruction, cascade_args,
        shots=shots, map_instruction=map_instruction, map_examples=map_examples,
        default=default, strategy=strategy,
    )
    if safe_mode:
        lotus_tpu.logger.warning("Safe mode is not implemented yet.")

    matches: list[tuple[int, int, str | None]] = [
        (row["_left_id"], row["_right_id"], None) for _, row in accepted.iterrows()
    ]

    # Batch the uncertain band per left id so each left value is rendered
    # once. (Deduplicating by VALUE, as the reference does at
    # sem_join.py:283-289, misaligns ids and docs when left values repeat.)
    docs: list[dict[str, Any]] = []
    pairs: list[tuple[int, int]] = []
    for lid, rows in band.groupby("_left_id", sort=False):
        left_doc = task_instructions.df2multimodal_info(rows.iloc[[0]][[col1_label]], [col1_label])
        merged = task_instructions.merge_multimodal_info(
            left_doc, task_instructions.df2multimodal_info(rows[[col2_label]], [col2_label])
        )
        docs.extend(merged)
        pairs.extend((lid, rid) for rid in rows["_right_id"])

    meter = tqdm(
        total=len(band), desc="Running predicate evals with oracle model",
        bar_format="{l_bar}{bar} {n}/{total} LM calls [{elapsed}<{remaining}, {rate_fmt}{postfix}]",
    )
    verdicts = sem_filter(
        docs, model, user_instruction,
        shots=shots, default=default, strategy=strategy, show_progress_bar=True,
    )
    meter.update(len(band))
    meter.close()

    matches.extend(
        (lid, rid, expl)
        for (lid, rid), keep, expl in zip(pairs, verdicts.outputs, verdicts.explanations)
        if keep
    )

    stats = {
        "join_resolved_by_helper_model": len(accepted) + rejected,
        "join_helper_positive": len(accepted),
        "join_helper_negative": rejected,
        "join_resolved_by_large_model": len(band),
        "optimized_join_cost": planning_calls,
        "total_LM_calls": planning_calls + len(band),
        "cascade_args": cascade_args,
    }
    return SemanticJoinOutput(
        join_results=matches, filter_outputs=[], all_raw_outputs=[],
        all_explanations=[], stats=stats,
    )


# ---------------------------------------------------------------------------
# Accessor
# ---------------------------------------------------------------------------


@pd.api.extensions.register_dataframe_accessor("sem_join")
class SemJoinDataframe(SemAccessor):
    """Semantic join accessor: ``df1.sem_join(df2, "{article} is about {category}")``.

    Columns can be disambiguated as ``{col:left}`` / ``{col:right}``. With
    ``cascade_args`` and |L|x|R| >= ``min_join_cascade_size`` the cascade
    path activates.
    """

    @staticmethod
    def _stitch(
        left_df: pd.DataFrame, right_df: pd.DataFrame,
        matches: list[tuple[int, int, str | None]], suffix: str, with_explanations: bool,
    ) -> pd.DataFrame:
        """Materialize matched id pairs back into a joined DataFrame."""
        lhs, rhs = left_df.copy(), right_df.copy()
        lhs["_left_id"] = left_df.index
        rhs["_right_id"] = right_df.index
        for col in set(lhs.columns) & set(rhs.columns):
            lhs.rename(columns={col: col + _LEFT_TAG}, inplace=True)
            rhs.rename(columns={col: col + _RIGHT_TAG}, inplace=True)

        if with_explanations:
            bridge = pd.DataFrame(matches, columns=["_left_id", "_right_id", f"explanation{suffix}"])
        else:
            bridge = pd.DataFrame(
                [(lid, rid) for lid, rid, _ in matches], columns=["_left_id", "_right_id"]
            )
        return (
            lhs.join(bridge.set_index("_left_id"), how="right", on="_left_id")
            .join(rhs.set_index("_right_id"), how="left", on="_right_id")
            .drop(columns=["_left_id", "_right_id"])
            .reset_index(drop=True)
        )

    @operator_cache
    def __call__(
        self, other: pd.DataFrame | pd.Series, join_instruction: str,
        return_explanations: bool = False, how: str = "inner", suffix: str = "_join",
        examples: pd.DataFrame | None = None, strategy: ReasoningStrategy | None = None,
        default: bool = True, cascade_args: CascadeArgs | None = None,
        return_stats: bool = False, safe_mode: bool = False,
        progress_bar_desc: str = "Join comparisons",
    ) -> pd.DataFrame | tuple[pd.DataFrame, dict[str, Any]]:
        model = self._lm()
        if isinstance(other, pd.Series):
            if other.name is None:
                raise ValueError("Other Series must have a name")
            other = other.to_frame()
        if how != "inner":
            raise NotImplementedError("Only inner join is currently supported")

        spec = resolve_join_columns(join_instruction, self._obj, other)

        shots = FewShot()
        if examples is not None:
            assert "Answer" in examples.columns, "Answer must be a column in examples dataframe"
            shots.multimodal_data = task_instructions.df2multimodal_info(
                examples, [spec.left_col, spec.right_col]
            )
            shots.answers = examples["Answer"].tolist()
            if strategy == ReasoningStrategy.COT:
                return_explanations = True
                shots.reasoning = examples["Reasoning"].tolist()

        pair_count = len(self._obj) * len(other)
        cascade_live = (
            cascade_args is not None
            and pair_count >= cascade_args.min_join_cascade_size
            and (
                cascade_args.recall_target is not None
                or cascade_args.precision_target is not None
                or cascade_args.join_cascade_strategy is not None
            )
        )

        if cascade_live:
            assert cascade_args is not None
            if cascade_args.recall_target is None:
                cascade_args.recall_target = 1.0
            if cascade_args.precision_target is None:
                cascade_args.precision_target = 1.0
            output = sem_join_cascade(
                self._obj[spec.left_col], other[spec.right_col],
                self._obj.index, other.index,
                spec.left_label, spec.right_label, model, join_instruction, cascade_args,
                shots=shots, map_instruction=cascade_args.map_instruction,
                map_examples=cascade_args.map_examples,
                default=default, strategy=strategy, safe_mode=safe_mode,
            )
        else:
            output = sem_join(
                self._obj[spec.left_col], other[spec.right_col],
                self._obj.index, other.index,
                spec.left_label, spec.right_label, model, join_instruction,
                shots=shots, default=default, strategy=strategy, safe_mode=safe_mode,
                progress_bar_desc=progress_bar_desc,
            )

        joined = self._stitch(self._obj, other, output.join_results, suffix, return_explanations)
        if output.stats and return_stats:
            return joined, output.stats
        return joined
