"""sem_join: LLM-predicate join with optional cascade optimization.

Parity target: ``lotus/sem_ops/sem_join.py:16-845``.  The exact path is a
cartesian product evaluated as one big sem_filter.  The cascade path costs
two plans — search_filter (similarity-join proxy over the TPU index) vs
map_search_filter (LLM-map left values into the right domain first) —
learns (tau_+, tau_-) per plan by importance sampling with oracle labels,
picks the plan with fewer oracle calls, and sends only the uncertain band
to the oracle LM.
"""

from __future__ import annotations

from typing import Any

import pandas as pd
from tqdm import tqdm

import lotus_tpu
from lotus_tpu.cache import operator_cache
from lotus_tpu.models import LM
from lotus_tpu.nl_expression import parse_cols
from lotus_tpu.sem_ops.cascade_utils import (
    calibrate_sem_sim_join,
    importance_sampling,
    learn_cascade_thresholds,
)
from lotus_tpu.sem_ops.sem_filter import sem_filter
from lotus_tpu.templates import task_instructions
from lotus_tpu.types import CascadeArgs, ReasoningStrategy, SemanticJoinOutput
from lotus_tpu.utils import show_safe_mode


def sem_join(
    l1: pd.Series,
    l2: pd.Series,
    ids1: list[int],
    ids2: list[int],
    col1_label: str,
    col2_label: str,
    model: LM,
    user_instruction: str,
    examples_multimodal_data: list[dict[str, Any]] | None = None,
    examples_answers: list[bool] | None = None,
    cot_reasoning: list[str] | None = None,
    default: bool = True,
    strategy: ReasoningStrategy | None = None,
    safe_mode: bool = False,
    show_progress_bar: bool = True,
    progress_bar_desc: str = "Join comparisons",
) -> SemanticJoinOutput:
    """Exact join: evaluate the predicate over the full cartesian product."""
    left_data = task_instructions.df2multimodal_info(l1.to_frame(col1_label), [col1_label])
    right_data = task_instructions.df2multimodal_info(l2.to_frame(col2_label), [col2_label])

    if safe_mode:
        sample_docs = task_instructions.merge_multimodal_info([left_data[0]], right_data)
        per_call = model.count_tokens(
            task_instructions.filter_formatter(
                model, sample_docs[0], user_instruction,
                examples_multimodal_data, examples_answers, cot_reasoning, strategy,
            )
        )
        print("Sem_Join:")
        show_safe_mode(per_call * len(l1) * len(l2), len(l1) * len(l2))

    pbar = None
    if show_progress_bar:
        pbar = tqdm(
            total=len(l1) * len(l2),
            desc=progress_bar_desc,
            bar_format="{l_bar}{bar} {n}/{total} LM Calls [{elapsed}<{remaining}, {rate_fmt}{postfix}]",
        )

    all_docs: list[dict[str, Any]] = []
    all_ids1: list[int] = []
    all_ids2: list[int] = []
    for id1, left_doc in zip(ids1, left_data):
        merged = task_instructions.merge_multimodal_info([left_doc], right_data)
        all_docs.extend(merged)
        all_ids1.extend([id1] * len(merged))
        all_ids2.extend(ids2)

    output = sem_filter(
        all_docs,
        model,
        user_instruction,
        examples_multimodal_data=examples_multimodal_data,
        examples_answers=examples_answers,
        cot_reasoning=cot_reasoning,
        default=default,
        strategy=strategy,
        show_progress_bar=False,
    )
    if pbar is not None:
        pbar.update(len(l1) * len(l2))
        pbar.close()

    join_results = [
        (all_ids1[i], all_ids2[i], expl)
        for i, (keep, expl) in enumerate(zip(output.outputs, output.explanations))
        if keep
    ]
    return SemanticJoinOutput(
        join_results=join_results,
        filter_outputs=output.outputs,
        all_raw_outputs=output.raw_outputs,
        all_explanations=output.explanations,
    )


def run_sem_sim_join(l1: pd.Series | pd.DataFrame, l2: pd.Series, col1_label: str, col2_label: str) -> pd.DataFrame:
    """Similarity-join proxy: index the right side, K=|right| join, calibrated scores."""
    if isinstance(l1, pd.Series):
        l1_df = l1.to_frame(name=col1_label)
    else:
        l1_df = l1
    l2_df = l2.to_frame(name=col2_label)
    l2_df = l2_df.sem_index(col2_label, f"{col2_label}_index")

    out = l1_df.sem_sim_join(l2_df, left_on=col1_label, right_on=col2_label, K=len(l2), keep_index=True)
    out["_scores"] = calibrate_sem_sim_join(out["_scores"].tolist())
    return out


def map_l1_to_l2(
    l1: pd.Series,
    col1_label: str,
    col2_label: str,
    map_instruction: str | None = None,
    map_examples: pd.DataFrame | None = None,
) -> tuple[pd.DataFrame, str]:
    """LLM-map left values into the right column's domain (map_search_filter)."""
    real_left_on = col1_label.split(":left")[0] if ":left" in col1_label else col1_label
    real_right_on = col2_label.split(":right")[0] if ":right" in col2_label else col2_label

    inst = map_instruction or (
        f"Given {{{real_left_on}}}, identify the most relevant {real_right_on}. "
        f"Always write your answer as a list of 2-10 comma-separated {real_right_on}."
    )
    l1_df = l1.to_frame(name=real_left_on)
    mapped_col1_name = f"_{col1_label}"
    out = l1_df.sem_map(inst, suffix=mapped_col1_name, examples=map_examples, progress_bar_desc="Mapping examples")
    out = out.rename(columns={real_left_on: col1_label})
    return out, mapped_col1_name


def learn_join_cascade_threshold(
    helper_join: pd.DataFrame,
    col1_label: str,
    col2_label: str,
    model: LM,
    user_instruction: str,
    cascade_args: CascadeArgs,
    examples_multimodal_data: list[dict[str, Any]] | None = None,
    examples_answers: list[bool] | None = None,
    cot_reasoning: list[str] | None = None,
    default: bool = True,
    strategy: ReasoningStrategy | None = None,
) -> tuple[float, float, int]:
    """Sample the proxy join, label with the oracle, learn (tau_+, tau_-).

    Falls back to a full join (1.0, 0.0) on any failure — same forgiving
    behavior as the reference (sem_join.py:615-618).
    """
    helper_scores = helper_join["_scores"].tolist()
    sample_indices, correction_factors = importance_sampling(helper_scores, cascade_args)
    lotus_tpu.logger.info(
        f"Sampled {len(sample_indices)} out of {len(helper_scores)} helper join results."
    )
    sample_df = helper_join.iloc[sample_indices]
    sample_data = task_instructions.df2multimodal_info(sample_df, [col1_label, col2_label])

    try:
        output = sem_filter(
            sample_data,
            model,
            user_instruction,
            default=default,
            examples_multimodal_data=examples_multimodal_data,
            examples_answers=examples_answers,
            cot_reasoning=cot_reasoning,
            strategy=strategy,
            progress_bar_desc="Running oracle for threshold learning",
        )
        (pos_t, neg_t), _ = learn_cascade_thresholds(
            proxy_scores=sample_df["_scores"].tolist(),
            oracle_outputs=output.outputs,
            sample_correction_factors=correction_factors[sample_indices],
            cascade_args=cascade_args,
        )
        lotus_tpu.logger.info(f"Learned cascade thresholds: {(pos_t, neg_t)}")
        return pos_t, neg_t, len(sample_indices)
    except Exception as e:
        lotus_tpu.logger.error(f"Error while learning join cascade thresholds: {e}")
        lotus_tpu.logger.error("Default to full join.")
        return 1.0, 0.0, len(sample_indices)


def join_optimizer(
    l1: pd.Series,
    l2: pd.Series,
    col1_label: str,
    col2_label: str,
    model: LM,
    user_instruction: str,
    cascade_args: CascadeArgs,
    examples_multimodal_data: list[dict[str, Any]] | None = None,
    examples_answers: list[bool] | None = None,
    map_instruction: str | None = None,
    map_examples: pd.DataFrame | None = None,
    cot_reasoning: list[str] | None = None,
    default: bool = True,
    strategy: ReasoningStrategy | None = None,
) -> tuple[pd.DataFrame, pd.DataFrame, int, int, CascadeArgs]:
    """Cost the two cascade plans and pick the one with fewer oracle calls."""
    from lotus_tpu.settings import settings

    if settings.helper_lm is not None:
        lotus_tpu.logger.debug("Helper model is not supported yet. Default to similarity join.")

    def evaluate_plan(plan: str):
        pos_t = cascade_args.join_cascade_pos_threshold
        neg_t = cascade_args.join_cascade_neg_threshold
        if plan == "search_filter":
            helper_join = run_sem_sim_join(l1, l2, col1_label, col2_label)
            cost = 0
        else:
            mapped_l1, mapped_label = map_l1_to_l2(
                l1, col1_label, col2_label, map_instruction=map_instruction, map_examples=map_examples
            )
            helper_join = run_sem_sim_join(mapped_l1, l2, mapped_label, col2_label)
            cost = len(l1)

        if pos_t is None or neg_t is None:
            pos_t, neg_t, learn_cost = learn_join_cascade_threshold(
                helper_join, col1_label, col2_label, model, user_instruction, cascade_args,
                examples_multimodal_data=examples_multimodal_data,
                examples_answers=examples_answers,
                cot_reasoning=cot_reasoning,
                default=default,
                strategy=strategy,
            )
            cost += learn_cost

        high = helper_join[helper_join["_scores"] >= pos_t].sort_values(by="_scores", ascending=False)
        high_neg = len(helper_join[helper_join["_scores"] <= neg_t])
        low = helper_join[
            (helper_join["_scores"] < pos_t) & (helper_join["_scores"] > neg_t)
        ].sort_values(by="_scores", ascending=False)
        return high, low, high_neg, cost, pos_t, neg_t

    if cascade_args.join_cascade_strategy is not None:
        high, low, high_neg, cost, _, _ = evaluate_plan(cascade_args.join_cascade_strategy)
        return high, low, high_neg, cost, cascade_args

    sf = evaluate_plan("search_filter")
    msf = evaluate_plan("map_search_filter")
    sf_cost, msf_cost = len(sf[1]), len(msf[1])

    lotus_tpu.logger.info("Join Optimizer: plan cost analysis:")
    lotus_tpu.logger.info(f"    Search-Filter: {sf_cost} LLM calls.")
    lotus_tpu.logger.info(
        f"    Search-Filter: accept {len(sf[0])} helper positive results, {sf[2]} helper negative results."
    )
    lotus_tpu.logger.info(f"    Map-Search-Filter: {msf_cost} LLM calls.")
    lotus_tpu.logger.info(
        f"    Map-Search-Filter: accept {len(msf[0])} helper positive results, {msf[2]} helper negative results."
    )

    chosen_args = cascade_args.model_copy(deep=True)
    learning_cost = sf[3] + msf[3]
    if sf_cost < msf_cost:
        lotus_tpu.logger.info("Proceeding with Search-Filter")
        chosen_args.join_cascade_strategy = "search_filter"
        chosen_args.join_cascade_pos_threshold = sf[4]
        chosen_args.join_cascade_neg_threshold = sf[5]
        return sf[0], sf[1], sf[2], learning_cost, chosen_args
    lotus_tpu.logger.info("Proceeding with Map-Search-Filter")
    chosen_args.join_cascade_strategy = "map_search_filter"
    chosen_args.join_cascade_pos_threshold = msf[4]
    chosen_args.join_cascade_neg_threshold = msf[5]
    return msf[0], msf[1], msf[2], learning_cost, chosen_args


def sem_join_cascade(
    l1: pd.Series,
    l2: pd.Series,
    ids1: list[int],
    ids2: list[int],
    col1_label: str,
    col2_label: str,
    model: LM,
    user_instruction: str,
    cascade_args: CascadeArgs,
    examples_multimodal_data: list[dict[str, Any]] | None = None,
    examples_answers: list[bool] | None = None,
    map_instruction: str | None = None,
    map_examples: pd.DataFrame | None = None,
    cot_reasoning: list[str] | None = None,
    default: bool = True,
    strategy: ReasoningStrategy | None = None,
    safe_mode: bool = False,
) -> SemanticJoinOutput:
    """Cascade join: proxy-confident pairs accepted/rejected, band to oracle."""
    high_conf, low_conf, high_conf_neg, optimize_cost, cascade_args = join_optimizer(
        l1, l2, col1_label, col2_label, model, user_instruction, cascade_args,
        examples_multimodal_data=examples_multimodal_data,
        examples_answers=examples_answers,
        map_instruction=map_instruction,
        map_examples=map_examples,
        cot_reasoning=cot_reasoning,
        default=default,
        strategy=strategy,
    )
    num_helper, num_large = len(high_conf), len(low_conf)
    if safe_mode:
        lotus_tpu.logger.warning("Safe mode is not implemented yet.")

    join_results: list[tuple[int, int, str | None]] = [
        (row["_left_id"], row["_right_id"], None) for _, row in high_conf.iterrows()
    ]

    pbar = tqdm(
        total=num_large,
        desc="Running predicate evals with oracle model",
        bar_format="{l_bar}{bar} {n}/{total} LM calls [{elapsed}<{remaining}, {rate_fmt}{postfix}]",
    )
    all_docs: list[dict[str, Any]] = []
    all_ids1: list[int] = []
    all_ids2: list[int] = []
    # One doc per unique LEFT ID (deduplicating by value, as the reference
    # does at sem_join.py:283-289, misaligns ids and docs when left values
    # repeat).
    uniq_left = low_conf.drop_duplicates(subset=["_left_id"])
    left_data = task_instructions.df2multimodal_info(uniq_left[[col1_label]], [col1_label])
    for id1, left_doc in zip(uniq_left["_left_id"], left_data):
        rows = low_conf[low_conf["_left_id"] == id1]
        merged = task_instructions.merge_multimodal_info(
            [left_doc], task_instructions.df2multimodal_info(rows[[col2_label]], [col2_label])
        )
        all_docs.extend(merged)
        all_ids1.extend([id1] * len(merged))
        all_ids2.extend(rows["_right_id"].tolist())

    output = sem_filter(
        all_docs,
        model,
        user_instruction,
        examples_multimodal_data=examples_multimodal_data,
        examples_answers=examples_answers,
        cot_reasoning=cot_reasoning,
        default=default,
        strategy=strategy,
        show_progress_bar=True,
    )
    pbar.update(num_large)
    pbar.close()

    join_results.extend(
        (all_ids1[i], all_ids2[i], expl)
        for i, (keep, expl) in enumerate(zip(output.outputs, output.explanations))
        if keep
    )

    stats = {
        "join_resolved_by_helper_model": num_helper + high_conf_neg,
        "join_helper_positive": num_helper,
        "join_helper_negative": high_conf_neg,
        "join_resolved_by_large_model": num_large,
        "optimized_join_cost": optimize_cost,
        "total_LM_calls": optimize_cost + num_large,
        "cascade_args": cascade_args,
    }
    return SemanticJoinOutput(
        join_results=join_results,
        filter_outputs=[],
        all_raw_outputs=[],
        all_explanations=[],
        stats=stats,
    )


@pd.api.extensions.register_dataframe_accessor("sem_join")
class SemJoinDataframe:
    """Semantic join accessor: ``df1.sem_join(df2, "{article} is about {category}")``.

    Columns can be disambiguated as ``{col:left}`` / ``{col:right}``.  With
    ``cascade_args`` and |L|x|R| >= ``min_join_cascade_size`` the cascade
    path activates.
    """

    def __init__(self, pandas_obj: Any):
        self._validate(pandas_obj)
        self._obj = pandas_obj

    @staticmethod
    def _validate(obj: Any) -> None:
        if not isinstance(obj, pd.DataFrame):
            raise AttributeError("Must be a DataFrame")

    @operator_cache
    def __call__(
        self,
        other: pd.DataFrame | pd.Series,
        join_instruction: str,
        return_explanations: bool = False,
        how: str = "inner",
        suffix: str = "_join",
        examples: pd.DataFrame | None = None,
        strategy: ReasoningStrategy | None = None,
        default: bool = True,
        cascade_args: CascadeArgs | None = None,
        return_stats: bool = False,
        safe_mode: bool = False,
        progress_bar_desc: str = "Join comparisons",
    ) -> pd.DataFrame | tuple[pd.DataFrame, dict[str, Any]]:
        from lotus_tpu.settings import settings

        model = settings.lm
        if model is None:
            raise ValueError("Configure a language model via lotus_tpu.settings.configure(lm=...)")

        if isinstance(other, pd.Series):
            if other.name is None:
                raise ValueError("Other Series must have a name")
            other = pd.DataFrame({other.name: other})
        if how != "inner":
            raise NotImplementedError("Only inner join is currently supported")

        cols = parse_cols(join_instruction)
        left_on = right_on = None
        real_left_on = real_right_on = None
        for col in cols:
            if ":left" in col:
                left_on, real_left_on = col, col.split(":left")[0]
            elif ":right" in col:
                right_on, real_right_on = col, col.split(":right")[0]
        if left_on is None:
            for col in cols:
                if col in self._obj.columns:
                    left_on = real_left_on = col
                    if col in other.columns:
                        raise ValueError("Column found in both dataframes")
                    break
        if right_on is None:
            for col in cols:
                if col in other.columns:
                    right_on = real_right_on = col
                    if col in self._obj.columns:
                        raise ValueError("Column found in both dataframes")
                    break
        assert left_on is not None, "Column not found in left dataframe"
        assert right_on is not None, "Column not found in right dataframe"

        ex_data = ex_answers = ex_cot = None
        if examples is not None:
            assert "Answer" in examples.columns, "Answer must be a column in examples dataframe"
            ex_data = task_instructions.df2multimodal_info(examples, [real_left_on, real_right_on])
            ex_answers = examples["Answer"].tolist()
            if strategy == ReasoningStrategy.COT:
                return_explanations = True
                ex_cot = examples["Reasoning"].tolist()

        num_full_join = len(self._obj) * len(other)
        use_cascade = (
            cascade_args is not None
            and num_full_join >= cascade_args.min_join_cascade_size
            and (
                cascade_args.recall_target is not None
                or cascade_args.precision_target is not None
                or cascade_args.join_cascade_strategy is not None
            )
        )
        if use_cascade:
            assert cascade_args is not None
            cascade_args.recall_target = cascade_args.recall_target if cascade_args.recall_target is not None else 1.0
            cascade_args.precision_target = (
                cascade_args.precision_target if cascade_args.precision_target is not None else 1.0
            )
            output = sem_join_cascade(
                self._obj[real_left_on], other[real_right_on],
                self._obj.index, other.index,
                left_on, right_on, model, join_instruction, cascade_args,
                examples_multimodal_data=ex_data,
                examples_answers=ex_answers,
                map_instruction=cascade_args.map_instruction,
                map_examples=cascade_args.map_examples,
                cot_reasoning=ex_cot,
                default=default,
                strategy=strategy,
                safe_mode=safe_mode,
            )
        else:
            output = sem_join(
                self._obj[real_left_on], other[real_right_on],
                self._obj.index, other.index,
                left_on, right_on, model, join_instruction,
                examples_multimodal_data=ex_data,
                examples_answers=ex_answers,
                cot_reasoning=ex_cot,
                default=default,
                strategy=strategy,
                safe_mode=safe_mode,
                progress_bar_desc=progress_bar_desc,
            )

        df1 = self._obj.copy()
        df2 = other.copy()
        df1["_left_id"] = self._obj.index
        df2["_right_id"] = other.index
        for col in df1.columns:
            if col in df2.columns:
                df1.rename(columns={col: col + ":left"}, inplace=True)
                df2.rename(columns={col: col + ":right"}, inplace=True)

        if return_explanations:
            temp_df = pd.DataFrame(
                output.join_results, columns=["_left_id", "_right_id", f"explanation{suffix}"]
            )
        else:
            temp_df = pd.DataFrame(
                [(jr[0], jr[1]) for jr in output.join_results], columns=["_left_id", "_right_id"]
            )

        joined_df = (
            df1.join(temp_df.set_index("_left_id"), how="right", on="_left_id")
            .join(df2.set_index("_right_id"), how="left", on="_right_id")
            .drop(columns=["_left_id", "_right_id"])
            .reset_index(drop=True)
        )

        if output.stats and return_stats:
            return joined_df, output.stats
        return joined_df
