"""sem_filter: boolean predicate per row, with optional model cascade.

Parity target: ``lotus/sem_ops/sem_filter.py:24-669``.  The cascade routes
high-confidence rows to a cheap proxy (helper-LM logprobs, quantile-
calibrated, or embedding similarity via the TPU store) and only the
uncertain band to the oracle LM, with thresholds either given or learned by
importance sampling against oracle labels (cascade_utils).
"""

from __future__ import annotations

from typing import Any

import numpy as np
import pandas as pd
from numpy.typing import NDArray

import lotus_tpu
from lotus_tpu.cache import operator_cache
from lotus_tpu.models import LM
from lotus_tpu.nl_expression import nle2str, parse_cols
from lotus_tpu.sem_ops.cascade_utils import (
    calibrate_llm_logprobs,
    importance_sampling,
    learn_cascade_thresholds,
)
from lotus_tpu.sem_ops.postprocessors import filter_postprocess
from lotus_tpu.templates import task_instructions
from lotus_tpu.types import (
    CascadeArgs,
    LMOutput,
    LogprobsForFilterCascade,
    ProxyModel,
    ReasoningStrategy,
    SemanticFilterOutput,
)
from lotus_tpu.utils import show_safe_mode


def sem_filter(
    docs: list[dict[str, Any]],
    model: LM,
    user_instruction: str,
    default: bool = True,
    examples_multimodal_data: list[dict[str, Any]] | None = None,
    examples_answers: list[bool] | None = None,
    cot_reasoning: list[str] | None = None,
    strategy: ReasoningStrategy | None = None,
    logprobs: bool = False,
    safe_mode: bool = False,
    show_progress_bar: bool = True,
    progress_bar_desc: str = "Filtering",
    additional_cot_instructions: str = "",
    system_prompt: str | None = None,
    output_tokens: tuple[str, str] = ("True", "False"),
    **model_kwargs: Any,
) -> SemanticFilterOutput:
    """Evaluate a boolean claim against each document."""
    inputs = [
        task_instructions.filter_formatter(
            model,
            doc,
            user_instruction,
            examples_multimodal_data,
            examples_answers,
            cot_reasoning,
            strategy,
            reasoning_instructions=additional_cot_instructions,
            system_prompt=system_prompt,
            output_tokens=output_tokens,
        )
        for doc in docs
    ]
    if safe_mode:
        show_safe_mode(sum(model.count_tokens(i) for i in inputs), len(docs))

    lm_output: LMOutput = model(
        inputs,
        show_progress_bar=show_progress_bar,
        progress_bar_desc=progress_bar_desc,
        logprobs=logprobs,
        **model_kwargs,
    )
    post = filter_postprocess(lm_output.outputs, model, default, output_tokens=output_tokens)
    if safe_mode:
        model.print_total_usage()
    return SemanticFilterOutput(
        raw_outputs=post.raw_outputs,
        outputs=post.outputs,
        explanations=post.explanations,
        logprobs=lm_output.logprobs if logprobs else None,
    )


def learn_filter_cascade_thresholds(
    sample_multimodal_data: list[dict[str, Any]],
    lm: LM,
    formatted_usr_instr: str,
    default: bool,
    cascade_args: CascadeArgs,
    proxy_scores: list[float],
    sample_correction_factors: NDArray[np.float64],
    examples_multimodal_data: list[dict[str, Any]] | None = None,
    examples_answers: list[bool] | None = None,
    cot_reasoning: list[str] | None = None,
    strategy: ReasoningStrategy | None = None,
    additional_cot_instructions: str = "",
    system_prompt: str | None = None,
    output_tokens: tuple[str, str] = ("True", "False"),
    **model_kwargs: Any,
) -> tuple[float, float]:
    """Label the sample with the oracle LM, then learn (tau_+, tau_-)."""
    oracle_outputs = sem_filter(
        sample_multimodal_data,
        lm,
        formatted_usr_instr,
        default=default,
        examples_multimodal_data=examples_multimodal_data,
        examples_answers=examples_answers,
        cot_reasoning=cot_reasoning,
        strategy=strategy,
        safe_mode=False,
        progress_bar_desc="Running oracle for threshold learning",
        additional_cot_instructions=additional_cot_instructions,
        system_prompt=system_prompt,
        output_tokens=output_tokens,
        **model_kwargs,
    ).outputs

    thresholds, _ = learn_cascade_thresholds(
        proxy_scores=proxy_scores,
        oracle_outputs=oracle_outputs,
        sample_correction_factors=sample_correction_factors,
        cascade_args=cascade_args,
    )
    lotus_tpu.logger.info(f"Learned cascade thresholds: {thresholds}")
    return thresholds


def _require_single_token(lm: LM, output_tokens: tuple[str, str], which: str) -> None:
    from lotus_tpu.models.tokenizer import ApproxTokenizer

    if isinstance(lm.tokenizer, ApproxTokenizer):
        # The approximate tokenizer can't know the provider's real token
        # boundaries; the check only applies with a real tokenizer attached.
        return
    for tok in output_tokens:
        if len(lm.encode_text(tok)) != 1:
            raise ValueError(
                f"Output token {tok!r} encodes to multiple tokens with the {which} LM; "
                "cascades require single-token outputs."
            )


@pd.api.extensions.register_dataframe_accessor("sem_filter")
class SemFilterDataframe:
    """Semantic filter accessor: ``df.sem_filter("{review} is positive")``.

    With ``cascade_args`` set, rows whose proxy confidence clears the learned
    (or provided) thresholds skip the oracle LM.
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
        user_instruction: str,
        return_raw_outputs: bool = False,
        return_explanations: bool = False,
        return_all: bool = False,
        default: bool = True,
        suffix: str = "_filter",
        examples: pd.DataFrame | None = None,
        helper_examples: pd.DataFrame | None = None,
        strategy: ReasoningStrategy | None = None,
        cascade_args: CascadeArgs | None = None,
        return_stats: bool = False,
        safe_mode: bool = False,
        progress_bar_desc: str = "Filtering",
        additional_cot_instructions: str = "",
        system_prompt: str | None = None,
        output_tokens: tuple[str, str] = ("True", "False"),
        **model_kwargs: Any,
    ) -> pd.DataFrame | tuple[pd.DataFrame, dict[str, Any]]:
        from lotus_tpu.settings import settings

        if settings.lm is None:
            raise ValueError("Configure a language model via lotus_tpu.settings.configure(lm=...)")

        stats: dict[str, Any] = {}
        main_cols = parse_cols(user_instruction)
        for column in main_cols:
            if column not in self._obj.columns:
                raise ValueError(f"Column {column} not found in DataFrame")
        main_data = task_instructions.df2multimodal_info(self._obj, main_cols)
        main_instr = nle2str(user_instruction, main_cols)

        # Helper-LM cascades may use their own instruction/columns.
        helper_data, helper_instr = main_data, main_instr
        helper_cols = main_cols
        if cascade_args is not None and cascade_args.proxy_model == ProxyModel.HELPER_LM:
            raw_helper_instr = cascade_args.helper_filter_instruction or user_instruction
            helper_cols = parse_cols(raw_helper_instr)
            for column in helper_cols:
                if column not in self._obj.columns:
                    raise ValueError(f"Column {column} not found in DataFrame")
            helper_data = task_instructions.df2multimodal_info(self._obj, helper_cols)
            helper_instr = nle2str(raw_helper_instr, helper_cols)

        ex_data = ex_answers = ex_cot = None
        if examples is not None:
            assert "Answer" in examples.columns, "Answer must be a column in examples dataframe"
            ex_data = task_instructions.df2multimodal_info(examples, main_cols)
            ex_answers = examples["Answer"].tolist()
            if strategy == ReasoningStrategy.COT and "Reasoning" in examples.columns:
                ex_cot = examples["Reasoning"].tolist()

        helper_ex_data = helper_ex_answers = helper_ex_cot = None
        if cascade_args is not None and cascade_args.proxy_model == ProxyModel.HELPER_LM:
            if helper_examples is not None:
                assert "Answer" in helper_examples.columns
                helper_ex_data = task_instructions.df2multimodal_info(helper_examples, helper_cols)
                helper_ex_answers = helper_examples["Answer"].tolist()
                if strategy == ReasoningStrategy.COT and "Reasoning" in helper_examples.columns:
                    helper_ex_cot = helper_examples["Reasoning"].tolist()

        pos_t = cascade_args.filter_pos_cascade_threshold if cascade_args else None
        neg_t = cascade_args.filter_neg_cascade_threshold if cascade_args else None

        proxy_model: ProxyModel | None = None
        helper_output: SemanticFilterOutput | None = None
        proxy_scores: list[float] = []

        if cascade_args:
            _require_single_token(settings.lm, output_tokens, "main")
            proxy_model = cascade_args.proxy_model

            if proxy_model == ProxyModel.HELPER_LM:
                if not settings.helper_lm:
                    raise ValueError("Helper LM must be set in settings")
                _require_single_token(settings.helper_lm, output_tokens, "helper")
                if strategy in (ReasoningStrategy.COT, ReasoningStrategy.ZS_COT):
                    raise ValueError("CoT not supported for helper models in cascades.")

                helper_output = sem_filter(
                    helper_data,
                    settings.helper_lm,
                    helper_instr,
                    default=default,
                    examples_multimodal_data=helper_ex_data,
                    examples_answers=helper_ex_answers,
                    cot_reasoning=helper_ex_cot,
                    logprobs=True,
                    strategy=strategy,
                    safe_mode=safe_mode,
                    show_progress_bar=True,
                    progress_bar_desc="Running helper LM",
                    system_prompt=system_prompt,
                    output_tokens=output_tokens,
                    **model_kwargs,
                )
                assert helper_output.logprobs is not None
                formatted: LogprobsForFilterCascade = settings.helper_lm.format_logprobs_for_filter_cascade(
                    helper_output.logprobs, output_tokens=output_tokens
                )
                proxy_scores = calibrate_llm_logprobs(formatted.positive_probs, cascade_args)
            elif proxy_model == ProxyModel.EMBEDDING_MODEL:
                if not settings.rm:
                    raise ValueError("RM must be set in settings")
                search_df = self._obj.sem_search(
                    main_cols[0], main_instr, K=len(self._obj), return_scores=True
                )
                # Re-align scores to the original row order and clip to
                # [0, 1]: cosine/ip similarities can be negative, and the
                # importance sampler takes sqrt(score).
                from lotus_tpu.sem_ops.cascade_utils import calibrate_sem_sim_join

                proxy_scores = calibrate_sem_sim_join(
                    search_df["vec_scores_sim_score"].reindex(self._obj.index).tolist()
                )

            if pos_t is None or neg_t is None:
                sample_indices, correction_factors = importance_sampling(proxy_scores, cascade_args)
                sample_df = self._obj.loc[self._obj.index[sample_indices]]
                sample_data = task_instructions.df2multimodal_info(sample_df, main_cols)
                pos_t, neg_t = learn_filter_cascade_thresholds(
                    sample_multimodal_data=sample_data,
                    lm=settings.lm,
                    formatted_usr_instr=main_instr,
                    default=default,
                    cascade_args=cascade_args,
                    proxy_scores=[proxy_scores[i] for i in sample_indices],
                    sample_correction_factors=correction_factors[sample_indices],
                    examples_multimodal_data=ex_data,
                    examples_answers=ex_answers,
                    cot_reasoning=ex_cot,
                    strategy=strategy,
                    additional_cot_instructions=additional_cot_instructions,
                    system_prompt=system_prompt,
                    output_tokens=output_tokens,
                    **model_kwargs,
                )
            stats["cascade_args"] = cascade_args.model_copy(deep=True)
            stats["cascade_args"].filter_pos_cascade_threshold = pos_t
            stats["cascade_args"].filter_neg_cascade_threshold = neg_t

        n = len(main_data)
        if pos_t is not None and neg_t is not None:
            high_conf = [i for i, p in enumerate(proxy_scores) if p >= pos_t or p <= neg_t]
            high_conf_set = set(high_conf)
            outputs = [False] * n
            raw_outputs = [""] * n
            explanations: list[str | None] = [None] * n
            for i in high_conf:
                outputs[i] = proxy_scores[i] >= pos_t
                if proxy_model == ProxyModel.HELPER_LM and helper_output is not None:
                    raw_outputs[i] = helper_output.raw_outputs[i]
                    explanations[i] = helper_output.explanations[i]

            low_conf = sorted(i for i in range(n) if i not in high_conf_set)
            if low_conf:
                oracle_out = sem_filter(
                    [main_data[i] for i in low_conf],
                    settings.lm,
                    main_instr,
                    default=default,
                    examples_multimodal_data=ex_data,
                    examples_answers=ex_answers,
                    cot_reasoning=ex_cot,
                    strategy=strategy,
                    safe_mode=safe_mode,
                    progress_bar_desc="Running predicate evals with oracle LM",
                    additional_cot_instructions=additional_cot_instructions,
                    system_prompt=system_prompt,
                    output_tokens=output_tokens,
                    **model_kwargs,
                )
                for j, i in enumerate(low_conf):
                    outputs[i] = oracle_out.outputs[j]
                    raw_outputs[i] = oracle_out.raw_outputs[j]
                    explanations[i] = oracle_out.explanations[j]

            lotus_tpu.logger.info(f"Num routed to smaller model: {len(high_conf)}")
            stats["num_routed_to_helper_model"] = len(high_conf)
            stats["filters_resolved_by_helper_model"] = len(high_conf)
            stats["filters_resolved_by_large_model"] = len(low_conf)
        else:
            out = sem_filter(
                main_data,
                settings.lm,
                main_instr,
                default=default,
                examples_multimodal_data=ex_data,
                examples_answers=ex_answers,
                cot_reasoning=ex_cot,
                strategy=strategy,
                safe_mode=safe_mode,
                show_progress_bar=True,
                progress_bar_desc=progress_bar_desc,
                additional_cot_instructions=additional_cot_instructions,
                system_prompt=system_prompt,
                output_tokens=output_tokens,
                **model_kwargs,
            )
            outputs, raw_outputs, explanations = out.outputs, out.raw_outputs, out.explanations

        if not return_all:
            keep = [i for i, x in enumerate(outputs) if x]
            new_df = self._obj.iloc[keep]
            new_df.attrs["index_dirs"] = self._obj.attrs.get("index_dirs", None)
            kept_explanations = [explanations[i] for i in keep]
            kept_raw = [raw_outputs[i] for i in keep]
        else:
            new_df = self._obj.copy()

            def out_col_name(col: str) -> str:
                if col not in new_df.columns:
                    return col
                i = 1
                while f"{col}_{i}" in new_df.columns:
                    i += 1
                return f"{col}_{i}"

            new_df[out_col_name(suffix)] = outputs
            kept_explanations = explanations
            kept_raw = raw_outputs

        if return_explanations:
            new_df["explanation" + suffix] = kept_explanations
        if return_raw_outputs:
            new_df["raw_output" + suffix] = kept_raw

        if return_stats:
            return new_df, stats
        return new_df
