"""sem_filter: boolean predicate per row, with optional model cascade.

Role parity with ``lotus/sem_ops/sem_filter.py:24-669``. A cascade scores
every row with a cheap proxy — helper-LM True/False logprobs (quantile
calibrated) or embedding similarity from the TPU store — then routes rows
whose confidence clears (tau_+, tau_-) straight to the proxy's verdict and
sends only the uncertain band to the oracle LM. Thresholds are taken from
``cascade_args`` or learned by importance sampling against oracle labels.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import numpy as np
import pandas as pd

import lotus_tpu
from lotus_tpu.cache import operator_cache
from lotus_tpu.models import LM
from lotus_tpu.sem_ops._accessor import FewShot, SemAccessor
from lotus_tpu.sem_ops.cascade_utils import (
    calibrate_llm_logprobs,
    calibrate_sem_sim_join,
    importance_sampling,
    learn_cascade_thresholds,
)
from lotus_tpu.sem_ops.postprocessors import filter_postprocess
from lotus_tpu.templates import task_instructions
from lotus_tpu.types import (
    CascadeArgs,
    ProxyModel,
    ReasoningStrategy,
    SemanticFilterOutput,
)
from lotus_tpu.utils import show_safe_mode


def sem_filter(
    docs: list[dict[str, Any]], model: LM, user_instruction: str, *,
    default: bool = True, shots: FewShot | None = None,
    strategy: ReasoningStrategy | None = None, logprobs: bool = False,
    safe_mode: bool = False, show_progress_bar: bool = True,
    progress_bar_desc: str = "Filtering", additional_cot_instructions: str = "",
    system_prompt: str | None = None, output_tokens: tuple[str, str] = ("True", "False"),
    **model_kwargs: Any,
) -> SemanticFilterOutput:
    """Evaluate a boolean claim against each document."""
    shots = shots or FewShot()
    prompts = [
        task_instructions.filter_formatter(
            model, doc, user_instruction,
            shots.multimodal_data, shots.answers, shots.reasoning, strategy,
            reasoning_instructions=additional_cot_instructions,
            system_prompt=system_prompt, output_tokens=output_tokens,
        )
        for doc in docs
    ]
    if safe_mode:
        show_safe_mode(sum(model.count_tokens(p) for p in prompts), len(docs))

    reply = model(
        prompts, show_progress_bar=show_progress_bar,
        progress_bar_desc=progress_bar_desc, logprobs=logprobs, **model_kwargs,
    )
    parsed = filter_postprocess(reply.outputs, model, default, output_tokens=output_tokens)
    if safe_mode:
        model.print_total_usage()
    return SemanticFilterOutput(
        raw_outputs=parsed.raw_outputs, outputs=parsed.outputs,
        explanations=parsed.explanations,
        logprobs=reply.logprobs if logprobs else None,
    )


def _filter_shots(examples: pd.DataFrame | None, cols: list[str], strategy: ReasoningStrategy | None) -> FewShot:
    """Filter-flavoured example unpacking: Reasoning is optional under CoT."""
    if examples is None:
        return FewShot()
    assert "Answer" in examples.columns, "Answer must be a column in examples dataframe"
    shot = FewShot(
        multimodal_data=task_instructions.df2multimodal_info(examples, cols),
        answers=examples["Answer"].tolist(),
    )
    if strategy == ReasoningStrategy.COT and "Reasoning" in examples.columns:
        shot.reasoning = examples["Reasoning"].tolist()
    return shot


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


def learn_filter_cascade_thresholds(
    sample_multimodal_data: list[dict[str, Any]], lm: LM, formatted_usr_instr: str,
    default: bool, cascade_args: CascadeArgs, proxy_scores: list[float],
    sample_correction_factors: Any, shots: FewShot | None = None,
    strategy: ReasoningStrategy | None = None, additional_cot_instructions: str = "",
    system_prompt: str | None = None, output_tokens: tuple[str, str] = ("True", "False"),
    **model_kwargs: Any,
) -> tuple[float, float]:
    """Label the sample with the oracle LM, then learn (tau_+, tau_-)."""
    oracle_labels = sem_filter(
        sample_multimodal_data, lm, formatted_usr_instr,
        default=default, shots=shots, strategy=strategy, safe_mode=False,
        progress_bar_desc="Running oracle for threshold learning",
        additional_cot_instructions=additional_cot_instructions,
        system_prompt=system_prompt, output_tokens=output_tokens, **model_kwargs,
    ).outputs

    thresholds, _ = learn_cascade_thresholds(
        proxy_scores=proxy_scores,
        oracle_outputs=oracle_labels,
        sample_correction_factors=sample_correction_factors,
        cascade_args=cascade_args,
    )
    lotus_tpu.logger.info(f"Learned cascade thresholds: {thresholds}")
    return thresholds


@dataclass
class _ProxyPass:
    """Per-row proxy confidences, plus the helper's raw verdicts when an LM
    produced them (so confident rows can surface explanations)."""

    scores: list[float]
    helper_output: SemanticFilterOutput | None = None


class _RowVerdicts:
    """Accumulates per-row filter results, scattered in by position."""

    def __init__(self, n: int):
        self.outputs: list[bool] = [False] * n
        self.raw_outputs: list[str] = [""] * n
        self.explanations: list[str | None] = [None] * n

    def put(self, pos: int, output: bool, raw: str = "", explanation: str | None = None) -> None:
        self.outputs[pos] = output
        self.raw_outputs[pos] = raw
        self.explanations[pos] = explanation


@pd.api.extensions.register_dataframe_accessor("sem_filter")
class SemFilterDataframe(SemAccessor):
    """Semantic filter accessor: ``df.sem_filter("{review} is positive")``.

    With ``cascade_args`` set, rows whose proxy confidence clears the learned
    (or provided) thresholds skip the oracle LM.
    """

    # ------------------------------------------------------------ proxies
    def _helper_lm_pass(
        self, args: CascadeArgs, helper_examples: pd.DataFrame | None,
        default: bool, strategy: ReasoningStrategy | None, safe_mode: bool,
        system_prompt: str | None, output_tokens: tuple[str, str], **model_kwargs: Any,
    ) -> _ProxyPass:
        from lotus_tpu.settings import settings

        if not settings.helper_lm:
            raise ValueError("Helper LM must be set in settings")
        _require_single_token(settings.helper_lm, output_tokens, "helper")
        if strategy in (ReasoningStrategy.COT, ReasoningStrategy.ZS_COT):
            raise ValueError("CoT not supported for helper models in cascades.")

        # The helper may run its own instruction over its own columns.
        raw_instr = args.helper_filter_instruction or self._raw_instruction
        cols, instruction = self._parse_instruction(raw_instr)
        docs = task_instructions.df2multimodal_info(self._obj, cols)

        helper_out = sem_filter(
            docs, settings.helper_lm, instruction,
            default=default, shots=_filter_shots(helper_examples, cols, strategy),
            logprobs=True, strategy=strategy, safe_mode=safe_mode,
            show_progress_bar=True, progress_bar_desc="Running helper LM",
            system_prompt=system_prompt, output_tokens=output_tokens, **model_kwargs,
        )
        assert helper_out.logprobs is not None
        token_probs = settings.helper_lm.format_logprobs_for_filter_cascade(
            helper_out.logprobs, output_tokens=output_tokens
        )
        return _ProxyPass(
            scores=calibrate_llm_logprobs(token_probs.positive_probs, args),
            helper_output=helper_out,
        )

    def _embedding_pass(self, cols: list[str], instruction: str) -> _ProxyPass:
        from lotus_tpu.settings import settings

        if not settings.rm:
            raise ValueError("RM must be set in settings")
        scored = self._obj.sem_search(cols[0], instruction, K=len(self._obj), return_scores=True)
        # Back to the original row order; clip to [0, 1] because similarity
        # can be negative and the importance sampler takes sqrt(score).
        aligned = scored["vec_scores_sim_score"].reindex(self._obj.index).tolist()
        return _ProxyPass(scores=calibrate_sem_sim_join(aligned))

    # ------------------------------------------------------------ cascade
    def _run_cascade(
        self, args: CascadeArgs, docs: list[dict[str, Any]], cols: list[str],
        instruction: str, shots: FewShot, helper_examples: pd.DataFrame | None,
        default: bool, strategy: ReasoningStrategy | None, safe_mode: bool,
        additional_cot_instructions: str, system_prompt: str | None,
        output_tokens: tuple[str, str], stats: dict[str, Any], **model_kwargs: Any,
    ) -> _RowVerdicts:
        from lotus_tpu.settings import settings

        _require_single_token(settings.lm, output_tokens, "main")

        if args.proxy_model == ProxyModel.HELPER_LM:
            proxy = self._helper_lm_pass(
                args, helper_examples, default, strategy, safe_mode,
                system_prompt, output_tokens, **model_kwargs,
            )
        else:
            proxy = self._embedding_pass(cols, instruction)

        pos_t, neg_t = args.filter_pos_cascade_threshold, args.filter_neg_cascade_threshold
        if pos_t is None or neg_t is None:
            picked, corrections = importance_sampling(proxy.scores, args)
            sample_rows = self._obj.loc[self._obj.index[picked]]
            pos_t, neg_t = learn_filter_cascade_thresholds(
                task_instructions.df2multimodal_info(sample_rows, cols),
                settings.lm, instruction,
                default=default, cascade_args=args,
                proxy_scores=[proxy.scores[i] for i in picked],
                sample_correction_factors=corrections[picked],
                shots=shots, strategy=strategy,
                additional_cot_instructions=additional_cot_instructions,
                system_prompt=system_prompt, output_tokens=output_tokens, **model_kwargs,
            )
        stats["cascade_args"] = args.model_copy(deep=True)
        stats["cascade_args"].filter_pos_cascade_threshold = pos_t
        stats["cascade_args"].filter_neg_cascade_threshold = neg_t

        scores = np.asarray(proxy.scores)
        confident = (scores >= pos_t) | (scores <= neg_t)
        verdicts = _RowVerdicts(len(docs))
        for i in np.flatnonzero(confident):
            if proxy.helper_output is not None:
                verdicts.put(
                    i, bool(scores[i] >= pos_t),
                    proxy.helper_output.raw_outputs[i], proxy.helper_output.explanations[i],
                )
            else:
                verdicts.put(i, bool(scores[i] >= pos_t))

        uncertain = np.flatnonzero(~confident)
        if uncertain.size:
            oracle = sem_filter(
                [docs[i] for i in uncertain], settings.lm, instruction,
                default=default, shots=shots, strategy=strategy, safe_mode=safe_mode,
                progress_bar_desc="Running predicate evals with oracle LM",
                additional_cot_instructions=additional_cot_instructions,
                system_prompt=system_prompt, output_tokens=output_tokens, **model_kwargs,
            )
            for j, i in enumerate(uncertain):
                verdicts.put(i, oracle.outputs[j], oracle.raw_outputs[j], oracle.explanations[j])

        routed = int(confident.sum())
        lotus_tpu.logger.info(f"Num routed to smaller model: {routed}")
        stats["num_routed_to_helper_model"] = routed
        stats["filters_resolved_by_helper_model"] = routed
        stats["filters_resolved_by_large_model"] = int(uncertain.size)
        return verdicts

    # ----------------------------------------------------------- assembly
    def _assemble(
        self, verdicts: _RowVerdicts, return_all: bool, suffix: str,
        return_explanations: bool, return_raw_outputs: bool,
    ) -> pd.DataFrame:
        if return_all:
            result = self._obj.copy()
            name = suffix
            serial = 0
            while name in result.columns:
                serial += 1
                name = f"{suffix}_{serial}"
            result[name] = verdicts.outputs
            explanations, raws = verdicts.explanations, verdicts.raw_outputs
        else:
            kept = [i for i, keep in enumerate(verdicts.outputs) if keep]
            result = self._obj.iloc[kept]
            result.attrs["index_dirs"] = self._obj.attrs.get("index_dirs", None)
            explanations = [verdicts.explanations[i] for i in kept]
            raws = [verdicts.raw_outputs[i] for i in kept]

        if return_explanations:
            result["explanation" + suffix] = explanations
        if return_raw_outputs:
            result["raw_output" + suffix] = raws
        return result

    @operator_cache
    def __call__(
        self, user_instruction: str,
        return_raw_outputs: bool = False, return_explanations: bool = False,
        return_all: bool = False, default: bool = True, suffix: str = "_filter",
        examples: pd.DataFrame | None = None, helper_examples: pd.DataFrame | None = None,
        strategy: ReasoningStrategy | None = None, cascade_args: CascadeArgs | None = None,
        return_stats: bool = False, safe_mode: bool = False,
        progress_bar_desc: str = "Filtering", additional_cot_instructions: str = "",
        system_prompt: str | None = None, output_tokens: tuple[str, str] = ("True", "False"),
        **model_kwargs: Any,
    ) -> pd.DataFrame | tuple[pd.DataFrame, dict[str, Any]]:
        model = self._lm()
        self._raw_instruction = user_instruction
        cols, instruction = self._parse_instruction(user_instruction)
        docs = task_instructions.df2multimodal_info(self._obj, cols)
        shots = _filter_shots(examples, cols, strategy)
        stats: dict[str, Any] = {}

        if cascade_args is not None:
            verdicts = self._run_cascade(
                cascade_args, docs, cols, instruction, shots, helper_examples,
                default, strategy, safe_mode, additional_cot_instructions,
                system_prompt, output_tokens, stats, **model_kwargs,
            )
        else:
            plain = sem_filter(
                docs, model, instruction,
                default=default, shots=shots, strategy=strategy, safe_mode=safe_mode,
                show_progress_bar=True, progress_bar_desc=progress_bar_desc,
                additional_cot_instructions=additional_cot_instructions,
                system_prompt=system_prompt, output_tokens=output_tokens, **model_kwargs,
            )
            verdicts = _RowVerdicts(len(docs))
            for i in range(len(docs)):
                verdicts.put(i, plain.outputs[i], plain.raw_outputs[i], plain.explanations[i])

        result = self._assemble(verdicts, return_all, suffix, return_explanations, return_raw_outputs)
        if return_stats:
            return result, stats
        return result
