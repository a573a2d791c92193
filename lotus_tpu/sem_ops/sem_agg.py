"""sem_agg: hierarchical aggregation of many documents into one answer.

Parity target: ``lotus/sem_ops/sem_agg.py:62-487``.  Documents are packed
into prompts up to ``max_ctx_len - max_tokens``, each level's summaries are
re-aggregated until one output remains.  Partition-aware: documents sharing
a partition id are kept together; when ids are unique the fold degenerates
to simple packing.  ``response_format`` is applied only on the final pass.
"""

from __future__ import annotations

import json
from concurrent.futures import ThreadPoolExecutor
from typing import Any

import pandas as pd
from pydantic import BaseModel

import lotus_tpu
from lotus_tpu.cache import operator_cache
from lotus_tpu.long_context_strategy import ChunkedDocument, create_chunked_documents
from lotus_tpu.models import LM
from lotus_tpu.nl_expression import nle2str, parse_cols
from lotus_tpu.templates import task_instructions
from lotus_tpu.types import LMOutput, LongContextStrategy, SemanticAggOutput


def _leaf_template(user_instruction: str) -> str:
    return (
        "Your job is to provide an answer to the user's instruction given the context below from multiple documents.\n"
        "Remember that your job is to answer the user's instruction by combining all relevant information from all provided documents, into a single coherent answer.\n"
        "Do NOT copy the format of the sources! Instead output your answer in a coherent, well-structured manner that best answers the user instruction.\n"
        "You have limited space to provide your answer, so be concise and to the point.\n\n---\n\n"
        "Follow the following format.\n\nContext: relevant facts from multiple documents\n\n"
        "Instruction: the instruction provided by the user\n\nAnswer: Write your answer\n\n---\n\n"
        "Context: {{docs_str}}\n\n"
        f"Instruction:  {user_instruction}\n\nAnswer:\n"
    )


def _node_template(user_instruction: str) -> str:
    return (
        "Your job is to provide an answer to the user's instruction given the context below from multiple sources.\n"
        "Note that each source may be formatted differently and contain information about several different documents.\n"
        "Remember that your job is to answer the user's instruction by combining all relevant information from all provided sources, into a single coherent answer.\n"
        "The sources may provide opposing viewpoints or complementary information.\n"
        "Be sure to include information from ALL relevant sources in your answer.\n"
        "Do NOT copy the format of the sources, instead output your answer in a coherent, well-structured manner that best answers the user instruction.\n"
        "You have limited space to provide your answer, so be concise and to the point.\n"
        "You may need to draw connections between sources to provide a complete answer.\n\n---\n\n"
        "Follow the following format.\n\nContext: relevant facts from multiple sources\n\n"
        "Instruction: the instruction provided by the user\n\nAnswer: Write your answer\n\n---\n\n"
        "Context: {{docs_str}}\n\n"
        f"Instruction:  {user_instruction}\n\nAnswer:\n"
    )


def sem_agg(
    docs: list[str] | ChunkedDocument,
    model: LM,
    user_instruction: str,
    partition_ids: list[int],
    safe_mode: bool = False,
    progress_bar_desc: str = "Aggregating",
    response_format: Any = None,
) -> SemanticAggOutput:
    """Hierarchically fold documents into a single answer."""
    if safe_mode:
        lotus_tpu.logger.warning("Safe mode is not implemented for sem_agg yet")

    doc_list = docs.docs if isinstance(docs, ChunkedDocument) else list(docs)
    templates = (_leaf_template(user_instruction), _node_template(user_instruction))

    def fmt(tree_level: int, doc: str, ctr: int) -> str:
        label = "Document" if tree_level == 0 else "Source"
        return f"\n\t{label} {ctr}: {doc}"

    tree_level = 0
    summaries: list[str] = []
    while len(doc_list) != 1 or not summaries:
        template = templates[0] if tree_level == 0 else templates[1]
        template_tokens = model.count_tokens(template)
        budget = model.max_ctx_len - model.max_tokens

        # Pack documents into prompts; a partition boundary also closes a
        # prompt unless every partition id is unique (pure fold).
        do_fold = len(partition_ids) == len(set(partition_ids))
        batch: list[list[dict[str, str]]] = []
        new_partition_ids: list[int] = []
        context_str, context_tokens = "", 0
        cur_pid = partition_ids[0]
        doc_ctr = 1

        def close_prompt(pid: int) -> None:
            batch.append([{"role": "user", "content": template.replace("{{docs_str}}", context_str)}])
            new_partition_ids.append(pid)

        for idx, doc in enumerate(doc_list):
            pid = partition_ids[idx]
            piece = fmt(tree_level, doc, doc_ctr)
            piece_tokens = model.count_tokens(piece)
            overflow = piece_tokens + context_tokens + template_tokens > budget
            boundary = pid != cur_pid and not do_fold
            if overflow or boundary:
                close_prompt(cur_pid)
                cur_pid = pid
                doc_ctr = 1
                piece = fmt(tree_level, doc, doc_ctr)
                context_str, context_tokens = piece, piece_tokens
                doc_ctr += 1
            else:
                context_str += piece
                context_tokens += piece_tokens
                doc_ctr += 1
        if doc_ctr > 1 or len(doc_list) == 1:
            close_prompt(cur_pid)

        # response_format applies only to the last pass (a single prompt).
        kwargs: dict[str, Any] = {}
        if len(batch) == 1 and response_format is not None:
            kwargs["response_format"] = response_format
        lm_output: LMOutput = model(batch, progress_bar_desc=progress_bar_desc, **kwargs)

        summaries = lm_output.outputs
        partition_ids, doc_list = new_partition_ids, summaries
        tree_level += 1
        if safe_mode:
            model.print_total_usage()
    return SemanticAggOutput(outputs=summaries)


@pd.api.extensions.register_dataframe_accessor("sem_agg")
class SemAggDataframe:
    """Aggregate rows into one answer: ``df.sem_agg("Summarize all {notes}")``."""

    def __init__(self, pandas_obj: Any):
        self._validate(pandas_obj)
        self._obj = pandas_obj

    @staticmethod
    def _validate(obj: Any) -> None:
        if not isinstance(obj, pd.DataFrame):
            raise AttributeError("Must be a DataFrame")

    @staticmethod
    def process_group(args: tuple) -> pd.DataFrame:
        (
            group_name, group, user_instruction, all_cols, group_by, suffix,
            progress_bar_desc, long_context_strategy, response_format,
        ) = args
        result = group.sem_agg(
            user_instruction,
            all_cols=all_cols,
            suffix=suffix,
            group_by=None,
            progress_bar_desc=progress_bar_desc,
            long_context_strategy=long_context_strategy,
            response_format=response_format,
        )
        if isinstance(group_name, tuple):
            for col, val in zip(group_by, group_name):
                result[col] = val
        else:
            result[group_by[0]] = group_name
        return result

    @operator_cache
    def __call__(
        self,
        user_instruction: str,
        all_cols: bool = False,
        suffix: str = "_output",
        group_by: list[str] | None = None,
        safe_mode: bool = False,
        progress_bar_desc: str = "Aggregating",
        long_context_strategy: LongContextStrategy | None = LongContextStrategy.CHUNK,
        split_fields_into_cols: bool = True,
        response_format: type[BaseModel] | dict | None = None,
    ) -> pd.DataFrame:
        from lotus_tpu.settings import settings

        if settings.lm is None:
            raise ValueError("Configure a language model via lotus_tpu.settings.configure(lm=...)")

        col_li = list(self._obj.columns) if all_cols else parse_cols(user_instruction)
        for column in col_li:
            if column not in self._obj.columns:
                raise ValueError(
                    f"column {column} not found in DataFrame. Given usr instruction: {user_instruction}"
                )

        if group_by:
            grouped = self._obj.groupby(group_by)
            group_args = [
                (
                    name, group, user_instruction, all_cols, group_by, suffix,
                    progress_bar_desc, long_context_strategy, response_format,
                )
                for name, group in grouped
            ]
            with ThreadPoolExecutor(max_workers=settings.parallel_groupby_max_threads) as ex:
                return pd.concat(list(ex.map(SemAggDataframe.process_group, group_args)))

        df = self._obj
        if "_lotus_partition_id" in df.columns:
            df = df.sort_values(by="_lotus_partition_id")
            partition_ids = df["_lotus_partition_id"].tolist()
        else:
            partition_ids = [0] * len(df)

        formatted_instr = nle2str(user_instruction, col_li)

        docs_input: list[str] | ChunkedDocument
        if long_context_strategy in (LongContextStrategy.TRUNCATE, LongContextStrategy.CHUNK):
            template_tokens = settings.lm.count_tokens(_leaf_template(formatted_instr))
            docs_input = create_chunked_documents(
                df, col_li, settings.lm, long_context_strategy, template_tokens
            )
            if "_lotus_partition_id" in df.columns:
                partition_ids = [
                    docs_input.get_value(i, "_lotus_partition_id") for i in range(len(docs_input))
                ]
            else:
                partition_ids = [0] * len(docs_input)
        else:
            docs_input = task_instructions.df2text(df, col_li)

        answer = sem_agg(
            docs_input,
            settings.lm,
            formatted_instr,
            partition_ids,
            safe_mode=safe_mode,
            progress_bar_desc=progress_bar_desc,
            response_format=response_format,
        )

        output: Any = answer.outputs[0]
        if response_format is not None and split_fields_into_cols:
            if isinstance(response_format, type) and issubclass(response_format, BaseModel):
                output = response_format.model_validate_json(answer.outputs[0]).model_dump()
            else:
                try:
                    output = json.loads(answer.outputs[0])
                except json.JSONDecodeError:
                    lotus_tpu.logger.warning(f"Failed to parse response format: {answer.outputs[0]}")

        if isinstance(output, dict):
            return pd.DataFrame([output])
        return pd.DataFrame([output], columns=[suffix])
