"""sem_topk: LLM pairwise-comparison ranking.

Parity target: ``lotus/sem_ops/sem_topk.py:16-847`` — binary match prompt and
parser, batch compare with optional helper-LM cascade, three algorithms
(naive O(n^2) voting, K-pruned quicksort with optional embedding-informed
pivot, heapsort where each heap comparison is an LM call), and a
thread-pooled group_by accessor.  ``quick-sem`` pre-sorts by the TPU
embedding index so quicksort pivots start near the true top.
"""

from __future__ import annotations

import heapq
import re
from typing import Any

import numpy as np
import pandas as pd
from tqdm import tqdm

import lotus_tpu
from lotus_tpu.cache import operator_cache
from lotus_tpu.models import LM
from lotus_tpu.nl_expression import nle2str, parse_cols
from lotus_tpu.templates import task_instructions
from lotus_tpu.types import LMOutput, ReasoningStrategy, SemanticTopKOutput
from lotus_tpu.utils import show_safe_mode


def get_match_prompt_binary(
    doc1: dict[str, Any],
    doc2: dict[str, Any],
    user_instruction: str,
    model: LM,
    strategy: ReasoningStrategy | None = None,
) -> list[dict[str, Any]]:
    """Build the two-document comparison chat."""
    if strategy == ReasoningStrategy.ZS_COT:
        sys_prompt = (
            "Your job is to to select and return the most relevant document to the user's question.\n"
            "Carefully read the user's question and the two documents provided below.\n"
            'First give your reasoning. Then you MUST end your output with "Answer: Document 1 or Document 2"\n'
            'You must pick a number and cannot say things like "None" or "Neither"\n'
            'Remember to explicitly state "Answer:" at the end before your choice.'
        )
    else:
        sys_prompt = (
            "Your job is to to select and return the most relevant document to the user's question.\n"
            "Carefully read the user's question and the two documents provided below.\n"
            'Respond only with the label of the document such as "Document NUMBER".\n'
            "NUMBER must be either 1 or 2, depending on which document is most relevant.\n"
            'You must pick a number and cannot say things like "None" or "Neither"'
        )
    content: list[dict[str, Any]] = [{"type": "text", "text": f"Question: {user_instruction}\n"}]
    for idx, doc in enumerate((doc1, doc2)):
        text, image_parts = task_instructions.context_formatter(doc)
        content.append({"type": "text", "text": f"\nDocument {idx + 1}:\n{text}"})
        content.extend(image_parts)
    if strategy == ReasoningStrategy.ZS_COT and model.is_deepseek():
        content.append({"type": "text", "text": f"\n{task_instructions.deepseek_cot_formatter()}"})
    return [{"role": "system", "content": sys_prompt}, {"role": "user", "content": content}]


def parse_ans_binary(answer: str) -> tuple[bool, str]:
    """Parse the model's document choice. Returns (doc1_wins, explanation)."""
    explanation = ""
    try:
        t0, t1 = answer.find("<think>"), answer.find("</think>")
        if t0 != -1 and t1 != -1:
            explanation = answer[t0 + len("<think>"): t1].strip()
            answer = answer[t1 + len("</think>"):].strip()
        else:
            a_idx = answer.lower().find("answer:")
            if a_idx != -1:
                explanation = answer[:a_idx].strip()
                answer = answer[a_idx:].strip()
        matches = list(re.finditer(r"Document[\s*](\d+)", answer, re.IGNORECASE))
        if not matches:
            matches = list(re.finditer(r"(\d+)", answer))
        ans = int(matches[-1].group(1)) - 1
        if ans not in (0, 1):
            lotus_tpu.logger.info(f"Could not parse {answer}")
            return True, explanation
        return ans == 0, explanation
    except Exception:
        lotus_tpu.logger.info(f"Could not parse {answer}")
        return True, explanation


def compare_batch_binary(
    pairs: list[tuple[dict[str, Any], dict[str, Any]]],
    model: LM,
    user_instruction: str,
    strategy: ReasoningStrategy | None = None,
) -> tuple[list[bool], list[str], int]:
    """Compare each (doc1, doc2) pair. Returns (doc1_wins, explanations, tokens)."""
    prompts, tokens = [], 0
    for d1, d2 in pairs:
        prompts.append(get_match_prompt_binary(d1, d2, user_instruction, model=model, strategy=strategy))
        tokens += model.count_tokens(prompts[-1])
    lm_results: LMOutput = model(prompts, show_progress_bar=False)
    parsed = [parse_ans_binary(o) for o in lm_results.outputs]
    return [p[0] for p in parsed], [p[1] for p in parsed], tokens


def compare_batch_binary_cascade(
    pairs: list[tuple[dict[str, Any], dict[str, Any]]],
    model: LM,
    user_instruction: str,
    cascade_threshold: float,
    strategy: ReasoningStrategy | None = None,
) -> tuple[list[bool], list[str], int, int, int]:
    """Helper-LM first; escalate low-confidence comparisons to the main LM.

    Confidence = the helper's probability on its emitted document-number
    token.  Returns (results, explanations, small_tokens, large_tokens,
    num_large_calls).
    """
    from lotus_tpu.settings import settings

    prompts, small_tokens = [], 0
    for d1, d2 in pairs:
        prompts.append(get_match_prompt_binary(d1, d2, user_instruction, model=model, strategy=strategy))
        small_tokens += model.count_tokens(prompts[-1])

    helper_lm = settings.helper_lm
    if helper_lm is None:
        raise ValueError("Configure a helper LM via lotus_tpu.settings.configure(helper_lm=...)")

    helper_output = helper_lm(prompts, logprobs=True)
    assert helper_output.logprobs is not None
    formatted = helper_lm.format_logprobs_for_cascade(helper_output.logprobs)

    results: list[bool] = []
    explanations: list[str] = []
    high_conf: set[int] = set()
    for idx, raw in enumerate(helper_output.outputs):
        win, expl = parse_ans_binary(raw)
        results.append(win)
        explanations.append(expl)
        # Scan backwards for the emitted document number's confidence.
        for j in range(len(formatted.tokens[idx]) - 1, -1, -1):
            if formatted.tokens[idx][j].strip(" \n").isnumeric():
                if formatted.confidences[idx][j] >= cascade_threshold:
                    high_conf.add(idx)
                break

    large_tokens = 0
    low_conf = sorted(set(range(len(pairs))) - high_conf)
    if low_conf:
        large_prompts = [prompts[i] for i in low_conf]
        large_tokens = sum(model.count_tokens(p) for p in large_prompts)
        large_out: LMOutput = model(large_prompts)
        for j, i in enumerate(low_conf):
            win, expl = parse_ans_binary(large_out.outputs[j])
            results[i] = win
            explanations[i] = expl
    return results, explanations, small_tokens, large_tokens, len(low_conf)


def llm_naive_sort(
    docs: list[dict[str, Any]],
    model: LM,
    user_instruction: str,
    strategy: ReasoningStrategy | None = None,
    safe_mode: bool = False,
) -> SemanticTopKOutput:
    """All-pairs voting sort: O(n^2) comparisons."""
    n = len(docs)
    pairs = [(docs[i], docs[j]) for i in range(n) for j in range(i + 1, n)]
    pbar = tqdm(
        total=len(pairs),
        desc="All-pairs comparisons",
        bar_format="{l_bar}{bar}| {n_fmt}/{total_fmt} LM calls [{elapsed}<{remaining}]",
    )
    comparisons, explanations, tokens = compare_batch_binary(pairs, model, user_instruction, strategy=strategy)
    pbar.update(len(pairs))
    pbar.close()
    if safe_mode:
        show_safe_mode(tokens, len(pairs))

    votes = [0] * n
    expl_by_doc: dict[int, list[str]] = {i: [] for i in range(n)}
    idx = 0
    for i in range(n):
        for j in range(i + 1, n):
            winner = i if comparisons[idx] else j
            votes[winner] += 1
            expl_by_doc[winner].append(explanations[idx])
            idx += 1
    indexes = sorted(range(n), key=lambda i: votes[i], reverse=True)
    stats = {"total_tokens": tokens, "total_llm_calls": len(pairs), "explanations": expl_by_doc}
    return SemanticTopKOutput(indexes=indexes, stats=stats)


def llm_quicksort(
    docs: list[dict[str, Any]],
    model: LM,
    user_instruction: str,
    K: int,
    embedding: bool = False,
    strategy: ReasoningStrategy | None = None,
    cascade_threshold: float | None = None,
    safe_mode: bool = False,
) -> SemanticTopKOutput:
    """K-pruned quicksort: only recurse where the top-K boundary falls.

    With ``embedding=True`` the input order is assumed similarity-ranked
    (quick-sem), so the pivot is chosen near the expected K boundary instead
    of at random.
    """
    stats: dict[str, Any] = {"total_tokens": 0, "total_llm_calls": 0, "explanations": {}}
    if cascade_threshold is not None:
        stats.update(total_small_tokens=0, total_large_tokens=0, total_small_calls=0, total_large_calls=0)

    if safe_mode:
        sample = get_match_prompt_binary(docs[0], docs[1], user_instruction, model=model, strategy=strategy)
        est_calls = 2 * K + 2 * len(docs) * np.log(max(len(docs), 2))
        show_safe_mode(model.count_tokens(sample) * est_calls, est_calls)

    def record_explanations(indexes, low, comparisons, explanations):
        for j, (_, expl) in enumerate(zip(comparisons, explanations), start=low):
            stats["explanations"].setdefault(indexes[j], []).append(expl)

    def partition(indexes: list[int], low: int, high: int, K: int) -> int:
        if embedding:
            # Input order is similarity-ranked: pick the pivot at (about) the
            # K boundary of the remaining window.
            span = high - low
            rank = K if K <= span else max(1, (span + 1) // 2)
            pivot_value = heapq.nsmallest(rank, indexes[low: high + 1])[-1]
            pivot_index = indexes.index(pivot_value)
        else:
            pivot_index = int(np.random.randint(low, high + 1))
            pivot_value = indexes[pivot_index]
        pivot_doc = docs[pivot_value]
        indexes[pivot_index], indexes[high] = indexes[high], indexes[pivot_index]

        pairs = [(docs[indexes[j]], pivot_doc) for j in range(low, high)]
        if cascade_threshold is None:
            comparisons, explanations, tokens = compare_batch_binary(
                pairs, model, user_instruction, strategy=strategy
            )
            stats["total_tokens"] += tokens
            stats["total_llm_calls"] += len(pairs)
        else:
            comparisons, explanations, st, lt, lc = compare_batch_binary_cascade(
                pairs, model, user_instruction, cascade_threshold, strategy=strategy
            )
            stats["total_small_tokens"] += st
            stats["total_large_tokens"] += lt
            stats["total_small_calls"] += len(pairs)
            stats["total_large_calls"] += lc
        record_explanations(indexes, low, comparisons, explanations)

        i = low - 1
        for j, doc1_wins in enumerate(comparisons, start=low):
            if doc1_wins:
                i += 1
                indexes[i], indexes[j] = indexes[j], indexes[i]
        indexes[i + 1], indexes[high] = indexes[high], indexes[i + 1]
        return i + 1

    def qsort(indexes: list[int], low: int, high: int, K: int) -> None:
        if high <= low:
            return
        pbar = tqdm(
            total=high - low,
            desc="Quicksort comparisons",
            bar_format="{l_bar}{bar}| {n_fmt}/{total_fmt} LM calls [{elapsed}<{remaining}]",
        )
        pi = partition(indexes, low, high, K)
        pbar.update(high - low)
        pbar.close()
        left_size = pi - low
        if left_size + 1 >= K:
            qsort(indexes, low, pi - 1, K)
        else:
            qsort(indexes, low, pi - 1, left_size)
            qsort(indexes, pi + 1, high, K - left_size - 1)

    indexes = list(range(len(docs)))
    qsort(indexes, 0, len(indexes) - 1, K)
    return SemanticTopKOutput(indexes=indexes, stats=stats)


class HeapDoc:
    """Wraps a document so each heap comparison is one LM call."""

    num_calls: int = 0
    total_tokens: int = 0
    strategy: ReasoningStrategy | None = None
    model: LM | None = None
    explanations: dict[int, list[str]] = {}

    def __init__(self, doc: dict[str, Any], user_instruction: str, idx: int) -> None:
        self.doc = doc
        self.user_instruction = user_instruction
        self.idx = idx

    def __lt__(self, other: "HeapDoc") -> bool:
        assert HeapDoc.model is not None
        prompt = get_match_prompt_binary(
            self.doc, other.doc, self.user_instruction, model=HeapDoc.model, strategy=HeapDoc.strategy
        )
        HeapDoc.num_calls += 1
        HeapDoc.total_tokens += HeapDoc.model.count_tokens(prompt)
        result: LMOutput = HeapDoc.model([prompt], progress_bar_desc="Heap comparisons")
        is_better, explanation = parse_ans_binary(result.outputs[0])
        HeapDoc.explanations.setdefault(self.idx, []).append(explanation)
        HeapDoc.explanations.setdefault(other.idx, []).append(explanation)
        return is_better


def llm_heapsort(
    docs: list[dict[str, Any]],
    model: LM,
    user_instruction: str,
    K: int,
    strategy: ReasoningStrategy | None = None,
    safe_mode: bool = False,
) -> SemanticTopKOutput:
    """Top-K via heapq.nsmallest over LM-compared HeapDocs."""
    if safe_mode:
        sample = get_match_prompt_binary(docs[0], docs[1], user_instruction, model=model, strategy=strategy)
        est_calls = (len(docs) + K) * np.log(max(len(docs), 2))
        show_safe_mode(model.count_tokens(sample) * est_calls, est_calls)

    HeapDoc.num_calls = 0
    HeapDoc.total_tokens = 0
    HeapDoc.strategy = strategy
    HeapDoc.model = model
    HeapDoc.explanations = {}
    heap = [HeapDoc(doc, user_instruction, idx) for idx, doc in enumerate(docs)]
    heap = heapq.nsmallest(K, heap)
    indexes = [heapq.heappop(heap).idx for _ in range(len(heap))]
    stats = {
        "total_tokens": HeapDoc.total_tokens,
        "total_llm_calls": HeapDoc.num_calls,
        "explanations": HeapDoc.explanations,
    }
    return SemanticTopKOutput(indexes=indexes, stats=stats)


@pd.api.extensions.register_dataframe_accessor("sem_topk")
class SemTopKDataframe:
    """Top-K ranking accessor: ``df.sem_topk("Rank {title} by novelty", K=5)``.

    Methods: "quick" (default), "quick-sem" (embedding-presorted pivots),
    "heap", "naive".
    """

    def __init__(self, pandas_obj: Any):
        self._validate(pandas_obj)
        self._obj = pandas_obj

    @staticmethod
    def _validate(obj: Any) -> None:
        if not isinstance(obj, pd.DataFrame):
            raise AttributeError("Must be a DataFrame")

    @staticmethod
    def process_group(args: tuple) -> Any:
        group, user_instruction, K, method, strategy, group_by, cascade_threshold, return_stats = args
        return group.sem_topk(
            user_instruction,
            K,
            method=method,
            strategy=strategy,
            group_by=None,
            cascade_threshold=cascade_threshold,
            return_stats=return_stats,
        )

    @operator_cache
    def __call__(
        self,
        user_instruction: str,
        K: int,
        method: str = "quick",
        strategy: ReasoningStrategy | None = None,
        group_by: list[str] | None = None,
        cascade_threshold: float | None = None,
        return_stats: bool = False,
        safe_mode: bool = False,
        return_explanations: bool = False,
    ) -> pd.DataFrame | tuple[pd.DataFrame, dict[str, Any]]:
        from lotus_tpu.settings import settings

        model = settings.lm
        if model is None:
            raise ValueError("Configure a language model via lotus_tpu.settings.configure(lm=...)")

        col_li = parse_cols(user_instruction)
        for column in col_li:
            if column not in self._obj.columns:
                raise ValueError(
                    f"column {column} not found in DataFrame. Given usr instruction: {user_instruction}"
                )

        if group_by:
            from concurrent.futures import ThreadPoolExecutor

            grouped = self._obj.groupby(group_by)
            group_args = [
                (group, user_instruction, K, method, strategy, None, cascade_threshold, return_stats)
                for _, group in grouped
            ]
            with ThreadPoolExecutor(max_workers=settings.parallel_groupby_max_threads) as ex:
                results = list(ex.map(SemTopKDataframe.process_group, group_args))
            if return_stats:
                new_df = pd.concat([r[0] for r in results])
                stats = {name: r[1] for name, r in zip(grouped.groups.keys(), results)}
                return new_df, stats
            return pd.concat(results)

        df = self._obj
        if method == "quick-sem":
            assert len(col_li) == 1, "Only one column can be used for embedding optimization"
            col_name = col_li[0]
            df = df.sem_index(col_name, f"{col_name}_lotus_index").sem_search(
                col_name, user_instruction, len(df)
            )

        multimodal_data = task_instructions.df2multimodal_info(df, col_li)
        formatted_instr = nle2str(user_instruction, col_li)

        if method in ("quick", "quick-sem"):
            output = llm_quicksort(
                multimodal_data, model, formatted_instr, K,
                embedding=(method == "quick-sem"),
                strategy=strategy, cascade_threshold=cascade_threshold, safe_mode=safe_mode,
            )
        elif method == "heap":
            output = llm_heapsort(
                multimodal_data, model, formatted_instr, K, strategy=strategy, safe_mode=safe_mode
            )
        elif method == "naive":
            output = llm_naive_sort(
                multimodal_data, model, formatted_instr, strategy=strategy, safe_mode=safe_mode
            )
        else:
            raise ValueError(f"Method {method} not recognized")

        new_df = df.reset_index(drop=True)
        new_df = new_df.reindex(output.indexes).reset_index(drop=True).head(K)

        if return_explanations and strategy == ReasoningStrategy.ZS_COT:
            explanations = []
            for idx in output.indexes[:K]:
                expl_dict = (output.stats or {}).get("explanations", {})
                explanations.append(
                    "\n".join(expl_dict[idx]) if idx in expl_dict else "No Comparison Made"
                )
            new_df["explanation"] = explanations

        if return_stats:
            if output.stats is None:
                output.stats = {"explanations": {}}
            else:
                output.stats["explanations"] = {}
            return new_df, output.stats
        return new_df
