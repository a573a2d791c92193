"""sem_topk: LLM pairwise-comparison ranking.

Role parity with ``lotus/sem_ops/sem_topk.py:16-847``: a two-document duel
prompt and parser, batched comparisons with an optional helper-LM cascade,
and three ranking algorithms — all-pairs voting ("naive"), K-pruned
quicksort ("quick", with embedding-informed pivots as "quick-sem"), and a
top-K heap where every sift comparison is an LM call ("heap") — behind a
thread-pooled group_by accessor. The "quick-sem" presort rides the TPU
embedding index.

The pieces are organised around one :class:`ComparisonEngine` that owns the
model(s), prompt rendering, verdict parsing, token/call accounting, and the
cascade escalation policy; the sort algorithms only ask it to run duels.
"""

from __future__ import annotations

import heapq
import re
from itertools import combinations
from typing import Any

import numpy as np
import pandas as pd
from tqdm import tqdm

import lotus_tpu
from lotus_tpu.cache import operator_cache
from lotus_tpu.models import LM
from lotus_tpu.sem_ops._accessor import SemAccessor
from lotus_tpu.templates import task_instructions
from lotus_tpu.types import ReasoningStrategy, SemanticTopKOutput
from lotus_tpu.utils import show_safe_mode

# ---------------------------------------------------------------------------
# Duel prompt + verdict parsing
# ---------------------------------------------------------------------------

_DUEL_RULES = (
    "You are given a question and two documents, and must decide which "
    "document answers the question better.\n"
    "Weigh both documents against the question before choosing.\n"
)

_DIRECT_FORMAT = (
    'Reply with nothing but the winning label, written as "Document NUMBER" '
    "where NUMBER is 1 or 2.\n"
    'Choosing is mandatory: never reply "None", "Neither", or similar.'
)

_REASONED_FORMAT = (
    "Lay out your reasoning first. Then finish with the winning label on a "
    'final line of the form "Answer: Document 1" or "Answer: Document 2".\n'
    'The "Answer:" line is required, and choosing is mandatory: never reply '
    '"None", "Neither", or similar.'
)


def get_match_prompt_binary(
    doc1: dict[str, Any], doc2: dict[str, Any], user_instruction: str, model: LM,
    strategy: ReasoningStrategy | None = None,
) -> list[dict[str, Any]]:
    """Build the two-document comparison chat."""
    reasoned = strategy == ReasoningStrategy.ZS_COT
    system = _DUEL_RULES + (_REASONED_FORMAT if reasoned else _DIRECT_FORMAT)

    content: list[dict[str, Any]] = [{"type": "text", "text": f"Question: {user_instruction}\n"}]
    for number, doc in ((1, doc1), (2, doc2)):
        text, image_parts = task_instructions.context_formatter(doc)
        content.append({"type": "text", "text": f"\nDocument {number}:\n{text}"})
        content.extend(image_parts)
    if reasoned and model.is_deepseek():
        content.append({"type": "text", "text": f"\n{task_instructions.deepseek_cot_formatter()}"})
    return [{"role": "system", "content": system}, {"role": "user", "content": content}]


def parse_ans_binary(answer: str) -> tuple[bool, str]:
    """Parse the model's choice. Returns (doc1_wins, explanation); doc1 on failure."""
    reasoning = ""
    split = False
    open_tag, close_tag = answer.find("<think>"), answer.find("</think>")
    if open_tag != -1 and close_tag != -1:
        reasoning = answer[open_tag + len("<think>"): close_tag].strip()
        answer = answer[close_tag + len("</think>"):].strip()
        split = True
    else:
        marker = answer.lower().find("answer:")
        if marker != -1:
            reasoning, answer = answer[:marker].strip(), answer[marker:].strip()
            split = True

    hits = re.findall(r"document[\s*](\d+)", answer, re.IGNORECASE) or re.findall(r"\d+", answer)
    # Verdict selection, tuned on real-model output:
    # - After an Answer:/think split, the verdict LINE usually holds exactly
    #   one label ("Answer: Document 1") — use it even when later lines name
    #   the loser ("…Document 2 has no overlap").  If the verdict line itself
    #   is comparative ("Answer: Document 1 is less relevant than Document 2,
    #   so Document 2 wins"), the conclusion comes last — take the last
    #   mention.
    # - Unsplit replies that LEAD with the label ("Document 1\n\nWhile…")
    #   take the first mention; reasoning-first replies read conclusion-last.
    first_line_hits = re.findall(r"document[\s*](\d+)", answer.splitlines()[0] if answer else "", re.IGNORECASE)
    leads = re.match(r"\W*document[\s*]*\d+", answer, re.IGNORECASE) is not None
    try:
        if split and len(set(first_line_hits)) == 1:
            choice = int(first_line_hits[0])
        elif split:
            choice = int(hits[-1])
        else:
            choice = int(hits[0] if leads else hits[-1])
    except (IndexError, ValueError):
        choice = 0
    if choice not in (1, 2):
        lotus_tpu.logger.info(f"Could not parse {answer}")
        return True, reasoning
    return choice == 1, reasoning


# ---------------------------------------------------------------------------
# The comparison engine
# ---------------------------------------------------------------------------


class ComparisonEngine:
    """Runs document duels and accounts for every token they cost.

    With a ``cascade_threshold`` the helper LM answers first and only duels
    whose emitted document-number token falls below the confidence bar are
    escalated to the main model (stats keys grow the small/large split).
    """

    def __init__(
        self, model: LM, user_instruction: str,
        strategy: ReasoningStrategy | None = None, cascade_threshold: float | None = None,
    ):
        self.model = model
        self.user_instruction = user_instruction
        self.strategy = strategy
        self.cascade_threshold = cascade_threshold
        self.explanations: dict[int, list[str]] = {}
        self.tokens = 0
        self.calls = 0
        self.small_tokens = 0
        self.large_tokens = 0
        self.small_calls = 0
        self.large_calls = 0

    # ------------------------------------------------------------- prompts
    def render(self, pair: tuple[dict[str, Any], dict[str, Any]]) -> list[dict[str, Any]]:
        return get_match_prompt_binary(pair[0], pair[1], self.user_instruction, self.model, self.strategy)

    def sample_cost(self, pair: tuple[dict[str, Any], dict[str, Any]]) -> int:
        return self.model.count_tokens(self.render(pair))

    # --------------------------------------------------------------- duels
    def run(
        self, pairs: list[tuple[dict[str, Any], dict[str, Any]]],
        progress_bar_desc: str | None = None,
    ) -> list[tuple[bool, str]]:
        """Judge every pair; returns (first_doc_wins, explanation) per pair."""
        prompts = [self.render(p) for p in pairs]
        if self.cascade_threshold is not None:
            return self._cascaded(prompts)

        self.tokens += sum(self.model.count_tokens(p) for p in prompts)
        self.calls += len(prompts)
        extra = {"progress_bar_desc": progress_bar_desc} if progress_bar_desc else {"show_progress_bar": False}
        reply = self.model(prompts, **extra)
        return [parse_ans_binary(text) for text in reply.outputs]

    def _confidence_clears(self, tokens: list[str], confidences: list[float]) -> bool:
        """Did the helper's emitted document number clear the bar?"""
        for tok, conf in zip(reversed(tokens), reversed(confidences)):
            if tok.strip(" \n").isnumeric():
                return conf >= self.cascade_threshold
        return False

    def _cascaded(self, prompts: list[list[dict[str, Any]]]) -> list[tuple[bool, str]]:
        from lotus_tpu.settings import settings

        helper = settings.helper_lm
        if helper is None:
            raise ValueError("Configure a helper LM via lotus_tpu.settings.configure(helper_lm=...)")

        self.small_tokens += sum(self.model.count_tokens(p) for p in prompts)
        self.small_calls += len(prompts)
        first_pass = helper(prompts, logprobs=True)
        assert first_pass.logprobs is not None
        scored = helper.format_logprobs_for_cascade(first_pass.logprobs)

        verdicts = [parse_ans_binary(text) for text in first_pass.outputs]
        shaky = [
            i for i in range(len(prompts))
            if not self._confidence_clears(scored.tokens[i], scored.confidences[i])
        ]
        if shaky:
            retry_prompts = [prompts[i] for i in shaky]
            self.large_tokens += sum(self.model.count_tokens(p) for p in retry_prompts)
            self.large_calls += len(shaky)
            second_pass = self.model(retry_prompts)
            for slot, text in zip(shaky, second_pass.outputs):
                verdicts[slot] = parse_ans_binary(text)
        return verdicts

    # ---------------------------------------------------------- accounting
    def remember(self, doc_idx: int, explanation: str) -> None:
        self.explanations.setdefault(doc_idx, []).append(explanation)

    def export_stats(self) -> dict[str, Any]:
        stats: dict[str, Any] = {
            "total_tokens": self.tokens,
            "total_llm_calls": self.calls,
            "explanations": self.explanations,
        }
        if self.cascade_threshold is not None:
            stats.update(
                total_small_tokens=self.small_tokens,
                total_large_tokens=self.large_tokens,
                total_small_calls=self.small_calls,
                total_large_calls=self.large_calls,
            )
        return stats


def compare_batch_binary(
    pairs: list[tuple[dict[str, Any], dict[str, Any]]], model: LM, user_instruction: str,
    strategy: ReasoningStrategy | None = None,
) -> tuple[list[bool], list[str], int]:
    """Standalone batch compare (kept for API parity with the reference)."""
    engine = ComparisonEngine(model, user_instruction, strategy)
    verdicts = engine.run(pairs)
    return [w for w, _ in verdicts], [e for _, e in verdicts], engine.tokens


# ---------------------------------------------------------------------------
# Ranking algorithms
# ---------------------------------------------------------------------------


def _comparison_meter(total: int, desc: str) -> tqdm:
    return tqdm(
        total=total, desc=desc,
        bar_format="{l_bar}{bar}| {n_fmt}/{total_fmt} LM calls [{elapsed}<{remaining}]",
    )


def llm_naive_sort(
    docs: list[dict[str, Any]], model: LM, user_instruction: str,
    strategy: ReasoningStrategy | None = None, safe_mode: bool = False,
) -> SemanticTopKOutput:
    """All-pairs voting sort: O(n^2) comparisons."""
    engine = ComparisonEngine(model, user_instruction, strategy)
    engine.explanations = {i: [] for i in range(len(docs))}
    matchups = list(combinations(range(len(docs)), 2))

    meter = _comparison_meter(len(matchups), "All-pairs comparisons")
    verdicts = engine.run([(docs[i], docs[j]) for i, j in matchups])
    meter.update(len(matchups))
    meter.close()
    if safe_mode:
        show_safe_mode(engine.tokens, len(matchups))

    wins = [0] * len(docs)
    for (i, j), (first_won, explanation) in zip(matchups, verdicts):
        victor = i if first_won else j
        wins[victor] += 1
        engine.remember(victor, explanation)
    ranking = sorted(range(len(docs)), key=wins.__getitem__, reverse=True)
    return SemanticTopKOutput(indexes=ranking, stats=engine.export_stats())


def llm_quicksort(
    docs: list[dict[str, Any]], model: LM, user_instruction: str, K: int,
    embedding: bool = False, strategy: ReasoningStrategy | None = None,
    cascade_threshold: float | None = None, safe_mode: bool = False,
) -> SemanticTopKOutput:
    """K-pruned quicksort: only recurse into windows crossing the top-K line.

    With ``embedding=True`` the input order is similarity-ranked (quick-sem),
    so pivots are picked near the expected K boundary instead of at random.
    """
    engine = ComparisonEngine(model, user_instruction, strategy, cascade_threshold)
    if safe_mode:
        expected = 2 * K + 2 * len(docs) * np.log(max(len(docs), 2))
        show_safe_mode(engine.sample_cost((docs[0], docs[1])) * expected, expected)

    order = list(range(len(docs)))

    def pick_pivot(low: int, high: int, k: int) -> int:
        """Position of the pivot inside order[low..high]."""
        if not embedding:
            return int(np.random.randint(low, high + 1))
        # order[] values are similarity ranks here; aim at the K boundary.
        span = high - low
        rank = k if k <= span else max(1, (span + 1) // 2)
        boundary_value = sorted(order[low: high + 1])[rank - 1]
        return order.index(boundary_value)

    def split(low: int, high: int, k: int) -> int:
        pivot_pos = pick_pivot(low, high, k)
        pivot_id = order[pivot_pos]
        order[pivot_pos], order[high] = order[high], order[pivot_pos]

        meter = _comparison_meter(high - low, "Quicksort comparisons")
        verdicts = engine.run([(docs[order[j]], docs[pivot_id]) for j in range(low, high)])
        meter.update(high - low)
        meter.close()

        frontier = low
        for j, (beats_pivot, explanation) in enumerate(verdicts):
            slot = low + j
            engine.remember(order[slot], explanation)
            if beats_pivot:
                order[frontier], order[slot] = order[slot], order[frontier]
                frontier += 1
        order[frontier], order[high] = order[high], order[frontier]
        return frontier

    pending = [(0, len(order) - 1, K)]
    while pending:
        low, high, k = pending.pop()
        if high <= low:
            continue
        boundary = split(low, high, k)
        ahead = boundary - low  # docs proven better than the pivot
        if ahead + 1 >= k:
            pending.append((low, boundary - 1, k))
        else:
            pending.append((low, boundary - 1, ahead))
            pending.append((boundary + 1, high, k - ahead - 1))
    return SemanticTopKOutput(indexes=order, stats=engine.export_stats())


def llm_heapsort(
    docs: list[dict[str, Any]], model: LM, user_instruction: str, K: int,
    strategy: ReasoningStrategy | None = None, safe_mode: bool = False,
) -> SemanticTopKOutput:
    """Top-K via heapq.nsmallest where each sift comparison is one LM call."""
    engine = ComparisonEngine(model, user_instruction, strategy)
    if safe_mode:
        expected = (len(docs) + K) * np.log(max(len(docs), 2))
        show_safe_mode(engine.sample_cost((docs[0], docs[1])) * expected, expected)

    class _Contender:
        __slots__ = ("idx",)

        def __init__(self, idx: int):
            self.idx = idx

        def __lt__(self, other: "_Contender") -> bool:
            wins, explanation = engine.run(
                [(docs[self.idx], docs[other.idx])], progress_bar_desc="Heap comparisons"
            )[0]
            engine.remember(self.idx, explanation)
            engine.remember(other.idx, explanation)
            return wins

    podium = heapq.nsmallest(K, [_Contender(i) for i in range(len(docs))])
    ranking = [heapq.heappop(podium).idx for _ in range(len(podium))]
    return SemanticTopKOutput(indexes=ranking, stats=engine.export_stats())


# ---------------------------------------------------------------------------
# Accessor
# ---------------------------------------------------------------------------


@pd.api.extensions.register_dataframe_accessor("sem_topk")
class SemTopKDataframe(SemAccessor):
    """Top-K ranking accessor: ``df.sem_topk("Rank {title} by novelty", K=5)``.

    Methods: "quick" (default), "quick-sem" (embedding-presorted pivots),
    "heap", "naive".
    """

    @operator_cache
    def __call__(
        self, user_instruction: str, K: int, method: str = "quick",
        strategy: ReasoningStrategy | None = None, group_by: list[str] | None = None,
        cascade_threshold: float | None = None, return_stats: bool = False,
        safe_mode: bool = False, return_explanations: bool = False,
    ) -> pd.DataFrame | tuple[pd.DataFrame, dict[str, Any]]:
        from lotus_tpu.settings import settings

        model = self._lm()
        cols, instruction = self._parse_instruction(user_instruction)

        if group_by:
            def rank_one(frame: pd.DataFrame) -> Any:
                return frame.sem_topk(
                    user_instruction, K, method=method, strategy=strategy, group_by=None,
                    cascade_threshold=cascade_threshold, return_stats=return_stats,
                )

            from concurrent.futures import ThreadPoolExecutor

            grouped = self._obj.groupby(group_by)
            with ThreadPoolExecutor(max_workers=settings.parallel_groupby_max_threads) as pool:
                ranked = list(pool.map(rank_one, (frame for _, frame in grouped)))
            if return_stats:
                frames = pd.concat([piece[0] for piece in ranked])
                return frames, {name: piece[1] for name, piece in zip(grouped.groups.keys(), ranked)}
            return pd.concat(ranked)

        frame = self._obj
        if method == "quick-sem":
            assert len(cols) == 1, "Only one column can be used for embedding optimization"
            frame = frame.sem_index(cols[0], f"{cols[0]}_lotus_index").sem_search(
                cols[0], user_instruction, len(frame)
            )

        docs = task_instructions.df2multimodal_info(frame, cols)
        if method in ("quick", "quick-sem"):
            ranked_out = llm_quicksort(
                docs, model, instruction, K, embedding=(method == "quick-sem"),
                strategy=strategy, cascade_threshold=cascade_threshold, safe_mode=safe_mode,
            )
        elif method == "heap":
            ranked_out = llm_heapsort(docs, model, instruction, K, strategy=strategy, safe_mode=safe_mode)
        elif method == "naive":
            ranked_out = llm_naive_sort(docs, model, instruction, strategy=strategy, safe_mode=safe_mode)
        else:
            raise ValueError(f"Method {method} not recognized")

        result = (
            frame.reset_index(drop=True)
            .reindex(ranked_out.indexes)
            .reset_index(drop=True)
            .head(K)
        )

        if return_explanations and strategy == ReasoningStrategy.ZS_COT:
            recorded = (ranked_out.stats or {}).get("explanations", {})
            result["explanation"] = [
                "\n".join(recorded[idx]) if idx in recorded else "No Comparison Made"
                for idx in ranked_out.indexes[:K]
            ]

        if return_stats:
            stats = ranked_out.stats or {}
            stats["explanations"] = {}
            return result, stats
        return result
