"""Planner: turn a one-line task into a concrete per-op Plan.

Parity target: ``lotus/agentic/planner.py:28-197``.  Derives one
natural-language instruction per op plus sharding/parallelism via an LM call
(pydantic response format), with a heuristic fallback whenever the LM is
missing or planning fails.
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Literal, Sequence

from pydantic import BaseModel, Field

from lotus_tpu.agentic.ops import DEFAULT_OPS, FILTER, MAP, REDUCE

if TYPE_CHECKING:  # pragma: no cover
    from lotus_tpu.corpus import Corpus

DEFAULT_PARALLELISM_CAP = 8

STRATEGIES: tuple[str, ...] = ("per_unit", "batched", "shared_context")


class Plan(BaseModel):
    """A concrete execution plan derived from a task."""

    ops: list[str] = Field(default_factory=lambda: list(DEFAULT_OPS))
    instructions: dict[str, str] = Field(default_factory=dict, description="Per-op instruction, keyed by op name.")
    strategies: dict[str, str] = Field(
        default_factory=dict, description="Per-op execution strategy: per_unit | batched | shared_context."
    )
    contexts: dict[str, str] = Field(
        default_factory=dict, description="Per-op shared context (for the shared_context strategy)."
    )
    segmentation: Literal["by_unit", "by_size", "semantic_chunk", "selector"] = "by_unit"
    shard_size: int | None = 1
    parallelism: int = 4
    selector: str | None = None
    reduce_strategy: Literal["hierarchical", "linear"] = "hierarchical"


class _PlanDraft(BaseModel):
    """What the LM planner is asked to produce."""

    map_instruction: str | None = None
    filter_instruction: str | None = None
    reduce_instruction: str | None = None
    map_strategy: str | None = None
    filter_strategy: str | None = None
    map_context: str | None = None
    filter_context: str | None = None
    shard_size: int = 1
    parallelism: int = 4


_OP_GUIDE = {
    MAP: "map_instruction — what each parallel agent should do to ONE shard of the corpus",
    FILTER: "filter_instruction — the keep/drop criterion each agent applies to ONE shard",
    REDUCE: "reduce_instruction — how to aggregate the per-shard results into one final answer",
}

_STRATEGY_GUIDE = (
    "For each corpus op (map/filter), also choose an execution strategy — how much context "
    "each per-unit decision gets:\n"
    "- 'per_unit' (default): one unit per agent, decided independently.\n"
    "- 'batched': several units per agent as mutual context; one result per unit. Best for "
    "comparative criteria or many tiny units.\n"
    "- 'shared_context': one unit per agent plus a fixed shared background you provide in "
    "map_context/filter_context.\n"
    "Set map_strategy/filter_strategy accordingly; with 'batched' also set shard_size; with "
    "'shared_context' fill the matching *_context."
)


def _planner_system(ops: Sequence[str]) -> str:
    wanted = "\n".join(f"- {_OP_GUIDE[op]}" for op in ops if op in _OP_GUIDE)
    strategy = f"\n\n{_STRATEGY_GUIDE}" if any(op in (MAP, FILTER) for op in ops) else ""
    return (
        "You are a planner for an agentic map-reduce system. Given a user's high-level "
        "task and a sample of the corpus, produce concrete, self-contained instructions "
        "for exactly the following pipeline ops (in order), plus shard_size (units per "
        "shard) and parallelism (agents to run concurrently):\n"
        f"{wanted}{strategy}"
    )


def _corpus_stats(corpus: "Corpus") -> str:
    lengths = [len(u.content) for u in corpus.units] or [0]
    return (
        f"{len(corpus)} units total; content length min={min(lengths)}, "
        f"max={max(lengths)}, mean={sum(lengths) // len(lengths)} chars."
    )


def _heuristic_instruction(op: str, task: str) -> str:
    if op == MAP:
        return f"For this shard, complete the task: {task}"
    if op == FILTER:
        return (
            f"Decide whether this shard is relevant to the task: {task}. "
            "End your reply with a line 'VERDICT: KEEP' or 'VERDICT: DROP'."
        )
    if op == REDUCE:
        return f"Combine the per-shard results into a single coherent answer for the task: {task}"
    return task


def derive_plan(
    task: str,
    corpus: "Corpus",
    ops: Sequence[str] | None = None,
    *,
    lm=None,
    overrides: dict[str, str] | None = None,
    parallelism_cap: int = DEFAULT_PARALLELISM_CAP,
) -> Plan:
    """Derive a Plan via the LM planner, falling back to heuristics."""
    ops = list(ops) if ops is not None else list(DEFAULT_OPS)
    overrides = dict(overrides or {})

    plan = Plan(
        ops=list(ops),
        instructions={op: overrides.get(op) or _heuristic_instruction(op, task) for op in ops},
        shard_size=1,
        parallelism=min(4, parallelism_cap),
    )

    if all(op in overrides for op in ops):
        return plan

    if lm is None:
        from lotus_tpu.settings import settings

        lm = settings.lm
    if lm is None:
        return plan

    sample = "\n---\n".join(u.content[:500] for u in corpus.sample(3))
    prompt = f"TASK:\n{task}\n\nCORPUS STATS: {_corpus_stats(corpus)}\n\nCORPUS SAMPLE:\n{sample}"
    try:
        draft = lm.get_completion(_planner_system(ops), prompt, response_format=_PlanDraft, show_progress_bar=False)
        for op in ops:
            derived = getattr(draft, f"{op}_instruction", None)
            plan.instructions[op] = overrides.get(op) or derived or _heuristic_instruction(op, task)
            strategy = (getattr(draft, f"{op}_strategy", None) or "").strip().lower()
            if strategy in STRATEGIES:
                plan.strategies[op] = strategy
            context = getattr(draft, f"{op}_context", None)
            if context:
                plan.contexts[op] = context
        plan.shard_size = max(1, draft.shard_size)
        plan.parallelism = max(1, min(draft.parallelism, parallelism_cap))
    except Exception:  # planning is best-effort
        pass
    return plan


__all__ = ["Plan", "derive_plan", "DEFAULT_PARALLELISM_CAP", "STRATEGIES"]
