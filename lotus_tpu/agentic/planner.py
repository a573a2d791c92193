"""Task planning for agentic pipelines.

Role parity with ``lotus/agentic/planner.py`` (turn a one-line task into
per-op instructions + sharding/parallelism), structured here as a two-stage
build: :func:`fallback_plan` always produces a runnable heuristic
:class:`Plan`, and — when an LM is configured — :func:`derive_plan` asks it
for a :class:`_Draft` and grafts whatever usable fields come back on top.
Planning is best-effort by design: any LM failure leaves the heuristic plan
in place.
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

    ops: list[str] = Field(default_factory=lambda: list(DEFAULT_OPS), description="Ordered op chain.")
    instructions: dict[str, str] = Field(default_factory=dict, description="Per-op instruction, keyed by op name.")
    strategies: dict[str, str] = Field(default_factory=dict, description="Per-op strategy (see STRATEGIES).")
    contexts: dict[str, str] = Field(default_factory=dict, description="Per-op shared background text.")
    segmentation: Literal["by_unit", "by_size", "semantic_chunk", "selector"] = Field(
        "by_unit", description="How the corpus splits into shards."
    )
    shard_size: int | None = Field(1, description="Units per shard (batched strategy).")
    parallelism: int = Field(4, description="Concurrent worker agents.")
    selector: str | None = Field(None, description="Unit selector expression (segmentation='selector').")
    reduce_strategy: Literal["hierarchical", "linear"] = Field(
        "hierarchical", description="Fold shape for the reduce op."
    )


class _OpDraft(BaseModel):
    """The planner LM's proposal for a single op."""

    instruction: str | None = None
    strategy: str | None = None
    context: str | None = None


class _Draft(BaseModel):
    """The structured answer the planning LM is asked for (one slot per op)."""

    map: _OpDraft | None = None
    filter: _OpDraft | None = None
    reduce: _OpDraft | None = None
    shard_size: int = Field(1, description="Units per shard.")
    parallelism: int = Field(4, description="Concurrent agents.")


# What each op's instruction must cover, shown to the planner LM.
_INSTRUCTION_BRIEF = {
    MAP: "map.instruction: the job one parallel agent performs on ONE shard",
    FILTER: "filter.instruction: the keep/drop test one agent applies to ONE shard",
    REDUCE: "reduce.instruction: how per-shard outputs merge into the final answer",
}

_STRATEGY_BRIEF = """\
Each corpus op (map/filter) also gets an execution strategy, which sets how much
context a per-unit decision sees:
  per_unit       — one unit per agent, judged alone (the default).
  batched        — several units per agent so they contextualise each other; still
                   one output per unit. Pick this for comparative criteria or many
                   tiny units, and set shard_size to the batch size.
  shared_context — one unit per agent plus fixed background text; put that text in
                   the op's context slot.
Record your choice in the op's strategy slot."""

# Heuristic instruction templates, used whenever no planner LM is available
# (and as the base the LM draft refines). The filter template bakes in the
# VERDICT wire format the pipeline's parser expects.
_HEURISTIC_TEMPLATES = {
    MAP: "For this shard, complete the task: {task}",
    FILTER: (
        "Decide whether this shard is relevant to the task: {task}."
        " End your reply with a line 'VERDICT: KEEP' or 'VERDICT: DROP'."
    ),
    REDUCE: "Combine the per-shard results into a single coherent answer for the task: {task}",
}


def heuristic_instruction(op: str, task: str) -> str:
    """A serviceable instruction when no planner LM is available."""
    return _HEURISTIC_TEMPLATES.get(op, "{task}").format(task=task)


def fallback_plan(task: str, ops: Sequence[str], overrides: dict[str, str], cap: int) -> Plan:
    """The always-available heuristic plan (also the base the LM refines)."""
    return Plan(
        ops=list(ops),
        instructions={op: overrides.get(op) or heuristic_instruction(op, task) for op in ops},
        shard_size=1,
        parallelism=min(4, cap),
    )


def _planner_brief(ops: Sequence[str]) -> str:
    lines = [
        "You plan work for an agentic map-reduce system. From the user's task and a",
        "corpus sample, write concrete self-contained instructions for exactly these",
        "pipeline ops (in order), and pick shard_size (units per shard) plus",
        "parallelism (concurrent agents):",
    ]
    lines += [f"  - {_INSTRUCTION_BRIEF[op]}" for op in ops if op in _INSTRUCTION_BRIEF]
    if any(op in (MAP, FILTER) for op in ops):
        lines += ["", _STRATEGY_BRIEF]
    return "\n".join(lines)


def _describe_corpus(corpus: "Corpus") -> str:
    sizes = [len(u.content) for u in corpus.units] or [0]
    head = "\n---\n".join(u.content[:500] for u in corpus.sample(3))
    return (
        f"CORPUS STATS: {len(corpus)} units; content chars "
        f"min={min(sizes)} max={max(sizes)} mean={sum(sizes) // len(sizes)}.\n\n"
        f"CORPUS SAMPLE:\n{head}"
    )


def _graft_draft(plan: Plan, draft: _Draft, ops: Sequence[str], overrides: dict[str, str], cap: int) -> None:
    """Overlay usable draft fields onto the heuristic plan, in place."""
    for op in ops:
        slot: _OpDraft | None = getattr(draft, op, None)
        if overrides.get(op):
            plan.instructions[op] = overrides[op]
        elif slot is not None and slot.instruction:
            plan.instructions[op] = slot.instruction
        if slot is None:
            continue
        strategy = (slot.strategy or "").strip().lower()
        if strategy in STRATEGIES:
            plan.strategies[op] = strategy
        if slot.context:
            plan.contexts[op] = slot.context
    plan.shard_size = max(1, draft.shard_size)
    plan.parallelism = min(max(1, draft.parallelism), cap)


def derive_plan(
    task: str,
    corpus: "Corpus",
    ops: Sequence[str] | None = None,
    *,
    lm=None,
    overrides: dict[str, str] | None = None,
    parallelism_cap: int = DEFAULT_PARALLELISM_CAP,
) -> Plan:
    """Produce a Plan for ``task`` over ``corpus``; LM-refined when possible."""
    ops = list(DEFAULT_OPS) if ops is None else list(ops)
    overrides = {**(overrides or {})}
    plan = fallback_plan(task, ops, overrides, parallelism_cap)

    # Fully overridden pipelines need no LM round-trip.
    if all(op in overrides for op in ops):
        return plan

    if lm is None:
        from lotus_tpu.settings import settings

        lm = settings.lm
    if lm is None:
        return plan

    try:
        draft = lm.get_completion(
            _planner_brief(ops),
            f"TASK:\n{task}\n\n{_describe_corpus(corpus)}",
            response_format=_Draft,
            show_progress_bar=False,
        )
        _graft_draft(plan, draft, ops, overrides, parallelism_cap)
    except Exception:  # planning is best-effort; keep the heuristic plan
        pass
    return plan


__all__ = ["Plan", "derive_plan", "fallback_plan", "heuristic_instruction", "DEFAULT_PARALLELISM_CAP", "STRATEGIES"]
