"""Agentic pipeline executor: runs an op chain (map/filter/reduce) over a corpus.

Role parity with ``lotus/agentic/pipeline.py``, organised around three small
stages instead of one monolithic driver:

1. *plan jobs* — :func:`_jobs_for_op` turns (corpus, op, Plan) into a list of
   :class:`_Job`s, each a fully-rendered prompt for one worker agent;
2. *fan out* — :func:`_fan_out` executes jobs on a thread pool through
   :func:`run_agent`;
3. *collect* — per-op collectors fold worker outputs back into a corpus
   (map/filter) or a final answer (reduce).

Wire formats shared with workers (and pinned by tests): units are framed as
``[unit <id>]``; filters answer ``VERDICT: KEEP|DROP``; batched shards answer
with one JSON array entry per unit id; the reducer sees ``PER-SHARD
FINDINGS``. The model is reached through ``completer_factory`` so the whole
pipeline runs offline under fakes.
"""

from __future__ import annotations

import json
import logging
import re
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass, field
from typing import TYPE_CHECKING, Callable

from lotus_tpu.agentic.loop import AgentResult, Completer, LiteLLMCompleter, run_agent
from lotus_tpu.agentic.ops import FILTER, MAP, REDUCE, normalize_ops
from lotus_tpu.agentic.planner import DEFAULT_PARALLELISM_CAP, Plan, derive_plan, heuristic_instruction

if TYPE_CHECKING:  # pragma: no cover
    from lotus_tpu.corpus import Corpus, Unit
    from lotus_tpu.tools.base import Tool

logger = logging.getLogger("lotus_tpu")

# ----------------------------------------------------------------- personas
_PERSONA = {
    MAP: (
        "You are one worker in a parallel agentic map-reduce. You are given ONE shard "
        "of a larger corpus and an instruction. Investigate only your shard and report "
        "your findings concisely and completely."
    ),
    FILTER: (
        "You are one worker in a parallel agentic filter. You are given a shard of a "
        "corpus (one or more units) and a keep/drop criterion. Investigate as needed — "
        "including with any tools available — and decide keep or drop for each unit. "
        "Follow the output format given in the instruction exactly."
    ),
    REDUCE: (
        "You are the reducer in an agentic map-reduce. You are given the per-shard "
        "results from many parallel workers. Aggregate them into a single, coherent "
        "result per the instruction: deduplicate, reconcile, and prioritize."
    ),
}

# Closing format demands appended to worker prompts.
_ASK_VERDICT = "\n\nEnd your reply with a line 'VERDICT: KEEP' or 'VERDICT: DROP'."
_ASK_JSON = {
    MAP: (
        "\n\nThe shard contains MULTIPLE units, each marked '[unit <id>]'. Use the other "
        "units as context, but produce the requested output for EACH unit. End your reply "
        'with a single JSON array on its own line: [{"id": "<id>", "output": "<result>"}, '
        "...] with exactly one entry per unit id."
    ),
    FILTER: (
        "\n\nThe shard contains MULTIPLE units, each marked '[unit <id>]'. Use the other "
        "units as context, but decide KEEP or DROP for EACH unit. End your reply with a "
        'single JSON array on its own line: [{"id": "<id>", "keep": true|false}, ...] '
        "with exactly one entry per unit id."
    ),
}


@dataclass
class _Job:
    """One worker invocation: a shard plus its fully-rendered user prompt."""

    shard: list["Unit"]
    prompt: str
    batched: bool


@dataclass
class Result:
    """Pipeline result: ``output`` for terminal pipelines, ``corpus`` for
    corpus-valued ones, ``findings`` = per-shard map outputs if a map ran."""

    ops: list[str]
    plan: Plan
    usage: dict[str, int] = field(default_factory=dict)
    output: str | None = None
    corpus: "Corpus | None" = None
    findings: list[str] | None = None

    def absorb_usage(self, delta: dict[str, int]) -> None:
        for key, n in (delta or {}).items():
            self.usage[key] = self.usage.get(key, 0) + n


# ------------------------------------------------------------ prompt render
def _frame_units(shard: list["Unit"]) -> str:
    return "\n\n".join(f"[unit {u.id}]\n{u.content}" for u in shard)


def _render_prompt(op: str, instruction: str, shard: list["Unit"], background: str | None) -> str:
    sections = [f"INSTRUCTION:\n{instruction}"]
    if background:
        sections.append(f"SHARED CONTEXT:\n{background}")
    sections.append(f"SHARD:\n{_frame_units(shard)}")
    text = "\n\n".join(sections)
    if len(shard) > 1:
        return text + _ASK_JSON[op]
    return text + _ASK_VERDICT if op == FILTER else text


def _jobs_for_op(corpus: "Corpus", op: str, instruction: str, strategy: str, background: str | None, shard_size: int | None) -> list[_Job]:
    """Slice the corpus per the strategy and render one prompt per shard."""
    width = max(2, shard_size or 2) if strategy == "batched" else 1
    return [
        _Job(shard=s, prompt=_render_prompt(op, instruction, s, background), batched=len(s) > 1)
        for s in corpus.shard(width)
        if s
    ]


def _tool_primer(tools: list["Tool"]) -> str:
    if not tools:
        return ""
    roster = "\n".join(f"- {t.name}: {t.description}" for t in tools)
    return (
        "\n\nTools available to you:\n"
        f"{roster}\n\n"
        "Use these tools whenever they help. In particular, use the Python REPL (or any "
        "other compute tool) for exact arithmetic, counting, parsing, and other "
        "deterministic work instead of doing it in your head."
    )


# ----------------------------------------------------------- output parsing
def _read_verdict(text: str) -> bool:
    """KEEP/DROP from a worker reply; unparseable replies default to KEEP."""
    hit = re.search(r"VERDICT:\s*(KEEP|DROP)", text or "", re.IGNORECASE)
    if hit:
        return hit.group(1).upper() == "KEEP"
    words = (text or "").upper()
    if ("DROP" in words) != ("KEEP" in words):  # exactly one keyword present
        return "KEEP" in words
    logger.warning("agentic filter: no KEEP/DROP verdict found; keeping the unit by default.")
    return True


def _read_json_array(text: str) -> list[dict]:
    hit = re.search(r"\[[\s\S]*\]", text or "")
    if not hit:
        return []
    try:
        data = json.loads(hit.group(0))
    except (json.JSONDecodeError, ValueError):
        return []
    return [e for e in data if isinstance(e, dict)] if isinstance(data, list) else []


def _per_unit_outputs(op: str, job: _Job, reply: str) -> list[tuple["Unit", str]]:
    """Attach one output string to every unit in the job's shard."""
    if not job.batched:
        return [(job.shard[0], reply)]

    by_id: dict[str, str] = {}
    for entry in _read_json_array(reply):
        if entry.get("id") is None:
            continue
        if op == FILTER:
            by_id[str(entry["id"])] = "VERDICT: KEEP" if entry.get("keep") else "VERDICT: DROP"
        else:
            by_id[str(entry["id"])] = str(entry.get("output", ""))

    rows: list[tuple["Unit", str]] = []
    for unit in job.shard:
        if unit.id in by_id:
            rows.append((unit, by_id[unit.id]))
        else:
            logger.warning("agentic %s: batched reply missing unit '%s'; using default.", op, unit.id)
            rows.append((unit, "VERDICT: KEEP" if op == FILTER else unit.content))
    return rows


# ---------------------------------------------------------------- execution
def _fan_out(
    jobs: list[_Job],
    *,
    completer: Completer,
    tools: list["Tool"],
    persona: str,
    parallelism: int,
    max_steps: int,
) -> list[AgentResult]:
    def worker(job: _Job) -> AgentResult:
        return run_agent(completer, tools, system_prompt=persona, user_content=job.prompt, max_steps=max_steps)

    with ThreadPoolExecutor(max_workers=max(1, parallelism)) as pool:
        return list(pool.map(worker, jobs))


class _PipelineRun:
    """Mutable state threaded through the op chain."""

    def __init__(self, result: Result, completer: Completer, tools: list["Tool"], guidance: str, max_steps: int):
        self.result = result
        self.completer = completer
        self.tools = tools
        self.guidance = guidance
        self.max_steps = max_steps

    def corpus_op(self, corpus: "Corpus", op: str) -> list[tuple["Unit", str]]:
        plan = self.result.plan
        jobs = _jobs_for_op(
            corpus,
            op,
            plan.instructions.get(op) or heuristic_instruction(op, "(no instruction)"),
            plan.strategies.get(op, "per_unit"),
            plan.contexts.get(op),
            plan.shard_size,
        )
        replies = _fan_out(
            jobs,
            completer=self.completer,
            tools=self.tools,
            persona=_PERSONA[op] + self.guidance,
            parallelism=plan.parallelism,
            max_steps=self.max_steps,
        )
        rows: list[tuple["Unit", str]] = []
        for job, res in zip(jobs, replies):
            self.result.absorb_usage(res.usage)
            rows.extend(_per_unit_outputs(op, job, res.output))
        return rows

    def reduce_op(self, corpus: "Corpus", op: str) -> str:
        digest = "\n\n".join(f"[shard {i}]\n{u.content}" for i, u in enumerate(corpus.units))
        instruction = self.result.plan.instructions.get(op) or heuristic_instruction(op, "(no instruction)")
        res = run_agent(
            self.completer,
            self.tools,
            system_prompt=_PERSONA[REDUCE] + self.guidance,
            user_content=f"INSTRUCTION:\n{instruction}\n\nPER-SHARD FINDINGS:\n{digest}",
            max_steps=self.max_steps,
        )
        self.result.absorb_usage(res.usage)
        return res.output


def run_pipeline(
    corpus: "Corpus",
    task: str,
    *,
    ops: "str | list[str] | None" = None,
    tools: list["Tool"] | None = None,
    instructions: dict[str, str] | None = None,
    strategies: dict[str, str] | None = None,
    contexts: dict[str, str] | None = None,
    plan: "Plan | str" = "auto",
    max_parallelism: int | str = "auto",
    max_steps: int = 6,
    verify: bool = False,  # reserved for a sandboxed re-check phase
    lm=None,
    completer_factory: Callable[[list["Tool"]], Completer] | None = None,
) -> Result:
    """Run an ordered pipeline of agent ops over ``corpus`` for ``task``."""
    from lotus_tpu.corpus import Corpus, Unit

    chain = normalize_ops(ops)
    tools = tools or []

    if lm is None:
        from lotus_tpu.settings import settings

        lm = settings.lm
    if completer_factory is None:
        completer_factory = lambda ts: LiteLLMCompleter(lm, ts)  # noqa: E731

    cap = DEFAULT_PARALLELISM_CAP if max_parallelism == "auto" else int(max_parallelism)
    if isinstance(plan, Plan):
        the_plan = plan
    else:
        the_plan = derive_plan(task, corpus, chain, lm=lm, overrides=dict(instructions or {}), parallelism_cap=cap)
    the_plan.ops = chain
    the_plan.parallelism = min(max(1, the_plan.parallelism), cap)

    # Explicit per-op arguments take precedence over whatever the plan holds.
    for op in chain:
        if instructions and op in instructions:
            the_plan.instructions[op] = instructions[op]
        if strategies and op in strategies:
            the_plan.strategies[op] = strategies[op]
        if contexts and op in contexts:
            the_plan.contexts[op] = contexts[op]
        the_plan.instructions.setdefault(op, heuristic_instruction(op, task))

    result = Result(ops=chain, plan=the_plan)
    run = _PipelineRun(result, completer_factory(tools), tools, _tool_primer(tools), max_steps)

    live: "Corpus | None" = corpus
    for op in chain:
        assert live is not None  # normalize_ops guarantees terminal-last
        if op == REDUCE:
            result.output = run.reduce_op(live, op)
            live = None
        else:
            rows = run.corpus_op(live, op)
            if op == MAP:
                live = Corpus(
                    Unit(id=u.id, content=text, metadata={"op": "map", "source_id": u.id}) for u, text in rows
                )
                result.findings = [text for _, text in rows]
            else:  # FILTER
                live = Corpus(u for u, text in rows if _read_verdict(text))
    result.corpus = live
    return result


__all__ = ["Result", "run_pipeline"]
