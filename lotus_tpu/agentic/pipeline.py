"""Agentic pipeline driver: fold ops (map/filter/reduce) over a corpus.

Parity target: ``lotus/agentic/pipeline.py:329-448``.  map and filter share
one execution core with three strategies (per_unit / batched /
shared_context); filter is map-to-a-verdict-then-select; reduce is a single
agent over all shard outputs.  Agents run in a thread pool; the model is
reached through a ``completer_factory`` so the whole pipeline is
offline-testable.
"""

from __future__ import annotations

import json
import logging
import re
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass, field
from typing import TYPE_CHECKING, Callable

from lotus_tpu.agentic.loop import Completer, LiteLLMCompleter, run_agent
from lotus_tpu.agentic.ops import FILTER, MAP, REDUCE, normalize_ops
from lotus_tpu.agentic.planner import DEFAULT_PARALLELISM_CAP, Plan, _heuristic_instruction, derive_plan

if TYPE_CHECKING:  # pragma: no cover
    from lotus_tpu.corpus import Corpus, Unit
    from lotus_tpu.tools.base import Tool

logger = logging.getLogger("lotus_tpu")

_MAP_SYSTEM = (
    "You are one worker in a parallel agentic map-reduce. You are given ONE shard of a "
    "larger corpus and an instruction. Investigate only your shard and report your "
    "findings concisely and completely."
)
_FILTER_SYSTEM = (
    "You are one worker in a parallel agentic filter. You are given a shard of a corpus "
    "(one or more units) and a keep/drop criterion. Investigate as needed — including with "
    "any tools available — and decide keep or drop for each unit. Follow the output format "
    "given in the instruction exactly."
)
_REDUCE_SYSTEM = (
    "You are the reducer in an agentic map-reduce. You are given the per-shard results "
    "from many parallel workers. Aggregate them into a single, coherent result per the "
    "instruction: deduplicate, reconcile, and prioritize."
)

_BATCH_MAP_SUFFIX = (
    "\n\nThe shard contains MULTIPLE units, each marked '[unit <id>]'. Use the other units "
    "as context, but produce the requested output for EACH unit. End your reply with a "
    'single JSON array on its own line: [{"id": "<id>", "output": "<result>"}, ...] with '
    "exactly one entry per unit id."
)
_BATCH_FILTER_SUFFIX = (
    "\n\nThe shard contains MULTIPLE units, each marked '[unit <id>]'. Use the other units "
    "as context, but decide KEEP or DROP for EACH unit. End your reply with a single JSON "
    'array on its own line: [{"id": "<id>", "keep": true|false}, ...] with exactly one '
    "entry per unit id."
)
_FILTER_SINGLE_SUFFIX = "\n\nEnd your reply with a line 'VERDICT: KEEP' or 'VERDICT: DROP'."


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


def _tools_guidance(tools: list["Tool"]) -> str:
    if not tools:
        return ""
    listed = "\n".join(f"- {t.name}: {t.description}" for t in tools)
    return (
        "\n\nTools available to you:\n"
        f"{listed}\n\n"
        "Use these tools whenever they help. In particular, use the Python REPL (or any "
        "other compute tool) for exact arithmetic, counting, parsing, and other "
        "deterministic work instead of doing it in your head."
    )


def _default_completer_factory(lm) -> Callable[[list["Tool"]], Completer]:
    return lambda tools: LiteLLMCompleter(lm, tools)


def _shard_content(shard: list["Unit"]) -> str:
    return "\n\n".join(f"[unit {u.id}]\n{u.content}" for u in shard)


def _parse_verdict(text: str) -> bool:
    """KEEP/DROP verdict; default KEEP so nothing is silently dropped."""
    m = re.search(r"VERDICT:\s*(KEEP|DROP)", text or "", re.IGNORECASE)
    if m:
        return m.group(1).upper() == "KEEP"
    upper = (text or "").upper()
    if "DROP" in upper and "KEEP" not in upper:
        return False
    if "KEEP" in upper and "DROP" not in upper:
        return True
    logger.warning("agentic filter: could not parse a KEEP/DROP verdict; keeping the unit by default.")
    return True


def _op_user_content(kind: str, instruction: str, shard: list["Unit"], context: str | None, batched: bool) -> str:
    parts = [f"INSTRUCTION:\n{instruction}"]
    if context:
        parts.append(f"SHARED CONTEXT:\n{context}")
    parts.append(f"SHARD:\n{_shard_content(shard)}")
    body = "\n\n".join(parts)
    if batched:
        body += _BATCH_FILTER_SUFFIX if kind == FILTER else _BATCH_MAP_SUFFIX
    elif kind == FILTER:
        body += _FILTER_SINGLE_SUFFIX
    return body


def _parse_batched(text: str, kind: str) -> dict[str, str]:
    """Per-unit JSON array -> {unit_id: result_text}; filter entries are
    normalized to VERDICT strings so _parse_verdict reads them."""
    out: dict[str, str] = {}
    m = re.search(r"\[[\s\S]*\]", text or "")
    if not m:
        return out
    try:
        arr = json.loads(m.group(0))
    except (json.JSONDecodeError, ValueError):
        return out
    if not isinstance(arr, list):
        return out
    for entry in arr:
        if not isinstance(entry, dict) or entry.get("id") is None:
            continue
        eid = str(entry["id"])
        if kind == FILTER:
            out[eid] = "VERDICT: KEEP" if entry.get("keep") else "VERDICT: DROP"
        else:
            out[eid] = str(entry.get("output", ""))
    return out


def _merge_usage(into: dict[str, int], other: dict[str, int]) -> None:
    for k, v in (other or {}).items():
        into[k] = into.get(k, 0) + v


def _run_shard(
    completer: Completer,
    tools: list["Tool"],
    system: str,
    kind: str,
    instruction: str,
    shard: list["Unit"],
    context: str | None,
    max_steps: int,
) -> tuple[list[tuple["Unit", str]], dict[str, int]]:
    batched = len(shard) > 1
    res = run_agent(
        completer, tools,
        system_prompt=system,
        user_content=_op_user_content(kind, instruction, shard, context, batched),
        max_steps=max_steps,
    )
    if not batched:
        return [(shard[0], res.output)], res.usage

    parsed = _parse_batched(res.output, kind)
    pairs: list[tuple["Unit", str]] = []
    for u in shard:
        if u.id in parsed:
            pairs.append((u, parsed[u.id]))
        else:
            logger.warning("agentic %s: batched output missing unit '%s'; using default.", kind, u.id)
            pairs.append((u, "VERDICT: KEEP" if kind == FILTER else u.content))
    return pairs, res.usage


def _run_corpus_op(
    corpus: "Corpus", kind: str, instruction: str, *,
    strategy: str, context: str | None, completer: Completer, tools: list["Tool"],
    system: str, shard_size: int | None, parallelism: int, max_steps: int,
    usage: dict[str, int],
) -> list[tuple["Unit", str]]:
    size = max(2, shard_size or 2) if strategy == "batched" else 1
    shards = corpus.shard(size)

    def one(shard: list["Unit"]):
        return _run_shard(completer, tools, system, kind, instruction, shard, context, max_steps)

    with ThreadPoolExecutor(max_workers=max(1, parallelism)) as ex:
        shard_outs = list(ex.map(one, shards))

    pairs: list[tuple["Unit", str]] = []
    for prs, u in shard_outs:
        pairs.extend(prs)
        _merge_usage(usage, u)
    return pairs


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

    op_list = normalize_ops(ops)
    tools = tools or []
    overrides = dict(instructions or {})
    strat_overrides = dict(strategies or {})
    ctx_overrides = dict(contexts or {})

    if lm is None:
        from lotus_tpu.settings import settings

        lm = settings.lm
    if completer_factory is None:
        completer_factory = _default_completer_factory(lm)

    cap = DEFAULT_PARALLELISM_CAP if max_parallelism == "auto" else int(max_parallelism)
    the_plan = plan if isinstance(plan, Plan) else derive_plan(
        task, corpus, op_list, lm=lm, overrides=overrides, parallelism_cap=cap
    )
    the_plan.ops = op_list
    the_plan.parallelism = max(1, min(the_plan.parallelism, cap))

    completer = completer_factory(tools)
    guidance = _tools_guidance(tools)
    usage: dict[str, int] = {}

    def instruction_for(op: str) -> str:
        return the_plan.instructions.get(op) or overrides.get(op) or _heuristic_instruction(op, task)

    def strategy_for(op: str) -> str:
        return strat_overrides.get(op) or the_plan.strategies.get(op) or "per_unit"

    def context_for(op: str) -> "str | None":
        return ctx_overrides.get(op) or the_plan.contexts.get(op)

    current: "Corpus | None" = corpus
    findings: list[str] | None = None
    output: str | None = None

    for op in op_list:
        assert current is not None  # terminal op is always last
        if op == MAP:
            pairs = _run_corpus_op(
                current, MAP, instruction_for(op),
                strategy=strategy_for(op), context=context_for(op),
                completer=completer, tools=tools, system=_MAP_SYSTEM + guidance,
                shard_size=the_plan.shard_size, parallelism=the_plan.parallelism,
                max_steps=max_steps, usage=usage,
            )
            current = Corpus(
                [Unit(id=u.id, content=r, metadata={"op": "map", "source_id": u.id}) for u, r in pairs]
            )
            findings = [r for _, r in pairs]
        elif op == FILTER:
            pairs = _run_corpus_op(
                current, FILTER, instruction_for(op),
                strategy=strategy_for(op), context=context_for(op),
                completer=completer, tools=tools, system=_FILTER_SYSTEM + guidance,
                shard_size=the_plan.shard_size, parallelism=the_plan.parallelism,
                max_steps=max_steps, usage=usage,
            )
            current = Corpus([u for u, r in pairs if _parse_verdict(r)])
        elif op == REDUCE:
            joined = "\n\n".join(f"[shard {i}]\n{u.content}" for i, u in enumerate(current.units))
            res = run_agent(
                completer, tools,
                system_prompt=_REDUCE_SYSTEM + guidance,
                user_content=f"INSTRUCTION:\n{instruction_for(op)}\n\nPER-SHARD FINDINGS:\n{joined}",
                max_steps=max_steps,
            )
            _merge_usage(usage, res.usage)
            output = res.output
            current = None

    return Result(ops=op_list, plan=the_plan, usage=usage, output=output, corpus=current, findings=findings)


__all__ = ["Result", "run_pipeline"]
