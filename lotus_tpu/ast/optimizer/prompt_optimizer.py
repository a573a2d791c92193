"""Prompt/instruction optimizers over LazyFrame node parameters.

Parity target: ``lotus/ast/optimizer/gepa_optimizer.py:44-762``.  Two
implementations over shared target-collection machinery:

- :class:`GEPAOptimizer` — uses the external ``gepa`` package
  (``optimize_anything``) when installed, same constructor surface as the
  reference.
- :class:`PromptHillClimbOptimizer` — built-in dependency-free fallback:
  LLM-guided mutation + greedy hill-climb using ``settings.lm`` to propose
  instruction rewrites, scored by the user's ``eval_fn`` on train data.

Targets default to the natural-language instruction per node type
(``user_instruction`` on filter/map/agg/topk, ``join_instruction`` on join,
``query`` on search, judge instructions on eval nodes), honoring explicit
``mark_optimizable`` annotations; nested LazyFrames (e.g. a join's right
side) are walked recursively with path-addressed targets.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import TYPE_CHECKING, Any, Callable

import pandas as pd

import lotus_tpu
from lotus_tpu.ast.nodes import (
    BaseNode,
    LLMAsJudgeNode,
    PairwiseJudgeNode,
    SemAggNode,
    SemFilterNode,
    SemJoinNode,
    SemMapNode,
    SemSearchNode,
    SemTopKNode,
    SourceNode,
)
from lotus_tpu.ast.optimizer.base import BaseOptimizer
from lotus_tpu.cache import Cache, CacheFactory

if TYPE_CHECKING:  # pragma: no cover
    from lotus_tpu.ast.lazyframe import LazyFrame

DEFAULT_OPTIMIZABLE_PARAMS: dict[type, frozenset[str]] = {
    SemFilterNode: frozenset({"user_instruction", SemFilterNode._HELPER_PARAM}),
    SemMapNode: frozenset({"user_instruction"}),
    SemAggNode: frozenset({"user_instruction"}),
    SemTopKNode: frozenset({"user_instruction"}),
    SemJoinNode: frozenset({"join_instruction"}),
    SemSearchNode: frozenset({"query"}),
    LLMAsJudgeNode: frozenset({"judge_instruction"}),
    PairwiseJudgeNode: frozenset({"judge_instruction", PairwiseJudgeNode._HELPER_PARAM}),
}

UserEvalFn = Callable[..., Any]  # (output_df, example) -> float | (float, dict)


def _node_optimizable_params(node: BaseNode) -> frozenset[str]:
    if node.optimizable_params is not None:
        params = node.optimizable_params
    else:
        params = DEFAULT_OPTIMIZABLE_PARAMS.get(type(node), frozenset())
    return frozenset(p for p in params if node.supports_optimizable_param(p))


@dataclass(frozen=True)
class OptTarget:
    """One optimizable parameter at a path through (possibly nested) node
    lists.  ``lf_path`` is a tuple of (node_idx, field_name) hops into child
    LazyFrames; ``node_idx`` indexes the final node list."""

    lf_path: tuple[tuple[int, str], ...]
    node_idx: int
    param: str

    def key(self) -> str:
        hops = "/".join(f"{i}.{f}" for i, f in self.lf_path)
        return f"{hops}|{self.node_idx}|{self.param}"


def _child_lf_fields(node: BaseNode) -> list[tuple[str, "LazyFrame"]]:
    """(field_name, LazyFrame) pairs directly on this node."""
    from lotus_tpu.ast.lazyframe import LazyFrame

    out = []
    for fname in type(node).model_fields:
        value = getattr(node, fname, None)
        if isinstance(value, LazyFrame):
            out.append((fname, value))
        elif isinstance(value, dict):
            for k, v in value.items():
                if isinstance(v, LazyFrame):
                    out.append((f"{fname}[{k}]", v))
    return out


def collect_targets(nodes: list[BaseNode], lf_path: tuple[tuple[int, str], ...] = ()) -> list[OptTarget]:
    """Walk the node list (and nested LazyFrames) collecting targets."""
    targets: list[OptTarget] = []
    for idx, node in enumerate(nodes):
        if isinstance(node, SourceNode):
            continue
        for param in sorted(_node_optimizable_params(node)):
            targets.append(OptTarget(lf_path=lf_path, node_idx=idx, param=param))
        for fname, child_lf in _child_lf_fields(node):
            targets.extend(collect_targets(child_lf._nodes, lf_path + ((idx, fname),)))
    return targets


def _get_nested_field(node: BaseNode, fname: str) -> Any:
    if "[" in fname:
        root, key = fname[:-1].split("[", 1)
        return getattr(node, root)[key]
    return getattr(node, fname)


def resolve_target(nodes: list[BaseNode], target: OptTarget) -> BaseNode:
    cur_nodes = nodes
    for idx, fname in target.lf_path:
        child = _get_nested_field(cur_nodes[idx], fname)
        cur_nodes = child._nodes
    return cur_nodes[target.node_idx]


def apply_candidate(nodes: list[BaseNode], values: dict[str, str], targets: list[OptTarget]) -> list[BaseNode]:
    """Return a deep-copied node list with candidate values applied."""
    from lotus_tpu.ast.lazyframe import LazyFrame

    tmp = LazyFrame(_nodes=nodes)
    copied = tmp.copy()._nodes

    for target in targets:
        if target.key() not in values:
            continue
        cur_nodes = copied
        for idx, fname in target.lf_path:
            child = _get_nested_field(cur_nodes[idx], fname)
            cur_nodes = child._nodes
        cur_nodes[target.node_idx] = cur_nodes[target.node_idx].apply_optimizable_param_value(
            target.param, values[target.key()]
        )
    return copied


class _PromptOptimizerBase(BaseOptimizer):
    requires_train_data: bool = True

    def __init__(
        self,
        eval_fn: UserEvalFn,
        *,
        valset: Any = None,
        objective: str | None = None,
        background: str | None = None,
        cache: Cache | None = None,
        include_output_in_side_info: bool = True,
    ) -> None:
        self._eval_fn = eval_fn
        self._valset = valset
        self._objective = objective
        self._background = background
        self._cache = cache or CacheFactory.create_default_cache(max_size=10_000)
        self._include_output_in_side_info = include_output_in_side_info

    # ------------------------------------------------------------ evaluation
    def _score(self, nodes: list[BaseNode], example: Any) -> tuple[float, dict[str, Any]]:
        from lotus_tpu.ast.lazyframe import LazyFrame
        from lotus_tpu.ast.run import LazyFrameRun

        tmp = LazyFrame(_nodes=nodes)
        if not isinstance(example, (pd.DataFrame, dict)):
            return 0.0, {
                "error": f"training example must be a DataFrame or input dict, got {type(example).__name__}"
            }
        try:
            output = LazyFrameRun(tmp, example, cache=self._cache).execute()
        except Exception as e:
            lotus_tpu.logger.warning(f"Prompt optimizer: candidate execution failed: {e}")
            return 0.0, {"error": str(e)}
        result = self._eval_fn(output, example)
        if isinstance(result, tuple):
            score, side_info = result
        else:
            score, side_info = result, {}
        if self._include_output_in_side_info and "output" not in side_info:
            side_info = {**side_info, "output": output}
        return float(score), side_info

    def _examples(self, train_data: Any) -> list[Any]:
        if isinstance(train_data, list):
            return train_data
        return [train_data]


class GEPAOptimizer(_PromptOptimizerBase):
    """GEPA evolutionary prompt optimizer (requires the ``gepa`` package).

    Same surface as the reference's GEPAOptimizer: optimizes the NL
    instructions of semantic nodes via ``gepa.optimize_anything`` with the
    user's ``eval_fn`` providing scores (and optional side info for the
    reflection LM).
    """

    def __init__(self, eval_fn: UserEvalFn, *, gepa_config: Any = None, **kwargs: Any) -> None:
        super().__init__(eval_fn, **kwargs)
        self._gepa_config = gepa_config

    def optimize(self, nodes: list[BaseNode], train_data: Any = None) -> list[BaseNode]:
        try:
            from gepa.optimize_anything import optimize_anything  # type: ignore
        except ImportError as exc:
            raise ImportError(
                "GEPA package not found (pip install gepa). For a dependency-free "
                "alternative use PromptHillClimbOptimizer."
            ) from exc
        if train_data is None:
            raise ValueError("GEPAOptimizer requires train_data")

        targets = collect_targets(nodes)
        if not targets:
            lotus_tpu.logger.warning("GEPAOptimizer: no optimizable targets found")
            return nodes

        seed_candidate = {t.key(): str(resolve_target(nodes, t).resolve_optimizable_param_value(t.param)) for t in targets}
        examples = self._examples(train_data)

        def evaluator(candidate: dict[str, str], example: Any) -> tuple[float, dict[str, Any]]:
            patched = apply_candidate(nodes, candidate, targets)
            return self._score(patched, example)

        result = optimize_anything(
            seed_candidate=seed_candidate,
            evaluator=evaluator,
            trainset=examples,
            valset=self._valset,
            objective=self._objective,
            background=self._background,
            config=self._gepa_config,
        )
        best = getattr(result, "best_candidate", None) or seed_candidate
        return apply_candidate(nodes, best, targets)


class PromptEvolutionOptimizer(_PromptOptimizerBase):
    """Dependency-free GEPA-style evolutionary prompt search.

    Matches the reference GEPA loop's structure
    (``lotus/ast/optimizer/gepa_optimizer.py:464-514,690-745``) without the
    external package: candidates are full target->instruction maps scored by
    re-executing the patched pipeline per training example with the user's
    ``eval_fn`` (per-example score VECTORS, not just means); parents are
    sampled from the Pareto frontier weighted by how many examples each
    frontier member wins; children come from (a) reflection-LM mutation of
    one target, prompted with the worst examples' side info, or (b) a merge
    of two frontier parents (per-target values from whichever parent scores
    better).  The search stops at ``max_evals`` candidate evaluations and
    returns the archive member with the best mean score on ``valset`` (or
    the train set).
    """

    def __init__(
        self,
        eval_fn: UserEvalFn,
        *,
        max_evals: int = 12,
        merge_prob: float = 0.25,
        seed: int = 0,
        **kwargs: Any,
    ) -> None:
        super().__init__(eval_fn, **kwargs)
        self.max_evals = max_evals
        self.merge_prob = merge_prob
        self.seed = seed

    # ----------------------------------------------------------- LM proposal
    def _reflect(self, current: str, description: str, feedback: list[str]) -> str | None:
        from lotus_tpu.settings import settings

        if settings.lm is None:
            return None
        fb = "\n".join(f"- {f}" for f in feedback[:4]) or "- (no failures recorded)"
        prompt = (
            "You are evolving an instruction inside a data-processing pipeline. "
            "Study the failure feedback, then rewrite the instruction to fix "
            "those failures while preserving intent and any {column} "
            "placeholders EXACTLY as written.\n"
            f"Parameter description: {description or 'n/a'}\n"
            f"Failure feedback from the worst-scoring training examples:\n{fb}\n"
            f"Current instruction:\n{current}\n\n"
            "Return ONLY the rewritten instruction, nothing else."
        )
        try:
            out = settings.lm.get_completion(
                "You improve prompts for semantic data operators.",
                prompt,
                show_progress_bar=False,
            )
            out = str(out).strip()
            return out if out and out != current else None
        except Exception as e:
            lotus_tpu.logger.warning(f"PromptEvolutionOptimizer: reflection failed: {e}")
            return None

    # ---------------------------------------------------------------- search
    @staticmethod
    def _pareto_frontier(archive: list[dict[str, Any]]) -> list[dict[str, Any]]:
        """Members whose per-example score vector is not dominated."""
        frontier = []
        for a in archive:
            dominated = any(
                all(o >= s for o, s in zip(b["scores"], a["scores"]))
                and any(o > s for o, s in zip(b["scores"], a["scores"]))
                for b in archive
                if b is not a
            )
            if not dominated:
                frontier.append(a)
        return frontier

    def optimize(self, nodes: list[BaseNode], train_data: Any = None) -> list[BaseNode]:
        import random

        if train_data is None:
            raise ValueError("PromptEvolutionOptimizer requires train_data")
        targets = collect_targets(nodes)
        if not targets:
            lotus_tpu.logger.warning("PromptEvolutionOptimizer: no optimizable targets found")
            return nodes
        examples = self._examples(train_data)
        val_examples = self._examples(self._valset) if self._valset is not None else examples
        rng = random.Random(self.seed)

        def evaluate(values: dict[str, str]) -> dict[str, Any]:
            patched = apply_candidate(nodes, values, targets)
            scores, infos = [], []
            for ex in examples:
                s, info = self._score(patched, ex)
                scores.append(s)
                infos.append(info)
            return {"values": values, "scores": scores, "infos": infos}

        seed_values = {
            t.key(): str(resolve_target(nodes, t).resolve_optimizable_param_value(t.param))
            for t in targets
        }
        archive = [evaluate(seed_values)]
        evals = 1

        while evals < self.max_evals:
            frontier = self._pareto_frontier(archive)
            # GEPA-style parent sampling: weight frontier members by the
            # number of examples on which they hold the best score.
            best_per_ex = [max(m["scores"][i] for m in archive) for i in range(len(examples))]
            weights = [
                1 + sum(1 for i, s in enumerate(m["scores"]) if s >= best_per_ex[i])
                for m in frontier
            ]
            parent = rng.choices(frontier, weights=weights, k=1)[0]

            child_values: dict[str, str] | None = None
            if len(frontier) >= 2 and rng.random() < self.merge_prob:
                other = rng.choice([m for m in frontier if m is not parent])
                p_mean = sum(parent["scores"]) / len(examples)
                o_mean = sum(other["scores"]) / len(examples)
                lead, trail = (parent, other) if p_mean >= o_mean else (other, parent)
                child_values = dict(lead["values"])
                diff = [k for k in child_values if child_values[k] != trail["values"][k]]
                if diff:  # graft one trailing-parent gene
                    k = rng.choice(diff)
                    child_values[k] = trail["values"][k]
                else:
                    child_values = None
            if child_values is None:
                target = rng.choice(targets)
                node = resolve_target(nodes, target)
                desc = node.optimizable_param_description(target.param)
                # Reflection feedback: side info of the worst-scoring examples.
                order = sorted(range(len(examples)), key=lambda i: parent["scores"][i])
                feedback = []
                for i in order[:4]:
                    info = parent["infos"][i]
                    msg = info.get("error") or info.get("feedback")
                    if msg is None and self._include_output_in_side_info:
                        msg = f"score {parent['scores'][i]:.3f} on example {i}"
                    if msg:
                        feedback.append(str(msg))
                proposal = self._reflect(parent["values"][target.key()], desc, feedback)
                if proposal is None:
                    break  # no LM or nothing new to try
                child_values = {**parent["values"], target.key(): proposal}

            if any(m["values"] == child_values for m in archive):
                evals += 1
                continue
            child = evaluate(child_values)
            evals += 1
            archive.append(child)
            lotus_tpu.logger.info(
                f"PromptEvolutionOptimizer: candidate {evals} mean score "
                f"{sum(child['scores']) / len(examples):.4f}"
            )

        # Final selection on the validation set (re-executed).
        def val_mean(values: dict[str, str]) -> float:
            patched = apply_candidate(nodes, values, targets)
            return sum(self._score(patched, ex)[0] for ex in val_examples) / max(
                len(val_examples), 1
            )

        frontier = self._pareto_frontier(archive)
        best = max(frontier, key=lambda m: val_mean(m["values"]))
        return apply_candidate(nodes, best["values"], targets)


class PromptHillClimbOptimizer(_PromptOptimizerBase):
    """Built-in LLM-guided prompt search: propose rewrites with settings.lm,
    keep any candidate that improves the mean eval score (greedy
    hill-climb, ``n_rounds`` passes over the targets)."""

    def __init__(
        self,
        eval_fn: UserEvalFn,
        *,
        n_rounds: int = 2,
        proposals_per_target: int = 2,
        **kwargs: Any,
    ) -> None:
        super().__init__(eval_fn, **kwargs)
        self.n_rounds = n_rounds
        self.proposals_per_target = proposals_per_target

    def _propose(self, current: str, description: str, feedback: str) -> list[str]:
        from lotus_tpu.settings import settings

        if settings.lm is None:
            return []
        prompt = (
            "You are optimizing an instruction used inside a data-processing "
            "pipeline. Rewrite it to improve task accuracy while preserving "
            "intent and any {column} placeholders EXACTLY as written.\n"
            f"Parameter description: {description or 'n/a'}\n"
            f"Recent evaluation feedback: {feedback or 'n/a'}\n"
            f"Current instruction:\n{current}\n\n"
            "Return ONLY the rewritten instruction, nothing else."
        )
        proposals = []
        for i in range(self.proposals_per_target):
            try:
                out = settings.lm.get_completion(
                    "You improve prompts for semantic data operators.",
                    prompt + (f"\n\nVariant {i + 1}: make this variant distinct." if i else ""),
                    show_progress_bar=False,
                )
                out = str(out).strip()
                if out and out != current:
                    proposals.append(out)
            except Exception as e:
                lotus_tpu.logger.warning(f"PromptHillClimbOptimizer: proposal failed: {e}")
        return proposals

    def optimize(self, nodes: list[BaseNode], train_data: Any = None) -> list[BaseNode]:
        if train_data is None:
            raise ValueError("PromptHillClimbOptimizer requires train_data")
        targets = collect_targets(nodes)
        if not targets:
            lotus_tpu.logger.warning("PromptHillClimbOptimizer: no optimizable targets found")
            return nodes
        examples = self._examples(train_data)

        best_values = {
            t.key(): str(resolve_target(nodes, t).resolve_optimizable_param_value(t.param)) for t in targets
        }

        def mean_score(values: dict[str, str]) -> tuple[float, str]:
            patched = apply_candidate(nodes, values, targets)
            scores, infos = [], []
            for ex in examples:
                s, info = self._score(patched, ex)
                scores.append(s)
                if info.get("error"):
                    infos.append(str(info["error"]))
            return (sum(scores) / max(len(scores), 1)), "; ".join(infos[:3])

        best_score, feedback = mean_score(best_values)
        lotus_tpu.logger.info(f"PromptHillClimbOptimizer: baseline score {best_score:.4f}")

        for _round in range(self.n_rounds):
            improved = False
            for target in targets:
                node = resolve_target(nodes, target)
                desc = node.optimizable_param_description(target.param)
                for proposal in self._propose(best_values[target.key()], desc, feedback):
                    trial = {**best_values, target.key(): proposal}
                    score, fb = mean_score(trial)
                    if score > best_score:
                        best_score, best_values, feedback = score, trial, fb
                        improved = True
                        lotus_tpu.logger.info(
                            f"PromptHillClimbOptimizer: improved to {best_score:.4f} on {target.key()}"
                        )
            if not improved:
                break
        return apply_candidate(nodes, best_values, targets)
