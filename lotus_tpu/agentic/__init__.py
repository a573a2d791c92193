"""Agentic map-reduce layer: ops algebra, planner, agent loop, pipeline."""

from lotus_tpu.agentic.loop import AgentResult, AgentStep, Completer, LiteLLMCompleter, ToolCall, run_agent
from lotus_tpu.agentic.ops import CORPUS_OPS, DEFAULT_OPS, FILTER, MAP, OPS, REDUCE, TERMINAL_OPS, normalize_ops
from lotus_tpu.agentic.pipeline import Result, run_pipeline
from lotus_tpu.agentic.planner import DEFAULT_PARALLELISM_CAP, Plan, derive_plan

__all__ = [n for n in dir() if not n.startswith("_")]
