"""Agentic map-reduce: totaling expense reports with the REPL tool.

Mirrors the reference's expense_reports.py (reference
examples/agentic_map_reduce/): each document is a small expense report,
the map computes per-report totals (exact arithmetic via the Python
sandbox, not by hand), the reduce produces a grand total.  Offline the
demo scripts the completer; set LOTUS_TPU_MODEL for a real tool-calling
run.
"""

import re

from lotus_tpu.agentic import Plan, run_pipeline
from lotus_tpu.agentic.loop import AgentStep
from lotus_tpu.corpus import Corpus
from lotus_tpu.tools import PythonREPLTool

REPORTS = [
    "Q1 travel: flights 420.50, hotel 610.00, meals 133.25.",
    "Q1 software: licenses 1200.00, cloud 348.75, monitoring 99.00.",
    "Q1 office: desks 890.00, chairs 445.50, supplies 76.20.",
]


class ScriptedCompleter:
    """Offline stand-in: computes each report total, then the grand total."""

    def __call__(self, messages, *, tools_enabled=True):
        user = next(m["content"] for m in reversed(messages) if m["role"] == "user")
        amounts = [float(a) for a in re.findall(r"\d+\.\d\d", user)]
        if "PER-SHARD FINDINGS" in user:
            return AgentStep(content=f"grand total {sum(amounts):.2f}")
        return AgentStep(content=f"report total {sum(amounts):.2f}")


corpus = Corpus.from_documents(REPORTS)
result = run_pipeline(
    corpus,
    "Compute the exact total of each expense report, then the grand total.",
    ops=["map", "reduce"],
    tools=[PythonREPLTool()],
    plan=Plan(),
    lm=object(),
    completer_factory=lambda tools: ScriptedCompleter(),
)
print("per-shard:", result.findings)
print("reduced:", result.output)
