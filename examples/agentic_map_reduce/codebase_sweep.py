"""Agentic map-reduce: sweeping a codebase (fan out per file, synthesize).

Mirrors the reference's codebase_sweep.py (reference
examples/agentic_map_reduce/): load source files as a corpus (one file per
unit), analyze each in parallel, reduce to an architecture overview.  By
default it sweeps this repo's own agentic implementation.  Offline the
completer is scripted; set LOTUS_TPU_MODEL for a real run.

    python examples/agentic_map_reduce/codebase_sweep.py "lotus_tpu/sem_ops/*.py"
"""

import sys
from pathlib import Path

from lotus_tpu.agentic import Plan, run_pipeline
from lotus_tpu.agentic.loop import AgentStep
from lotus_tpu.corpus import Corpus

REPO_ROOT = Path(__file__).resolve().parents[2]
DEFAULT_GLOB = str(REPO_ROOT / "lotus_tpu" / "agentic" / "*.py")


class ScriptedCompleter:
    def __call__(self, messages, *, tools_enabled=True):
        user = next(m["content"] for m in reversed(messages) if m["role"] == "user")
        if "PER-SHARD FINDINGS" in user:
            return AgentStep(content="Overview: planner builds a Plan, loop drives tools, pipeline fans out.")
        defs = [line.split("(")[0].split()[-1] for line in user.splitlines() if line.startswith(("def ", "class "))]
        return AgentStep(content=f"defines: {', '.join(defs[:6]) or 'module-level code'}")


pattern = sys.argv[1] if len(sys.argv) > 1 else DEFAULT_GLOB
corpus = Corpus.from_files(pattern)
print(f"loaded {len(corpus.units)} files from {pattern}")

result = run_pipeline(
    corpus,
    "Summarize each file's purpose and key definitions, then produce one architecture overview.",
    ops=["map", "reduce"],
    plan=Plan(),
    lm=object(),
    completer_factory=lambda tools: ScriptedCompleter(),
)
for unit, finding in zip(corpus.units, result.findings or []):
    print(f"--- {unit.id}: {finding}")
print("overview:", result.output)
print("usage:", result.usage)
