"""Agentic map-reduce over a corpus, with the Python REPL tool.

Offline demo uses a scripted completer; with litellm installed and an API
key set, drop completer_factory to use the real tool-calling loop.
"""

from lotus_tpu.agentic import Plan, run_pipeline
from lotus_tpu.agentic.loop import AgentStep
from lotus_tpu.corpus import Corpus
from lotus_tpu.tools import PythonREPLTool


class DemoCompleter:
    def __call__(self, messages, *, tools_enabled=True):
        user = next(m["content"] for m in reversed(messages) if m["role"] == "user")
        if "PER-SHARD FINDINGS" in user:
            return AgentStep(content="All shards counted; total words reported.")
        words = len(user.split())
        return AgentStep(content=f"shard has ~{words} words")


corpus = Corpus.from_documents(
    ["The quick brown fox.", "Jumped over the lazy dog.", "And ran far away."]
)
result = corpus.agent(
    task="Count the words in each shard, then total them.",
    tools=[PythonREPLTool()],
    plan=Plan(),
    lm=object(),
    completer_factory=lambda tools: DemoCompleter(),
)
print("findings:", result.findings)
print("output:", result.output)
