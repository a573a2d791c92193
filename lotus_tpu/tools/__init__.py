"""Agent tools: schema-carrying callables plus a sandboxed Python REPL."""

from lotus_tpu.tools.base import FunctionTool, Tool, signature_model, tool
from lotus_tpu.tools.repl import DockerSandbox, LocalSandbox, PythonREPLTool, Sandbox

__all__ = [n for n in dir() if not n.startswith("_")]
