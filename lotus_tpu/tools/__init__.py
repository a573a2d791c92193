from lotus_tpu.tools.base import Tool, tool
from lotus_tpu.tools.repl import DockerSandbox, ExecResult, LocalSandbox, PythonREPLTool, Sandbox

__all__ = ["Tool", "tool", "PythonREPLTool", "LocalSandbox", "DockerSandbox", "Sandbox", "ExecResult"]
