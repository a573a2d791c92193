from lotus_tpu.tools.base import FunctionTool, Tool, signature_model, tool
from lotus_tpu.tools.repl import DockerSandbox, LocalSandbox, PythonREPLTool, Sandbox

__all__ = [
    "Tool",
    "tool",
    "FunctionTool",
    "signature_model",
    "PythonREPLTool",
    "LocalSandbox",
    "DockerSandbox",
    "Sandbox",
]
