"""Python execution tool, sandboxed behind a pluggable backend.

Role parity with ``lotus/tools/repl.py`` (agents get a ``python_repl`` tool),
restructured around a shared :class:`_Workspace` stage-and-run helper: each
backend only decides *how* to launch the interpreter; staging files, script
placement, timeout mapping, and output rendering are common.

Backends:

* :class:`LocalSandbox` — a subprocess in a throwaway directory. No isolation
  beyond the working dir; fine for trusted code and tests.
* :class:`DockerSandbox` — one ephemeral container per call, network off
  unless asked for.
"""

from __future__ import annotations

import subprocess
import sys
import tempfile
from dataclasses import dataclass
from pathlib import Path
from typing import Protocol

from pydantic import BaseModel, Field

from lotus_tpu.tools.base import Tool

_SCRIPT = "_cell.py"
_TIMEOUT_EXIT = 124


class Sandbox(Protocol):
    """Anything that can execute a Python source string and report back."""

    def run_code(self, code: str, files: dict[str, str] | None = None) -> str: ...


class _Workspace:
    """A temp dir holding the script plus any support files for one run."""

    def __init__(self, code: str, files: dict[str, str] | None):
        self._tmp = tempfile.TemporaryDirectory(prefix="lotus_tpu_cell_")
        self.root = Path(self._tmp.name)
        for relpath, text in (files or {}).items():
            target = self.root / relpath
            target.parent.mkdir(parents=True, exist_ok=True)
            target.write_text(text)
        (self.root / _SCRIPT).write_text(code)

    def __enter__(self) -> "_Workspace":
        return self

    def __exit__(self, *exc: object) -> None:
        self._tmp.cleanup()


def _render(stdout: str, stderr: str, exit_code: int) -> str:
    """Collapse a finished process into the observation string for the agent."""
    chunks: list[str] = []
    if stdout.strip():
        chunks.append(stdout.rstrip())
    if stderr.strip():
        chunks.append("[stderr]\n" + stderr.rstrip())
    if exit_code and not stderr.strip():
        chunks.append(f"[exit code {exit_code}]")
    return "\n".join(chunks) or "(no output)"


def _launch(cmd: list[str], *, cwd: Path, timeout: float) -> str:
    try:
        done = subprocess.run(cmd, cwd=str(cwd), capture_output=True, text=True, timeout=timeout)
    except subprocess.TimeoutExpired:
        return _render("", f"Execution timed out after {timeout:g}s", _TIMEOUT_EXIT)
    except FileNotFoundError as e:
        return _render("", f"{e.filename or cmd[0]}: not found on PATH", 127)
    return _render(done.stdout, done.stderr, done.returncode)


@dataclass
class LocalSandbox:
    """Run the cell with the host interpreter inside a scratch directory."""

    timeout: int = 30
    python: str | None = None

    def run_code(self, code: str, files: dict[str, str] | None = None) -> str:
        interpreter = self.python if self.python else sys.executable
        with _Workspace(code, files) as ws:
            return _launch([interpreter, _SCRIPT], cwd=ws.root, timeout=self.timeout)


@dataclass
class DockerSandbox:
    """Run the cell in a fresh container (``docker run --rm``), offline by default."""

    image: str = "python:3.11-slim"
    timeout: int = 30
    network: bool = False
    packages: list[str] | None = None

    def _container_cmd(self, workdir: Path) -> list[str]:
        setup = f"pip install -q {' '.join(self.packages)} && " if self.packages else ""
        net = ["--network", "bridge" if self.network else "none"]
        mount = ["-v", f"{workdir}:/work", "-w", "/work"]
        return (
            ["docker", "run", "--rm"]
            + net
            + mount
            + [self.image, "sh", "-c", f"{setup}python {_SCRIPT}"]
        )

    def run_code(self, code: str, files: dict[str, str] | None = None) -> str:
        with _Workspace(code, files) as ws:
            # Container start + optional pip install get extra headroom.
            return _launch(self._container_cmd(ws.root), cwd=ws.root, timeout=self.timeout + 60)


class _CellArgs(BaseModel):
    code: str = Field(..., description="Python source to run. print() anything you want returned.")


class PythonREPLTool(Tool):
    """The agent-facing ``python_repl`` tool: one stateless cell per call."""

    name = "python_repl"
    description = (
        "Run a Python cell in a sandbox; stdout/stderr come back as the observation. "
        "print() whatever you need returned — nothing persists between calls."
    )
    args_schema = _CellArgs

    def __init__(self, sandbox: Sandbox | None = None, **local_kwargs):
        self.sandbox: Sandbox = sandbox if sandbox is not None else LocalSandbox(**local_kwargs)

    def run(self, code: str) -> str:  # type: ignore[override]
        return self.sandbox.run_code(code)
