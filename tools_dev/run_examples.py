"""Run every example script offline (forced-CPU JAX), report pass/fail.

Usage: python tools_dev/run_examples.py [glob ...]

Examples are written to run without network or API keys (provider sections
gate on env/imports), so this doubles as an offline smoke lane for CI.
The runner forces the CPU backend via JAX_PLATFORMS plus a sitecustomize
shim (the axon plugin ignores the env var alone) and runs each script in
its own subprocess with a timeout.
"""

from __future__ import annotations

import glob
import os
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TIMEOUT_S = int(os.getenv("EXAMPLES_TIMEOUT_S", "300"))


def main(patterns: list[str]) -> int:
    patterns = patterns or [os.path.join(REPO, "examples", "*", "*.py")]
    scripts = sorted(p for pat in patterns for p in glob.glob(pat) if "_common" not in p)
    if not scripts:
        print("no example scripts matched", file=sys.stderr)
        return 2

    # Force CPU before any jax import inside the example process: the env
    # var alone does not override the axon plugin, so inject a shim that
    # sets the config flag first (same trick as tests/conftest.py).
    shim_dir = tempfile.mkdtemp(prefix="examples_cpu_")
    with open(os.path.join(shim_dir, "sitecustomize.py"), "w") as f:
        f.write(
            "try:\n"
            "    import jax\n"
            "    jax.config.update('jax_platforms', 'cpu')\n"
            "except Exception:\n"
            "    pass\n"
        )
    env = {
        **os.environ,
        "JAX_PLATFORMS": "cpu",
        "PYTHONPATH": shim_dir + os.pathsep + REPO + os.pathsep + os.environ.get("PYTHONPATH", ""),
    }

    failures: list[str] = []
    for script in scripts:
        rel = os.path.relpath(script, REPO)
        t0 = time.time()
        try:
            proc = subprocess.run(
                [sys.executable, script], env=env, cwd=REPO,
                capture_output=True, text=True, timeout=TIMEOUT_S,
            )
            status = "ok" if proc.returncode == 0 else f"FAIL rc={proc.returncode}"
        except subprocess.TimeoutExpired:
            proc, status = None, f"TIMEOUT >{TIMEOUT_S}s"
        print(f"{status:>12}  {rel}  ({time.time() - t0:.1f}s)", flush=True)
        if status != "ok":
            failures.append(rel)
            if proc is not None and proc.stderr:
                tail = "\n".join(proc.stderr.strip().splitlines()[-8:])
                print(f"             stderr tail:\n{tail}", flush=True)

    print(f"\n{len(scripts) - len(failures)}/{len(scripts)} examples passed")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
