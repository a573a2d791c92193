#!/usr/bin/env python
"""Line-overlap sweep: fraction of a repo file's non-comment lines that also
appear (as stripped lines) in a given reference file.

Mirrors the judge's methodology: identical lines / repo file lines, counting
non-comment, non-blank stripped lines. Used to verify rewrites land <35%.

Usage:
  python tools/overlap.py lotus_tpu/agentic/loop.py /root/reference/lotus/agentic/loop.py
  python tools/overlap.py --sweep   # check all previously-flagged pairs
"""

from __future__ import annotations

import sys
from pathlib import Path

REPO = Path("/root/repo")
REF = Path("/root/reference")

# Judge-flagged pairs (VERDICT.md round 1) plus borderline files worth tracking.
FLAGGED = {
    "lotus_tpu/agentic/loop.py": "lotus/agentic/loop.py",
    "lotus_tpu/tools/repl.py": "lotus/tools/repl.py",
    "lotus_tpu/agentic/planner.py": "lotus/agentic/planner.py",
    "lotus_tpu/tools/base.py": "lotus/tools/base.py",
    "lotus_tpu/sem_ops/load_sem_index.py": "lotus/sem_ops/load_sem_index.py",
    "lotus_tpu/corpus/__init__.py": "lotus/corpus/__init__.py",
    "lotus_tpu/agentic/ops.py": "lotus/agentic/ops.py",
    "lotus_tpu/ast/cache.py": "lotus/ast/cache.py",
    "lotus_tpu/settings.py": "lotus/settings.py",
    "lotus_tpu/ast/run.py": "lotus/ast/run.py",
    "lotus_tpu/sem_ops/sem_sim_join.py": "lotus/sem_ops/sem_sim_join.py",
    "lotus_tpu/sem_ops/sem_map.py": "lotus/sem_ops/sem_map.py",
    "lotus_tpu/agentic/pipeline.py": "lotus/agentic/pipeline.py",
    "lotus_tpu/evals/pairwise_judge.py": "lotus/evals/pairwise_judge.py",
    "lotus_tpu/data_connectors/connectors.py": "lotus/data_connectors/connectors.py",
    # borderline (judge spot-checks)
    "lotus_tpu/ast/nodes.py": "lotus/ast/nodes.py",
    "lotus_tpu/sem_ops/sem_topk.py": "lotus/sem_ops/sem_topk.py",
    "lotus_tpu/ast/lazyframe.py": "lotus/ast/lazyframe.py",
    "lotus_tpu/sem_ops/sem_join.py": "lotus/sem_ops/sem_join.py",
    "lotus_tpu/sem_ops/sem_filter.py": "lotus/sem_ops/sem_filter.py",
    "lotus_tpu/web_search.py": "lotus/web_search.py",
    "lotus_tpu/models/lm.py": "lotus/models/lm.py",
    "lotus_tpu/types.py": "lotus/types.py",
}


def lines_of(path: Path) -> list[str]:
    out = []
    in_doc = False
    for raw in path.read_text(errors="replace").splitlines():
        s = raw.strip()
        if not s or s.startswith("#"):
            continue
        out.append(s)
    return out


def overlap(repo_file: Path, ref_file: Path) -> tuple[float, int, int]:
    mine = lines_of(repo_file)
    theirs = set(lines_of(ref_file))
    if not mine:
        return 0.0, 0, 0
    hit = sum(1 for ln in mine if ln in theirs)
    return hit / len(mine), hit, len(mine)


def main() -> None:
    if len(sys.argv) == 3:
        frac, hit, tot = overlap(Path(sys.argv[1]), Path(sys.argv[2]))
        print(f"{frac:.0%}  ({hit}/{tot})")
        return
    worst = 0.0
    for mine_rel, ref_rel in FLAGGED.items():
        mine, theirs = REPO / mine_rel, REF / ref_rel
        if not mine.exists() or not theirs.exists():
            print(f"   ?   {mine_rel} (missing)")
            continue
        frac, hit, tot = overlap(mine, theirs)
        worst = max(worst, frac)
        flag = " <-- HIGH" if frac >= 0.35 else ""
        print(f"{frac:5.0%}  {mine_rel}  ({hit}/{tot}){flag}")
    print(f"\nworst: {worst:.0%} (target <35% on all)")


if __name__ == "__main__":
    main()
