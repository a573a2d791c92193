"""Executed real-model quality runs on the frozen real-text BioDEX slice.

The reference's paper suites carry numbers from REAL runs — BEIR SciFact
nDCG@10 > 0.6 (``/root/reference/benchmarks/reranking/test_paper_results.py:216-257``)
and the BioDEX join cascade at recall/precision 0.9
(``/root/reference/benchmarks/biodex/test_paper_results.py:84-120``).  The
full live tiers need external dataset downloads (ir_datasets / HuggingFace),
which this environment's zero-egress network blocks; what it DOES have is an
Anthropic gateway.  This runner executes the same two protocol shapes with a
real Claude model on the frozen real-reaction-term slice shipped in
``benchmarks/data/`` and records the achieved quality + spend in
``benchmarks/artifacts/real_model_results.json`` — real-model numbers from a
real run, not deterministic fakes.

Run:  python -m benchmarks.real_model_run [--model claude-haiku-4-5]
"""

from __future__ import annotations

import argparse
import csv
import json
import os
import time
from typing import Any

import numpy as np
import pandas as pd

import lotus_tpu
from lotus_tpu.models import LM, TfidfRM
from lotus_tpu.types import CascadeArgs, ProxyModel
from lotus_tpu.vector_store import TpuVS

DATA = os.path.join(os.path.dirname(__file__), "data", "biodex_reactions_slice.csv")
ARTIFACT = os.path.join(os.path.dirname(__file__), "artifacts", "real_model_results.json")


def _load_terms(n: int | None = None) -> list[str]:
    with open(DATA) as f:
        terms = [row["reaction"] for row in csv.DictReader(f)]
    return terms[:n] if n else terms


def _ndcg(found: list[float], ideal: list[float], k: int) -> float:
    dcg = sum((2**g - 1) / np.log2(i + 2) for i, g in enumerate(found[:k]))
    idcg = sum((2**g - 1) / np.log2(i + 2) for i, g in enumerate(sorted(ideal, reverse=True)[:k]))
    return float(dcg / idcg) if idcg > 0 else 0.0


def run_search_topk_ndcg(lm: LM, workdir: str, n_terms: int = 400, n_queries: int = 8) -> dict[str, Any]:
    """BEIR protocol shape — sem_index -> sem_search(30) -> sem_topk(quick,
    K=10) -> graded nDCG@10 — with the REAL LM as the ranking comparator."""
    terms = _load_terms(n_terms)
    df = pd.DataFrame({"passage": terms})
    lotus_tpu.settings.configure(lm=lm, rm=TfidfRM(), vs=TpuVS())
    df = df.sem_index("passage", os.path.join(workdir, "idx"))

    rng = np.random.default_rng(11)
    qidx = rng.choice(len(terms), size=n_queries, replace=False)
    ndcgs = []
    for qi in qidx:
        query = terms[qi]
        hits = df.sem_search("passage", query, 30)
        top = hits.sem_topk(
            f"What {{passage}} is most relevant to the query: {query}", K=10, method="quick"
        )
        qwords = set(query.lower().split())
        found = [
            2.0 if p == query else (1.0 if qwords & set(p.lower().split()) else 0.0)
            for p in top["passage"]
        ]
        ideal = [
            2.0 if p == query else (1.0 if qwords & set(p.lower().split()) else 0.0)
            for p in terms
        ]
        ndcgs.append(_ndcg(found, ideal, 10))
    return {"ndcg_at_10": float(np.mean(ndcgs)), "per_query": [round(x, 4) for x in ndcgs],
            "n_corpus": len(terms), "n_queries": n_queries, "bar": 0.6}


def run_join_cascade(lm: LM, n_terms: int = 120, n_reports: int = 40) -> dict[str, Any]:
    """BioDEX join protocol — reports sem_join'ed to real reaction terms under
    CascadeArgs(recall/precision 0.9, embedding proxy) — with the REAL LM as
    the oracle.  The slice ships no report text, so each report embeds its
    true term in clinical boilerplate (real term, synthetic wrapper)."""
    terms = _load_terms(n_terms)
    rng = np.random.default_rng(3)
    reports, truth = [], {}
    for i, t in enumerate(rng.choice(terms, size=n_reports, replace=False)):
        r = f"Patient {i} was admitted; records note {t} following administration."
        reports.append(r)
        truth[r] = t

    lotus_tpu.settings.configure(lm=lm, helper_lm=lm, rm=TfidfRM(), vs=TpuVS())
    left = pd.DataFrame({"report": reports})
    right = pd.DataFrame({"term": terms})
    joined, stats = left.sem_join(
        right,
        "The patient report {report:left} explicitly mentions the adverse reaction {term:right}",
        cascade_args=CascadeArgs(
            recall_target=0.9, precision_target=0.9, sampling_percentage=0.25,
            proxy_model=ProxyModel.EMBEDDING_MODEL,
        ),
        return_stats=True,
    )
    got = set(zip(joined["report"], joined["term"]))
    want = set(truth.items())
    tp = len(got & want)
    return {
        "recall": tp / len(want),
        "precision": tp / max(len(got), 1),
        "pairs_total": len(reports) * len(terms),
        "resolved_by_helper": int(stats.get("join_resolved_by_helper_model", 0)),
        "oracle_calls": int(stats.get("join_resolved_by_large_model", 0)),
        "bar": 0.9,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default=os.getenv("LOTUS_TPU_BENCH_MODEL", "claude-haiku-4-5"))
    ap.add_argument("--skip", choices=["ndcg", "join"], action="append", default=[])
    args = ap.parse_args()

    lm = LM(args.model, temperature=0.0, max_tokens=128)
    import tempfile

    out: dict[str, Any] = {}
    # Merge ONLY partial (--skip) runs into the prior artifact: a full rerun
    # replaces it outright (merging there would double-count usage).
    if args.skip and os.path.exists(ARTIFACT):
        try:
            with open(ARTIFACT) as f:
                prior = json.load(f)
            if prior.get("model") == args.model:
                out = prior
        except (json.JSONDecodeError, OSError):
            pass
    prior_usage = out.pop("usage", None)
    out |= {
        "model": args.model,
        "date": time.strftime("%Y-%m-%d"),
        "data": "benchmarks/data/biodex_reactions_slice.csv (real BioDEX reaction terms)",
        "note": (
            "Live BEIR/BioDEX dataset downloads are blocked in this environment "
            "(zero egress); these are the same protocol shapes executed with a real "
            "model on the frozen real-text slice."
        ),
    }
    t0 = time.time()
    if "ndcg" not in args.skip:
        with tempfile.TemporaryDirectory() as td:
            out["search_topk_ndcg"] = run_search_topk_ndcg(lm, td)
            print("ndcg:", out["search_topk_ndcg"]["ndcg_at_10"], flush=True)
    if "join" not in args.skip:
        out["join_cascade"] = run_join_cascade(lm)
        print("join:", out["join_cascade"], flush=True)
    u = lm.stats.virtual_usage
    prev = prior_usage or {}
    out["usage"] = {
        "prompt_tokens": u.prompt_tokens + prev.get("prompt_tokens", 0),
        "completion_tokens": u.completion_tokens + prev.get("completion_tokens", 0),
        "total_tokens": u.total_tokens + prev.get("total_tokens", 0),
        "cost_usd": round(u.total_cost + prev.get("cost_usd", 0.0), 4),
        "wall_seconds": round(time.time() - t0 + prev.get("wall_seconds", 0.0), 1),
    }
    os.makedirs(os.path.dirname(ARTIFACT), exist_ok=True)
    with open(ARTIFACT, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
