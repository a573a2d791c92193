"""Executed real-model results: the committed artifact carries numbers from
a REAL run (``python -m benchmarks.real_model_run``, claude-haiku-4-5 via the
stdlib AnthropicTransport), the reference-parity analogue of the executed
numbers in ``/root/reference/benchmarks/biodex/README.md:25-33``.

Two tiers:

1. ARTIFACT (always on): the committed ``real_model_results.json`` must
   exist and meet the paper bars — this pins that the real run actually
   happened and what it scored.
2. LIVE (``ENABLE_REAL_LM_TESTS=1`` + an Anthropic key): re-executes the
   nDCG protocol end-to-end against the live model and re-asserts the bar.
"""

from __future__ import annotations

import json
import os

import pytest

ARTIFACT = os.path.join(os.path.dirname(__file__), "artifacts", "real_model_results.json")
LIVE = os.getenv("ENABLE_REAL_LM_TESTS", "").lower() in ("1", "true")


def _artifact() -> dict:
    assert os.path.exists(ARTIFACT), "real-model artifact missing — run benchmarks.real_model_run"
    with open(ARTIFACT) as f:
        return json.load(f)


def test_artifact_ndcg_meets_paper_bar():
    a = _artifact()
    res = a.get("search_topk_ndcg")
    assert res, "artifact lacks the search->topk->nDCG run"
    assert res["ndcg_at_10"] > res["bar"], res
    assert a["model"].startswith("claude"), a["model"]


def test_artifact_join_cascade_meets_paper_bar():
    a = _artifact()
    res = a.get("join_cascade")
    assert res, "artifact lacks the join-cascade run"
    assert res["recall"] >= res["bar"] and res["precision"] >= res["bar"], res
    # The cascade must actually have off-loaded work from the oracle.
    assert res["resolved_by_helper"] > 0


def test_artifact_records_real_spend():
    u = _artifact()["usage"]
    assert u["total_tokens"] > 10_000 and u["cost_usd"] > 0, u


def test_live_ndcg_rerun(tmp_path):
    if not LIVE:
        pytest.skip("set ENABLE_REAL_LM_TESTS=1 (requires an Anthropic key)")
    if not os.environ.get("ANTHROPIC_API_KEY"):
        pytest.skip("no ANTHROPIC_API_KEY")
    from benchmarks.real_model_run import run_search_topk_ndcg
    from lotus_tpu.models import LM

    lm = LM(os.getenv("LOTUS_TPU_BENCH_MODEL", "claude-haiku-4-5"), temperature=0.0, max_tokens=128)
    res = run_search_topk_ndcg(lm, str(tmp_path), n_terms=200, n_queries=4)
    assert res["ndcg_at_10"] > 0.6, res
