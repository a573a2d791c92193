"""Paper-results validation lanes (reference parity:
``/root/reference/benchmarks/reranking/test_paper_results.py:216-257`` pins
BEIR SciFact nDCG@10 > 0.6 and COVID > 0.4;
``/root/reference/benchmarks/biodex/test_paper_results.py:84-120`` pins the
join cascade at recall/precision 0.9).

Three tiers:

1. OFFLINE (always on): the full protocols — search -> topk -> nDCG, and
   the cascade join with learned thresholds — run end-to-end on the frozen
   real-text BioDEX reaction slice with deterministic models, so CI
   exercises every code path of the paper pipelines.
2. LIVE BEIR (``ENABLE_PAPER_TESTS=1`` + network + real models): SciFact /
   COVID nDCG pins with a real embedding model and LM.
3. LIVE BioDEX (same gate): join recall/precision 0.9 pins on the real
   dataset.
"""

from __future__ import annotations

import csv
import os

import numpy as np
import pandas as pd
import pytest

import lotus_tpu
from lotus_tpu.models import TfidfRM, make_fake_lm
from lotus_tpu.types import CascadeArgs
from lotus_tpu.vector_store import TpuVS

DATA = os.path.join(os.path.dirname(__file__), "data", "biodex_reactions_slice.csv")
LIVE = os.getenv("ENABLE_PAPER_TESTS", "").lower() in ("1", "true")


def _ndcg(found: list[float], ideal: list[float], k: int) -> float:
    dcg = sum((2**g - 1) / np.log2(i + 2) for i, g in enumerate(found[:k]))
    idcg = sum((2**g - 1) / np.log2(i + 2) for i, g in enumerate(sorted(ideal, reverse=True)[:k]))
    return float(dcg / idcg) if idcg > 0 else 0.0


@pytest.fixture(autouse=True)
def reset_settings():
    yield
    lotus_tpu.settings.configure(
        lm=None, helper_lm=None, rm=None, vs=None, reranker=None, enable_cache=False
    )


def _load_terms(n: int | None = None) -> list[str]:
    with open(DATA) as f:
        terms = [row["reaction"] for row in csv.DictReader(f)]
    return terms[:n] if n else terms


# ---------------------------------------------------------------- offline


def test_offline_search_topk_ndcg_protocol(tmp_path):
    """The BEIR protocol shape — sem_index -> sem_search(initial_k) ->
    sem_topk(K, method='quick') -> nDCG@10 — on real reaction-term text
    with a deterministic ranking oracle.  Pins the protocol's quality on
    this corpus: nDCG@10 > 0.6 (the SciFact bar) averaged over queries."""
    terms = _load_terms(400)
    df = pd.DataFrame({"passage": terms})

    import re

    def oracle(prompt, msgs, **kw):
        # Comparison prompts arrive as multimodal part lists; join the text
        # parts, then prefer the document sharing more words with the query.
        parts: list[str] = []
        for m in msgs:
            c = m.get("content")
            if isinstance(c, list):
                parts += [p.get("text", "") for p in c if isinstance(p, dict)]
            elif isinstance(c, str):
                parts.append(c)
        text = "\n".join(parts)
        qm = re.search(r"relevant to the query: (.*)", text)
        qwords = set(qm.group(1).lower().split()) if qm else set()
        docs = re.findall(r"Document \d+:\s*\[Passage\]: «(.*?)»", text, re.S)
        if len(docs) >= 2:
            s = [len(qwords & set(d.lower().split())) for d in docs[:2]]
            return "Answer: Document 1" if s[0] >= s[1] else "Answer: Document 2"
        return "Answer: Document 1"

    lotus_tpu.settings.configure(
        lm=make_fake_lm(responder=oracle), rm=TfidfRM(), vs=TpuVS()
    )
    df = df.sem_index("passage", str(tmp_path / "idx"))

    rng = np.random.default_rng(11)
    qidx = rng.choice(len(terms), size=8, replace=False)
    ndcgs = []
    for qi in qidx:
        query = terms[qi]
        hits = df.sem_search("passage", query, 30)
        top = hits.sem_topk(
            f"What {{passage}} is most relevant to the query: {query}", K=10, method="quick"
        )
        # Graded relevance: 2 = the exact term, 1 = shares a word, 0 else.
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
    avg = float(np.mean(ndcgs))
    assert avg > 0.6, f"offline protocol nDCG@10 {avg:.4f} <= 0.6"


def test_offline_biodex_join_cascade_protocol(tmp_path):
    """The BioDEX join protocol — reports sem_join'ed to reaction terms
    with CascadeArgs(recall_target=0.9, precision_target=0.9) — on the
    frozen real-term slice with a deterministic oracle.  Pins achieved
    recall AND precision >= 0.9 vs ground truth, and that the cascade
    actually off-loads work from the oracle."""
    terms = _load_terms(120)
    rng = np.random.default_rng(3)
    # Each "report" mentions its true reaction term in clinical boilerplate
    # (real term text, synthetic wrapper — the slice ships no report text).
    reports, truth = [], {}
    for i, t in enumerate(rng.choice(terms, size=40, replace=False)):
        r = f"Patient {i} was admitted; records note {t} following administration."
        reports.append(r)
        truth[r] = t

    def oracle(prompt, msgs, **kw):
        # The DEFAULT serialization renders each value as «value», so the
        # candidate term appears as an exact «t» outside the report text.
        text = str(prompt)
        for r, t in truth.items():
            if r in text:
                return f"Answer: {f'«{t}»' in text.replace(r, '')}"
        return "Answer: False"

    lm = make_fake_lm(responder=oracle)
    lotus_tpu.settings.configure(lm=lm, helper_lm=lm, rm=TfidfRM(), vs=TpuVS())

    left = pd.DataFrame({"report": reports})
    right = pd.DataFrame({"term": terms})
    joined, stats = left.sem_join(
        right,
        "The patient report {report:left} describes the adverse reaction {term:right}",
        cascade_args=CascadeArgs(
            recall_target=0.9, precision_target=0.9, sampling_percentage=0.25,
            proxy_model=lotus_tpu.types.ProxyModel.EMBEDDING_MODEL,
        ),
        return_stats=True,
    )
    got = set(zip(joined["report"], joined["term"]))
    want = set(truth.items())
    recall = len(got & want) / len(want)
    tp = len(got & want)
    precision = tp / max(len(got), 1)
    assert recall >= 0.9, f"join cascade recall {recall:.3f} < 0.9"
    assert precision >= 0.9, f"join cascade precision {precision:.3f} < 0.9"
    assert stats.get("join_resolved_by_helper_model", 0) > 0, stats


# ------------------------------------------------------------------ live


def _require_live():
    if not LIVE:
        pytest.skip("set ENABLE_PAPER_TESTS=1 (requires network + provider keys)")


@pytest.mark.parametrize("dataset,bar", [("scifact", 0.6), ("trec-covid", 0.4)])
def test_beir_ndcg_live(tmp_path, dataset, bar):
    """BEIR nDCG@10 pins with real models (reference protocol: e5-base-v2
    embeddings, gpt-4o-mini reranker, 10 queries, initial_k=100)."""
    _require_live()
    ir_datasets = pytest.importorskip("ir_datasets")
    from lotus_tpu.models import LM, SentenceTransformersRM

    ds = ir_datasets.load(f"beir/{dataset.replace('trec-covid', 'trec-covid')}" if dataset != "scifact" else "beir/scifact/test")
    corpus = {d.doc_id: d.text for d in ds.docs_iter()}
    queries = {q.query_id: q.text for q in ds.queries_iter()}
    qrels: dict[str, dict[str, int]] = {}
    for qr in ds.qrels_iter():
        qrels.setdefault(qr.query_id, {})[qr.doc_id] = qr.relevance

    df = pd.DataFrame({"pid": list(corpus), "passage": ["passage: " + t for t in corpus.values()]})
    lotus_tpu.settings.configure(
        lm=LM("gpt-4o-mini", temperature=0.0, max_tokens=100),
        rm=SentenceTransformersRM(model="intfloat/e5-base-v2"),
        vs=TpuVS(),
    )
    df = df.sem_index("passage", str(tmp_path / "beir_idx"))

    ndcgs = []
    for qid, query in list(queries.items())[:10]:
        if qid not in qrels:
            continue
        hits = df.sem_search("passage", f"query: {query}", 100)
        top = hits.sem_topk(
            f"What {{passage}} is most relevant to the query: {query}", K=10, method="quick"
        )
        found = [qrels[qid].get(pid, 0) for pid in top["pid"]]
        ideal = sorted(qrels[qid].values(), reverse=True)
        ndcgs.append(_ndcg([float(x) for x in found], [float(x) for x in ideal], 10))
    avg = float(np.mean(ndcgs))
    assert avg > bar, f"{dataset} nDCG@10 {avg:.4f} <= {bar}"


def test_biodex_join_cascade_live():
    """BioDEX join recall/precision 0.9 pins with real models on the real
    dataset (reference: 25 samples)."""
    _require_live()
    datasets = pytest.importorskip("datasets")
    from lotus_tpu.models import LM, SentenceTransformersRM

    raw = datasets.load_dataset("BioDEX/BioDEX-Reactions", split="test")
    sample = raw.select(range(25))
    left = pd.DataFrame({"report": [r["fulltext_processed"][:8000] for r in sample]})
    truth = [set(r["reactions"].split(", ")) for r in sample]
    terms = sorted({t for s in truth for t in s})
    right = pd.DataFrame({"term": terms})

    lm = LM("gpt-4o-mini", temperature=0.0)
    lotus_tpu.settings.configure(
        lm=lm, helper_lm=lm, rm=SentenceTransformersRM(model="intfloat/e5-base-v2"), vs=TpuVS()
    )
    joined = left.sem_join(
        right,
        "The patient report {report:left} describes the adverse reaction {term:right}",
        cascade_args=CascadeArgs(recall_target=0.9, precision_target=0.9),
    )
    per_row_recall = []
    per_row_precision = []
    for i, want in enumerate(truth):
        got = set(joined[joined["report"] == left["report"][i]]["term"])
        if want:
            per_row_recall.append(len(got & want) / len(want))
        if got:
            per_row_precision.append(len(got & want) / len(got))
    assert float(np.mean(per_row_recall)) >= 0.9
    assert float(np.mean(per_row_precision)) >= 0.9
