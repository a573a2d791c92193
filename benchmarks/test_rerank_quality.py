"""Reranking quality gate (the reference pins SciFact nDCG@10 > 0.6 and
BEIR-COVID > 0.4 in ``benchmarks/reranking/test_paper_results.py:216-257``).

Offline equivalent: a deterministic topical corpus, HashRM embeddings (bag
of words -> topical similarity), the TPU store for retrieval, and a
deterministic fake LM for pairwise reranking. The pins fail this suite if
retrieval or rerank quality regresses:

- retrieval-only nDCG@10 must clear 0.60
- sem_search -> sem_topk rerank must clear 0.75 AND beat retrieval alone
"""

import math

import numpy as np
import pandas as pd
import pytest

import lotus_tpu
from lotus_tpu.models import HashRM, make_fake_lm
from lotus_tpu.vector_store import TpuVS

TOPICS = {
    "cardiology": ["heart", "artery", "cardiac", "blood", "valve"],
    "astronomy": ["star", "galaxy", "telescope", "orbit", "nebula"],
    "cooking": ["recipe", "oven", "flavor", "saute", "broth"],
    "databases": ["query", "index", "transaction", "schema", "shard"],
}
DOCS_PER_TOPIC = 12
K_EVAL = 10


def _corpus(rng: np.random.Generator) -> pd.DataFrame:
    """Docs with graded relevance: rank r uses fewer topic keywords."""
    rows = []
    filler = ["report", "study", "notes", "draft", "memo", "survey"]
    for topic, words in TOPICS.items():
        for r in range(DOCS_PER_TOPIC):
            n_kw = max(1, len(words) - r // 3)  # later docs drift off-topic
            kws = list(rng.choice(words, size=n_kw, replace=False))
            noise = list(rng.choice(filler, size=3 + r // 2, replace=True))
            rows.append({"doc": " ".join(kws + noise), "topic": topic, "grade": n_kw})
    return pd.DataFrame(rows)


def _ndcg_at_k(ranked_grades: list[int], ideal_grades: list[int], k: int) -> float:
    def dcg(grades):
        return sum(g / math.log2(i + 2) for i, g in enumerate(grades[:k]))

    ideal = dcg(sorted(ideal_grades, reverse=True))
    return dcg(ranked_grades) / ideal if ideal > 0 else 0.0


def _keyword_judge(prompt, msgs, **kw):
    """Deterministic reranker: prefer the document with more topic words."""
    text = str(prompt)
    all_kw = [w for words in TOPICS.values() for w in words]
    try:
        d1 = text.split("Document 1:")[1].split("Document 2:")[0]
        d2 = text.split("Document 2:")[1]
    except IndexError:
        return "Document 1"
    s1 = sum(d1.count(w) for w in all_kw)
    s2 = sum(d2.count(w) for w in all_kw)
    return "Document 1" if s1 >= s2 else "Document 2"


@pytest.fixture()
def setting(tmp_path):
    lotus_tpu.settings.configure(
        lm=make_fake_lm(responder=_keyword_judge),
        rm=HashRM(dim=96),
        vs=TpuVS(),
        enable_cache=False,
    )
    yield tmp_path
    lotus_tpu.settings.configure(lm=None, rm=None, vs=None)


def _grades_of(result: pd.DataFrame, topic: str) -> list[int]:
    return [(g if t == topic else 0) for t, g in zip(result["topic"], result["grade"])]


def test_rerank_pipeline_quality(setting):
    rng = np.random.default_rng(7)
    df = _corpus(rng)
    df = df.sem_index("doc", str(setting / "rerank_idx"))

    retrieval_ndcg, rerank_ndcg = [], []
    for topic, words in TOPICS.items():
        query = " ".join(words[:3])
        ideal = sorted(df[df["topic"] == topic]["grade"], reverse=True)

        hits = df.sem_search("doc", query, K=K_EVAL)
        retrieval_ndcg.append(_ndcg_at_k(_grades_of(hits, topic), ideal, K_EVAL))

        reranked = hits.sem_topk(f"Which {{doc}} is most about {topic}?", K=K_EVAL, method="naive")
        rerank_ndcg.append(_ndcg_at_k(_grades_of(reranked, topic), ideal, K_EVAL))

    retrieval = float(np.mean(retrieval_ndcg))
    reranked = float(np.mean(rerank_ndcg))

    # Pinned thresholds — regression gates, not aspirations.
    assert retrieval > 0.60, f"retrieval nDCG@10 regressed: {retrieval:.3f}"
    assert reranked > 0.75, f"reranked nDCG@10 regressed: {reranked:.3f}"
    assert reranked >= retrieval, (
        f"reranking made results worse: {reranked:.3f} < {retrieval:.3f}"
    )
