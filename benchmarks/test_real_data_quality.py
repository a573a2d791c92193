"""Real-data retrieval quality gates (VERDICT round-2 item 5).

The reference pins paper results on real public data (SciFact/COVID nDCG in
``benchmarks/reranking/test_paper_results.py:216-257``, BioDEX join targets
in ``benchmarks/biodex/test_paper_results.py:84-120``).  This suite pins
retrieval quality on a frozen slice of the SAME real corpus the reference
ships — 800 MedDRA reaction terms from the public BioDEX dataset
(``benchmarks/data/biodex_reactions_slice.csv``; deterministic sample of
the reference's ``benchmarks/biodex/biodex-reactions.csv``) — embedded with
a real classical model (char-n-gram TF-IDF + SVD, ``TfidfRM``), so the
thresholds measure neighbourhood quality on real text, not hash artifacts.

Gates:
- typo-robust retrieval: corrupted real terms must retrieve their source
  term (recall@10 pinned)
- lexical-family ranking: nDCG@10 over graded real term families pinned
- sem_sim_join on real text: corrupted->clean top-1 match accuracy pinned
"""

import csv
import math
import os

import numpy as np
import pandas as pd
import pytest

import lotus_tpu
from lotus_tpu.models import TfidfRM
from lotus_tpu.vector_store import TpuVS

DATA = os.path.join(os.path.dirname(__file__), "data", "biodex_reactions_slice.csv")
K = 10


@pytest.fixture(autouse=True)
def reset_settings():
    yield
    lotus_tpu.settings.configure(lm=None, helper_lm=None, rm=None, vs=None, enable_cache=False)


def load_terms() -> list[str]:
    with open(DATA) as f:
        return [row["reaction"] for row in csv.DictReader(f)]


def corrupt(term: str, rng: np.random.Generator) -> str:
    """Deterministic realistic corruption: one typo class per term."""
    s = list(term)
    op = rng.integers(0, 3)
    i = int(rng.integers(0, max(len(s) - 1, 1)))
    if op == 0 and len(s) > 4:          # transpose
        s[i], s[i + 1] = s[i + 1], s[i]
    elif op == 1 and len(s) > 4:        # delete
        del s[i]
    else:                               # duplicate
        s.insert(i, s[i])
    return "".join(s)


def test_typo_robust_retrieval_recall():
    terms = load_terms()
    rng = np.random.default_rng(0)
    lotus_tpu.settings.configure(rm=TfidfRM(dim=256), vs=TpuVS())
    df = pd.DataFrame({"reaction": terms})
    df = df.sem_index("reaction", "/tmp/realdata_idx")

    probes = rng.choice(len(terms), size=150, replace=False)
    hits = 0
    for i in probes:
        noisy = corrupt(terms[i], rng)
        got = df.sem_search("reaction", noisy, K=K)
        if terms[i] in set(got["reaction"]):
            hits += 1
    recall = hits / len(probes)
    assert recall >= 0.95, f"typo-corrupted recall@10 on real terms: {recall}"


def _ndcg(ranked: list[float], ideal: list[float], k: int) -> float:
    def dcg(gr):
        return sum(g / math.log2(j + 2) for j, g in enumerate(gr[:k]))

    denom = dcg(sorted(ideal, reverse=True))
    return dcg(ranked) / denom if denom else 0.0


def test_lexical_family_ndcg():
    """Graded relevance from real term structure: for a family-head query
    (e.g. 'Blood ...'), same-first-word terms are relevant (grade 2 when
    the first two words match, else 1)."""
    terms = load_terms()
    first = {}
    for t in terms:
        first.setdefault(t.split()[0], []).append(t)
    families = {w: ts for w, ts in first.items() if len(ts) >= 4}
    assert len(families) >= 20  # the frozen slice carries real families

    lotus_tpu.settings.configure(rm=TfidfRM(dim=256), vs=TpuVS())
    df = pd.DataFrame({"reaction": terms})
    df = df.sem_index("reaction", "/tmp/realdata_idx2")

    scores = []
    for head, members in sorted(families.items())[:25]:
        query = members[0]
        got = df.sem_search("reaction", query, K=K)

        def grade(t: str) -> float:
            if t == query:
                return 3.0
            if t.split()[0] != head:
                return 0.0
            q2 = query.split()[:2]
            return 2.0 if t.split()[:2] == q2 else 1.0

        ranked = [grade(t) for t in got["reaction"]]
        ideal = sorted((grade(t) for t in terms), reverse=True)[:K]
        scores.append(_ndcg(ranked, ideal, K))
    mean_ndcg = float(np.mean(scores))
    assert mean_ndcg >= 0.55, f"real-term family nDCG@10: {mean_ndcg}"


def test_sim_join_matches_corrupted_terms():
    terms = load_terms()[:400]
    rng = np.random.default_rng(1)
    noisy = [corrupt(t, rng) for t in terms[:100]]

    lotus_tpu.settings.configure(rm=TfidfRM(dim=256), vs=TpuVS())
    clean_df = pd.DataFrame({"reaction": terms})
    clean_df = clean_df.sem_index("reaction", "/tmp/realdata_idx3")
    noisy_df = pd.DataFrame({"typo": noisy})

    joined = noisy_df.sem_sim_join(clean_df, left_on="typo", right_on="reaction", K=1)
    correct = sum(1 for t, r in zip(joined["typo"], joined["reaction"])
                  if r == terms[noisy.index(t)] if t in noisy)
    acc = correct / len(noisy)
    assert acc >= 0.9, f"corrupted->clean top-1 join accuracy on real terms: {acc}"
