"""Retrieval semantic operators end-to-end with HashRM + TpuVS (offline)."""

import numpy as np
import pandas as pd
import pytest

import lotus_tpu
from lotus_tpu.models import HashRM
from lotus_tpu.vector_store import TpuVS


@pytest.fixture(autouse=True)
def configure(tmp_path):
    lotus_tpu.settings.configure(rm=HashRM(dim=48), vs=TpuVS(), lm=None, enable_cache=False)
    yield
    lotus_tpu.settings.configure(rm=None, vs=None)


@pytest.fixture
def df(tmp_path):
    df = pd.DataFrame(
        {
            "title": [
                "Machine learning tutorial",
                "Deep learning with neural networks",
                "Cooking pasta at home",
                "Best pasta recipes",
                "Quantum computing basics",
                "Intro to machine learning",
            ]
        }
    )
    return df.sem_index("title", str(tmp_path / "title_idx"))


def test_sem_index_records_dir(df):
    assert "title" in df.attrs["index_dirs"]


def test_sem_search_returns_relevant(df):
    out = df.sem_search("title", "machine learning", K=2)
    assert len(out) == 2
    assert all("learning" in t.lower() for t in out["title"])


def test_sem_search_respects_filtered_df(df):
    sub = df[df.index >= 2]  # drop the two ML docs at positions 0-1
    out = sub.sem_search("title", "machine learning", K=2)
    assert len(out) == 2
    assert set(out.index) <= set(sub.index)


def test_sem_search_with_scores(df):
    out = df.sem_search("title", "pasta recipes", K=3, return_scores=True)
    scores = out["vec_scores_sim_score"].to_numpy()
    assert (np.diff(scores) <= 1e-6).all()  # descending


def test_load_sem_index_resumes(df, tmp_path):
    fresh = pd.DataFrame({"title": df["title"]})
    fresh = fresh.load_sem_index("title", str(tmp_path / "title_idx"))
    out = fresh.sem_search("title", "quantum computing", K=1)
    assert out["title"].iloc[0] == "Quantum computing basics"


def test_sem_sim_join(df, tmp_path):
    left = pd.DataFrame({"query": ["pasta dishes", "neural nets"]})
    joined = left.sem_sim_join(df, left_on="query", right_on="title", K=2)
    assert len(joined) == 4
    assert "_scores" in joined.columns
    pasta_matches = joined[joined["query"] == "pasta dishes"]["title"].tolist()
    assert any("pasta" in t.lower() for t in pasta_matches)


def test_sem_cluster_by(df):
    out = df.sem_cluster_by("title", 2, niter=10)
    assert "cluster_id" in out.columns
    assert out["cluster_id"].nunique() == 2


def test_sem_dedup(tmp_path):
    df = pd.DataFrame(
        {
            "text": [
                "the quick brown fox jumps",
                "the quick brown fox jumps!",
                "a completely different sentence about databases",
                "the quick brown fox jumped",
            ]
        }
    ).sem_index("text", str(tmp_path / "dedup_idx"))
    out = df.sem_dedup("text", threshold=0.85)
    assert len(out) < 4
    assert "a completely different sentence about databases" in out["text"].tolist()


def test_sem_partition_by(df):
    out = df.sem_partition_by(lotus_tpu.utils.cluster("title", 2))
    assert "_lotus_partition_id" in out.columns


def test_sem_search_rerank_with_fake_reranker(df):
    from lotus_tpu.models.reranker import Reranker
    from lotus_tpu.types import RerankerOutput

    class ReverseReranker(Reranker):
        def __call__(self, query, docs, K):
            return RerankerOutput(indices=list(range(len(docs)))[::-1][:K])

    lotus_tpu.settings.configure(reranker=ReverseReranker())
    plain = df.sem_search("title", "machine learning", K=3)
    reranked = df.sem_search("title", "machine learning", K=3, n_rerank=2)
    assert len(reranked) == 2
    assert reranked["title"].iloc[0] == plain["title"].iloc[2]


def test_sem_dedup_exact_mode_matches_bruteforce_oracle(tmp_path):
    """``max_neighbors=None`` is the reference-exact contract (K = len(df),
    reference ``lotus/sem_ops/sem_dedup.py:45``): surviving rows must match
    a brute-force oracle that thresholds the full similarity matrix and
    keeps the first value of each connected component."""
    rng = np.random.default_rng(77)
    base = [
        "the quick brown fox jumps over the lazy dog",
        "a database transaction commits atomically",
        "stars form inside collapsing molecular clouds",
        "fresh basil elevates a simple tomato sauce",
        "gradient descent minimizes the training loss",
    ]
    texts = []
    for t in base:
        texts.append(t)
        texts.append(t + "!")            # near-duplicate
        texts.append("note: " + t)       # farther variant
    rng.shuffle(texts)
    df = pd.DataFrame({"text": texts}).sem_index("text", str(tmp_path / "exact_idx"))

    threshold = 0.8
    out = df.sem_dedup("text", threshold=threshold, max_neighbors=None)

    # Brute-force oracle over the SAME embeddings the store searched.
    rm = lotus_tpu.settings.rm
    emb = np.asarray(rm(df["text"].tolist()))
    emb = emb / np.linalg.norm(emb, axis=1, keepdims=True)
    sims = emb @ emb.T
    n = len(df)
    parent = list(range(n))

    def find(a):
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    for i in range(n):
        for j in range(i + 1, n):
            # Dedup is by VALUE: identical texts always merge.
            if sims[i, j] > threshold or df["text"].iloc[i] == df["text"].iloc[j]:
                parent[find(i)] = find(j)
    # Which representative survives is implementation-defined (the
    # reference's own DFS order is arbitrary); the exact-mode contract is
    # the component STRUCTURE: exactly one survivor per oracle component.
    comp_of = {}
    for i in range(n):
        comp_of.setdefault(find(i), set()).add(df["text"].iloc[i])
    kept = set(out["text"])
    for members in comp_of.values():
        assert len(kept & members) == 1, (members, kept & members)
    assert len(out) == len(comp_of)


def test_sem_search_empty_filtered_df(df):
    """Search over an emptied (filtered) DataFrame returns zero rows
    without error (reference test_filter.py::test_filtered_search_empty_result)."""
    empty = df[df["title"] == "no such row"]
    out = empty.sem_search("title", "anything", K=2)
    assert len(out) == 0
