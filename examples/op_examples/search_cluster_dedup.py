"""TPU-backed retrieval ops: sem_index, sem_search, sem_sim_join,
sem_cluster_by, sem_dedup."""

import sys
import tempfile

import pandas as pd

from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))
from examples._common import configure

configure()

df = pd.DataFrame(
    {
        "title": [
            "Machine learning tutorial",
            "Intro to machine learning",
            "Deep learning with JAX",
            "Cooking pasta at home",
            "Best pasta recipes",
            "Gardening for beginners",
        ]
    }
)

with tempfile.TemporaryDirectory() as d:
    df = df.sem_index("title", f"{d}/title_index")
    print("search:", df.sem_search("title", "machine learning", K=2)["title"].tolist())

    queries = pd.DataFrame({"q": ["pasta dishes", "neural networks"]})
    print(queries.sem_sim_join(df, left_on="q", right_on="title", K=2)[["q", "title", "_scores"]])

    print(df.sem_cluster_by("title", 2)[["title", "cluster_id"]])
    print("dedup:", df.sem_dedup("title", threshold=0.9)["title"].tolist())
