"""sem_partition_by + sem_agg, and sem_sim_join.

Mirrors the reference's partition.py and sim_join.py (reference
examples/op_examples/): a partition function groups rows before a
hierarchical aggregation, and sim_join matches each left row to its K
nearest right rows by embedding similarity (TPU kNN, no LM calls).
"""

import sys

import pandas as pd

from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))
from examples._common import configure

configure(lambda p, m, **kw: "an aggregate answer over the partition")

papers = pd.DataFrame(
    {
        "title": [
            "Attention is all you need",
            "Scaling laws for neural LMs",
            "A photometric survey of exoplanets",
            "Transit timing of hot Jupiters",
        ]
    }
)

# Partition by embedding clusters (any fn returning one int per row works —
# here the TPU k-means behind sem_cluster_by, which needs the column
# indexed), then aggregate: partitions fold internally before the
# cross-partition fold.
import tempfile

_index_dir = tempfile.mkdtemp()
papers = papers.sem_index("title", f"{_index_dir}/titles")


def by_cluster(df: pd.DataFrame) -> list[int]:
    return df.sem_cluster_by("title", 2)["cluster_id"].tolist()


parted = papers.sem_partition_by(by_cluster)
print(parted.sem_agg("Summarize the {title} collection"))

# sim_join: K nearest descriptions per skill, cosine over the RM's
# embeddings.  The right side must be indexed (it is the searched corpus).
skills = pd.DataFrame({"skill": ["machine learning", "astronomy"]})
jobs = pd.DataFrame(
    {"posting": ["deep learning engineer", "telescope operations analyst", "LLM researcher"]}
).sem_index("posting", f"{_index_dir}/postings")
print(skills.sem_sim_join(jobs, left_on="skill", right_on="posting", K=2, score_suffix="_sim"))
