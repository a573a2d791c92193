"""QdrantVS / WeaviateVS behind the same 4-method store contract.

Mirrors the reference's search_qdrant.py / search_weaviate.py (reference
examples/vs_examples/): swap the vs= setting and every sem_index /
sem_search pipeline runs unchanged.  Both clients are optional installs,
so each section gates on its import.
"""

import tempfile

import pandas as pd

import lotus_tpu
from lotus_tpu.models import HashRM

df = pd.DataFrame(
    {
        "course": [
            "Probability and Random Processes",
            "Cooking Fundamentals",
            "Digital Design and Integrated Circuits",
        ]
    }
)

rm = HashRM(dim=64)


def demo(vs, tag):
    lotus_tpu.settings.configure(lm=None, rm=rm, vs=vs)
    with tempfile.TemporaryDirectory() as d:
        indexed = df.sem_index("course", f"{d}/courses")
        print(tag, indexed.sem_search("course", "circuits", K=1)["course"].tolist())


try:
    from qdrant_client import QdrantClient

    from lotus_tpu.vector_store import QdrantVS

    demo(QdrantVS(QdrantClient(":memory:")), "qdrant:")
except ImportError as e:
    print(f"qdrant skipped: {e}")

# Weaviate needs a running server (embedded mode downloads a binary), so
# gate on an explicit endpoint rather than attempting a connection blindly.
import os

if os.getenv("WEAVIATE_URL"):
    import weaviate

    from lotus_tpu.vector_store import WeaviateVS

    demo(WeaviateVS(weaviate.connect_to_custom(os.environ["WEAVIATE_URL"])), "weaviate:")
else:
    print("weaviate skipped: set WEAVIATE_URL to a running instance")

# The TPU-native store needs no external service and is the default:
from lotus_tpu.vector_store import TpuVS

demo(TpuVS(), "tpu:")
