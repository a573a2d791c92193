"""LazyFrame pipelines: build, optimize, execute, persist."""

import sys
import tempfile

import pandas as pd

from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))
from examples._common import configure
from lotus_tpu.ast import LazyFrame

configure(lambda p, m, **kw: f"Answer: {'sports' in str(p)}")

df = pd.DataFrame(
    {
        "text": ["The game went to overtime", "Quarterly earnings rose", "A sports upset last night"],
        "views": [100, 5, 250],
    }
)

def popular(d):
    # A named function (not a lambda) so the pipeline stays picklable.
    return d["views"] > 50


lf = (
    LazyFrame()
    .sem_filter("{text} is about sports")
    .filter(popular)
    .sort_values("views", ascending=False)
)
lf.print_tree()

# Predicate pushdown moves the cheap pandas filter before the LLM filter.
optimized = lf.optimize()
optimized.print_tree()
print(optimized.execute(df))

with tempfile.TemporaryDirectory() as d:
    optimized.save(f"{d}/pipeline.pkl")
    again = LazyFrame.load(f"{d}/pipeline.pkl")
    print("reloaded:", len(again), "nodes")
