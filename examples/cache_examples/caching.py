"""Operator + message caching: repeated calls are free and still accounted."""

import sys

import pandas as pd

from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))
import lotus_tpu
from examples._common import configure

lm = configure(lambda p, m, **kw: "Answer: True")
lotus_tpu.settings.configure(enable_cache=True)

df = pd.DataFrame({"text": ["alpha", "beta"]})
df.sem_filter("{text} ok?")
df.sem_filter("{text} ok?")  # served from the operator cache

print("operator cache hits:", lm.stats.operator_cache_hits)
print("virtual tokens (both runs accounted):", lm.stats.virtual_usage.total_tokens)
print("physical tokens (only the first run paid):", lm.stats.physical_usage.total_tokens)
