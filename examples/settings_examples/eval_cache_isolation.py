"""Run an eval step with a different model + cache setting, in isolation.

Mirrors the reference's eval_cache_isolation.py (reference
examples/settings_examples/): the production pipeline runs with caching on;
the judge runs inside settings.context() with caching OFF and its own lm,
and the outer settings are restored afterwards — nothing leaks.
"""

import sys

import pandas as pd

from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))
from examples._common import configure
from lotus_tpu import settings
from lotus_tpu.models import make_fake_lm

prod_lm = configure(lambda p, m, **kw: "an expanded answer with one extra fact")
settings.configure(enable_cache=True)

judge_lm = make_fake_lm(responder=lambda p, m, **kw: "9" if "Paris" in str(p) else "6")

df = pd.DataFrame(
    {
        "question": ["What is the capital of France?", "Who wrote Romeo and Juliet?"],
        "answer": ["Paris is the capital of France.", "Shakespeare wrote it."],
    }
)

# Step 1: cached production mapping — running it twice hits the operator cache.
expanded = df.sem_map("Expand {answer} with one additional relevant fact.")
expanded = df.sem_map("Expand {answer} with one additional relevant fact.")
print("operator cache hits:", prod_lm.stats.operator_cache_hits)

# Step 2: judge with its own lm and caching disabled, leaking nothing.
with settings.context(lm=judge_lm, enable_cache=False):
    scored = df.llm_as_judge("Grade the {answer} to {question} from 1-10")
print(scored)

assert settings.enable_cache is True and settings.lm is prod_lm
print("outer settings restored: enable_cache =", settings.enable_cache)
