"""Temporarily switch models for one pipeline step.

Mirrors the reference's scoped_model_switching.py (reference
examples/settings_examples/): settings.context() overlays the lm for the
current thread/task only and restores it on exit, so later steps keep the
original model with no manual save/restore.
"""

import sys

import pandas as pd

from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))
from examples._common import configure
from lotus_tpu import settings
from lotus_tpu.models import make_fake_lm

# "Production" model: answers filters True only for transformer papers.
configure(lambda p, m, **kw: "Answer: " + str("Attention" in str(p) or "BERT" in str(p)))
# "Cheap" model for the high-volume coarse step: permissive.
cheap_lm = make_fake_lm(responder=lambda p, m, **kw: "Answer: True")

df = pd.DataFrame(
    {
        "title": [
            "Attention Is All You Need",
            "BERT: Pre-training of Deep Bidirectional Transformers",
            "Deep Residual Learning for Image Recognition",
        ]
    }
)

with settings.context(lm=cheap_lm):
    coarse = df.sem_filter("Is {title} a machine learning paper?")
print("coarse pass kept:", len(coarse), "rows (cheap model)")

# Outside the context the original lm is active again.
fine = coarse.sem_filter("Is {title} specifically about transformers?")
print("fine pass kept:", fine["title"].tolist())
