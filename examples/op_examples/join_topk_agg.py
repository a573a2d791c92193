"""sem_join, sem_topk, sem_agg."""

import sys

import pandas as pd

from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))
from examples._common import configure


def responder(prompt, messages, **kw):
    text = str(prompt)
    if "Claim:" in text:  # join predicate
        ok = ("cat" in text and "animal" in text) or ("rose" in text and "plant" in text)
        return f"Answer: {ok}"
    if "Document 1" in text:  # topk comparison: prefer shorter title
        d1 = text.split("Document 1:")[1].split("Document 2:")[0]
        d2 = text.split("Document 2:")[1]
        return "Document 1" if len(d1) < len(d2) else "Document 2"
    return "Combined summary of all rows"


configure(responder)

left = pd.DataFrame({"word": ["cat", "rose"]})
right = pd.DataFrame({"kind": ["animal", "plant"]})
print(left.sem_join(right, "the {word} is a {kind}"))

df = pd.DataFrame({"title": ["A very long winded name", "Short", "Medium name"]})
print(df.sem_topk("Rank {title} by brevity", K=2))

notes = pd.DataFrame({"notes": ["meeting at 10", "ship v2 friday", "hire two engineers"]})
print(notes.sem_agg("Summarize all {notes}"))
