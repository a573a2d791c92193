"""Few-shot examples and group_by variants.

Mirrors the reference's map_fewshot.py, agg_with_grouping.py and
top_k_with_grouping.py (reference examples/op_examples/): a demonstrations
DataFrame (with an ``Answer`` column) rides the prompt, and agg/topk run
once per group when ``group_by`` is set.
"""

import sys

import pandas as pd

from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))
from examples._common import configure


def responder(prompt, messages, **kw):
    text = str(prompt)
    if "capital" in text.lower():
        return {"Germany": "Berlin", "Japan": "Tokyo", "France": "Paris"}.get(
            next((c for c in ("Germany", "Japan", "France") if c in text), ""), "Unknown"
        )
    if "Summarize" in text:
        return "a grouped summary of the listed dishes"
    return "Answer: Document 1"


configure(responder)

# --- few-shot map: the examples frame carries the instruction's column + Answer
countries = pd.DataFrame({"country": ["Germany", "Japan"]})
shots = pd.DataFrame({"country": ["France"], "Answer": ["Paris"]})
print(countries.sem_map("What is the capital of {country}?", examples=shots))

# --- agg with group_by: one folded answer per cuisine
dishes = pd.DataFrame(
    {
        "cuisine": ["italian", "italian", "japanese", "japanese"],
        "dish": ["carbonara", "margherita", "ramen", "katsu curry"],
    }
)
print(dishes.sem_agg("Summarize the {dish} list", group_by=["cuisine"]))

# --- topk with group_by: an independent ranking per group
print(
    dishes.sem_topk("Which {dish} is most popular worldwide?", K=1, group_by=["cuisine"])
)
