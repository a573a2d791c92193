"""Chain-of-thought strategies on map/filter/extract.

Mirrors the reference's filter_cot.py / extract_cot.py / map_deepseek_cot.py
(reference examples/op_examples/): ReasoningStrategy.COT asks the model to
reason before answering and the postprocessor strips the reasoning;
ZS_COT injects a zero-shot "think step by step" nudge.
"""

import json
import sys

import pandas as pd

from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))
from examples._common import configure
from lotus_tpu.types import ReasoningStrategy


def responder(prompt, messages, **kw):
    text = str(prompt).lower()
    if "json" in str(messages).lower():
        return "Reasoning: the course title names the field.\n" + json.dumps(
            {"field": "math" if "algebra" in text else "history"}
        )
    if "difficult" in text:
        answer = "True" if "advanced" in text else "False"
        return f"Reasoning: difficulty tracks the level prefix.\nAnswer: {answer}"
    return "Reasoning: summarizing.\nAnswer: a one-line course pitch"


configure(responder)

df = pd.DataFrame(
    {
        "course": [
            "Advanced Abstract Algebra",
            "Intro to World History",
            "Advanced Topology",
        ]
    }
)

# COT: the template requests explicit reasoning; return_explanations keeps it.
hard = df.sem_filter(
    "{course} is difficult",
    strategy=ReasoningStrategy.COT,
    return_explanations=True,
)
print(hard)

# ZS_COT on extract: structured output plus a think-step-by-step nudge.
fields = df.sem_extract(["course"], {"field": "academic field"}, strategy=ReasoningStrategy.ZS_COT)
print(fields)

# COT on map.
print(df.sem_map("Pitch {course} in one line", strategy=ReasoningStrategy.COT))
