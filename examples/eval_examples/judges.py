"""llm_as_judge and pairwise_judge."""

import sys

import pandas as pd

from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))
from examples._common import configure


def responder(prompt, messages, **kw):
    text = str(prompt)
    if "is better than" in text:
        return "Answer: A" if "detailed" in text.split("[B]:")[0] else "Answer: B"
    return "4" if "good" in text else "2"


configure(responder)

df = pd.DataFrame({"answer": ["a good detailed response", "a terse reply"]})
print(df.llm_as_judge("Grade the {answer} from 1-5", n_trials=2))

pairs = pd.DataFrame(
    {"left": ["detailed explanation with steps"], "right": ["short answer"]}
)
print(pairs.pairwise_judge("left", "right", "Which of {left} and {right} is more helpful?"))
