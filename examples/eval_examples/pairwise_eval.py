"""pairwise_judge with permuted trials (position-bias control).

Mirrors the reference's pairwise_eval.py (reference
examples/eval_examples/): each pair is judged n_trials times and, with
permute_cols=True, half the trials swap [A]/[B] so a position-biased judge
cannot win by always answering "A".
"""

import sys

import pandas as pd

from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))
from examples._common import configure


def responder(prompt, messages, **kw):
    # Pick whichever side mentions sources — regardless of A/B position.
    text = str(prompt)
    a_side = text.split("[B]:")[0]
    return "Answer: A" if "sources" in a_side else "Answer: B"


configure(responder)

pairs = pd.DataFrame(
    {
        "model_a": [
            "The claim is true, confirmed by two cited sources.",
            "Short answer: yes.",
        ],
        "model_b": [
            "It is true.",
            "Yes — verified against the primary sources and a survey.",
        ],
    }
)

out = pairs.pairwise_judge(
    "model_a",
    "model_b",
    "Which of {model_a} and {model_b} is better supported?",
    n_trials=2,
    permute_cols=True,
    return_explanations=False,
)
print(out)
