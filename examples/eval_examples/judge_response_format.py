"""llm_as_judge with a pydantic response_format.

Mirrors the reference's llm_as_judge_response_format.py (reference
examples/eval_examples/): the judge returns a structured pydantic model per
row instead of free text, and the fields land as DataFrame columns.
"""

import json
import sys

import pandas as pd

from pathlib import Path

from pydantic import BaseModel, Field

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))
from examples._common import configure


class EvaluationScore(BaseModel):
    score: int = Field(description="Score from 1-10")
    reasoning: str = Field(description="One-line reasoning")
    strengths: list[str] = Field(description="Key strengths")


def responder(prompt, messages, **kw):
    good = "labeled data" in str(prompt)
    return json.dumps(
        {
            "score": 9 if good else 4,
            "reasoning": "contrasts both paradigms" if good else "answer is circular",
            "strengths": ["concrete example"] if good else [],
        }
    )


configure(responder)

df = pd.DataFrame(
    {
        "question": [
            "Explain supervised vs unsupervised learning",
            "What is cross-validation?",
        ],
        "answer": [
            "Supervised learning uses labeled data; unsupervised finds structure in unlabeled data.",
            "Cross-validation is when you validate with cross-validation.",
        ],
    }
)

results = df.llm_as_judge(
    "Evaluate the student {answer} for the {question}",
    response_format=EvaluationScore,
    suffix="_evaluation",
)
print(results)
