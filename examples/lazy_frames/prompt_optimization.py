"""Evolving a pipeline's instructions against a metric.

Mirrors the reference's optimizer examples (reference
examples/lazy_frames/optimizer_examples/): PromptEvolutionOptimizer
re-executes the pipeline per candidate, scores it with a user eval_fn, and
mutates the weakest instruction — here fixing a vague filter prompt inside
a LazyFrame without touching the pipeline code.
"""

import sys

import pandas as pd

from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))
from examples._common import configure
from lotus_tpu.ast import LazyFrame
from lotus_tpu.ast.optimizer.prompt_optimizer import PromptEvolutionOptimizer


def responder(prompt, messages, **kw):
    text = str(prompt)
    if "Return ONLY the rewritten instruction" in text:
        # The "reflection" model proposes a sharper instruction.
        return "keep rows where {dish} is vegetarian"
    if "vegetarian" in text:  # the good instruction judges correctly
        return "Answer: " + str(any(w in text for w in ("salad", "falafel")))
    return "Answer: True"  # the vague instruction keeps everything


configure(responder)

df = pd.DataFrame({"dish": ["steak", "falafel wrap", "caesar salad", "pork belly"]})
lf = LazyFrame().sem_filter("keep the good {dish}")


def eval_fn(output, example):
    got, want = set(output["dish"]), {"falafel wrap", "caesar salad"}
    return (len(got & want) - len(got - want)) / len(want)


print("baseline score:", eval_fn(lf.execute(df), df))
opt = PromptEvolutionOptimizer(eval_fn, max_evals=6, seed=0)
tuned = LazyFrame(_nodes=opt.optimize(lf._nodes, train_data=df))
print("tuned score:   ", eval_fn(tuned.execute(df), df))
tuned.print_tree()
