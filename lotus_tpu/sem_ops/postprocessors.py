"""Output parsing for the LLM operators.

Parity target: ``lotus/sem_ops/postprocessors.py:12-221`` — ``Reasoning:`` /
``Answer:`` CoT splitting, the DeepSeek ``<think>`` variant with a
model-dispatch registry, JSON extraction parsing, and boolean filter parsing
with substring matching and a default fallback.
"""

from __future__ import annotations

import json
from typing import TYPE_CHECKING, Any, Callable

import lotus_tpu
from lotus_tpu.types import (
    SemanticExtractPostprocessOutput,
    SemanticFilterPostprocessOutput,
    SemanticMapPostprocessOutput,
)

if TYPE_CHECKING:  # pragma: no cover
    from lotus_tpu.models import LM


def _parse_json_or_empty(answer: str) -> dict[str, str]:
    try:
        obj = json.loads(answer)
    except json.JSONDecodeError:
        lotus_tpu.logger.info(f"\t Failed to parse: {answer}")
        obj = {}
    return {k: str(v) for k, v in obj.items()}


def cot_postprocessor(llm_answers: list[str], for_extract: bool = False):
    """Split 'Reasoning:\\n...' / 'Answer: ...' outputs."""
    outputs: list[Any] = []
    explanations: list[str | None] = []
    for ans in llm_answers:
        r_idx = ans.find("Reasoning:\n")
        r_idx = 0 if r_idx == -1 else r_idx + len("Reasoning:\n")
        a_idx = ans.find("Answer:")
        if a_idx == -1:
            reasoning, answer = "", ans.strip()
        else:
            reasoning = ans[r_idx:a_idx].strip("\n")
            answer = ans[a_idx + len("Answer:"):].strip()
        explanations.append(reasoning)
        outputs.append(_parse_json_or_empty(answer) if for_extract else answer)
    return outputs, explanations


def deepseek_cot_postprocessor(llm_answers: list[str], for_extract: bool = False):
    """Split DeepSeek '<think>...</think> ... Answer: ...' outputs."""
    outputs: list[Any] = []
    explanations: list[str | None] = []
    for ans in llm_answers:
        t0, t1 = ans.find("<think>"), ans.find("</think>")
        a_idx = ans.find("Answer:")
        if t0 != -1 and t1 != -1:
            reasoning = ans[t0 + len("<think>"): t1].strip()
            answer = ans[a_idx + len("Answer:"):].strip() if a_idx != -1 else ""
            if not answer and t0 > 0:
                answer = ans[:t0].strip()
        else:
            reasoning, answer = "", ans.strip()
        explanations.append(reasoning)
        outputs.append(_parse_json_or_empty(answer) if for_extract else answer)
    return outputs, explanations


COT_POSTPROCESSORS: dict[str, Callable] = {
    "deepseek-r1": deepseek_cot_postprocessor,
}


def get_cot_postprocessor(model: "LM", for_extract: bool = False) -> Callable:
    """Model-dispatched CoT postprocessor, defaulting to the standard one."""
    name = model.get_model_name()
    for prefix, proc in COT_POSTPROCESSORS.items():
        if name.startswith(prefix):
            return lambda answers, _p=proc: _p(answers, for_extract=for_extract)
    return lambda answers: cot_postprocessor(answers, for_extract=for_extract)


def map_postprocess(
    llm_answers: list[str], model: "LM", cot_reasoning: bool = False
) -> SemanticMapPostprocessOutput:
    if cot_reasoning:
        outputs, explanations = get_cot_postprocessor(model)(llm_answers)
    else:
        outputs, explanations = llm_answers, [None] * len(llm_answers)
    return SemanticMapPostprocessOutput(
        raw_outputs=llm_answers, outputs=outputs, explanations=explanations
    )


def extract_postprocess(
    llm_answers: list[str], model: "LM", cot_reasoning: bool = False
) -> SemanticExtractPostprocessOutput:
    if cot_reasoning:
        outputs, explanations = get_cot_postprocessor(model, for_extract=True)(llm_answers)
    else:
        outputs = [_parse_json_or_empty(a) for a in llm_answers]
        explanations = [None] * len(llm_answers)
    return SemanticExtractPostprocessOutput(
        raw_outputs=llm_answers, outputs=outputs, explanations=explanations
    )


def filter_postprocess(
    llm_answers: list[str],
    model: "LM",
    default: bool = True,
    output_tokens: tuple[str, str] = ("True", "False"),
) -> SemanticFilterPostprocessOutput:
    positive, negative = output_tokens

    def to_bool(answer: str | None) -> bool:
        if answer is None:
            lotus_tpu.logger.info(f"\t Failed to parse {answer}: defaulting to {default}")
            return default
        low = answer.lower()
        # Whichever token appears FIRST wins: real models often append an
        # explanation after "Answer: False" that mentions the word "true"
        # (or vice versa) — substring priority would mask the verdict.
        p_idx, n_idx = low.find(positive.lower()), low.find(negative.lower())
        if p_idx != -1 and (n_idx == -1 or p_idx < n_idx):
            return True
        if n_idx != -1:
            return False
        lotus_tpu.logger.info(f"\t Failed to parse {answer}: defaulting to {default}")
        return default

    outputs, explanations = get_cot_postprocessor(model)(llm_answers)
    return SemanticFilterPostprocessOutput(
        raw_outputs=llm_answers,
        outputs=[to_bool(a) for a in outputs],
        explanations=explanations,
    )
