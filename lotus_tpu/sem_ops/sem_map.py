"""sem_map: apply a natural-language transform to every row.

Role parity with ``lotus/sem_ops/sem_map.py`` (free function over multimodal
docs + a pandas accessor with few-shot/CoT support), rebuilt on the shared
:mod:`lotus_tpu.sem_ops._accessor` foundation: the accessor only does
instruction parsing, example unpacking, and column assembly; the free
function owns prompt formatting and the LM round-trip.
"""

from __future__ import annotations

from typing import Any, Callable

import pandas as pd

import lotus_tpu
from lotus_tpu.cache import operator_cache
from lotus_tpu.models import LM
from lotus_tpu.sem_ops._accessor import FewShot, SemAccessor, unpack_examples, uses_cot
from lotus_tpu.sem_ops.postprocessors import map_postprocess
from lotus_tpu.templates import task_instructions
from lotus_tpu.types import LMOutput, ReasoningStrategy, SemanticMapOutput, SemanticMapPostprocessOutput
from lotus_tpu.utils import show_safe_mode


def sem_map(
    docs: list[dict[str, Any]], model: LM, user_instruction: str, *,
    system_prompt: str | None = None, shots: FewShot | None = None,
    postprocessor: Callable[..., SemanticMapPostprocessOutput] = map_postprocess,
    strategy: ReasoningStrategy | None = None, safe_mode: bool = False,
    progress_bar_desc: str = "Mapping", **model_kwargs: Any,
) -> SemanticMapOutput:
    """Run the map instruction over ``docs`` and postprocess the outputs.

    ``docs`` are multimodal row payloads ({"text": ..., "image": {...}});
    ``shots`` bundles few-shot example payloads/answers and optional CoT
    reasoning into every prompt. ``safe_mode`` prints a cost estimate with an
    abort window before spending tokens.
    """
    shots = shots or FewShot()
    render = lambda doc: task_instructions.map_formatter(  # noqa: E731
        model,
        doc,
        user_instruction,
        shots.multimodal_data,
        shots.answers,
        shots.reasoning,
        strategy=strategy,
        system_prompt=system_prompt,
    )
    prompts = [render(doc) for doc in docs]
    if safe_mode:
        show_safe_mode(sum(model.count_tokens(p) for p in prompts), len(prompts))

    reply: LMOutput = model(prompts, progress_bar_desc=progress_bar_desc, **model_kwargs)
    digested = postprocessor(reply.outputs, model, uses_cot(strategy))
    if safe_mode:
        model.print_total_usage()
    return SemanticMapOutput(
        raw_outputs=digested.raw_outputs,
        outputs=digested.outputs,
        explanations=digested.explanations,
    )


@pd.api.extensions.register_dataframe_accessor("sem_map")
class SemMapDataframe(SemAccessor):
    """``df.sem_map("Summarize the {text}")`` — one new column per row.

    Few-shot examples arrive as a DataFrame carrying the instruction's
    columns plus an "Answer" column ("Reasoning" too under CoT).
    """

    @operator_cache
    def __call__(
        self, user_instruction: str, system_prompt: str | None = None,
        postprocessor: Callable[..., SemanticMapPostprocessOutput] = map_postprocess,
        return_explanations: bool = False, return_raw_outputs: bool = False,
        suffix: str = "_map", examples: pd.DataFrame | None = None,
        strategy: ReasoningStrategy | None = None, safe_mode: bool = False,
        progress_bar_desc: str = "Mapping", **model_kwargs: Any,
    ) -> pd.DataFrame:
        model = self._lm()
        cols, rendered_instruction = self._parse_instruction(user_instruction)
        shots = unpack_examples(examples, cols, strategy)

        forwarded = dict(
            system_prompt=system_prompt, postprocessor=postprocessor, shots=shots,
            strategy=strategy, safe_mode=safe_mode, progress_bar_desc=progress_bar_desc,
        )
        docs = task_instructions.df2multimodal_info(self._obj, cols)
        result = sem_map(docs, model, rendered_instruction, **forwarded, **model_kwargs)

        out = self._obj.copy()
        out[suffix] = result.outputs
        if return_explanations or shots.forced_explanations:
            out["explanation" + suffix] = result.explanations
        if return_raw_outputs:
            out["raw_output" + suffix] = result.raw_outputs
        return out
