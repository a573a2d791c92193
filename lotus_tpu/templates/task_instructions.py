"""Prompt formatters and DataFrame serialization.

Parity target: ``lotus/templates/task_instructions.py:11-414`` — chat-message
construction for filter/map/extract (few-shot, CoT, zero-shot CoT, DeepSeek
<think> variant), row serialization in DEFAULT ``[Col]: «val»`` / JSON-lines /
XML formats, multimodal text+image splitting, and the cartesian merge used by
joins.
"""

from __future__ import annotations

import re
from typing import TYPE_CHECKING, Any

import pandas as pd

from lotus_tpu.dtype_extensions import ImageDtype
from lotus_tpu.types import ReasoningStrategy, SerializationFormat

if TYPE_CHECKING:  # pragma: no cover
    from lotus_tpu.models import LM


# --------------------------------------------------------------- answer forms
def cot_formatter(reasoning: str, answer: str) -> str:
    return f"Reasoning:\n{reasoning}\n\nAnswer: {answer}"


def answer_only_formatter(answer: str) -> str:
    return f"Answer: {answer}"


def deepseek_cot_formatter() -> str:
    return (
        "Please think through your reasoning step by step, then provide your final "
        "answer.\nYou must put your reasoning inside the <think></think> tags, then "
        "provide your final answer after the </think> tag with the format: "
        "Answer: your answer."
    )


def cot_prompt_formatter(reasoning_instructions: str = "", answer_instructions: str = "") -> str:
    body = cot_formatter(
        f"<Your reasoning here. {reasoning_instructions}>",
        f"<Your answer here. {answer_instructions}>",
    )
    return f"Let's think step by step. Use the following format to provide your answer:\n{body}\n"


def non_cot_prompt_formatter(answer_instructions: str = "") -> str:
    body = answer_only_formatter(f"<Your answer here. {answer_instructions}>")
    return f"Use the following format to provide your answer:\n{body}\n"


# ------------------------------------------------------------ message builders
def context_formatter(multimodal_data: dict[str, Any] | str) -> tuple[str, list[dict[str, Any]]]:
    """Split a multimodal row payload into text + image content parts."""
    if isinstance(multimodal_data, str):
        return multimodal_data, []
    if not isinstance(multimodal_data, dict):
        raise ValueError("multimodal_data must be a dictionary or a string")
    image_parts: list[dict[str, Any]] = []
    for key, b64 in (multimodal_data.get("image") or {}).items():
        image_parts.append({"type": "text", "text": f"[{key.capitalize()}]: \n"})
        image_parts.append({"type": "image_url", "image_url": {"url": b64}})
    return multimodal_data.get("text") or "", image_parts


def user_message_formatter(
    multimodal_data: dict[str, Any] | str,
    user_instruction_with_tag: str | None = None,
) -> dict[str, Any]:
    text, image_parts = context_formatter(multimodal_data)
    if not image_parts:
        # Omit the tag entirely when absent (upstream interpolates the None
        # into the prompt — lotus/templates/task_instructions.py:76).
        tag = f"\n\n{user_instruction_with_tag}" if user_instruction_with_tag else ""
        return {"role": "user", "content": f"Context:\n{text}{tag}"}
    content: list[dict[str, Any]] = [{"type": "text", "text": f"Context:\n{text}"}] + image_parts
    if user_instruction_with_tag:
        content.append({"type": "text", "text": f"\n\n{user_instruction_with_tag}"})
    return {"role": "user", "content": content}


def filter_formatter(
    model: "LM",
    multimodal_data: dict[str, Any],
    user_instruction: str,
    examples_multimodal_data: list[dict[str, Any]] | None = None,
    examples_answer: list[bool] | None = None,
    cot_reasoning: list[str] | None = None,
    strategy: ReasoningStrategy | None = None,
    reasoning_instructions: str = "",
    system_prompt: str | None = None,
    output_tokens: tuple[str, str] = ("True", "False"),
) -> list[dict[str, Any]]:
    """Build the chat for a boolean claim over one row."""
    positive_token, negative_token = output_tokens
    answer_instructions = f"The answer should be either {positive_token} or {negative_token}"

    sys_instruction = system_prompt or (
        "The user will provide a claim and some relevant context.\n"
        "Your job is to determine whether the claim is true for the given context.\n"
    )
    if strategy in (ReasoningStrategy.COT, ReasoningStrategy.ZS_COT):
        sys_instruction += cot_prompt_formatter(reasoning_instructions, answer_instructions)
    elif not system_prompt:
        sys_instruction += non_cot_prompt_formatter(answer_instructions)

    messages: list[dict[str, Any]] = [{"role": "system", "content": sys_instruction}]

    if examples_multimodal_data:
        assert examples_answer is not None and len(examples_multimodal_data) == len(examples_answer)
        if cot_reasoning:
            assert len(cot_reasoning) == len(examples_answer)
        for idx, (ex_data, ex_ans) in enumerate(zip(examples_multimodal_data, examples_answer)):
            if isinstance(ex_ans, bool):
                token = positive_token if ex_ans else negative_token
            else:
                token = positive_token if str(ex_ans).lower() == positive_token.lower() else negative_token
            if cot_reasoning:
                content = cot_formatter(cot_reasoning[idx], token)
            elif strategy == ReasoningStrategy.COT:
                content = cot_formatter("Reasoning omitted", token)
            else:
                content = answer_only_formatter(token)
            messages.append(user_message_formatter(ex_data, f"Claim: {user_instruction}"))
            messages.append({"role": "assistant", "content": content})

    tag = f"Claim: {user_instruction}"
    if strategy == ReasoningStrategy.ZS_COT and model.is_deepseek():
        tag = f"{tag}\n\n{deepseek_cot_formatter()}"
    messages.append(user_message_formatter(multimodal_data, tag))
    return messages


def map_formatter(
    model: "LM",
    multimodal_data: dict[str, Any],
    user_instruction: str,
    examples_multimodal_data: list[dict[str, Any]] | None = None,
    examples_answer: list[str] | None = None,
    cot_reasoning: list[str] | None = None,
    strategy: ReasoningStrategy | str | None = None,
    system_prompt: str | None = None,
) -> list[dict[str, Any]]:
    """Build the chat for a row->text transform."""
    if cot_reasoning:
        assert examples_multimodal_data is not None and examples_answer is not None
        sys_instruction = system_prompt or (
            "The user will provide an instruction and some relevant context.\n"
            "Your job is to answer the user's instruction given the context."
            "You must give your reasoning and then your final answer"
        )
        messages: list[dict[str, Any]] = [{"role": "system", "content": sys_instruction}]
        for ex_data, ex_ans, cot in zip(examples_multimodal_data, examples_answer, cot_reasoning):
            messages.append(user_message_formatter(ex_data, f"Instruction: {user_instruction}"))
            messages.append({"role": "assistant", "content": cot_formatter(cot, str(ex_ans))})
        messages.append(user_message_formatter(multimodal_data, f"Instruction: {user_instruction}"))
        return messages

    if strategy == ReasoningStrategy.ZS_COT and not model.is_deepseek():
        sys_instruction = system_prompt or (
            "The user will provide an instruction and some relevant context.\n"
            "Your job is to answer the user's instruction given the context."
            'First give your reasoning. Then you MUST end your output with "Answer: your answer"'
        )
        return [
            {"role": "system", "content": sys_instruction},
            user_message_formatter(multimodal_data, f"Instruction: {user_instruction}"),
        ]

    sys_instruction = system_prompt or (
        "The user will provide an instruction and some relevant context.\n"
        "Your job is to answer the user's instruction given the context."
    )
    messages = [{"role": "system", "content": sys_instruction}]
    if examples_multimodal_data:
        assert examples_answer is not None
        for ex_data, ex_ans in zip(examples_multimodal_data, examples_answer):
            messages.append(user_message_formatter(ex_data, f"Instruction: {user_instruction}"))
            messages.append({"role": "assistant", "content": str(ex_ans)})

    tag = f"Instruction: {user_instruction}"
    if strategy == ReasoningStrategy.ZS_COT and model.is_deepseek():
        tag = f"{tag}\n\n{deepseek_cot_formatter()}"
    messages.append(user_message_formatter(multimodal_data, tag))
    return messages


def extract_formatter(
    model: "LM",
    multimodal_data: dict[str, Any],
    output_cols: dict[str, str | None],
    extract_quotes: bool = True,
    strategy: ReasoningStrategy | None = None,
) -> list[dict[str, Any]]:
    """Build the chat for JSON schema extraction over one row."""
    col_names = list(output_cols.keys())
    cols_with_desc = {col: (desc if desc is not None else col) for col, desc in output_cols.items()}
    all_fields = list(col_names)
    quote_fields: list[str] = []
    if extract_quotes:
        quote_fields = [f"{col}_quote" for col in col_names]
        all_fields += quote_fields
    fields_str = ", ".join(all_fields)

    if extract_quotes:
        sys_instruction = (
            "The user will provide the columns that need to be extracted and some relevant context.\n"
            "Your job is to extract these columns and provide only a concise value for each field "
            f"and the corresponding full quote for each field in the '{', '.join(quote_fields)}' fields.\n"
            f"Here is a description of each field: {cols_with_desc}\n"
            f"The response should be valid JSON format with the following fields: {fields_str}.\n"
        )
    else:
        sys_instruction = (
            "The user will provide the columns that need to be extracted and some relevant context.\n"
            "Your job is to extract these columns and provide only a concise value for each field.\n"
            f"Here is a description of each field: {cols_with_desc}\n"
            f"The response should be valid JSON format with the following fields: {fields_str}.\n"
        )

    if strategy in (ReasoningStrategy.COT, ReasoningStrategy.ZS_COT):
        sys_instruction += "\n" + cot_prompt_formatter(
            "Think through each extraction step by step.",
            f"Provide the JSON response with fields: {fields_str}",
        )

    messages = [
        {"role": "system", "content": sys_instruction},
        user_message_formatter(multimodal_data),
    ]
    if strategy == ReasoningStrategy.ZS_COT and model.is_deepseek():
        messages.append(user_message_formatter(multimodal_data, f"Instruction: {deepseek_cot_formatter()}"))
    return messages


# ------------------------------------------------------------- serialization
def df2text(df: pd.DataFrame, cols: list[str]) -> list[str]:
    """Serialize each row's projection onto ``cols`` to text.

    Formats (settings.serialization_format): DEFAULT ``[Col]: «val»`` lines,
    JSON (one json object per row), XML (one <row> element per row).
    """
    from lotus_tpu.settings import settings

    cols = [c for c in cols if c in df.columns]
    if not cols:
        return [""] * len(df)
    projected = df[cols]

    fmt = settings.serialization_format
    if fmt == SerializationFormat.DEFAULT:
        display = [c.capitalize() for c in cols]
        rows = []
        for _, row in projected.iterrows():
            rows.append("".join(f"[{disp}]: «{row[c]}»\n" for c, disp in zip(cols, display)))
        return rows
    if fmt == SerializationFormat.JSON:
        return projected.to_json(orient="records", lines=True).splitlines()
    if fmt == SerializationFormat.XML:
        import xml.sax.saxutils as su

        def clean(name: str) -> str:
            return re.sub(r"[^\w]", "", name)

        rows = []
        for _, row in projected.iterrows():
            cells = "".join(
                f"<{clean(c)}>{su.escape(str(row[c]))}</{clean(c)}>" for c in cols
            )
            rows.append(f"<row>{cells}</row>")
        return rows
    raise ValueError(f"Unknown serialization format: {fmt}")


def df2multimodal_info(df: pd.DataFrame, cols: list[str]) -> list[dict[str, Any]]:
    """Split each row into text (serialized) + image (base64 by column)."""
    image_cols = [c for c in cols if c in df.columns and isinstance(df[c].dtype, ImageDtype)]
    text_cols = [c for c in cols if c not in image_cols]
    text_rows = df2text(df, text_cols)
    return [
        {
            "text": text_rows[i],
            "image": {c.capitalize(): df[c].array.get_image(i, "base64") for c in image_cols},
        }
        for i in range(len(df))
    ]


def merge_multimodal_info(
    first: list[dict[str, Any]], second: list[dict[str, Any]]
) -> list[dict[str, Any]]:
    """Cartesian merge of two multimodal row lists (used by joins)."""
    merged = []
    for a in first:
        for b in second:
            if a["text"] and b["text"]:
                text = f"{a['text']}\n{b['text']}"
            else:
                text = a["text"] + b["text"]
            merged.append({"text": text, "image": {**a["image"], **b["image"]}})
    return merged


def li2text(li: list[str], name: str) -> str:
    return "".join(f"[{name}] {item}\n" for item in li)
