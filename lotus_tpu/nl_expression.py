"""Natural-language expression parsing: ``{column}`` template handling.

Reference contract: ``lotus/nl_expression.py:4-21`` — single braces mark
parameterized columns, double braces escape.
"""

from __future__ import annotations

import re

_COL_PATTERN = re.compile(r"(?<!\{)\{(?!\{)(.*?)(?<!\})\}(?!\})")


def parse_cols(text: str) -> list[str]:
    """Return the distinct column names referenced as ``{col}`` in *text*."""
    matches = _COL_PATTERN.findall(text)
    if not matches:
        raise ValueError(
            "Language expression contains no parameterized columns. Please specify the "
            "name of the relevant data column(s) in brackets {} within your language expression."
        )
    # Stable order of first appearance (the reference uses set(); deterministic
    # order makes prompts reproducible).
    seen: dict[str, None] = {}
    for m in matches:
        seen.setdefault(m, None)
    return list(seen)


def nle2str(nle: str, cols: list[str]) -> str:
    """Render the expression with each ``{col}`` replaced by its display name."""
    return nle.format(**{col: col.capitalize() for col in cols})
