"""Real-model semantic operators through the stdlib Anthropic transport.

The reference needs litellm for every provider; here `AnthropicTransport`
(urllib-only, `lotus_tpu/models/anthropic_transport.py`) drives the full
operator stack against the Messages API with zero SDK dependencies —
`LM("claude-…")` selects it automatically whenever litellm is absent and
`ANTHROPIC_API_KEY` is set.

Offline by default: without a key this example falls back to the
deterministic fake LM so the examples sweep stays green.  With
`ANTHROPIC_API_KEY` (+ optional `ANTHROPIC_BASE_URL`) it runs live — this
is exactly how the executed paper numbers in
`benchmarks/artifacts/real_model_results.json` were produced
(`python -m benchmarks.real_model_run`).
"""

import os

import pandas as pd

import lotus_tpu
from lotus_tpu.models import LM, make_fake_lm


def build_lm():
    if os.environ.get("ANTHROPIC_API_KEY"):
        return LM("claude-haiku-4-5", temperature=0.0, max_tokens=128)

    def responder(prompt, messages, **kw):
        text = str(prompt).lower()
        return f"Answer: {'false' if 'cold' in text else 'true'}"

    return make_fake_lm(responder=responder)


def main() -> None:
    lotus_tpu.settings.configure(lm=build_lm())
    df = pd.DataFrame(
        {
            "claim": [
                "The sky appears blue on a clear day.",
                "Fire is cold to the touch.",
                "Water boils at 100 C at sea level.",
            ]
        }
    )
    true_claims = df.sem_filter("{claim} is a true statement")
    print(true_claims)
    assert "Fire is cold to the touch." not in set(true_claims["claim"])


if __name__ == "__main__":
    main()
