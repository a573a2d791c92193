"""Configuring LM for different providers (OpenAI / Ollama / DeepSeek).

Mirrors the reference's openai.py / ollama.py / deepseek.py (reference
examples/model_examples/): the same LM class fronts every litellm-routable
provider; only the model string (and optionally api_base) changes.  Calls
are gated on the relevant env var so the script runs offline.
"""

import os

import pandas as pd

import lotus_tpu
from lotus_tpu.models import LM

PROVIDERS = {
    # model string                      env var that gates a live call
    "gpt-4o-mini": "OPENAI_API_KEY",
    "deepseek/deepseek-chat": "DEEPSEEK_API_KEY",
    "ollama/llama3.2": "LOTUS_TPU_OLLAMA",  # needs a local ollama server
}

df = pd.DataFrame({"course": ["Probability and Random Processes", "Cooking"]})

for model, env in PROVIDERS.items():
    if not os.getenv(env):
        print(f"skipped {model}: set {env} to run live")
        continue
    kwargs = {"api_base": "http://localhost:11434"} if model.startswith("ollama/") else {}
    lotus_tpu.settings.configure(lm=LM(model=model, temperature=0.0, **kwargs))
    print(model, "->")
    print(df.sem_filter("{course} requires a lot of math"))
    lotus_tpu.settings.lm.print_total_usage()
