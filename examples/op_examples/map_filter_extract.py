"""sem_map, sem_filter, sem_extract over a small DataFrame."""

import json
import sys

import pandas as pd

from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))
from examples._common import configure


def responder(prompt, messages, **kw):
    text = str(prompt).lower()
    if "sentiment" in text and "json" in str(messages).lower():
        return json.dumps({"sentiment": "positive" if "love" in text else "negative"})
    if "claim" in text:
        return "Answer: True" if "love" in text else "Answer: False"
    return "a concise summary"


configure(responder)

df = pd.DataFrame(
    {"review": ["I love this product, works great", "Terrible quality, broke instantly"]}
)

print(df.sem_map("Summarize the {review} in five words"))
print(df.sem_filter("The {review} is positive"))
print(df.sem_extract(["review"], {"sentiment": "positive or negative"}))
