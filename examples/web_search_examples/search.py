"""web_search / web_extract (requires engine-specific API keys)."""

import lotus_tpu
from lotus_tpu import WebSearchCorpus

# Requires the 'arxiv' package (no API key):
try:
    df = lotus_tpu.web_search(WebSearchCorpus.ARXIV, "vector search on TPUs", K=3)
    print(df[["title", "link"]])
except ImportError as e:
    print(f"skipped: {e}")

# Tavily (set TAVILY_API_KEY):
# df = lotus_tpu.web_search(WebSearchCorpus.TAVILY, "semantic operators", K=5)
# full = lotus_tpu.web_extract(WebSearchCorpus.TAVILY, urls=df["url"].tolist())
