"""web_search -> sem_topk -> web_extract pipelines per engine.

Mirrors the reference's arxiv_topk.py / pubmed_extract.py / tavily_topk.py
family (reference examples/web_search_examples/): search an engine, rank
the hits with a semantic operator, pull full text for the winners.  Each
engine is gated on its dependency / API key so the script degrades
gracefully offline.
"""

import os
import sys

from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))
from examples._common import configure
from lotus_tpu import WebSearchCorpus, web_extract, web_search

configure(lambda p, m, **kw: "Answer: Document 1")

QUERY = "semantic operators over dataframes"

# arXiv: needs the `arxiv` package, no API key.
try:
    hits = web_search(WebSearchCorpus.ARXIV, QUERY, K=5)
    top = hits.sem_topk("Which {title} is most relevant to TPU execution?", K=2)
    print(top[["title"]])
    full = web_extract(WebSearchCorpus.ARXIV, doc_ids=top["id"].head(1).tolist())
    print("chars of full text:", full["full_text"].str.len().tolist())
except Exception as e:  # ImportError or network
    print(f"arxiv skipped: {e}")

# PubMed (NCBI eutils, no key needed but network required).
try:
    hits = web_search(WebSearchCorpus.PUBMED, "adverse drug reactions NLP", K=3)
    print(hits[["title"]])
except Exception as e:
    print(f"pubmed skipped: {e}")

# Keyed engines follow the same shape:
for corpus, env in [
    (WebSearchCorpus.TAVILY, "TAVILY_API_KEY"),
    (WebSearchCorpus.YOU, "YOU_API_KEY"),
    (WebSearchCorpus.GOOGLE, "SERPAPI_API_KEY"),
]:
    if os.getenv(env):
        print(web_search(corpus, QUERY, K=3))
    else:
        print(f"{corpus.name.lower()} skipped: set {env}")
