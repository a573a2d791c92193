"""Web search & extraction: multiple engines -> DataFrames.

Parity target: ``lotus/web_search.py:15-723``.  Engines: Google / Google
Scholar (serpapi), Arxiv, You.com, Tavily, PubMed (pymed); Bing is
discontinued upstream and raises accordingly.  ``web_extract`` fetches full
text (HTML stripped with a stdlib parser; PDFs via pymupdf when installed).
All provider SDKs and API keys are optional/gated.

Architecture: one ``_Engine`` spec per corpus (default columns + search
callable + optional full-text callable) in a registry; ``web_search`` /
``web_extract`` are thin lookups over it rather than if-chains.
"""

from __future__ import annotations

import logging
import os
import time
from datetime import datetime
from enum import Enum
from html.parser import HTMLParser
from typing import Any, Callable, NamedTuple

import pandas as pd

logger = logging.getLogger("lotus_tpu")

_DEFAULT_HEADERS = {"User-Agent": "lotus-tpu/0.1 (+https://github.com/lotus-tpu)"}


class WebSearchCorpus(Enum):
    GOOGLE = "google"
    GOOGLE_SCHOLAR = "google_scholar"
    ARXIV = "arxiv"
    YOU = "you"
    BING = "bing"
    TAVILY = "tavily"
    PUBMED = "pubmed"


_BING_GONE = "Bing search is discontinued. Please use Google search instead."

# Shared arxiv/pubmed record shape; pubmed appends its article-level extras.
_PAPER_COLS = "id title link abstract published authors categories".split()

_SERP_COLS = (
    "position title link redirect_link displayed_link thumbnail date author "
    "cited_by extracted_cited_by favicon snippet inline_links publication_info".split()
    + ["inline_links.cited_by.total"]
)


class _Window(NamedTuple):
    """Optional [start, end] date restriction, engine-agnostic."""

    start: datetime | None
    end: datetime | None

    def fmt(self, pattern: str, lo_default: str = "", hi_default: str = "") -> tuple[str, str]:
        lo = self.start.strftime(pattern) if self.start else lo_default
        hi = self.end.strftime(pattern) if self.end else hi_default
        return lo, hi

    def __bool__(self) -> bool:
        return self.start is not None or self.end is not None


# -------------------------------------------------------------- text extract
class _HTMLTextExtractor(HTMLParser):
    """Strip tags; skip script/style/head subtrees."""

    _SKIP = {"script", "style", "head", "noscript", "template"}

    def __init__(self) -> None:
        super().__init__()
        self._chunks: list[str] = []
        self._skip_depth = 0

    def handle_starttag(self, tag: str, attrs) -> None:
        self._skip_depth += tag.lower() in self._SKIP

    def handle_endtag(self, tag: str) -> None:
        if self._skip_depth and tag.lower() in self._SKIP:
            self._skip_depth -= 1

    def handle_data(self, data: str) -> None:
        stripped = data.strip()
        if stripped and not self._skip_depth:
            self._chunks.append(stripped)

    def get_text(self) -> str:
        return "\n".join(self._chunks)


def _clip(text: str | None, max_length: int | None) -> str | None:
    if text is None or max_length is None:
        return text
    return text[: max(max_length, 0)]


def html_to_text(html_text: str) -> str:
    parser = _HTMLTextExtractor()
    parser.feed(html_text)
    parser.close()
    return parser.get_text()


def _pdf_to_text(pdf_bytes: bytes, url: str, max_length: int | None) -> str | None:
    try:
        import fitz  # type: ignore
    except ImportError:
        raise ImportError("The 'pymupdf' library is required for PDF extraction.")
    try:
        parts: list[str] = []
        budget = max_length if max_length and max_length > 0 else None
        with fitz.open(stream=pdf_bytes, filetype="pdf") as doc:
            for page in doc:
                txt = page.get_text("text")
                if not txt:
                    continue
                if budget is not None:
                    txt = txt[:budget]
                    budget -= len(txt)
                parts.append(txt)
                if budget is not None and budget <= 0:
                    break
        joined = "\n".join(parts).strip()
        return joined or None
    except Exception as exc:
        logger.warning("Failed to extract PDF text from %s: %s", url, exc)
        return None


def _fetch_url_texts(urls: list[str], max_length: int | None, delay: float = 0.1) -> list[str | None]:
    import requests

    def one(url: str) -> str | None:
        time.sleep(delay)
        if not url:
            return None
        try:
            resp = requests.get(url, headers=_DEFAULT_HEADERS, timeout=20)
            resp.raise_for_status()
        except Exception as exc:
            logger.warning("Failed to fetch %s: %s", url, exc)
            return None
        if "application/pdf" in resp.headers.get("Content-Type", "").lower() or url.lower().endswith(".pdf"):
            pdf_text = _pdf_to_text(resp.content, url, max_length)
            if pdf_text:
                return pdf_text
        body = resp.text or resp.content.decode("utf-8", errors="ignore")
        return _clip(html_to_text(body), max_length) or None

    return [one(u) for u in urls]


# ------------------------------------------------------------------ engines
def _require_key(env: str, what: str) -> str:
    key = os.getenv(env)
    if not key:
        raise ValueError(f"{env} is not set. It is required to use {what}.")
    return key


def _tag_query(df: pd.DataFrame, cols: list[str], query: str) -> pd.DataFrame:
    kept = df[[c for c in cols if c in df.columns]].copy()
    kept["query"] = query
    return kept


def _per_query(queries: list[str], delay: float, one: Callable[[str], pd.DataFrame]) -> pd.DataFrame:
    frames = []
    for q in queries:
        time.sleep(delay)
        frames.append(one(q))
    return pd.concat(frames, ignore_index=True) if frames else pd.DataFrame()


def _serpapi_search(queries, K, cols, window: _Window, delay: float, *, sort_by_date=False, engine="google"):
    try:
        from serpapi import GoogleSearch
    except ImportError:
        raise ImportError("The 'serpapi' library is required for Google search.")
    api_key = _require_key("SERPAPI_API_KEY", "GoogleSearch")

    def one(q: str) -> pd.DataFrame:
        params: dict[str, Any] = {"api_key": api_key, "q": q, "num": K, "engine": engine}
        if window.start and window.end:
            lo, hi = window.fmt("%m/%d/%Y")
            params["tbs"] = f"cdr:1,cd_min:{lo},cd_max:{hi}"
        elif window.start:
            params["q"] = f"{q} after:{window.start.strftime('%Y-%m-%d')}"
        elif window.end:
            params["q"] = f"{q} before:{window.end.strftime('%Y-%m-%d')}"
        payload = GoogleSearch(params).get_dict()
        if "organic_results" not in payload:
            raise ValueError("No organic_results found in the response from GoogleSearch")
        hits = pd.DataFrame(payload["organic_results"])
        if len(hits):
            hits = pd.json_normalize(hits.to_dict("records"))
        return _tag_query(hits, cols, q)

    return _per_query(queries, delay, one)


def _arxiv_search(queries, K, cols, window: _Window, delay: float, *, sort_by_date=False):
    try:
        import arxiv
    except ImportError:
        raise ImportError("The 'arxiv' library is required for Arxiv search.")
    client = arxiv.Client()
    order = arxiv.SortCriterion.SubmittedDate if sort_by_date else arxiv.SortCriterion.Relevance

    def record(r) -> dict[str, Any]:
        return {
            "id": r.get_short_id() if hasattr(r, "get_short_id") else r.entry_id,
            "title": r.title,
            "link": r.entry_id,
            "abstract": r.summary,
            "published": r.published,
            "authors": ", ".join(a.name for a in r.authors),
            "categories": ", ".join(r.categories),
        }

    def one(q: str) -> pd.DataFrame:
        term = q
        if window:
            lo, hi = window.fmt("%Y%m%d%H%M", "00000000", "99999999")
            term = f"({q}) AND (submittedDate:[{lo} TO {hi}])"
        found = client.results(arxiv.Search(query=term, max_results=K, sort_by=order))
        return _tag_query(pd.DataFrame([record(r) for r in found]), cols, q)

    return _per_query(queries, delay, one)


def _you_search(queries, K, cols, window: _Window, delay: float, *, sort_by_date=False):
    import requests

    api_key = _require_key("YOU_API_KEY", "You.com search")

    def one(q: str) -> pd.DataFrame:
        params: dict[str, Any] = {"query": str(q), "count": K}
        if window:
            lo, hi = window.fmt("%Y-%m-%d", "0000-01-01", datetime.now().strftime("%Y-%m-%d"))
            params["freshness"] = f"{lo}to{hi}"
        resp = requests.get("https://ydc-index.io/v1/search", headers={"X-API-Key": api_key}, params=params)
        resp.raise_for_status()
        found = resp.json().get("results", {})
        rows = list(found.get("web", [])) + list(found.get("news", []))
        return _tag_query(pd.DataFrame(rows), cols, q)

    return _per_query(queries, delay, one)


def _tavily_search(queries, K, cols, window: _Window, delay: float, *, sort_by_date=False):
    import requests

    headers = {"Authorization": f"Bearer {_require_key('TAVILY_API_KEY', 'Tavily search')}"}

    def one(q: str) -> pd.DataFrame:
        params: dict[str, Any] = {"query": q, "max_results": K}
        if window.start:
            params["start_date"] = window.start.strftime("%Y-%m-%d")
        if window.end:
            params["end_date"] = window.end.strftime("%Y-%m-%d")
        resp = requests.post("https://api.tavily.com/search", headers=headers, json=params)
        resp.raise_for_status()
        return _tag_query(pd.DataFrame(resp.json().get("results", [])), cols, q)

    return _per_query(queries, delay, one)


def _tavily_fetch(identifiers: list[str], max_length: int | None, delay: float) -> list[str | None]:
    import requests

    valid = [i for i in identifiers if i]
    if not valid:
        return [None] * len(identifiers)
    api_key = _require_key("TAVILY_API_KEY", "Tavily extract")
    by_url: dict[str, str | None] = {}
    try:
        resp = requests.post(
            "https://api.tavily.com/extract",
            headers={"Authorization": f"Bearer {api_key}"},
            json={"urls": valid, "extract_depth": "basic", "format": "markdown"},
        )
        resp.raise_for_status()
        payload = resp.json()
    except Exception as exc:
        logger.warning("Tavily extraction failed for %s: %s", valid, exc)
        return [None] * len(identifiers)
    for r in payload.get("results", []):
        raw = r.get("raw_content")
        by_url[r.get("url", "")] = _clip(raw, max_length) if isinstance(raw, str) else None
    for f in payload.get("failed_results", []):
        by_url[f.get("url", "")] = None
    return [by_url.get(i) if i else None for i in identifiers]


def _pubmed_search(queries, K, cols, window: _Window, delay: float, *, sort_by_date=False):
    try:
        from pymed import PubMed
    except ImportError:
        raise ImportError("The 'pymed' library is required for PubMed search.")
    pm = PubMed(tool=os.getenv("PUBMED_TOOL", "LOTUS"))

    def record(article) -> dict[str, Any]:
        get = lambda attr: getattr(article, attr, None)  # noqa: E731
        pmid_raw = get("pubmed_id")
        if isinstance(pmid_raw, dict):
            pmid_raw = pmid_raw.get("pubmed_id", "")
        pmid = str(pmid_raw).split("\n")[0].strip() if pmid_raw else None
        author_names = ", ".join(
            f"{a.get('firstname', '')} {a.get('lastname', '')}".strip() for a in (get("authors") or [])
        )
        types = ", ".join(pt.get("name", "") for pt in (get("publication_types") or []) if pt.get("name"))
        return {
            "id": pmid,
            "title": get("title"),
            "link": f"https://pubmed.ncbi.nlm.nih.gov/{pmid}" if pmid else None,
            "abstract": get("abstract"),
            "published": get("publication_date"),
            "authors": author_names,
            "categories": types,
            "journal": get("journal"),
            "doi": get("doi"),
            "methods": get("methods"),
            "conclusions": get("conclusions"),
            "results": get("results"),
        }

    def one(q: str) -> pd.DataFrame:
        term = q
        if window:
            lo = window.start.year if window.start else 1800
            hi = window.end.year if window.end else 3000
            term = f"({q}) AND {lo}:{hi}[PDAT]"
        rows = [record(a) for a in pm.query(term, max_results=K)]
        return _tag_query(pd.DataFrame(rows), cols, q)

    return _per_query(queries, delay, one)


def _arxiv_fetch(identifiers: list[str], max_length: int | None, delay: float) -> list[str | None]:
    try:
        import arxiv
    except ImportError:
        raise ImportError("The 'arxiv' library is required for Arxiv extraction.")
    pdf_texts = _fetch_url_texts([f"https://arxiv.org/pdf/{i}.pdf" if i else "" for i in identifiers], max_length, delay)
    out: list[str | None] = []
    for ident, pdf_text in zip(identifiers, pdf_texts):
        if pdf_text:
            out.append(pdf_text)
        elif ident:  # abstract fallback when the PDF fetch failed
            hit = next(arxiv.Client().results(arxiv.Search(id_list=[ident], max_results=1)), None)
            out.append(hit.summary if hit else None)
        else:
            out.append(None)
    return out


def _pubmed_fetch(identifiers: list[str], max_length: int | None, delay: float) -> list[str | None]:
    try:
        from pymed import PubMed
    except ImportError:
        raise ImportError("The 'pymed' library is required for PubMed extraction.")
    pm = PubMed(tool="LOTUS")

    def one(ident: str) -> str | None:
        if not ident:
            return None
        hit = next(pm.query(ident, max_results=1), None)
        return hit.abstract if hit else None

    return [one(i) for i in identifiers]


class _Engine(NamedTuple):
    default_cols: list[str]
    search: Callable[..., pd.DataFrame]
    id_to_url: Callable[[str], str] | None = None
    # Full-text fetcher taking (identifiers, max_length, delay); None = fetch
    # each identifier as a URL.
    fetch: Callable[[list[str], int | None, float], list[str | None]] | None = None


def _scholar(*args: Any, **kwargs: Any) -> pd.DataFrame:
    return _serpapi_search(*args, **kwargs, engine="google_scholar")


_ENGINES: dict[WebSearchCorpus, _Engine] = {
    WebSearchCorpus.GOOGLE: _Engine(_SERP_COLS, _serpapi_search),
    WebSearchCorpus.GOOGLE_SCHOLAR: _Engine(_SERP_COLS, _scholar),
    WebSearchCorpus.ARXIV: _Engine(
        _PAPER_COLS, _arxiv_search, id_to_url=lambda i: f"https://arxiv.org/abs/{i}", fetch=_arxiv_fetch
    ),
    WebSearchCorpus.YOU: _Engine(["title", "url", "snippets", "description"], _you_search),
    WebSearchCorpus.TAVILY: _Engine(["title", "url", "content"], _tavily_search, fetch=_tavily_fetch),
    WebSearchCorpus.PUBMED: _Engine(
        _PAPER_COLS + ["journal", "doi", "methods", "conclusions", "results"],
        _pubmed_search,
        id_to_url=lambda i: f"https://pubmed.ncbi.nlm.nih.gov/{i}/",
        fetch=_pubmed_fetch,
    ),
}


def _engine_for(corpus: WebSearchCorpus) -> _Engine:
    if corpus == WebSearchCorpus.BING:
        raise DeprecationWarning(_BING_GONE)
    if corpus not in _ENGINES:
        raise ValueError(f"Unsupported corpus: {corpus}")
    return _ENGINES[corpus]


# ----------------------------------------------------------------- dispatch
def web_search(
    corpus: WebSearchCorpus,
    query: str | list[str],
    K: int,
    cols: list[str] | None = None,
    sort_by_date: bool = False,
    start_date: datetime | None = None,
    end_date: datetime | None = None,
    delay: float = 0.1,
) -> pd.DataFrame:
    """Search the given engine(s) and return a DataFrame with a ``query`` column."""
    spec = _engine_for(corpus)
    queries = [query] if isinstance(query, str) else list(query)
    return spec.search(
        queries, K, cols or spec.default_cols, _Window(start_date, end_date), delay, sort_by_date=sort_by_date
    )


def web_extract(
    corpus: WebSearchCorpus,
    doc_ids: str | list[str] | None = None,
    urls: str | list[str] | None = None,
    max_length: int | None = None,
    delay: float = 0.1,
) -> pd.DataFrame:
    """Fetch full text for ids/urls -> DataFrame(id, url, full_text)."""
    spec = _engine_for(corpus)

    def listify(v: str | list[str] | None) -> list[str]:
        if isinstance(v, str):
            return [v.strip()]
        return [x.strip() for x in v] if isinstance(v, list) else []

    id_list, url_list = listify(doc_ids), listify(urls)
    if not id_list and not url_list:
        raise ValueError("web_extract requires doc_id or url.")

    # For id-addressable corpora a URL's 5th path segment is the id.
    url_ids = [u.split("/")[4] if spec.id_to_url else u for u in url_list]
    identifiers = id_list + url_ids
    row_urls = [spec.id_to_url(d) if spec.id_to_url else d for d in id_list] + url_list

    fetch = spec.fetch or (lambda ids, ml, dl: _fetch_url_texts([i or "" for i in ids], ml, dl))
    texts = fetch(identifiers, max_length, delay)
    return pd.DataFrame({"id": identifiers, "url": row_urls, "full_text": texts})
