"""Web search & extraction: multiple engines -> DataFrames.

Parity target: ``lotus/web_search.py:15-723``.  Engines: Google / Google
Scholar (serpapi), Arxiv, You.com, Tavily, PubMed (pymed); Bing is
discontinued upstream and raises accordingly.  ``web_extract`` fetches full
text (HTML stripped with a stdlib parser; PDFs via pymupdf when installed).
All provider SDKs and API keys are optional/gated.
"""

from __future__ import annotations

import logging
import os
import time
from datetime import datetime
from enum import Enum
from html.parser import HTMLParser
from typing import Any

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


_GOOGLE_DEFAULT_COLS = [
    "position", "title", "link", "redirect_link", "displayed_link", "thumbnail",
    "date", "author", "cited_by", "extracted_cited_by", "favicon", "snippet",
    "inline_links", "publication_info", "inline_links.cited_by.total",
]
_ARXIV_DEFAULT_COLS = ["id", "title", "link", "abstract", "published", "authors", "categories"]
_YOU_DEFAULT_COLS = ["title", "url", "snippets", "description"]
_TAVILY_DEFAULT_COLS = ["title", "url", "content"]
_PUBMED_DEFAULT_COLS = [
    "id", "title", "link", "abstract", "published", "authors", "categories",
    "journal", "doi", "methods", "conclusions", "results",
]

_DEFAULT_COLS_BY_CORPUS = {
    WebSearchCorpus.GOOGLE: _GOOGLE_DEFAULT_COLS,
    WebSearchCorpus.GOOGLE_SCHOLAR: _GOOGLE_DEFAULT_COLS,
    WebSearchCorpus.ARXIV: _ARXIV_DEFAULT_COLS,
    WebSearchCorpus.YOU: _YOU_DEFAULT_COLS,
    WebSearchCorpus.TAVILY: _TAVILY_DEFAULT_COLS,
    WebSearchCorpus.PUBMED: _PUBMED_DEFAULT_COLS,
}


# -------------------------------------------------------------- text extract
class _HTMLTextExtractor(HTMLParser):
    """Strip tags; skip script/style/head subtrees."""

    _SKIP = {"script", "style", "head", "noscript", "template"}

    def __init__(self) -> None:
        super().__init__()
        self._chunks: list[str] = []
        self._skip_depth = 0

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag.lower() in self._SKIP:
            self._skip_depth += 1

    def handle_endtag(self, tag: str) -> None:
        if tag.lower() in self._SKIP and self._skip_depth > 0:
            self._skip_depth -= 1

    def handle_data(self, data: str) -> None:
        if self._skip_depth == 0 and data.strip():
            self._chunks.append(data.strip())

    def get_text(self) -> str:
        return "\n".join(self._chunks)


def _truncate_text(text: str | None, max_length: int | None) -> str | None:
    if text is None or max_length is None:
        return text
    if max_length <= 0:
        return ""
    return text[:max_length]


def _extract_text_from_html(html_text: str) -> str:
    parser = _HTMLTextExtractor()
    parser.feed(html_text)
    parser.close()
    return parser.get_text()


def _extract_text_from_pdf(pdf_bytes: bytes, url: str, max_length: int | None) -> str | None:
    try:
        import fitz  # type: ignore
    except ImportError:
        raise ImportError("The 'pymupdf' library is required for PDF extraction.")
    try:
        with fitz.open(stream=pdf_bytes, filetype="pdf") as doc:
            parts: list[str] = []
            total = 0
            for page in doc:
                page_text = page.get_text("text")
                if page_text:
                    if max_length is not None and max_length > 0:
                        remaining = max_length - total
                        if remaining <= 0:
                            break
                        page_text = page_text[:remaining]
                    parts.append(page_text)
                    total += len(page_text)
                if max_length is not None and total >= max_length:
                    break
        text = "\n".join(parts).strip()
        return text or None
    except Exception as exc:
        logger.warning("Failed to extract PDF text from %s: %s", url, exc)
        return None


def _fetch_full_text_from_url(urls: list[str], max_length: int | None, delay: float = 0.1) -> list[str | None]:
    import requests

    out: list[str | None] = []
    for url in urls:
        time.sleep(delay)
        if not url:
            out.append(None)
            continue
        try:
            resp = requests.get(url, headers=_DEFAULT_HEADERS, timeout=20)
            resp.raise_for_status()
        except Exception as exc:
            logger.warning("Failed to fetch %s: %s", url, exc)
            out.append(None)
            continue
        ctype = resp.headers.get("Content-Type", "").lower()
        if "application/pdf" in ctype or url.lower().endswith(".pdf"):
            pdf_text = _extract_text_from_pdf(resp.content, url, max_length)
            if pdf_text:
                out.append(pdf_text)
                continue
        html = resp.text or resp.content.decode("utf-8", errors="ignore")
        text = _extract_text_from_html(html)
        out.append(_truncate_text(text, max_length) if text else None)
    return out


# ------------------------------------------------------------------ engines
def _require_key(env: str, what: str) -> str:
    key = os.getenv(env)
    if not key:
        raise ValueError(f"{env} is not set. It is required to use {what}.")
    return key


def _finish(df: pd.DataFrame, cols: list[str], query: str) -> pd.DataFrame:
    df = df[[c for c in cols if c in df.columns]]
    df = df.copy()
    df["query"] = query
    return df


def _search_google(queries, K, cols=None, engine="google", start_date=None, end_date=None, delay=0.1):
    try:
        from serpapi import GoogleSearch
    except ImportError:
        raise ImportError("The 'serpapi' library is required for Google search.")
    api_key = _require_key("SERPAPI_API_KEY", "GoogleSearch")
    cols = cols or _GOOGLE_DEFAULT_COLS
    dfs = []
    for query in queries:
        time.sleep(delay)
        params: dict[str, Any] = {"api_key": api_key, "q": query, "num": K, "engine": engine}
        if start_date and end_date:
            params["tbs"] = (
                f"cdr:1,cd_min:{start_date.strftime('%m/%d/%Y')},cd_max:{end_date.strftime('%m/%d/%Y')}"
            )
        elif start_date:
            params["q"] = f"{query} after:{start_date.strftime('%Y-%m-%d')}"
        elif end_date:
            params["q"] = f"{query} before:{end_date.strftime('%Y-%m-%d')}"
        results = GoogleSearch(params).get_dict()
        if "organic_results" not in results:
            raise ValueError("No organic_results found in the response from GoogleSearch")
        df = pd.DataFrame(results["organic_results"])
        if len(df) > 0:
            df = pd.json_normalize(df.to_dict("records"))
        dfs.append(_finish(df, cols, query))
    return pd.concat(dfs, ignore_index=True) if dfs else pd.DataFrame()


def _search_arxiv(queries, K, cols=None, sort_by_date=False, start_date=None, end_date=None, delay=0.1):
    try:
        import arxiv
    except ImportError:
        raise ImportError("The 'arxiv' library is required for Arxiv search.")
    cols = cols or _ARXIV_DEFAULT_COLS
    client = arxiv.Client()
    dfs = []
    for query in queries:
        time.sleep(delay)
        search_query = query
        fmt = "%Y%m%d%H%M"
        if start_date and end_date:
            search_query = f"({query}) AND (submittedDate:[{start_date.strftime(fmt)} TO {end_date.strftime(fmt)}])"
        elif start_date:
            search_query = f"({query}) AND (submittedDate:[{start_date.strftime(fmt)} TO 99999999])"
        elif end_date:
            search_query = f"({query}) AND (submittedDate:[00000000 TO {end_date.strftime(fmt)}])"
        sort = arxiv.SortCriterion.SubmittedDate if sort_by_date else arxiv.SortCriterion.Relevance
        rows = [
            {
                "id": r.get_short_id() if hasattr(r, "get_short_id") else r.entry_id,
                "title": r.title,
                "link": r.entry_id,
                "abstract": r.summary,
                "published": r.published,
                "authors": ", ".join(a.name for a in r.authors),
                "categories": ", ".join(r.categories),
            }
            for r in client.results(arxiv.Search(query=search_query, max_results=K, sort_by=sort))
        ]
        dfs.append(_finish(pd.DataFrame(rows), cols, query))
    return pd.concat(dfs, ignore_index=True) if dfs else pd.DataFrame()


def _search_you(queries, K, cols=None, start_date=None, end_date=None, delay=0.1):
    import requests

    api_key = _require_key("YOU_API_KEY", "You.com search")
    cols = cols or _YOU_DEFAULT_COLS
    dfs = []
    for query in queries:
        time.sleep(delay)
        params: dict[str, Any] = {"query": str(query), "count": K}
        if start_date and end_date:
            params["freshness"] = f"{start_date.strftime('%Y-%m-%d')}to{end_date.strftime('%Y-%m-%d')}"
        elif start_date:
            params["freshness"] = f"{start_date.strftime('%Y-%m-%d')}to{datetime.now().strftime('%Y-%m-%d')}"
        elif end_date:
            params["freshness"] = f"0000-01-01to{end_date.strftime('%Y-%m-%d')}"
        resp = requests.get("https://ydc-index.io/v1/search", headers={"X-API-Key": api_key}, params=params)
        resp.raise_for_status()
        data = resp.json().get("results", {})
        rows = list(data.get("web", [])) + list(data.get("news", []))
        dfs.append(_finish(pd.DataFrame(rows), cols, query))
    return pd.concat(dfs, ignore_index=True) if dfs else pd.DataFrame()


def _search_tavily(queries, K, cols=None, start_date=None, end_date=None, delay=0.1):
    import requests

    api_key = _require_key("TAVILY_API_KEY", "Tavily search")
    cols = cols or _TAVILY_DEFAULT_COLS
    headers = {"Authorization": f"Bearer {api_key}"}
    dfs = []
    for query in queries:
        time.sleep(delay)
        params: dict[str, Any] = {"query": query, "max_results": K}
        if start_date:
            params["start_date"] = start_date.strftime("%Y-%m-%d")
        if end_date:
            params["end_date"] = end_date.strftime("%Y-%m-%d")
        resp = requests.post("https://api.tavily.com/search", headers=headers, json=params)
        resp.raise_for_status()
        dfs.append(_finish(pd.DataFrame(resp.json().get("results", [])), cols, query))
    return pd.concat(dfs, ignore_index=True) if dfs else pd.DataFrame()


def _extract_tavily(urls: list[str], max_length: int | None) -> list[str | None]:
    import requests

    if not urls:
        return []
    api_key = _require_key("TAVILY_API_KEY", "Tavily extract")
    try:
        resp = requests.post(
            "https://api.tavily.com/extract",
            headers={"Authorization": f"Bearer {api_key}"},
            json={"urls": urls, "extract_depth": "basic", "format": "markdown"},
        )
        resp.raise_for_status()
        data = resp.json()
    except Exception as exc:
        logger.warning("Tavily extraction failed for %s: %s", urls, exc)
        return [None] * len(urls)
    result_map: dict[str, str | None] = {}
    for r in data.get("results", []):
        raw = r.get("raw_content")
        result_map[r.get("url", "")] = _truncate_text(raw, max_length) if isinstance(raw, str) else None
    for f in data.get("failed_results", []):
        result_map[f.get("url", "")] = None
    return [result_map.get(u) for u in urls]


def _search_pubmed(queries, K, cols=None, start_date=None, end_date=None, delay=0.1):
    try:
        from pymed import PubMed
    except ImportError:
        raise ImportError("The 'pymed' library is required for PubMed search.")
    cols = cols or _PUBMED_DEFAULT_COLS
    pm = PubMed(tool=os.getenv("PUBMED_TOOL", "LOTUS"))
    dfs = []
    for query in queries:
        time.sleep(delay)
        search_query = query
        if start_date and end_date:
            search_query = f"({query}) AND {start_date.year}:{end_date.year}[PDAT]"
        elif start_date:
            search_query = f"({query}) AND {start_date.year}:3000[PDAT]"
        elif end_date:
            search_query = f"({query}) AND 1800:{end_date.year}[PDAT]"
        rows = []
        for article in pm.query(search_query, max_results=K):
            authors = ""
            if getattr(article, "authors", None):
                authors = ", ".join(
                    f"{a.get('firstname', '')} {a.get('lastname', '')}".strip() for a in article.authors
                )
            pmid_raw = getattr(article, "pubmed_id", None)
            if isinstance(pmid_raw, dict):
                pmid_raw = pmid_raw.get("pubmed_id", "")
            pmid = str(pmid_raw).split("\n")[0].strip() if pmid_raw else None
            categories = ""
            if getattr(article, "publication_types", None):
                categories = ", ".join(
                    pt.get("name", "") for pt in article.publication_types if pt.get("name")
                )
            rows.append(
                {
                    "id": pmid,
                    "title": getattr(article, "title", None),
                    "link": f"https://pubmed.ncbi.nlm.nih.gov/{pmid}" if pmid else None,
                    "abstract": getattr(article, "abstract", None),
                    "published": getattr(article, "publication_date", None),
                    "authors": authors,
                    "categories": categories,
                    "journal": getattr(article, "journal", None),
                    "doi": getattr(article, "doi", None),
                    "methods": getattr(article, "methods", None),
                    "conclusions": getattr(article, "conclusions", None),
                    "results": getattr(article, "results", None),
                }
            )
        dfs.append(_finish(pd.DataFrame(rows), cols, query))
    return pd.concat(dfs, ignore_index=True) if dfs else pd.DataFrame()


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
    queries = [query] if isinstance(query, str) else list(query)
    if corpus == WebSearchCorpus.GOOGLE:
        return _search_google(queries, K, cols=cols, start_date=start_date, end_date=end_date, delay=delay)
    if corpus == WebSearchCorpus.GOOGLE_SCHOLAR:
        return _search_google(
            queries, K, cols=cols, engine="google_scholar", start_date=start_date, end_date=end_date, delay=delay
        )
    if corpus == WebSearchCorpus.ARXIV:
        return _search_arxiv(
            queries, K, cols=cols, sort_by_date=sort_by_date, start_date=start_date, end_date=end_date, delay=delay
        )
    if corpus == WebSearchCorpus.YOU:
        return _search_you(queries, K, cols=cols, start_date=start_date, end_date=end_date, delay=delay)
    if corpus == WebSearchCorpus.BING:
        raise DeprecationWarning("Bing search is discontinued. Please use Google search instead.")
    if corpus == WebSearchCorpus.TAVILY:
        return _search_tavily(queries, K, cols=cols, start_date=start_date, end_date=end_date, delay=delay)
    if corpus == WebSearchCorpus.PUBMED:
        return _search_pubmed(queries, K, cols=cols, start_date=start_date, end_date=end_date, delay=delay)
    raise ValueError(f"Unsupported corpus: {corpus}")


def _url_from_id(corpus: WebSearchCorpus, doc_id: str) -> str:
    if corpus == WebSearchCorpus.ARXIV:
        return f"https://arxiv.org/abs/{doc_id}"
    if corpus == WebSearchCorpus.PUBMED:
        return f"https://pubmed.ncbi.nlm.nih.gov/{doc_id}/"
    return doc_id


def _id_from_url(corpus: WebSearchCorpus, url: str) -> str:
    if corpus in (WebSearchCorpus.ARXIV, WebSearchCorpus.PUBMED):
        return url.split("/")[4]
    return url


def _full_texts(
    corpus: WebSearchCorpus, identifiers: list[str], max_length: int | None, delay: float
) -> list[str | None]:
    if corpus == WebSearchCorpus.ARXIV:
        try:
            import arxiv
        except ImportError:
            raise ImportError("The 'arxiv' library is required for Arxiv extraction.")
        pdf_urls = [f"https://arxiv.org/pdf/{i}.pdf" if i else "" for i in identifiers]
        pdf_texts = _fetch_full_text_from_url(pdf_urls, max_length, delay)
        out: list[str | None] = []
        for ident, pdf_text in zip(identifiers, pdf_texts):
            if pdf_text:
                out.append(pdf_text)
            elif ident:
                article = next(arxiv.Client().results(arxiv.Search(id_list=[ident], max_results=1)), None)
                out.append(article.summary if article else None)
            else:
                out.append(None)
        return out
    if corpus == WebSearchCorpus.PUBMED:
        try:
            from pymed import PubMed
        except ImportError:
            raise ImportError("The 'pymed' library is required for PubMed extraction.")
        pm = PubMed(tool="LOTUS")
        out = []
        for ident in identifiers:
            if not ident:
                out.append(None)
                continue
            article = next(pm.query(ident, max_results=1), None)
            out.append(article.abstract if article else None)
        return out
    if corpus == WebSearchCorpus.TAVILY:
        valid = [i for i in identifiers if i]
        texts = dict(zip(valid, _extract_tavily(valid, max_length)))
        return [texts.get(i) if i else None for i in identifiers]
    return _fetch_full_text_from_url([i or "" for i in identifiers], max_length, delay)


def web_extract(
    corpus: WebSearchCorpus,
    doc_ids: str | list[str] | None = None,
    urls: str | list[str] | None = None,
    max_length: int | None = None,
    delay: float = 0.1,
) -> pd.DataFrame:
    """Fetch full text for ids/urls -> DataFrame(id, url, full_text)."""
    if corpus == WebSearchCorpus.BING:
        raise DeprecationWarning("Bing search is discontinued. Please use Google search instead.")

    doc_id_list = (
        [doc_ids.strip()] if isinstance(doc_ids, str)
        else [d.strip() for d in doc_ids] if isinstance(doc_ids, list) else []
    )
    url_list = (
        [urls.strip()] if isinstance(urls, str)
        else [u.strip() for u in urls] if isinstance(urls, list) else []
    )
    if not url_list and not doc_id_list:
        raise ValueError("web_extract requires doc_id or url.")

    identifiers = doc_id_list + [_id_from_url(corpus, u) for u in url_list]
    row_urls = [_url_from_id(corpus, d) for d in doc_id_list] + url_list
    texts = _full_texts(corpus, identifiers, max_length, delay)
    return pd.DataFrame({"id": identifiers, "url": row_urls, "full_text": texts})
