"""Offline units for web_search helpers and the profiling tracer."""

from datetime import datetime

import pandas as pd
import pytest

import importlib

from lotus_tpu import profiling

# The package re-exports the web_search *function*, which shadows the
# submodule as a package attribute — load the module itself for helpers.
ws_mod = importlib.import_module("lotus_tpu.web_search")
WebSearchCorpus = ws_mod.WebSearchCorpus
html_to_text = ws_mod.html_to_text
web_extract = ws_mod.web_extract
web_search = ws_mod.web_search


# ------------------------------------------------------------- html extract
def test_html_to_text_skips_script_style():
    html = (
        "<html><head><title>nope</title><style>b{color:red}</style></head>"
        "<body><script>var x=1;</script><h1>Title</h1><p>Body  text</p></body></html>"
    )
    text = html_to_text(html)
    assert "Title" in text and "Body  text" in text
    assert "var x" not in text and "color:red" not in text and "nope" not in text


def test_html_to_text_nested_skip_subtrees():
    html = "<div><noscript><p>hidden</p></noscript><p>shown</p></div>"
    assert html_to_text(html) == "shown"


def test_clip():
    assert ws_mod._clip("abcdef", 3) == "abc"
    assert ws_mod._clip("abcdef", None) == "abcdef"
    assert ws_mod._clip(None, 3) is None
    assert ws_mod._clip("abc", -1) == ""


# ------------------------------------------------------------------ windows
def test_window_fmt_and_truthiness():
    w = ws_mod._Window(datetime(2024, 1, 2), None)
    lo, hi = w.fmt("%Y-%m-%d", hi_default="3000")
    assert (lo, hi) == ("2024-01-02", "3000")
    assert bool(w) is True
    assert bool(ws_mod._Window(None, None)) is False


# ----------------------------------------------------------------- dispatch
def test_engine_for_bing_deprecated_and_unknown():
    with pytest.raises(DeprecationWarning):
        ws_mod._engine_for(WebSearchCorpus.BING)


def test_web_search_routes_through_engine(monkeypatch):
    calls = {}

    def fake_search(queries, K, cols, window, delay, *, sort_by_date=False):
        calls.update(queries=queries, K=K, cols=cols, window=window, sort=sort_by_date)
        return pd.concat(
            [ws_mod._tag_query(pd.DataFrame({"title": ["t"], "url": ["u"]}), cols, q) for q in queries],
            ignore_index=True,
        )

    monkeypatch.setitem(
        ws_mod._ENGINES, WebSearchCorpus.GOOGLE, ws_mod._Engine(["title", "url"], fake_search)
    )
    out = web_search(WebSearchCorpus.GOOGLE, ["a", "b"], K=3, start_date=datetime(2020, 5, 1))
    assert calls["queries"] == ["a", "b"] and calls["K"] == 3
    assert calls["window"].start == datetime(2020, 5, 1)
    assert out["query"].tolist() == ["a", "b"]


def test_web_extract_id_and_url_addressing(monkeypatch):
    seen = {}

    def fake_fetch(identifiers, max_length, delay):
        seen["ids"] = identifiers
        return [f"text:{i}" for i in identifiers]

    spec = ws_mod._ENGINES[WebSearchCorpus.ARXIV]._replace(fetch=fake_fetch)
    monkeypatch.setitem(ws_mod._ENGINES, WebSearchCorpus.ARXIV, spec)
    out = web_extract(
        WebSearchCorpus.ARXIV,
        doc_ids="1706.03762",
        urls=["https://arxiv.org/abs/2406.00001"],
    )
    # URL's 5th path segment is the id for id-addressable corpora.
    assert seen["ids"] == ["1706.03762", "2406.00001"]
    assert out["url"].tolist() == [
        "https://arxiv.org/abs/1706.03762",
        "https://arxiv.org/abs/2406.00001",
    ]
    assert out["full_text"].tolist() == ["text:1706.03762", "text:2406.00001"]


def test_web_extract_requires_input():
    with pytest.raises(ValueError, match="doc_id or url"):
        web_extract(WebSearchCorpus.GOOGLE)


def test_per_query_empty():
    assert ws_mod._per_query([], 0.0, lambda q: pd.DataFrame()).empty


def test_require_key(monkeypatch):
    monkeypatch.delenv("SOME_FAKE_KEY", raising=False)
    with pytest.raises(ValueError, match="SOME_FAKE_KEY"):
        ws_mod._require_key("SOME_FAKE_KEY", "tests")
    monkeypatch.setenv("SOME_FAKE_KEY", "k")
    assert ws_mod._require_key("SOME_FAKE_KEY", "tests") == "k"


# ---------------------------------------------------------------- profiling
def test_timed_sink_accumulates():
    sink = {}
    with profiling.timed("step", sink):
        pass
    with profiling.timed("step", sink):
        pass
    assert sink["step"] >= 0.0


def test_annotate_and_trace_smoke(tmp_path):
    import jax.numpy as jnp

    with profiling.trace(str(tmp_path)):
        with profiling.annotate("region"):
            jnp.arange(8).sum().block_until_ready()
    # The JAX profiler writes a plugins/profile tree into the log dir.
    assert any(tmp_path.rglob("*")), "trace produced no files"
