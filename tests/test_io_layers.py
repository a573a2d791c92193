"""File extractors, data connectors, web-extract HTML parsing (offline)."""

import json

import pandas as pd
import pytest

from lotus_tpu.file_extractors import DirectoryReader
from lotus_tpu.file_extractors.directory_reader import get_extension
from lotus_tpu.web_search import WebSearchCorpus, html_to_text


def test_directory_reader_text_files(tmp_path):
    (tmp_path / "a.txt").write_text("hello world")
    (tmp_path / "b.md").write_text("# title\nbody")
    df = DirectoryReader().add_dir(tmp_path).to_df()
    assert len(df) == 2
    assert set(df["file_name"]) == {"a.txt", "b.md"}
    assert "hello world" in df["content"].tolist()


def test_directory_reader_chunks(tmp_path):
    (tmp_path / "big.txt").write_text("x" * 250)
    df = DirectoryReader(chunk_size=100, chunk_overlap=0).add_file(tmp_path / "big.txt").to_df()
    assert len(df) == 3
    assert df["chunk"].tolist() == [0, 1, 2]


def test_directory_reader_csv_json(tmp_path):
    pd.DataFrame({"a": [1, 2]}).to_csv(tmp_path / "t.csv", index=False)
    (tmp_path / "d.json").write_text(json.dumps({"k": "v"}))
    (tmp_path / "l.jsonl").write_text('{"x": 1}\n{"x": 2}\n')
    df = DirectoryReader().add_dir(tmp_path).to_df()
    assert len(df) == 4  # csv(1) + json(1) + jsonl(2 lines)


def test_directory_reader_recursive_and_hidden(tmp_path):
    (tmp_path / "sub").mkdir()
    (tmp_path / "sub" / "x.txt").write_text("deep")
    (tmp_path / ".hidden.txt").write_text("secret")
    df = DirectoryReader(recursive=True).add_dir(tmp_path).to_df()
    assert df["file_name"].tolist() == ["x.txt"]


def test_directory_reader_missing_file():
    with pytest.raises(FileNotFoundError):
        DirectoryReader().add_file("/definitely/not/here.txt")


def test_per_file_merge(tmp_path):
    (tmp_path / "l.jsonl").write_text('{"x": 1}\n{"x": 2}\n')
    df = DirectoryReader().add_file(tmp_path / "l.jsonl").to_df(per_page=False)
    assert len(df) == 1


def test_html_text_extraction():
    html = "<html><head><script>var x;</script></head><body><h1>Title</h1><p>Para text</p></body></html>"
    text = html_to_text(html)
    assert "Title" in text and "Para text" in text
    assert "var x" not in text


def test_extension_sniffing():
    assert get_extension(b"%PDF-1.4 blah") == ".pdf"
    assert get_extension(b"<html><body>") == ".html"
    assert get_extension(b'{"a": 1}') == ".json"
    assert get_extension(b"plain words") == ".txt"


def test_web_search_requires_keys(monkeypatch):
    import lotus_tpu

    monkeypatch.delenv("TAVILY_API_KEY", raising=False)
    with pytest.raises(ValueError):
        lotus_tpu.web_search(WebSearchCorpus.TAVILY, "q", 3)


def test_bing_discontinued():
    import lotus_tpu

    with pytest.raises(DeprecationWarning):
        lotus_tpu.web_search(WebSearchCorpus.BING, "q", 3)


def test_data_connector_sqlite_requires_sqlalchemy():
    from lotus_tpu.data_connectors import DataConnector

    try:
        import sqlalchemy  # noqa: F401

        has_sqlalchemy = True
    except ImportError:
        has_sqlalchemy = False

    if not has_sqlalchemy:
        with pytest.raises(ImportError):
            DataConnector.load_from_db("sqlite:///:memory:", "SELECT 1")
    else:
        df = DataConnector.load_from_db("sqlite:///:memory:", "SELECT 1 AS one")
        assert df["one"].tolist() == [1]
