"""Multi-format file/dir/url -> DataFrame loader.

Functional counterpart of the reference's llama-index-based DirectoryReader
(``lotus/file_extractors/directory_reader.py:141-589``), implemented natively
(no llama-index dependency): built-in readers for text/markdown/csv/tsv/
json/jsonl/html/xml, PDF via pymupdf and docx/pptx via their readers when
installed, byte-signature sniffing for extension-less URLs, incremental
``add_file``/``add_dir``/``add_url``/``add``, optional chunking, and
``to_df``.
"""

from __future__ import annotations

import glob as _glob
import json
import os
import tempfile
import urllib.parse
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any, Callable

import pandas as pd

import lotus_tpu


@dataclass
class Document:
    """One loaded document (or chunk)."""

    text: str
    metadata: dict[str, Any] = field(default_factory=dict)
    doc_id: str = ""


# ------------------------------------------------------------- format readers
def _read_text(path: str, encoding: str) -> list[tuple[str, dict]]:
    with open(path, encoding=encoding, errors="replace") as f:
        return [(f.read(), {})]


def _read_csv(path: str, encoding: str) -> list[tuple[str, dict]]:
    df = pd.read_csv(path, encoding=encoding)
    return [(df.to_string(index=False), {"rows": len(df)})]


def _read_tsv(path: str, encoding: str) -> list[tuple[str, dict]]:
    df = pd.read_csv(path, sep="\t", encoding=encoding)
    return [(df.to_string(index=False), {"rows": len(df)})]


def _read_json(path: str, encoding: str) -> list[tuple[str, dict]]:
    with open(path, encoding=encoding) as f:
        data = json.load(f)
    return [(json.dumps(data, indent=2, default=str), {})]


def _read_jsonl(path: str, encoding: str) -> list[tuple[str, dict]]:
    out = []
    with open(path, encoding=encoding) as f:
        for i, line in enumerate(f):
            line = line.strip()
            if line:
                out.append((line, {"line": i}))
    return out or [("", {})]


def _read_html(path: str, encoding: str) -> list[tuple[str, dict]]:
    from lotus_tpu.web_search import html_to_text

    with open(path, encoding=encoding, errors="replace") as f:
        return [(html_to_text(f.read()), {})]


def _read_pdf(path: str, encoding: str) -> list[tuple[str, dict]]:
    try:
        import fitz  # type: ignore
    except ImportError:
        raise ImportError("The 'pymupdf' library is required to read PDFs.")
    pages = []
    with fitz.open(path) as doc:
        for i, page in enumerate(doc):
            pages.append((page.get_text("text"), {"page_label": str(i + 1)}))
    return pages or [("", {})]


def _read_docx(path: str, encoding: str) -> list[tuple[str, dict]]:
    try:
        import docx  # type: ignore
    except ImportError:
        raise ImportError("The 'python-docx' library is required to read .docx files.")
    doc = docx.Document(path)
    return [("\n".join(p.text for p in doc.paragraphs), {})]


def _read_pptx(path: str, encoding: str) -> list[tuple[str, dict]]:
    from lotus_tpu.file_extractors.pptx import PptxReader

    return PptxReader().read(path)


_READERS: dict[str, Callable[[str, str], list[tuple[str, dict]]]] = {
    ".txt": _read_text, ".md": _read_text, ".rst": _read_text, ".py": _read_text,
    ".log": _read_text, ".yaml": _read_text, ".yml": _read_text, ".toml": _read_text,
    ".csv": _read_csv, ".tsv": _read_tsv,
    ".json": _read_json, ".jsonl": _read_jsonl, ".ndjson": _read_jsonl,
    ".html": _read_html, ".htm": _read_html, ".xml": _read_html,
    ".pdf": _read_pdf, ".docx": _read_docx, ".pptx": _read_pptx,
}

# Byte signatures for sniffing extension-less downloads.
_SIGNATURES: list[tuple[bytes, str]] = [
    (b"%PDF", ".pdf"),
    (b"PK\x03\x04", ".docx"),  # zip container (docx/pptx/xlsx); docx is the common case
    (b"<!DOCTYPE html", ".html"),
    (b"<html", ".html"),
    (b"{", ".json"),
    (b"[", ".json"),
]


def get_extension(content: bytes) -> str:
    """Guess a file extension from leading bytes (default: .txt)."""
    head = content[:512].lstrip()
    for sig, ext in _SIGNATURES:
        if head[: len(sig)].lower() == sig.lower():
            return ext
    return ".txt"


def is_url(path: str | Path) -> bool:
    parsed = urllib.parse.urlparse(str(path))
    return parsed.scheme in ("http", "https")


def _chunk_text(text: str, chunk_size: int, chunk_overlap: int) -> list[str]:
    if len(text) <= chunk_size:
        return [text]
    step = max(1, chunk_size - chunk_overlap)
    return [text[i : i + chunk_size] for i in range(0, len(text), step)]


class DirectoryReader:
    """Incrementally collect files/dirs/urls and load them as documents.

    Example:
        >>> reader = DirectoryReader(recursive=True, chunk_size=1000)
        >>> reader.add_file("report.pdf").add_url("https://example.com/x.txt")
        >>> df = reader.to_df(per_page=False)
    """

    def __init__(
        self,
        recursive: bool = False,
        custom_reader_configs: dict[str, dict] | None = None,
        chunk_size: int | None = None,
        chunk_overlap: int | None = None,
        encoding: str = "utf-8",
        required_exts: list[str] | None = None,
        exclude_hidden: bool = True,
        num_files_limit: int | None = None,
        file_metadata: Callable[[str], dict] | None = None,
        raise_on_error: bool = False,
        **kwargs: Any,
    ):
        self.recursive = recursive
        self.custom_reader_configs = custom_reader_configs or {}
        self.chunk_size = chunk_size
        self.chunk_overlap = chunk_overlap if chunk_overlap is not None else (20 if chunk_size else 0)
        self.encoding = encoding
        self.required_exts = required_exts
        self.exclude_hidden = exclude_hidden
        self.num_files_limit = num_files_limit
        self.file_metadata = file_metadata
        self.raise_on_error = raise_on_error
        self._files: list[str] = []
        self._temp_file_to_url: dict[str, str] = {}
        self._tempdirs: list[tempfile.TemporaryDirectory] = []

    # -------------------------------------------------------------- adders
    def add_file(self, file_path: str | Path) -> "DirectoryReader":
        path = str(file_path)
        if not os.path.isfile(path):
            raise FileNotFoundError(f"File not found: {path}")
        self._files.append(path)
        return self

    def add_dir(self, input_dir: str | Path) -> "DirectoryReader":
        input_dir = str(input_dir)
        if not os.path.isdir(input_dir):
            raise FileNotFoundError(f"Directory not found: {input_dir}")
        pattern = os.path.join(input_dir, "**" if self.recursive else "*")
        for p in sorted(_glob.glob(pattern, recursive=self.recursive)):
            if not os.path.isfile(p):
                continue
            name = os.path.basename(p)
            if self.exclude_hidden and name.startswith("."):
                continue
            if self.required_exts and os.path.splitext(p)[1] not in self.required_exts:
                continue
            self._files.append(p)
        return self

    def add_url(self, url: str | Path, temp_dir: str | None = None, timeout: int | None = None) -> "DirectoryReader":
        import requests

        url = str(url)
        resp = requests.get(url, timeout=timeout or 30)
        resp.raise_for_status()
        ext = os.path.splitext(urllib.parse.urlparse(url).path)[1] or get_extension(resp.content)
        if temp_dir is None:
            td = tempfile.TemporaryDirectory(prefix="lotus_tpu_reader_")
            self._tempdirs.append(td)
            temp_dir = td.name
        fname = os.path.join(temp_dir, f"download_{len(self._temp_file_to_url)}{ext}")
        with open(fname, "wb") as f:
            f.write(resp.content)
        self._temp_file_to_url[fname] = url
        self._files.append(fname)
        return self

    def add(self, path: str | Path, temp_dir: str | None = None, timeout: int | None = None) -> "DirectoryReader":
        """Add a file, directory, or URL (auto-detected)."""
        if is_url(path):
            return self.add_url(path, temp_dir=temp_dir, timeout=timeout)
        if os.path.isdir(str(path)):
            return self.add_dir(path)
        return self.add_file(path)

    def add_multiple(self, paths: list[str | Path], temp_dir: str | None = None) -> "DirectoryReader":
        for p in paths:
            self.add(p, temp_dir=temp_dir)
        return self

    # -------------------------------------------------------------- loading
    def _read_one(self, path: str) -> list[Document]:
        ext = os.path.splitext(path)[1].lower()
        reader = _READERS.get(ext, _read_text)
        try:
            parts = reader(path, self.encoding)
        except Exception as e:
            if self.raise_on_error:
                raise
            lotus_tpu.logger.warning(f"DirectoryReader: failed to read {path}: {e}")
            return []

        source = self._temp_file_to_url.get(path, path)
        base_meta = {"file_path": source, "file_name": os.path.basename(source)}
        if self.file_metadata is not None:
            base_meta.update(self.file_metadata(path))

        docs: list[Document] = []
        for part_idx, (text, meta) in enumerate(parts):
            texts = (
                _chunk_text(text, self.chunk_size, self.chunk_overlap) if self.chunk_size else [text]
            )
            for chunk_idx, chunk in enumerate(texts):
                doc_meta = {**base_meta, **meta}
                if self.chunk_size:
                    doc_meta["chunk"] = chunk_idx
                doc_id = f"{source}#part{part_idx}" + (f"#chunk{chunk_idx}" if self.chunk_size else "")
                docs.append(Document(text=chunk, metadata=doc_meta, doc_id=doc_id))
        return docs

    def iter_data(self):
        files = self._files[: self.num_files_limit] if self.num_files_limit else self._files
        for path in files:
            docs = self._read_one(path)
            if docs:
                yield docs

    def load_data(self, show_progress: bool = False) -> list[Document]:
        out: list[Document] = []
        for docs in self.iter_data():
            out.extend(docs)
        return out

    def to_df(self, per_page: bool = True, show_progress: bool = False) -> pd.DataFrame:
        """Load all documents into a DataFrame (one row per page/chunk, or per
        file when ``per_page`` is False)."""
        docs = self.load_data(show_progress=show_progress)
        if not per_page:
            merged: dict[str, Document] = {}
            for d in docs:
                key = d.metadata.get("file_path", d.doc_id)
                if key in merged:
                    merged[key].text += "\n" + d.text
                else:
                    merged[key] = Document(text=d.text, metadata=dict(d.metadata), doc_id=key)
            docs = list(merged.values())
        rows = [{"content": d.text, "doc_id": d.doc_id, **d.metadata} for d in docs]
        return pd.DataFrame(rows)

    def __del__(self) -> None:
        for td in getattr(self, "_tempdirs", []):
            try:
                td.cleanup()
            except Exception:
                pass
