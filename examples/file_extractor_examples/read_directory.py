"""DirectoryReader: multi-format ingestion into a DataFrame."""

import tempfile
from pathlib import Path

from lotus_tpu.file_extractors import DirectoryReader

with tempfile.TemporaryDirectory() as d:
    Path(d, "notes.md").write_text("# Plan\nShip the thing.")
    Path(d, "data.jsonl").write_text('{"x": 1}\n{"x": 2}\n')
    Path(d, "log.txt").write_text("line one\nline two")

    df = DirectoryReader(recursive=True, chunk_size=500).add_dir(d).to_df()
    print(df[["file_name", "content"]])
