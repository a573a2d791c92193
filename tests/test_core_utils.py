"""nl_expression, serialization formats, tokenizer, pricing, cache backends,
long-context strategies, image dtype."""

import numpy as np
import pandas as pd
import pytest

import lotus_tpu
from lotus_tpu.cache import InMemoryCache, PickleFileCache, SQLiteCache
from lotus_tpu.long_context_strategy import create_chunked_documents
from lotus_tpu.models import make_fake_lm
from lotus_tpu.models.tokenizer import ApproxTokenizer
from lotus_tpu.nl_expression import nle2str, parse_cols
from lotus_tpu.pricing import calculate_cost, register_model_pricing
from lotus_tpu.templates.task_instructions import df2text, merge_multimodal_info
from lotus_tpu.types import LongContextStrategy, SerializationFormat


# ------------------------------------------------------------ nl_expression
def test_parse_cols_basic_and_escape():
    assert parse_cols("judge the {review} against {criteria}") == ["review", "criteria"]
    assert parse_cols("a {x} with {{escaped}}") == ["x"]
    with pytest.raises(ValueError):
        parse_cols("no columns here")


def test_nle2str():
    assert nle2str("rank {title} by {score}", ["title", "score"]) == "rank Title by Score"


# ------------------------------------------------------------- serialization
def test_df2text_formats():
    df = pd.DataFrame({"name": ["Ada"], "age": [36]})
    assert df2text(df, ["name", "age"]) == ["[Name]: «Ada»\n[Age]: «36»\n"]

    with lotus_tpu.settings.context(serialization_format=SerializationFormat.JSON):
        [row] = df2text(df, ["name", "age"])
        assert '"name":"Ada"' in row.replace(" ", "")

    with lotus_tpu.settings.context(serialization_format=SerializationFormat.XML):
        [row] = df2text(df, ["name", "age"])
        assert row.startswith("<row>") and "<name>Ada</name>" in row


def test_df2text_missing_cols():
    df = pd.DataFrame({"a": [1, 2]})
    assert df2text(df, ["zzz"]) == ["", ""]


def test_merge_multimodal_cartesian():
    a = [{"text": "A1", "image": {}}, {"text": "A2", "image": {}}]
    b = [{"text": "B1", "image": {}}]
    merged = merge_multimodal_info(a, b)
    assert [m["text"] for m in merged] == ["A1\nB1", "A2\nB1"]


# ----------------------------------------------------------------- tokenizer
def test_approx_tokenizer_roundtrip():
    tok = ApproxTokenizer()
    text = "hello world, this is a somewhat longer sentence!"
    ids = tok.encode(text)
    assert tok.decode(ids) == text
    assert tok.count(text) == len(ids)
    # prefix decode is a prefix of the text (needed by TRUNCATE)
    assert text.startswith(tok.decode(ids[:5]))


# ------------------------------------------------------------------- pricing
def test_pricing_known_and_custom():
    cost = calculate_cost("gpt-4o-mini", 1_000_000, 0)
    assert cost == pytest.approx(0.15)
    assert calculate_cost("unknown-model-xyz", 100, 100) is None
    register_model_pricing("my-model", 1.0, 2.0)
    assert calculate_cost("my-model", 1_000_000, 1_000_000) == pytest.approx(3.0)


def test_pricing_cached_tokens_discount():
    full = calculate_cost("gpt-4o-mini", 1_000_000, 0, cached_prompt_tokens=0)
    disc = calculate_cost("gpt-4o-mini", 1_000_000, 0, cached_prompt_tokens=1_000_000)
    assert disc < full


# ------------------------------------------------------------ cache backends
@pytest.mark.parametrize("backend", ["memory", "sqlite", "pickle"])
def test_cache_backends_roundtrip(backend, tmp_path):
    if backend == "memory":
        cache = InMemoryCache(max_size=4)
    elif backend == "sqlite":
        cache = SQLiteCache(max_size=4, cache_dir=str(tmp_path))
    else:
        cache = PickleFileCache(max_size=4, cache_dir=str(tmp_path))
    cache.insert("k1", {"a": [1, 2]})
    assert cache.get("k1") == {"a": [1, 2]}
    assert cache.get("missing") is None
    cache.reset()
    assert cache.get("k1") is None


def test_inmemory_cache_lru_eviction():
    cache = InMemoryCache(max_size=2)
    cache.insert("a", 1)
    cache.insert("b", 2)
    cache.get("a")  # refresh a
    cache.insert("c", 3)  # evicts b
    assert cache.get("b") is None
    assert cache.get("a") == 1


# --------------------------------------------------------------- long context
def test_truncate_strategy_exact():
    lm = make_fake_lm(max_ctx_len=60, max_tokens=10)
    df = pd.DataFrame({"text": ["word " * 200, "short"]})
    chunked = create_chunked_documents(df, ["text"], lm, LongContextStrategy.TRUNCATE, extra_tokens=5)
    assert len(chunked) == 2
    assert lm.count_tokens(chunked.docs[0]) <= 45
    assert chunked.docs[0].endswith("...")
    assert "short" in chunked.docs[1]


def test_chunk_strategy_provenance():
    lm = make_fake_lm(max_ctx_len=80, max_tokens=10)
    df = pd.DataFrame({"id": ["r0"], "text": ["word " * 300]})
    chunked = create_chunked_documents(df, ["id", "text"], lm, LongContextStrategy.CHUNK, extra_tokens=5)
    assert len(chunked) > 1
    assert all(info.original_row_idx == 0 for info in chunked.chunk_info)
    assert all(info.chunked_column == "text" for info in chunked.chunk_info)
    assert chunked.chunk_info[0].total_chunks == len(chunked)
    # every chunk carries the replicated id column
    assert all("r0" in doc for doc in chunked.docs)


# ---------------------------------------------------------------- image dtype
def test_image_array_basics():
    from PIL import Image

    from lotus_tpu.dtype_extensions import ImageArray

    img = Image.new("RGB", (4, 4), (255, 0, 0))
    arr = ImageArray([img, None])
    assert len(arr) == 2
    assert arr.isna().tolist() == [False, True]
    fetched = arr.get_image(0)
    assert np.asarray(fetched).shape == (4, 4, 3)
    b64 = arr.get_image(0, "base64")
    assert b64.startswith("data:image/png;base64,")

    taken = arr.take([0])
    assert len(taken) == 1


def test_image_series_in_dataframe():
    from PIL import Image

    from lotus_tpu.dtype_extensions import ImageArray, ImageDtype, convert_to_base_data

    img = Image.new("RGB", (2, 2), (0, 255, 0))
    df = pd.DataFrame({"pic": pd.array(ImageArray([img]), dtype=ImageDtype()), "x": [1]})
    assert isinstance(df["pic"].dtype, ImageDtype)
    base = convert_to_base_data(df["pic"])
    assert np.asarray(base[0]).shape == (2, 2, 3)


def test_image_setitem_invalidates_all_renderings():
    from PIL import Image

    from lotus_tpu.dtype_extensions import ImageArray

    red = Image.new("RGB", (2, 2), (255, 0, 0))
    blue = Image.new("RGB", (2, 2), (0, 0, 255))
    arr = ImageArray([red])
    b64_before = arr.get_image(0, "base64")
    arr[0] = blue
    assert arr.get_image(0, "base64") != b64_before
    assert np.asarray(arr.get_image(0))[0, 0, 2] == 255  # now blue


def test_count_tokens_skips_image_payloads():
    from lotus_tpu.models import make_fake_lm

    lm = make_fake_lm()
    msgs = [{
        "role": "user",
        "content": [
            {"type": "text", "text": "short question"},
            {"type": "image_url", "image_url": {"url": "data:image/png;base64," + "A" * 100_000}},
        ],
    }]
    assert lm.count_tokens(msgs) < 50


def test_sqlite_cache_concurrent_threads(tmp_path):
    """Per-thread connections: concurrent inserts/reads from many threads
    neither crash nor lose committed entries."""
    from concurrent.futures import ThreadPoolExecutor

    from lotus_tpu.cache import SQLiteCache

    cache = SQLiteCache(max_size=1000, cache_dir=str(tmp_path / "c.db"))

    def work(i):
        for j in range(20):
            cache.insert(f"k{i}_{j}", {"v": i * 100 + j})
        return [cache.get(f"k{i}_{j}") for j in range(20)]

    with ThreadPoolExecutor(max_workers=6) as pool:
        results = list(pool.map(work, range(6)))
    for i, res in enumerate(results):
        assert res == [{"v": i * 100 + j} for j in range(20)]


def test_sqlite_cache_lru_eviction(tmp_path):
    from lotus_tpu.cache import SQLiteCache

    cache = SQLiteCache(max_size=3, cache_dir=str(tmp_path / "lru.db"))
    for i in range(5):
        cache.insert(f"k{i}", i)
    live = [cache.get(f"k{i}") for i in range(5)]
    assert live.count(None) == 2  # two oldest evicted
    assert live[3:] == [3, 4]  # newest survive
