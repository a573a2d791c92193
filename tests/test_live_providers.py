"""Live provider tests, env-gated like the reference's .github/tests lanes.

Skipped unless the matching ENABLE_* variable is set; they exercise the
same code paths the offline fakes cover, against real services.
"""

import os

import pandas as pd
import pytest

import lotus_tpu

requires_openai = pytest.mark.skipif(
    not os.getenv("ENABLE_OPENAI_TESTS"), reason="ENABLE_OPENAI_TESTS not set"
)
requires_local_models = pytest.mark.skipif(
    not os.getenv("ENABLE_LOCAL_TESTS"), reason="ENABLE_LOCAL_TESTS not set"
)


@requires_openai
def test_openai_sem_filter():
    from lotus_tpu.models import LM

    lotus_tpu.settings.configure(lm=LM(model=os.getenv("LOTUS_TPU_TEST_MODEL", "gpt-4o-mini")))
    df = pd.DataFrame({"text": ["I love this", "I hate this"]})
    out = df.sem_filter("{text} expresses positive sentiment")
    assert out["text"].tolist() == ["I love this"]


@requires_openai
def test_openai_embeddings_search(tmp_path):
    from lotus_tpu.models import LM, LiteLLMRM
    from lotus_tpu.vector_store import TpuVS

    lotus_tpu.settings.configure(
        lm=LM(model="gpt-4o-mini"), rm=LiteLLMRM(), vs=TpuVS()
    )
    df = pd.DataFrame({"title": ["Machine learning", "Italian cooking", "Quantum physics"]})
    df = df.sem_index("title", str(tmp_path / "idx"))
    out = df.sem_search("title", "artificial intelligence", K=1)
    assert out["title"].iloc[0] == "Machine learning"


@requires_local_models
def test_sentence_transformers_search(tmp_path):
    from lotus_tpu.models import SentenceTransformersRM
    from lotus_tpu.vector_store import TpuVS

    lotus_tpu.settings.configure(
        rm=SentenceTransformersRM(model="sentence-transformers/all-MiniLM-L6-v2"),
        vs=TpuVS(),
    )
    df = pd.DataFrame({"title": ["Machine learning basics", "Pasta recipes", "Garden care"]})
    df = df.sem_index("title", str(tmp_path / "idx"))
    out = df.sem_search("title", "neural networks", K=1)
    assert out["title"].iloc[0] == "Machine learning basics"


requires_ollama = pytest.mark.skipif(
    not os.getenv("ENABLE_OLLAMA_TESTS"), reason="ENABLE_OLLAMA_TESTS not set"
)


def _ollama_lm(**kwargs):
    from lotus_tpu.models import LM

    model = os.getenv("LOTUS_TPU_OLLAMA_MODEL", "ollama/llama3.1")
    base = os.getenv("OLLAMA_API_BASE", "http://localhost:11434")
    return LM(model=model, api_base=base, **kwargs)


@requires_ollama
def test_ollama_sem_map():
    lotus_tpu.settings.configure(lm=_ollama_lm())
    df = pd.DataFrame({"course": ["Databases", "Organic Chemistry"]})
    out = df.sem_map("What department teaches {course}? Answer in one word.")
    assert len(out) == 2 and out["_map"].str.len().gt(0).all()


@requires_ollama
def test_ollama_cache_hits():
    """Second identical call must be served from the message cache."""
    lm = _ollama_lm()
    lotus_tpu.settings.configure(lm=lm, enable_cache=True)
    df = pd.DataFrame({"text": ["the sky is blue"]})
    df.sem_filter("{text} mentions a color")
    physical_before = lm.stats.physical_usage.total_tokens
    df.sem_filter("{text} mentions a color")
    assert lm.stats.physical_usage.total_tokens == physical_before  # no new call
    assert lm.stats.cache_hits >= 1


@requires_openai
def test_openai_sem_agg_and_usage_accounting():
    from lotus_tpu.models import LM

    lm = LM(model=os.getenv("LOTUS_TPU_TEST_MODEL", "gpt-4o-mini"))
    lotus_tpu.settings.configure(lm=lm)
    df = pd.DataFrame({"note": ["TPUs use systolic arrays.", "TPUs have fast HBM."]})
    out = df.sem_agg("Summarize all {note} in one sentence")
    assert len(out) == 1
    assert lm.stats.virtual_usage.total_tokens > 0
    assert lm.stats.virtual_usage.total_cost > 0


@requires_openai
def test_openai_multimodal_filter():
    from lotus_tpu.dtype_extensions import ImageDtype
    from lotus_tpu.models import LM

    import numpy as np

    lotus_tpu.settings.configure(lm=LM(model=os.getenv("LOTUS_TPU_TEST_MODEL", "gpt-4o-mini")))
    red = np.zeros((24, 24, 3), dtype=np.uint8); red[..., 0] = 255
    blue = np.zeros((24, 24, 3), dtype=np.uint8); blue[..., 2] = 255
    df = pd.DataFrame({"image": pd.array([red, blue], dtype=ImageDtype())})
    out = df.sem_filter("the {image} is mostly red")
    assert len(out) == 1


@requires_openai
def test_openai_lazyframe_pipeline(tmp_path):
    from lotus_tpu.ast import LazyFrame
    from lotus_tpu.models import LM, LiteLLMRM
    from lotus_tpu.vector_store import TpuVS

    lotus_tpu.settings.configure(
        lm=LM(model=os.getenv("LOTUS_TPU_TEST_MODEL", "gpt-4o-mini")),
        rm=LiteLLMRM(), vs=TpuVS(),
    )
    df = pd.DataFrame({"title": ["Deep learning", "Sourdough baking", "Linear algebra"]})
    lf = (
        LazyFrame()
        .sem_index("title", str(tmp_path / "lf_idx"))
        .sem_search("title", "mathematics", K=2)
        .sem_filter("{title} is an academic subject")
    )
    out = lf.execute(df)
    assert "Linear algebra" in set(out["title"])
