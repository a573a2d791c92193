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
