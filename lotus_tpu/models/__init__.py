"""Model abstraction layer: LM (chat), RM (embeddings), Reranker.

Provider-optional by design: the LM talks to a Transport (litellm when
installed, injectable fakes otherwise); RMs include API (litellm), local
(sentence-transformers), and a deterministic offline HashRM.
"""

from lotus_tpu.models.lm import LM
from lotus_tpu.models.rm import RM
from lotus_tpu.models.reranker import Reranker
from lotus_tpu.models.transport import CallableTransport, Completion, CompletionUsage, LiteLLMTransport, Transport
from lotus_tpu.models.anthropic_transport import AnthropicTransport
from lotus_tpu.models.fake import FakeTransport, HashRM, make_fake_lm
from lotus_tpu.models.tfidf_rm import TfidfRM

__all__ = [
    "LM",
    "RM",
    "Reranker",
    "Transport",
    "Completion",
    "CompletionUsage",
    "LiteLLMTransport",
    "AnthropicTransport",
    "CallableTransport",
    "FakeTransport",
    "HashRM",
    "TfidfRM",
    "make_fake_lm",
]


def __getattr__(name: str):
    # Lazy imports for provider-dependent classes so `import lotus_tpu`
    # never requires optional packages.
    if name == "LiteLLMRM":
        from lotus_tpu.models.litellm_rm import LiteLLMRM

        return LiteLLMRM
    if name == "SentenceTransformersRM":
        from lotus_tpu.models.sentence_transformers_rm import SentenceTransformersRM

        return SentenceTransformersRM
    if name == "JaxSentenceEncoderRM":
        from lotus_tpu.models.flax_rm import JaxSentenceEncoderRM

        return JaxSentenceEncoderRM
    if name == "JaxCrossEncoderReranker":
        from lotus_tpu.models.flax_reranker import JaxCrossEncoderReranker

        return JaxCrossEncoderReranker
    if name == "CrossEncoderReranker":
        from lotus_tpu.models.cross_encoder_reranker import CrossEncoderReranker

        return CrossEncoderReranker
    if name == "ColBERTv2RM":
        from lotus_tpu.models.colbertv2_rm import ColBERTv2RM

        return ColBERTv2RM
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
