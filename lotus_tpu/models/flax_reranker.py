"""TPU-resident cross-encoder reranker: a Flax/HF sequence-classification
head under ``jax.jit``.

Fills the role of the reference's ``CrossEncoderReranker``
(``lotus/models/cross_encoder_reranker.py:7-38``) with the (query, doc)
pair forward running as an XLA program on the accelerator.  Scoring
convention matches sentence-transformers' ``CrossEncoder``: a single-logit
head scores directly; a two-logit head scores by the positive-class logit.

Shapes are bucketed exactly like ``JaxSentenceEncoderRM``: batch pads to
``max_batch_size``, tokens to the next power of two (pair-encoded with the
tokenizer's standard ``(text, text_pair)`` path).
"""

from __future__ import annotations

from typing import Any, Optional

import numpy as np

from lotus_tpu.models.reranker import Reranker
from lotus_tpu.types import RerankerOutput

_MIN_SEQ_BUCKET = 16


class JaxCrossEncoderReranker(Reranker):
    def __init__(
        self,
        model: str = "mixedbread-ai/mxbai-rerank-large-v1",
        max_batch_size: int = 64,
        max_seq_length: int = 512,
        dtype: Optional[Any] = None,
    ):
        try:
            import jax
            import jax.numpy as jnp
            from transformers import AutoTokenizer, FlaxAutoModelForSequenceClassification
        except ImportError as e:  # pragma: no cover - environment dependent
            raise ImportError(
                "JaxCrossEncoderReranker needs transformers (with flax support) installed."
            ) from e
        self.model_name = model
        self.max_batch_size = int(max_batch_size)
        self.max_seq_length = int(max_seq_length)
        self._jnp = jnp
        self.tokenizer = AutoTokenizer.from_pretrained(model)
        load_dtype = dtype if dtype is not None else jnp.float32
        try:
            self.model = FlaxAutoModelForSequenceClassification.from_pretrained(
                model, dtype=load_dtype
            )
        except (OSError, EnvironmentError):
            self.model = FlaxAutoModelForSequenceClassification.from_pretrained(
                model, dtype=load_dtype, from_pt=True
            )
        self._params = jax.tree_util.tree_map(
            lambda x: x.astype(load_dtype) if hasattr(x, "astype") else x, self.model.params
        )
        mdl = self.model

        def _forward(params, input_ids, attention_mask):
            logits = mdl(
                input_ids=input_ids, attention_mask=attention_mask, params=params, train=False
            ).logits.astype(jnp.float32)
            # CrossEncoder convention: 1 logit -> the score; 2+ -> positive class.
            return logits[:, 0] if logits.shape[-1] == 1 else logits[:, -1]

        self._score = jax.jit(_forward)

    def _seq_bucket(self, longest: int) -> int:
        b = _MIN_SEQ_BUCKET
        while b < longest:
            b *= 2
        return min(b, self.max_seq_length)

    def score_pairs(self, query: str, docs: list[str]) -> np.ndarray:
        """Raw cross-encoder scores for (query, doc) pairs, one per doc."""
        scores: list[np.ndarray] = []
        bs = self.max_batch_size
        for lo in range(0, len(docs), bs):
            batch = [str(d) for d in docs[lo : lo + bs]]
            n = len(batch)
            if n < bs:
                batch = batch + [""] * (bs - n)
            queries = [query] * len(batch)
            enc = self.tokenizer(
                queries, batch, padding=True, truncation=True,
                max_length=self.max_seq_length, return_tensors="np",
            )
            bucket = self._seq_bucket(enc["input_ids"].shape[1])
            enc = self.tokenizer(
                queries, batch, padding="max_length", truncation=True,
                max_length=bucket, return_tensors="np",
            )
            out = self._score(
                self._params,
                self._jnp.asarray(enc["input_ids"], self._jnp.int32),
                self._jnp.asarray(enc["attention_mask"], self._jnp.int32),
            )
            scores.append(np.asarray(out)[:n])
        return np.concatenate(scores, axis=0) if scores else np.zeros((0,), np.float32)

    def __call__(self, query: str, docs: list[str], K: int) -> RerankerOutput:
        scores = self.score_pairs(query, docs)
        order = np.argsort(-scores, kind="stable")[:K]
        return RerankerOutput(indices=[int(i) for i in order])
