"""TPU-resident sentence-embedding RM: a Flax/HF encoder under ``jax.jit``.

Fills the role of the reference's ``SentenceTransformersRM``
(``lotus/models/sentence_transformers_rm.py:11-76``) but runs the encoder
forward as an XLA program on the accelerator instead of torch on the host —
so the whole ingest path (embed -> quantize -> index build) stays device-
resident.  The contract is the plain ``RM`` one: ``_embed(list[str]) ->
(n, d) float32``, mean-pooled (or CLS) and optionally L2-normalised, the
convention of the reference default ``intfloat/e5-base-v2``
(``sentence_transformers_rm.py:46`` normalize_embeddings=True).

XLA traces one program per (batch, seq) shape, so inputs are padded to a
small set of buckets: the batch dimension always pads to ``max_batch_size``
and the token dimension to the next power of two (capped at
``max_seq_length``).  Steady-state corpora therefore compile a handful of
programs total; padding rows ride an all-zero attention mask and are
sliced off after pooling.
"""

from __future__ import annotations

from typing import Any, Optional

import numpy as np
from numpy.typing import NDArray

from lotus_tpu.models.rm import RM

_MIN_SEQ_BUCKET = 16


class JaxSentenceEncoderRM(RM):
    """HF encoder (BERT-family) embeddings on the default JAX device.

    ``model`` is any Hugging Face checkpoint or local directory with a
    tokenizer + weights (Flax or torch — torch checkpoints are converted at
    load).  ``dtype`` sets the computation dtype (e.g. ``jnp.bfloat16`` on
    TPU for MXU rate); parameters are kept in that dtype too, outputs are
    always float32.
    """

    def __init__(
        self,
        model: str = "intfloat/e5-base-v2",
        max_batch_size: int = 64,
        normalize_embeddings: bool = True,
        pooling: str = "mean",
        max_seq_length: int = 512,
        dtype: Optional[Any] = None,
    ):
        try:
            import jax
            import jax.numpy as jnp
            from transformers import AutoTokenizer, FlaxAutoModel
        except ImportError as e:  # pragma: no cover - environment dependent
            raise ImportError(
                "JaxSentenceEncoderRM needs transformers (with flax support) installed."
            ) from e
        if pooling not in ("mean", "cls"):
            raise ValueError(f"pooling must be 'mean' or 'cls', got {pooling!r}")
        self.model_name = model
        self.max_batch_size = int(max_batch_size)
        self.normalize_embeddings = normalize_embeddings
        self.pooling = pooling
        self.max_seq_length = int(max_seq_length)
        self._jnp = jnp
        self.tokenizer = AutoTokenizer.from_pretrained(model)
        load_dtype = dtype if dtype is not None else jnp.float32
        try:
            self.encoder = FlaxAutoModel.from_pretrained(model, dtype=load_dtype)
        except (OSError, EnvironmentError):
            # Torch-only checkpoint: convert weights at load time.
            self.encoder = FlaxAutoModel.from_pretrained(model, dtype=load_dtype, from_pt=True)
        self._params = jax.tree_util.tree_map(
            lambda x: x.astype(load_dtype) if hasattr(x, "astype") else x, self.encoder.params
        )

        encoder, norm, pool = self.encoder, normalize_embeddings, pooling

        def _forward(params, input_ids, attention_mask):
            hidden = encoder(
                input_ids=input_ids, attention_mask=attention_mask, params=params, train=False
            ).last_hidden_state
            if pool == "mean":
                m = attention_mask[:, :, None].astype(hidden.dtype)
                emb = (hidden * m).sum(axis=1) / jnp.clip(m.sum(axis=1), 1e-9, None)
            else:
                emb = hidden[:, 0]
            emb = emb.astype(jnp.float32)
            if norm:
                emb = emb / jnp.clip(jnp.linalg.norm(emb, axis=-1, keepdims=True), 1e-12, None)
            return emb

        self._encode = jax.jit(_forward)

    def _seq_bucket(self, longest: int) -> int:
        b = _MIN_SEQ_BUCKET
        while b < longest:
            b *= 2
        return min(b, self.max_seq_length)

    def _embed(self, docs: list[str]) -> NDArray[np.float32]:
        out: list[np.ndarray] = []
        bs = self.max_batch_size
        for lo in range(0, len(docs), bs):
            batch = [str(d) for d in docs[lo : lo + bs]]
            n = len(batch)
            if n < bs:  # static batch shape: pad with empty docs, slice after
                batch = batch + [""] * (bs - n)
            enc = self.tokenizer(
                batch, padding=True, truncation=True,
                max_length=self.max_seq_length, return_tensors="np",
            )
            bucket = self._seq_bucket(enc["input_ids"].shape[1])
            enc = self.tokenizer(
                batch, padding="max_length", truncation=True,
                max_length=bucket, return_tensors="np",
            )
            emb = self._encode(
                self._params,
                self._jnp.asarray(enc["input_ids"], self._jnp.int32),
                self._jnp.asarray(enc["attention_mask"], self._jnp.int32),
            )
            out.append(np.asarray(emb)[:n])
        if not out:
            return np.zeros((0, int(self.encoder.config.hidden_size)), np.float32)
        return np.concatenate(out, axis=0)
