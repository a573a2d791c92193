"""JaxCrossEncoderReranker parity vs a torch oracle on locally-built tiny
sequence-classification checkpoints (offline — no network).

Pins both scoring conventions of sentence-transformers' ``CrossEncoder``
(the reference reranker's engine, ``lotus/models/cross_encoder_reranker.py``):
single-logit heads score directly, multi-logit heads by the positive-class
logit; plus the end-to-end ``sem_search(n_rerank=...)`` hookup.
"""

from __future__ import annotations

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from lotus_tpu.models import JaxCrossEncoderReranker  # noqa: E402

VOCAB = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
         "the", "cat", "sat", "on", "mat", "dog", "##s", "hello", "world", "a"]
DOCS = ["the cat sat on the mat", "hello world", "dogs", "a dog sat on a mat"]
QUERY = "cat on a mat"


def _make_checkpoint(d: str, num_labels: int) -> transformers.BertForSequenceClassification:
    import os

    with open(os.path.join(d, "vocab.txt"), "w") as f:
        f.write("\n".join(VOCAB) + "\n")
    tok = transformers.BertTokenizerFast(vocab_file=os.path.join(d, "vocab.txt"))
    tok.save_pretrained(d)
    cfg = transformers.BertConfig(
        vocab_size=len(VOCAB), hidden_size=32, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=64, max_position_embeddings=64,
        num_labels=num_labels,
    )
    torch.manual_seed(num_labels)
    model = transformers.BertForSequenceClassification(cfg)
    model.eval()
    model.save_pretrained(d)
    return model


def _torch_scores(model, d: str, num_labels: int) -> np.ndarray:
    tok = transformers.AutoTokenizer.from_pretrained(d)
    enc = tok([QUERY] * len(DOCS), DOCS, padding=True, truncation=True,
              max_length=64, return_tensors="pt")
    with torch.no_grad():
        logits = model(**enc).logits
    return (logits[:, 0] if num_labels == 1 else logits[:, -1]).numpy()


@pytest.mark.parametrize("num_labels", [1, 2])
def test_score_parity_and_order(tmp_path, num_labels):
    d = str(tmp_path)
    model = _make_checkpoint(d, num_labels)
    want = _torch_scores(model, d, num_labels)
    # max_batch_size=3 forces a padded final device batch.
    rr = JaxCrossEncoderReranker(model=d, max_batch_size=3)
    got = rr.score_pairs(QUERY, DOCS)
    np.testing.assert_allclose(got, want, atol=2e-4)
    out = rr(QUERY, DOCS, K=2)
    # Order asserts against the RM's own scores: the tiny random model's
    # scores can sit closer together than the float tolerance, so the
    # torch argsort is not a stable oracle for rank (parity above is).
    assert out.indices == [int(i) for i in np.argsort(-got, kind="stable")[:2]]


def test_sem_search_n_rerank_hookup(tmp_path):
    import pandas as pd

    import lotus_tpu
    from lotus_tpu.models import HashRM
    from lotus_tpu.vector_store import TpuVS

    d = str(tmp_path / "ckpt")
    (tmp_path / "ckpt").mkdir()
    _make_checkpoint(d, 1)
    rr = JaxCrossEncoderReranker(model=d, max_batch_size=4)
    df = pd.DataFrame({"text": DOCS})
    with lotus_tpu.settings.context(rm=HashRM(dim=32), vs=TpuVS(), reranker=rr):
        out = df.sem_index("text", str(tmp_path / "idx")).sem_search(
            "text", QUERY, K=4, n_rerank=2
        )
    assert len(out) == 2
    assert set(out["text"]).issubset(set(DOCS))
