"""JaxSentenceEncoderRM parity vs a torch oracle on a locally-built tiny
BERT checkpoint (offline: vocab, config, and weights are all constructed
in the test — no network).

Covers the reference's local-embedding role
(``lotus/models/sentence_transformers_rm.py``) with the encoder forward
running as an XLA program: mean pooling over the attention mask,
L2-normalisation, batch padding to the static batch shape, and seq-length
bucketing must all reproduce the torch reference numerics.
"""

from __future__ import annotations

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from lotus_tpu.models import JaxSentenceEncoderRM  # noqa: E402

VOCAB = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
         "the", "cat", "sat", "on", "mat", "dog", "##s", "hello", "world", "a"]
DOCS = ["the cat sat on the mat", "hello world", "dogs", "a dog sat", "hello hello cat"]


@pytest.fixture(scope="module")
def checkpoint(tmp_path_factory):
    d = tmp_path_factory.mktemp("tiny_bert")
    (d / "vocab.txt").write_text("\n".join(VOCAB) + "\n")
    tok = transformers.BertTokenizerFast(vocab_file=str(d / "vocab.txt"))
    tok.save_pretrained(str(d))
    cfg = transformers.BertConfig(
        vocab_size=len(VOCAB), hidden_size=32, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=64, max_position_embeddings=64,
    )
    torch.manual_seed(0)
    model = transformers.BertModel(cfg)
    model.eval()
    model.save_pretrained(str(d))
    return str(d), tok, model


def _torch_mean_pooled(tok, model, docs: list[str], normalize: bool) -> np.ndarray:
    enc = tok(docs, padding=True, truncation=True, max_length=64, return_tensors="pt")
    with torch.no_grad():
        hidden = model(**enc).last_hidden_state
    m = enc["attention_mask"].unsqueeze(-1).float()
    emb = (hidden * m).sum(1) / m.sum(1).clamp(min=1e-9)
    if normalize:
        emb = emb / emb.norm(dim=-1, keepdim=True).clamp(min=1e-12)
    return emb.numpy()


def test_mean_pool_parity_with_batch_padding(checkpoint):
    path, tok, model = checkpoint
    # max_batch_size=2 forces multiple device batches AND a padded final
    # batch; docs of different lengths hit different seq buckets.
    rm = JaxSentenceEncoderRM(model=path, max_batch_size=2, normalize_embeddings=True)
    got = rm._embed(DOCS)
    want = _torch_mean_pooled(tok, model, DOCS, normalize=True)
    assert got.shape == want.shape == (len(DOCS), 32)
    np.testing.assert_allclose(got, want, atol=2e-4)
    np.testing.assert_allclose(np.linalg.norm(got, axis=-1), 1.0, atol=1e-5)


def test_unnormalized_and_cls_pooling(checkpoint):
    path, tok, model = checkpoint
    rm = JaxSentenceEncoderRM(model=path, max_batch_size=8, normalize_embeddings=False)
    got = rm._embed(DOCS[:3])
    want = _torch_mean_pooled(tok, model, DOCS[:3], normalize=False)
    np.testing.assert_allclose(got, want, atol=2e-4)

    rm_cls = JaxSentenceEncoderRM(model=path, max_batch_size=8,
                                  normalize_embeddings=False, pooling="cls")
    enc = tok(DOCS[:3], padding=True, truncation=True, max_length=64, return_tensors="pt")
    with torch.no_grad():
        want_cls = model(**enc).last_hidden_state[:, 0].numpy()
    np.testing.assert_allclose(rm_cls._embed(DOCS[:3]), want_cls, atol=2e-4)


def test_empty_and_query_coercion(checkpoint):
    path, _, _ = checkpoint
    rm = JaxSentenceEncoderRM(model=path, max_batch_size=4)
    assert rm._embed([]).shape == (0, 32)
    qv = rm.convert_query_to_query_vector("hello world")
    assert qv.shape == (1, 32)


def test_end_to_end_sem_index_search(checkpoint, tmp_path):
    """The RM drops into the standard operator path: index + search."""
    import pandas as pd

    import lotus_tpu
    from lotus_tpu.vector_store import TpuVS

    path, _, _ = checkpoint
    rm = JaxSentenceEncoderRM(model=path, max_batch_size=4)
    df = pd.DataFrame({"text": DOCS})
    with lotus_tpu.settings.context(rm=rm, vs=TpuVS()):
        out = df.sem_index("text", str(tmp_path / "idx")).sem_search("text", DOCS[1], K=2)
    assert len(out) == 2
    assert DOCS[1] in out["text"].tolist()  # the exact doc is its own top hit
