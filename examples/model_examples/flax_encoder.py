"""Accelerator-resident embeddings and reranking via Flax/HF models.

`JaxSentenceEncoderRM` and `JaxCrossEncoderReranker` run their forward
passes as XLA programs on whatever `jax.devices()[0]` is (TPU in
production, CPU here), replacing the torch-on-host path of
`SentenceTransformersRM` / `CrossEncoderReranker`.

This example is fully offline: it builds a tiny BERT checkpoint locally
(random weights — retrieval quality is meaningless; the point is the
wiring).  With network access, point `model=` at any HF checkpoint, e.g.

    rm = JaxSentenceEncoderRM("intfloat/e5-base-v2", dtype=jnp.bfloat16)
    rr = JaxCrossEncoderReranker("mixedbread-ai/mxbai-rerank-large-v1")
"""

import os
import tempfile

import pandas as pd

import lotus_tpu
from lotus_tpu.vector_store import TpuVS


def make_tiny_checkpoint(d: str, num_labels: int | None = None) -> None:
    import torch
    import transformers

    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
             "the", "cat", "sat", "on", "mat", "dog", "##s", "hello", "world", "a"]
    with open(os.path.join(d, "vocab.txt"), "w") as f:
        f.write("\n".join(vocab) + "\n")
    transformers.BertTokenizerFast(vocab_file=os.path.join(d, "vocab.txt")).save_pretrained(d)
    cfg = transformers.BertConfig(
        vocab_size=len(vocab), hidden_size=32, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=64, max_position_embeddings=64,
        **({"num_labels": num_labels} if num_labels else {}),
    )
    torch.manual_seed(0)
    cls = transformers.BertForSequenceClassification if num_labels else transformers.BertModel
    cls(cfg).save_pretrained(d)


def main() -> None:
    from lotus_tpu.models import JaxCrossEncoderReranker, JaxSentenceEncoderRM

    enc_dir = tempfile.mkdtemp()
    rr_dir = tempfile.mkdtemp()
    make_tiny_checkpoint(enc_dir)
    make_tiny_checkpoint(rr_dir, num_labels=1)

    rm = JaxSentenceEncoderRM(model=enc_dir, max_batch_size=4)
    reranker = JaxCrossEncoderReranker(model=rr_dir, max_batch_size=4)

    df = pd.DataFrame({"text": [
        "the cat sat on the mat", "hello world", "dogs",
        "a dog sat", "hello hello cat",
    ]})
    with lotus_tpu.settings.context(rm=rm, vs=TpuVS(), reranker=reranker):
        hits = (
            df.sem_index("text", tempfile.mkdtemp())
              .sem_search("text", "cat on a mat", K=4, n_rerank=2)
        )
    print(hits[["text"]])


if __name__ == "__main__":
    main()
