"""Similarity-join benchmark (BASELINE.md config 2 scaled): left-KNN join
wall clock + correctness vs numpy."""

from __future__ import annotations

import tempfile
import time
from typing import Any

import numpy as np
import pandas as pd

import lotus_tpu  # noqa: F401  (registers accessors)
from benchmarks.common import exact_topk, make_corpus
from lotus_tpu.models.rm import RM
from lotus_tpu.settings import settings
from lotus_tpu.vector_store import TpuVS


class _PrecomputedRM(RM):
    """Serves precomputed vectors keyed by the doc string ("vec:<row>")."""

    def __init__(self, vectors: np.ndarray):
        self.vectors = vectors

    def _embed(self, docs):
        rows = [int(str(d).split(":", 1)[1]) for d in docs]
        return self.vectors[rows]


def run(
    n_left: int = 5_000, n_right: int = 50_000, d: int = 384, k: int = 5,
    spec: bool = False, device_dtype: str = "float32",
) -> dict[str, Any]:
    """``spec=True`` runs BASELINE config 2 at full scale: a 100k x 100k
    cosine kNN join (k=5) at 768-d.  Corpora are generated on device (the
    dev host's core would otherwise dominate wall time) and pair recall is
    checked for EVERY left row against the exact f32 device oracle, chunked
    so the score matrix stays HBM-resident; recall >= 0.99 is asserted."""
    if spec:
        n_left = n_right = 100_000
        d, k, device_dtype = 768, 5, "bfloat16"
        from benchmarks.common import make_corpus_device

        right_vecs = np.asarray(make_corpus_device(n_right, d, seed=0))
        left_vecs = np.asarray(make_corpus_device(n_left, d, seed=1))
    else:
        right_vecs = make_corpus(n_right, d, seed=0)
        left_vecs = make_corpus(n_left, d, seed=1)

    left = pd.DataFrame({"q": [f"vec:{i}" for i in range(n_left)]})
    right = pd.DataFrame({"doc": [f"vec:{i}" for i in range(n_right)]})

    with tempfile.TemporaryDirectory() as tmp:
        settings.configure(rm=_PrecomputedRM(right_vecs), vs=TpuVS(device_dtype=device_dtype))
        right = right.sem_index("doc", tmp)
        settings.configure(rm=_PrecomputedRM(left_vecs))

        t0 = time.perf_counter()
        joined = left.sem_sim_join(right, left_on="q", right_on="doc", K=k)
        wall = time.perf_counter() - t0

    got_pairs = set(zip((int(s.split(":")[1]) for s in joined["q"]),
                        (int(s.split(":")[1]) for s in joined["doc"])))
    if spec:
        from benchmarks.common import exact_topk_device_chunked

        # FULL exact oracle, chunked on device — every left row checked, no
        # sampling caveat on the config-2 pin.
        truth = exact_topk_device_chunked(right_vecs, left_vecs, k)
        true_pairs = {(i, int(j)) for i in range(n_left) for j in truth[i]}
        overlap = len(got_pairs & true_pairs) / len(true_pairs)
        assert overlap >= 0.99, f"config-2 pair recall {overlap:.4f} < 0.99"
    else:
        truth = exact_topk(right_vecs, left_vecs, k)
        true_pairs = {(i, int(j)) for i in range(n_left) for j in truth[i]}
        overlap = len(got_pairs & true_pairs) / len(true_pairs)

    settings.configure(rm=None, vs=None)
    return {
        "n_left": n_left, "n_right": n_right, "d": d, "k": k,
        "wall_s": wall,
        "rows": len(joined),
        "pair_recall": overlap,
        "joined_rows_per_sec": len(joined) / wall,
        **({"oracle": "device f32, FULL left side (chunked)"} if spec else {}),
    }
