"""Recall-target autotuning: let the store pick nprobe for you.

Instead of hand-tuning the recall/latency knob, construct the store with
``recall_target=`` (or call ``calibrate_nprobe`` explicitly).  The store
samples its own rows as stand-in queries, ranks them against a full probe,
walks an nprobe ladder on the serving path, adopts the cheapest point that
meets the target, and persists it into the index's meta.json so the next
load skips the measurement.  (The reference exposes faiss's raw nprobe
knob only.)
"""

import json
import os
import tempfile

import numpy as np

from lotus_tpu.vector_store import TpuVS

rng = np.random.default_rng(0)
centers = rng.standard_normal((32, 64)).astype(np.float32)
emb = centers[rng.integers(0, 32, 20_000)] + 0.15 * rng.standard_normal(
    (20_000, 64)
).astype(np.float32)
emb /= np.linalg.norm(emb, axis=1, keepdims=True)

with tempfile.TemporaryDirectory() as tmp:
    index_dir = os.path.join(tmp, "idx")
    vs = TpuVS(index_type="ivf", nlist=64, nprobe=4)
    vs.index([], emb, index_dir)

    result = vs.calibrate_nprobe(recall_target=0.97, k=10, nq=128)
    print(f"calibrated nprobe={result['nprobe']} "
          f"(measured recall@10 {result['recall']:.4f} vs full probe)")
    print("ladder walked:", result["ladder"])

    # The calibration persists with the index.
    with open(os.path.join(index_dir, "meta.json")) as f:
        print("meta.json calibration:", json.dumps(json.load(f)["calibration"]))

    # A fresh store given the same target adopts it without re-measuring.
    vs2 = TpuVS(index_type="ivf", recall_target=0.97)
    vs2.load_index(index_dir)
    queries = emb[:4] + 0.02 * rng.standard_normal((4, 64)).astype(np.float32)
    out = vs2(queries, 10)
    print(f"served with nprobe={vs2.nprobe}; "
          f"top-1 ids {np.asarray(out.indices)[:, 0].tolist()}")
