"""Recall-target autotuning for the IVF probe.

The reference exposes faiss's raw ``nprobe`` and leaves picking it to the
user (``lotus/vector_store/faiss_vs.py`` never tunes it); every LOTUS
recall/latency trade-off is manual.  Here the store can calibrate itself:
sample stored rows as stand-in queries (the standard index-autotune proxy
when the real query distribution is unknown), rank them against a FULL
probe (``nprobe = nlist`` — by construction the best any nprobe can do on
this store, quantization included), then walk an nprobe ladder and keep
the smallest value whose recall@k meets the target.

Calibration measures the probe path the store will actually serve with
(the Pallas grouped probe on TPU, the window probe otherwise), so fold
candidate caps and quantization are priced in — the chosen point is an
operating point, not a model.
"""

from __future__ import annotations

from typing import Any, Callable, Sequence

import numpy as np


def nprobe_ladder(nlist: int, start: int = 1) -> list[int]:
    """Geometric-ish ladder {1, 2, 3, 4, 6, 8, 12, ...} capped at nlist.

    ~1.5x steps keep the chosen point within ~25% of the true minimal
    nprobe while needing only O(log nlist) measurements.
    """
    out: list[int] = []
    v = max(1, start)
    while v < nlist:
        out.append(v)
        nxt = v + max(1, v // 2)
        v = nxt
    out.append(nlist)
    # dedup, keep order
    seen: set[int] = set()
    return [x for x in out if not (x in seen or seen.add(x))]


def recall_at_k(got: np.ndarray, want: np.ndarray, k: int) -> float:
    """Mean |got ∩ want| / k per row (−1 = no-hit padding, never matches)."""
    total = 0.0
    for g, w in zip(got, want):
        ws = set(int(x) for x in w[:k] if x >= 0)
        gs = set(int(x) for x in g[:k] if x >= 0)
        total += len(gs & ws) / max(k, 1)
    return total / max(len(got), 1)


def calibrate_nprobe(
    search_fn: Callable[[np.ndarray, int, int], np.ndarray],
    xq: np.ndarray,
    *,
    nlist: int,
    recall_target: float,
    k: int = 10,
    ladder: Sequence[int] | None = None,
) -> dict[str, Any]:
    """Pick the smallest ladder nprobe whose recall@k vs the full probe
    meets ``recall_target``.

    ``search_fn(xq, k, nprobe) -> (nq, >=k) int indices`` must rank with
    the store's serving path.  Returns ``{"nprobe", "recall", "k",
    "recall_target", "ladder": [(nprobe, recall), ...]}``; if no ladder
    point reaches the target the full probe (nprobe = nlist, recall as
    measured ≈ 1.0) is returned.
    """
    if not 0.0 < recall_target <= 1.0:
        raise ValueError(f"recall_target must be in (0, 1], got {recall_target}")
    want = np.asarray(search_fn(xq, k, nlist))
    points: list[tuple[int, float]] = []
    chosen: tuple[int, float] | None = None
    for np_i in ladder if ladder is not None else nprobe_ladder(nlist):
        if np_i >= nlist:
            break
        got = np.asarray(search_fn(xq, k, np_i))
        rec = recall_at_k(got, want, k)
        points.append((np_i, rec))
        if rec >= recall_target:
            chosen = (np_i, rec)
            break
    if chosen is None:  # only the full probe reaches the target
        chosen = (nlist, recall_at_k(want, want, k))
        points.append(chosen)
    return {
        "nprobe": int(chosen[0]),
        "recall": float(chosen[1]),
        "k": int(k),
        "recall_target": float(recall_target),
        "ladder": [(int(a), float(b)) for a, b in points],
    }
