"""Cascade math: importance sampling, proxy calibration, and threshold
learning with statistical guarantees.

Parity target: ``lotus/sem_ops/cascade_utils.py:8-149``.  The algorithm
(from the LOTUS paper) learns a (tau_+, tau_-) pair such that routing
proxy-confident rows past the oracle still meets recall/precision targets
with probability >= 1 - failure_probability, via Hoeffding-style upper/lower
confidence bounds on importance-weighted sample statistics.
"""

from __future__ import annotations

import math

import numpy as np
from numpy.typing import NDArray

import lotus_tpu
from lotus_tpu.types import CascadeArgs


def importance_sampling(
    proxy_scores: list[float],
    cascade_args: CascadeArgs,
) -> tuple[NDArray[np.int64], NDArray[np.float64]]:
    """Sample indices for threshold learning, biased toward high proxy scores.

    Sampling weight is proportional to sqrt(score), mixed with a uniform
    component (weight ``1 - cascade_IS_weight``).  Returns the sampled
    indices and per-element correction factors 1/(N*w) used to de-bias
    sample statistics.
    """
    if cascade_args.cascade_IS_random_seed is not None:
        np.random.seed(cascade_args.cascade_IS_random_seed)

    n = len(proxy_scores)
    w = np.sqrt(np.asarray(proxy_scores, dtype=np.float64))
    is_w = cascade_args.cascade_IS_weight
    w = is_w * w / np.sum(w) + (1 - is_w) / n

    sample_range = min(cascade_args.cascade_IS_max_sample_range, n)
    sample_w = w[:sample_range]
    sample_w = sample_w / np.sum(sample_w)

    sample_size = int(cascade_args.sampling_percentage * n)
    sample_indices = np.random.choice(np.arange(sample_range), sample_size, p=sample_w)

    correction_factors = (1.0 / n) / w
    return sample_indices, correction_factors


def calibrate_llm_logprobs(true_probs: list[float], cascade_args: CascadeArgs) -> list[float]:
    """Quantile-bin calibration of raw proxy probabilities."""
    q = cascade_args.cascade_num_calibration_quantiles
    edges = np.percentile(true_probs, np.linspace(0, 100, q + 1))
    binned = (np.digitize(true_probs, edges) - 1) / q
    return list(np.clip(binned, 0, 1))


def _ub(mean: float, std: float, s: int, delta: float) -> float:
    return mean + (std / math.sqrt(s)) * math.sqrt(2 * math.log(1 / delta))


def _lb(mean: float, std: float, s: int, delta: float) -> float:
    return mean - (std / math.sqrt(s)) * math.sqrt(2 * math.log(1 / delta))


def _recall(pos_t: float, neg_t: float, scores, oracle, corr) -> float:
    """Recall of the cascade policy at thresholds (pos_t, neg_t).

    Rows with score >= pos_t are accepted by the proxy; rows with
    score <= neg_t rejected by the proxy; the band in between goes to the
    oracle (and is therefore always correct, weighted by correction).
    """
    total_correct = float(np.sum(oracle * corr))
    if total_correct <= 0:
        return 0.0
    accepted_true = float(np.sum((scores >= pos_t) & oracle))
    to_oracle = (scores < pos_t) & (scores > neg_t)
    oracle_weighted = float(np.sum(oracle[to_oracle] * corr[to_oracle]))
    return (accepted_true + oracle_weighted) / total_correct


def _precision(pos_t: float, neg_t: float, scores, oracle) -> float:
    to_oracle = (scores < pos_t) & (scores > neg_t)
    oracle_pos = int(np.sum(oracle[to_oracle]))
    accepted = scores >= pos_t
    tp = int(np.sum(accepted & oracle)) + oracle_pos
    pp = int(np.sum(accepted)) + oracle_pos
    return tp / pp if pp > 0 else 0.0


def learn_cascade_thresholds(
    proxy_scores: list[float],
    oracle_outputs: list[bool],
    sample_correction_factors: NDArray[np.float64],
    cascade_args: CascadeArgs,
) -> tuple[tuple[float, float], int]:
    """Learn (tau_+, tau_-) from oracle-labelled samples.

    Returns the thresholds and the number of oracle calls the policy would
    make over the sampled scores.
    """
    scores = np.asarray(proxy_scores, dtype=np.float64)
    oracle = np.asarray(oracle_outputs, dtype=bool)
    corr = np.asarray(sample_correction_factors, dtype=np.float64)
    order = np.argsort(-scores, kind="stable")
    scores, oracle, corr = scores[order], oracle[order], corr[order]
    s = len(scores)

    def tau_neg_for(recall_target: float, tau_pos: float) -> float:
        # Highest negative threshold (scanning ascending scores) that still
        # meets the recall target.
        best = 0.0
        for t in scores[::-1]:
            if _recall(tau_pos, t, scores, oracle, corr) >= recall_target:
                best = max(best, float(t))
        return best

    tau_pos = 1.0
    tau_neg = tau_neg_for(cascade_args.recall_target, tau_pos)

    # Statistical correction of the recall target: split the importance-
    # weighted positives at tau_neg and bound each side.
    z1 = (oracle.astype(float) * corr)[scores >= tau_neg]
    z2 = (oracle.astype(float) * corr)[scores < tau_neg]
    ub_z1 = _ub(float(np.mean(z1)) if z1.size else 0.0, float(np.std(z1)) if z1.size else 0.0,
                s, cascade_args.failure_probability / 2)
    lb_z2 = _lb(float(np.mean(z2)) if z2.size else 0.0, float(np.std(z2)) if z2.size else 0.0,
                s, cascade_args.failure_probability / 2)
    corrected_target = 1.0 if (ub_z1 + lb_z2) == 0 else min(1.0, ub_z1 / (ub_z1 + lb_z2))
    tau_neg = tau_neg_for(corrected_target, tau_pos)

    # Precision side: keep only positive thresholds whose lower confidence
    # bound on precision clears the target.
    candidates = [1.0]
    for t in scores:
        z = oracle[scores >= t].astype(float)
        mean_z = float(np.mean(z)) if z.size else 0.0
        std_z = float(np.std(z)) if z.size else 0.0
        p_l = _lb(mean_z, std_z, max(len(z), 1), cascade_args.failure_probability / s)
        if p_l > cascade_args.precision_target:
            candidates.append(float(t))

    tau_pos = max(tau_neg, min(candidates))
    oracle_calls = int(np.sum((np.asarray(proxy_scores) < tau_pos) & (np.asarray(proxy_scores) > tau_neg)))

    lotus_tpu.logger.info(
        f"Sample recall: {_recall(tau_pos, tau_neg, scores, oracle, np.ones_like(corr))}"
    )
    lotus_tpu.logger.info(f"Sample precision: {_precision(tau_pos, tau_neg, scores, oracle)}")
    return (tau_pos, tau_neg), oracle_calls


def calibrate_sem_sim_join(true_score: list[float]) -> list[float]:
    return list(np.clip(true_score, 0, 1))
