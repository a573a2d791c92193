"""Statistical validation of the cascade threshold-learning guarantee on
realistic proxy-score distributions.

The contract (LOTUS paper; reference `lotus/sem_ops/cascade_utils.py:42-144`):
learned (tau_+, tau_-) route proxy-confident rows past the oracle while the
END-TO-END cascade output still meets ``recall_target`` and
``precision_target`` with probability >= 1 - ``failure_probability``.
The unit tests elsewhere pin the mechanics on toy scores; this suite runs
the full protocol (importance sampling -> oracle labels -> threshold
learning -> routing) over many seeds on a bimodal, miscalibrated proxy —
the shape real LLM helper logprobs take (confident clusters at both ends,
a smeared uncertain band) — and checks the realized guarantee rate on the
whole population, the reference's implicit BioDEX-pin validation made
explicit and offline.
"""

from __future__ import annotations

import numpy as np
import pytest

from lotus_tpu.sem_ops.cascade_utils import (
    calibrate_llm_logprobs,
    importance_sampling,
    learn_cascade_thresholds,
)
from lotus_tpu.types import CascadeArgs

N = 2000
SEEDS = 30
RECALL_TARGET = 0.9
PRECISION_TARGET = 0.85
FAILURE_PROB = 0.2


def _population(rng: np.random.Generator) -> tuple[np.ndarray, np.ndarray]:
    """Bimodal proxy scores + ground-truth labels with a miscalibrated,
    noisy relationship (what helper-LM True/False logprobs look like)."""
    n_pos = int(0.4 * N)
    # Latent truth probability: positives cluster high, negatives low, both
    # with heavy shoulders into the uncertain middle.
    latent = np.concatenate([
        rng.beta(6, 2, size=n_pos),        # true positives, mostly confident
        rng.beta(2, 6, size=N - n_pos),    # true negatives
    ])
    truth = np.concatenate([
        np.ones(n_pos, dtype=bool), np.zeros(N - n_pos, dtype=bool)
    ])
    # Proxy = miscalibrated (temperature-sharpened, shifted) + logit noise.
    logit = np.log(np.clip(latent, 1e-6, 1 - 1e-6) / np.clip(1 - latent, 1e-6, 1))
    noisy = 1.6 * logit + 0.4 + rng.normal(0, 1.0, size=N)
    proxy = 1.0 / (1.0 + np.exp(-noisy))
    perm = rng.permutation(N)
    return proxy[perm], truth[perm]


def _run_once(seed: int) -> tuple[float, float, float]:
    rng = np.random.default_rng(seed)
    proxy_raw, truth = _population(rng)

    args = CascadeArgs(
        recall_target=RECALL_TARGET,
        precision_target=PRECISION_TARGET,
        failure_probability=FAILURE_PROB,
        sampling_percentage=0.1,
        cascade_IS_max_sample_range=N,
        cascade_IS_random_seed=seed,
    )
    proxy = np.asarray(calibrate_llm_logprobs(list(proxy_raw), args))

    sample_idx, corrections = importance_sampling(list(proxy), args)
    (tau_pos, tau_neg), _ = learn_cascade_thresholds(
        list(proxy[sample_idx]),
        list(truth[sample_idx]),  # oracle == ground truth on the sample
        corrections[sample_idx],
        args,
    )

    # Route the WHOLE population with the learned thresholds.
    accept = proxy >= tau_pos
    reject = proxy <= tau_neg
    to_oracle = ~accept & ~reject
    final = accept | (to_oracle & truth)  # oracle answers are correct

    tp = int(np.sum(final & truth))
    recall = tp / max(int(np.sum(truth)), 1)
    precision = tp / max(int(np.sum(final)), 1)
    return recall, precision, float(np.mean(to_oracle))


def test_cascade_guarantee_holds_on_realistic_distributions():
    results = [_run_once(seed) for seed in range(SEEDS)]
    recalls = np.array([r for r, _, _ in results])
    precisions = np.array([p for _, p, _ in results])
    oracle_frac = np.array([o for _, _, o in results])

    ok = (recalls >= RECALL_TARGET) & (precisions >= PRECISION_TARGET)
    # Guarantee: P(meet targets) >= 1 - failure_probability.  At 30 seeds,
    # requiring >= 1 - failure_probability - 2 binomial sigma keeps the
    # meta-test itself from flaking while still catching a broken bound
    # (an unprotected threshold rule fails the recall side ~half the time
    # on this distribution).
    sigma = np.sqrt(FAILURE_PROB * (1 - FAILURE_PROB) / SEEDS)
    assert ok.mean() >= (1 - FAILURE_PROB) - 2 * sigma, (
        f"guarantee rate {ok.mean():.2f}, recalls {np.round(recalls, 3)}, "
        f"precisions {np.round(precisions, 3)}"
    )

    # The cascade must actually cascade: a thresholds-learned policy that
    # sends (nearly) everything to the oracle meets any target vacuously.
    assert oracle_frac.mean() < 0.9


def test_cascade_guarantee_is_not_vacuous():
    """Sanity: a naive uncorrected threshold rule (accept above the sample
    recall quantile, no confidence bounds) violates the recall target on a
    meaningful fraction of seeds — i.e. the distribution is hard enough
    that the statistical correction is doing real work."""
    fails = 0
    for seed in range(SEEDS):
        rng = np.random.default_rng(seed)
        proxy, truth = _population(rng)
        args = CascadeArgs(
            cascade_IS_max_sample_range=N, cascade_IS_random_seed=seed,
            sampling_percentage=0.1,
        )
        proxy = np.asarray(calibrate_llm_logprobs(list(proxy), args))
        idx, _ = importance_sampling(list(proxy), args)
        s_scores, s_truth = proxy[idx], truth[idx]
        pos = np.sort(s_scores[s_truth])
        # Naive: tau_- at the (1 - target) quantile of sampled positives,
        # tau_+ at the precision-greedy point, no UB/LB correction.
        tau_neg = pos[int((1 - RECALL_TARGET) * len(pos))] if len(pos) else 0.0
        tau_pos = np.quantile(s_scores, 0.9)
        accept = proxy >= tau_pos
        reject = proxy <= tau_neg
        final = accept | (~accept & ~reject & truth)
        recall = int(np.sum(final & truth)) / max(int(np.sum(truth)), 1)
        fails += recall < RECALL_TARGET
    assert fails >= 2, f"naive rule failed only {fails}/{SEEDS} — distribution too easy"
