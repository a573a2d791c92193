"""Join-cascade quality gate (the reference pins recall/precision 0.9 for
its BioDEX join pipeline in ``benchmarks/biodex/test_paper_results.py:84-120``).

Offline equivalent: an entity-matching join with known ground truth, a
deterministic oracle LM, and HashRM similarity as the cascade proxy. Gates:

- the cascade join's recall and precision vs ground truth must both be >= 0.9
- the cascade must actually route work away from the oracle (stats check)
"""

import numpy as np
import pandas as pd
import pytest

import lotus_tpu
from lotus_tpu.models import HashRM, make_fake_lm
from lotus_tpu.types import CascadeArgs
from lotus_tpu.vector_store import TpuVS

# Entities share a token with their category text, so the HashRM proxy's
# similarity carries real signal (it embeds bags of words).
CATEGORIES = {
    "cat species": ["tabby cat", "siamese cat", "lynx cat"],
    "dog species": ["beagle dog", "husky dog", "terrier dog"],
    "flower species": ["rose flower", "lily flower", "tulip flower"],
    "guitar variant": ["acoustic guitar", "electric guitar", "bass guitar"],
}
TRUTH = {e: cat for cat, ents in CATEGORIES.items() for e in ents}


def _oracle(prompt, msgs, **kw):
    text = str(prompt)
    for entity, category in TRUTH.items():
        if entity in text:
            return f"Answer: {category in text}"
    return "Answer: False"


@pytest.fixture()
def setting(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)  # the sim-join proxy writes an index dir in cwd
    lotus_tpu.settings.configure(
        lm=make_fake_lm(responder=_oracle),
        rm=HashRM(dim=64),
        vs=TpuVS(),
        enable_cache=False,
    )
    yield
    lotus_tpu.settings.configure(lm=None, rm=None, vs=None)


def _scores(result: pd.DataFrame) -> tuple[float, float]:
    found = set(zip(result["entity"], result["category"]))
    wanted = set(TRUTH.items())
    recall = len(found & wanted) / len(wanted)
    precision = len(found & wanted) / max(len(found), 1)
    return recall, precision


def test_join_cascade_meets_quality_pins(setting):
    left = pd.DataFrame({"entity": list(TRUTH) * 3})  # repeats: cascade-sized
    right = pd.DataFrame({"category": list(CATEGORIES)})

    args = CascadeArgs(
        recall_target=0.9,
        precision_target=0.9,
        sampling_percentage=0.5,
        failure_probability=0.2,
        min_join_cascade_size=10,
    )
    out, stats = left.sem_join(
        right, "the {entity} is a {category}", cascade_args=args, return_stats=True
    )
    recall, precision = _scores(out.drop_duplicates())

    assert recall >= 0.9, f"join recall regressed: {recall:.3f}"
    assert precision >= 0.9, f"join precision regressed: {precision:.3f}"
    # The cascade must have resolved a real share of pairs without the oracle.
    assert stats["join_resolved_by_helper_model"] + stats["join_resolved_by_large_model"] > 0
    total_pairs = len(left) * len(right)
    assert stats["join_resolved_by_large_model"] < total_pairs, "cascade never skipped the oracle"


def test_exact_join_is_perfect(setting):
    left = pd.DataFrame({"entity": list(TRUTH)})
    right = pd.DataFrame({"category": list(CATEGORIES)})
    out = left.sem_join(right, "the {entity} is a {category}")
    recall, precision = _scores(out)
    assert recall == 1.0 and precision == 1.0
