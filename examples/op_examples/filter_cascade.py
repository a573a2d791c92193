"""sem_filter with a helper-LM cascade: confident rows skip the oracle."""

import sys

import pandas as pd

from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))
import lotus_tpu
from examples._common import configure
from lotus_tpu.models import make_fake_lm
from lotus_tpu.types import CascadeArgs, ProxyModel

oracle = configure(lambda p, m, **kw: f"Answer: {'great' in str(p)}")
helper = make_fake_lm(
    responder=lambda p, m, **kw: f"Answer: {'great' in str(p)}",
    positive_prob=lambda p: 0.98 if "great" in p else 0.02,
)
lotus_tpu.settings.configure(helper_lm=helper)

df = pd.DataFrame({"review": (["great product"] * 10 + ["bad product"] * 10)})
out, stats = df.sem_filter(
    "The {review} is positive",
    cascade_args=CascadeArgs(
        proxy_model=ProxyModel.HELPER_LM,
        recall_target=0.9,
        precision_target=0.9,
        sampling_percentage=0.5,
        cascade_IS_random_seed=0,
    ),
    return_stats=True,
)
print(out)
print("cascade stats:", {k: v for k, v in stats.items() if k != "cascade_args"})
