"""lotus_tpu: TPU-native semantic-operator DataFrame framework.

A from-scratch rebuild of the capabilities of the reference LOTUS framework
with a JAX/XLA/Pallas retrieval engine replacing faiss.  Importing this
module registers the semantic-operator pandas accessors (same side-effect
registration contract as the reference ``lotus/__init__.py:9-23``).
"""

import logging

logging.basicConfig(format="%(asctime)s - %(levelname)s - %(message)s", level=logging.INFO)
logger = logging.getLogger(__name__)

# Side-effect imports: ImageDtype + every df.sem_* accessor register here.
import lotus_tpu.dtype_extensions  # noqa: E402
import lotus_tpu.models  # noqa: E402
import lotus_tpu.nl_expression  # noqa: E402
import lotus_tpu.templates  # noqa: E402
import lotus_tpu.utils  # noqa: E402
import lotus_tpu.vector_store  # noqa: E402
import lotus_tpu.sem_ops as _sem_ops  # noqa: E402
from lotus_tpu.ast import LazyFrame  # noqa: E402
from lotus_tpu.corpus import Corpus, Unit  # noqa: E402
from lotus_tpu.evals import llm_as_judge, pairwise_judge  # noqa: E402
from lotus_tpu.settings import settings  # noqa: E402
from lotus_tpu.web_search import WebSearchCorpus, web_extract, web_search  # noqa: E402

# Re-export every operator module (lotus_tpu.sem_filter etc.).
for _op in _sem_ops.__all__:
    globals()[_op] = getattr(_sem_ops, _op)

__all__ = [
    *_sem_ops.__all__,
    "settings", "logger", "LazyFrame", "ast", "Corpus", "Unit",
    "llm_as_judge", "pairwise_judge",
    "web_search", "web_extract", "WebSearchCorpus",
    "nl_expression", "templates", "models", "vector_store", "utils",
    "dtype_extensions",
]
