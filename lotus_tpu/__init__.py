"""lotus_tpu: TPU-native semantic-operator DataFrame framework.

A from-scratch rebuild of the capabilities of the reference LOTUS framework
with a JAX/XLA/Pallas retrieval engine replacing faiss.  Importing this
module registers the semantic-operator pandas accessors (same side-effect
registration contract as the reference ``lotus/__init__.py:9-23``).
"""

import logging

logging.basicConfig(format="%(asctime)s - %(levelname)s - %(message)s", level=logging.INFO)
logger = logging.getLogger(__name__)

import lotus_tpu.dtype_extensions  # noqa: E402  (registers ImageDtype)
import lotus_tpu.models  # noqa: E402
import lotus_tpu.vector_store  # noqa: E402
import lotus_tpu.nl_expression  # noqa: E402
import lotus_tpu.templates  # noqa: E402
import lotus_tpu.utils  # noqa: E402
from lotus_tpu.sem_ops import (  # noqa: E402
    load_sem_index,
    sem_agg,
    sem_cluster_by,
    sem_dedup,
    sem_extract,
    sem_filter,
    sem_index,
    sem_join,
    sem_map,
    sem_partition_by,
    sem_search,
    sem_sim_join,
    sem_topk,
)
from lotus_tpu.ast import LazyFrame  # noqa: E402
from lotus_tpu.corpus import Corpus, Unit  # noqa: E402
from lotus_tpu.evals import llm_as_judge, pairwise_judge  # noqa: E402
from lotus_tpu.web_search import WebSearchCorpus, web_extract, web_search  # noqa: E402
from lotus_tpu.settings import settings  # noqa: E402

__all__ = [
    "sem_map",
    "sem_filter",
    "sem_agg",
    "sem_extract",
    "sem_join",
    "sem_partition_by",
    "sem_topk",
    "sem_index",
    "load_sem_index",
    "sem_sim_join",
    "sem_cluster_by",
    "sem_search",
    "sem_dedup",
    "settings",
    "nl_expression",
    "templates",
    "logger",
    "models",
    "vector_store",
    "utils",
    "dtype_extensions",
    "llm_as_judge",
    "pairwise_judge",
    "LazyFrame",
    "ast",
    "Corpus",
    "Unit",
    "web_search",
    "web_extract",
    "WebSearchCorpus",
]
