"""lotus_tpu: TPU-native semantic-operator DataFrame framework.

A from-scratch rebuild of the capabilities of the reference LOTUS framework
with a JAX/XLA/Pallas retrieval engine replacing faiss.  Importing this
module registers the semantic-operator pandas accessors.
"""

import logging

from lotus_tpu.settings import settings

logging.basicConfig(format="%(asctime)s - %(levelname)s - %(message)s", level=logging.INFO)
logger = logging.getLogger(__name__)

__all__ = ["settings", "logger"]
