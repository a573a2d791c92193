"""Shared example setup: use a real provider when LOTUS_TPU_MODEL is set,
otherwise a deterministic offline fake."""

from __future__ import annotations

import os

import lotus_tpu
from lotus_tpu.models import HashRM, LM, make_fake_lm
from lotus_tpu.vector_store import TpuVS


def configure(responder=None, **fake_kwargs):
    """Configure settings with a real or fake LM plus HashRM + TpuVS."""
    model = os.getenv("LOTUS_TPU_MODEL")
    if model:
        lm = LM(model=model)
    else:
        lm = make_fake_lm(responder=responder, **fake_kwargs)
    lotus_tpu.settings.configure(lm=lm, rm=HashRM(dim=64), vs=TpuVS())
    return lm
