from lotus_tpu.evals import llm_as_judge, pairwise_judge

__all__ = ["llm_as_judge", "pairwise_judge"]
