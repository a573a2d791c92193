from lotus_tpu.templates import task_instructions

__all__ = ["task_instructions"]
