"""Global configuration singleton with a ContextVar overlay.

Same contract as the reference (``lotus/settings.py:12-77``): direct mutation
via ``configure()`` is not thread-safe; ``settings.context(...)`` gives each
thread / asyncio task an isolated overlay, supports nesting, and restores on
exit even under exceptions.
"""

from __future__ import annotations

from contextlib import contextmanager
from contextvars import ContextVar
from typing import TYPE_CHECKING, Any, Generator

from lotus_tpu.types import SerializationFormat

if TYPE_CHECKING:  # pragma: no cover - typing only
    import lotus_tpu.models
    import lotus_tpu.vector_store

_settings_context: ContextVar[dict[str, Any] | None] = ContextVar("_settings_context", default=None)


class Settings:
    # Models
    lm: "lotus_tpu.models.LM | None" = None
    rm: "lotus_tpu.models.RM | None" = None  # embedding-only model
    helper_lm: "lotus_tpu.models.LM | None" = None
    reranker: "lotus_tpu.models.Reranker | None" = None
    vs: "lotus_tpu.vector_store.VS | None" = None

    # Cache settings
    enable_cache: bool = False

    # Serialization setting
    serialization_format: SerializationFormat = SerializationFormat.DEFAULT

    # Parallel groupby settings
    parallel_groupby_max_threads: int = 8

    def __getattribute__(self, name: str) -> Any:
        annotations = object.__getattribute__(self, "__class__").__annotations__
        if name in annotations:
            ctx = _settings_context.get()
            if ctx is not None and name in ctx:
                return ctx[name]
        return object.__getattribute__(self, name)

    def configure(self, **kwargs: Any) -> None:
        for key, value in kwargs.items():
            if not hasattr(self, key):
                raise ValueError(f"Invalid setting: {key}")
            setattr(self, key, value)

    @contextmanager
    def context(self, **kwargs: Any) -> Generator["Settings", None, None]:
        """Temporarily override settings in the current thread or asyncio task.

        Each thread and asyncio task sees only its own overrides; concurrent
        callers cannot interfere with each other.
        """
        for key in kwargs:
            if not hasattr(self, key):
                raise ValueError(f"Invalid setting: {key}")

        current = _settings_context.get() or {}
        token = _settings_context.set({**current, **kwargs})
        try:
            yield self
        finally:
            _settings_context.reset(token)

    def __str__(self) -> str:
        return str(vars(self))


settings = Settings()
