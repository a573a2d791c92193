"""Process-wide configuration with task-local overlays.

Role parity with ``lotus/settings.py`` (one ``settings`` singleton holding
the configured LM/RM/VS etc., overridable per thread/task), built around a
declared field registry instead of class-annotation introspection:

* the schema lives in ``_DEFAULTS`` — one dict, one place to add a setting;
* base values go in an ordinary instance dict via ``configure()`` or
  attribute assignment (process-global, not thread-safe);
* ``context(...)`` pushes an overlay onto a ``ContextVar`` so each thread
  and each asyncio task reads its own stack of overrides, nests cleanly,
  and restores on exit even when the body raises.
"""

from __future__ import annotations

from contextlib import contextmanager
from contextvars import ContextVar
from typing import TYPE_CHECKING, Any, Generator

from lotus_tpu.types import SerializationFormat

if TYPE_CHECKING:  # pragma: no cover - typing only
    import lotus_tpu.models
    import lotus_tpu.vector_store

# The full settings schema: name -> default. Adding a field here is all
# that's needed; configure()/context() validation reads this registry.
_DEFAULTS: dict[str, Any] = {
    # model slots
    "lm": None,  # main LM
    "rm": None,  # embedding-only model
    "helper_lm": None,  # cheap helper LM for cascades
    "reranker": None,
    "vs": None,  # vector store
    # behaviour knobs
    "enable_cache": False,
    "serialization_format": SerializationFormat.DEFAULT,
    "parallel_groupby_max_threads": 8,
}

# Task-local overlay (a plain merged dict; context() snapshots + restores).
_overlay: ContextVar[dict[str, Any] | None] = ContextVar("lotus_tpu_settings_overlay", default=None)


class Settings:
    """The configuration object. Reads resolve overlay -> base -> default."""

    # Type hints for editors/mypy; actual storage is _base + the overlay.
    lm: "lotus_tpu.models.LM | None"
    rm: "lotus_tpu.models.RM | None"
    helper_lm: "lotus_tpu.models.LM | None"
    reranker: "lotus_tpu.models.Reranker | None"
    vs: "lotus_tpu.vector_store.VS | None"
    enable_cache: bool
    serialization_format: SerializationFormat
    parallel_groupby_max_threads: int

    def __init__(self) -> None:
        object.__setattr__(self, "_base", dict(_DEFAULTS))

    # ------------------------------------------------------------ plumbing
    @staticmethod
    def _check_known(names: Any) -> None:
        for name in names:
            if name not in _DEFAULTS:
                raise ValueError(f"Invalid setting: {name}")

    def __getattr__(self, name: str) -> Any:
        # Only reached for names without real attributes — i.e. settings fields.
        if name not in _DEFAULTS:
            raise AttributeError(name)
        ctx = _overlay.get()
        if ctx is not None and name in ctx:
            return ctx[name]
        return self._base[name]

    def __setattr__(self, name: str, value: Any) -> None:
        self._check_known([name])
        self._base[name] = value

    # ------------------------------------------------------------- surface
    def configure(self, **kwargs: Any) -> None:
        """Set base values process-wide (not thread-safe; use at startup)."""
        self._check_known(kwargs)
        self._base.update(kwargs)

    @contextmanager
    def context(self, **kwargs: Any) -> Generator["Settings", None, None]:
        """Override settings for the current thread or asyncio task only.

        Nests: inner contexts see outer overrides; everything restores on
        exit, including on exceptions.
        """
        self._check_known(kwargs)
        merged = {**(_overlay.get() or {}), **kwargs}
        token = _overlay.set(merged)
        try:
            yield self
        finally:
            _overlay.reset(token)

    def snapshot(self) -> dict[str, Any]:
        """The effective settings as seen by the current task."""
        ctx = _overlay.get() or {}
        return {name: ctx.get(name, self._base[name]) for name in _DEFAULTS}

    def __str__(self) -> str:
        return str(self.snapshot())


settings = Settings()
