"""Caching: operator-level result cache + pluggable backends.

Semantics follow the reference (``lotus/cache.py:21-337``):

- ``operator_cache`` wraps a semantic operator's ``__call__``; the key is a
  SHA-256 over (serialized DataFrame, args, kwargs).  A hit replays the
  recorded *virtual* usage delta so cost accounting stays truthful even when
  no LM call happens.
- Backends: in-memory LRU, SQLite (thread-local connections, LRU eviction by
  last-access time), pickle-file.
"""

from __future__ import annotations

import copy
import hashlib
import json
import os
import pickle
import sqlite3
import threading
import time
from abc import ABC, abstractmethod
from collections import OrderedDict
from enum import Enum
from functools import wraps
from typing import Any, Callable

import pandas as pd
from pydantic import BaseModel

import lotus_tpu


def _serialize(value: Any) -> Any:
    """Normalize a value into JSON-serializable form for cache keys."""
    if value is None or isinstance(value, (str, int, float, bool)):
        return value
    if isinstance(value, pd.DataFrame):
        return value.to_json(orient="split")
    if isinstance(value, pd.Series):
        return value.to_json()
    if isinstance(value, BaseModel):
        return _serialize(value.model_dump())
    if isinstance(value, type) and issubclass(value, BaseModel):
        return _serialize(value.model_json_schema())
    if isinstance(value, Enum):
        return str(value)
    if isinstance(value, (list, tuple)):
        return [_serialize(v) for v in value]
    if isinstance(value, dict):
        return {k: _serialize(v) for k, v in value.items()}
    if hasattr(value, "dict") and callable(getattr(value, "dict")):
        return value.dict()
    if hasattr(value, "__dict__"):
        return {k: _serialize(v) for k, v in vars(value).items() if not k.startswith("_")}
    lotus_tpu.logger.warning(f"Unsupported type {type(value)} for cache-key serialization; using str().")
    return str(value)


def operator_cache(func: Callable) -> Callable:
    """Cache a semantic operator's result keyed on its full inputs."""

    @wraps(func)
    def wrapper(self, *args, **kwargs):
        from lotus_tpu.settings import settings

        model = settings.lm
        if not (settings.enable_cache and model is not None and model.cache is not None):
            return func(self, *args, **kwargs)

        payload = {
            "self": _serialize(self._obj),
            "args": [_serialize(a) for a in args],
            "kwargs": {k: _serialize(v) for k, v in kwargs.items()},
        }
        cache_key = hashlib.sha256(json.dumps(payload, sort_keys=True).encode()).hexdigest()
        usage_key = cache_key + "_usage"

        cached = model.cache.get(cache_key)
        if cached is not None:
            model.stats.operator_cache_hits += 1
            cached_usage = model.cache.get(usage_key)
            if cached_usage is not None:
                model.stats.virtual_usage += cached_usage
            return cached

        usage_before = copy.deepcopy(model.stats.virtual_usage)
        result = func(self, *args, **kwargs)
        model.cache.insert(usage_key, model.stats.virtual_usage - usage_before)
        model.cache.insert(cache_key, result)
        return result

    return wrapper


class CacheType(Enum):
    IN_MEMORY = "in_memory"
    SQLITE = "sqlite"
    PICKLE_FILE = "pickle_file"


class CacheConfig:
    def __init__(self, cache_type: CacheType, max_size: int, **kwargs: Any):
        self.cache_type = cache_type
        self.max_size = max_size
        self.kwargs = kwargs


class Cache(ABC):
    def __init__(self, max_size: int):
        self.max_size = max_size

    @abstractmethod
    def get(self, key: str) -> Any | None: ...

    @abstractmethod
    def insert(self, key: str, value: Any) -> None: ...

    @abstractmethod
    def reset(self, max_size: int | None = None) -> None: ...


class InMemoryCache(Cache):
    """Thread-safe LRU dict cache."""

    def __init__(self, max_size: int = 1024):
        super().__init__(max_size)
        self._store: OrderedDict[str, Any] = OrderedDict()
        self._lock = threading.Lock()

    def get(self, key: str) -> Any | None:
        with self._lock:
            if key not in self._store:
                return None
            self._store.move_to_end(key)
            return self._store[key]

    def insert(self, key: str, value: Any) -> None:
        with self._lock:
            self._store[key] = value
            self._store.move_to_end(key)
            while len(self._store) > self.max_size:
                self._store.popitem(last=False)

    def reset(self, max_size: int | None = None) -> None:
        with self._lock:
            self._store.clear()
            if max_size is not None:
                self.max_size = max_size

    # Picklable (LazyFrame.save reaches the default cache through source
    # refs): drop the lock and the volatile contents.
    def __getstate__(self) -> dict:
        return {"max_size": self.max_size}

    def __setstate__(self, state: dict) -> None:
        self.__init__(max_size=state.get("max_size", 1024))


class SQLiteCache(Cache):
    """SQLite-backed cache with per-thread connections and last-access LRU
    eviction."""

    def __init__(self, max_size: int = 4096, cache_dir: str | None = None):
        super().__init__(max_size)
        cache_dir = cache_dir or os.path.expanduser("~/.lotus_tpu/cache")
        os.makedirs(cache_dir, exist_ok=True)
        self.db_path = os.path.join(cache_dir, "lotus_cache.db")
        self._local = threading.local()
        with self._conn() as conn:
            conn.execute(
                "CREATE TABLE IF NOT EXISTS cache ("
                " key TEXT PRIMARY KEY, value BLOB, last_accessed REAL)"
            )

    def _conn(self) -> sqlite3.Connection:
        conn = getattr(self._local, "conn", None)
        if conn is None:
            conn = sqlite3.connect(self.db_path)
            self._local.conn = conn
        return conn

    def get(self, key: str) -> Any | None:
        conn = self._conn()
        row = conn.execute("SELECT value FROM cache WHERE key = ?", (key,)).fetchone()
        if row is None:
            return None
        conn.execute("UPDATE cache SET last_accessed = ? WHERE key = ?", (time.time(), key))
        conn.commit()
        try:
            return pickle.loads(row[0])
        except Exception:
            return None

    def insert(self, key: str, value: Any) -> None:
        conn = self._conn()
        try:
            blob = pickle.dumps(value)
        except Exception:
            lotus_tpu.logger.warning(f"Value for {key} is not picklable; skipping cache insert.")
            return
        conn.execute(
            "INSERT OR REPLACE INTO cache (key, value, last_accessed) VALUES (?, ?, ?)",
            (key, blob, time.time()),
        )
        n = conn.execute("SELECT COUNT(*) FROM cache").fetchone()[0]
        if n > self.max_size:
            conn.execute(
                "DELETE FROM cache WHERE key IN ("
                " SELECT key FROM cache ORDER BY last_accessed ASC LIMIT ?)",
                (n - self.max_size,),
            )
        conn.commit()

    def reset(self, max_size: int | None = None) -> None:
        conn = self._conn()
        conn.execute("DELETE FROM cache")
        conn.commit()
        if max_size is not None:
            self.max_size = max_size


class PickleFileCache(Cache):
    """One pickle file per entry under a cache directory."""

    def __init__(self, max_size: int = 4096, cache_dir: str | None = None):
        super().__init__(max_size)
        self.cache_dir = cache_dir or os.path.expanduser("~/.lotus_tpu/pickle_cache")
        os.makedirs(self.cache_dir, exist_ok=True)
        self._lock = threading.Lock()

    def _path(self, key: str) -> str:
        return os.path.join(self.cache_dir, f"{key}.pkl")

    def get(self, key: str) -> Any | None:
        path = self._path(key)
        if not os.path.exists(path):
            return None
        try:
            with open(path, "rb") as f:
                return pickle.load(f)
        except Exception:
            return None

    def insert(self, key: str, value: Any) -> None:
        with self._lock:
            try:
                with open(self._path(key), "wb") as f:
                    pickle.dump(value, f)
            except Exception:
                lotus_tpu.logger.warning(f"Could not pickle value for {key}; skipping cache insert.")

    def reset(self, max_size: int | None = None) -> None:
        with self._lock:
            for name in os.listdir(self.cache_dir):
                if name.endswith(".pkl"):
                    os.remove(os.path.join(self.cache_dir, name))
            if max_size is not None:
                self.max_size = max_size


class CacheFactory:
    @staticmethod
    def create_cache(config: CacheConfig) -> Cache:
        if config.cache_type == CacheType.IN_MEMORY:
            return InMemoryCache(max_size=config.max_size)
        if config.cache_type == CacheType.SQLITE:
            return SQLiteCache(max_size=config.max_size, cache_dir=config.kwargs.get("cache_dir"))
        if config.cache_type == CacheType.PICKLE_FILE:
            return PickleFileCache(max_size=config.max_size, cache_dir=config.kwargs.get("cache_dir"))
        raise ValueError(f"Unknown cache type: {config.cache_type}")

    @staticmethod
    def create_default_cache(max_size: int = 1024) -> Cache:
        return InMemoryCache(max_size=max_size)
