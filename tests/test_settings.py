"""Settings ContextVar overlay: nesting, thread and asyncio isolation."""

import asyncio
import threading

import pytest

import lotus_tpu
from lotus_tpu.settings import Settings


@pytest.fixture(autouse=True)
def reset():
    yield
    lotus_tpu.settings.configure(lm=None, enable_cache=False)


def test_configure_rejects_unknown_keys():
    with pytest.raises(ValueError, match="Invalid setting"):
        lotus_tpu.settings.configure(nonsense=True)


def test_context_overlay_and_restore():
    lotus_tpu.settings.configure(enable_cache=False)
    with lotus_tpu.settings.context(enable_cache=True):
        assert lotus_tpu.settings.enable_cache is True
        with lotus_tpu.settings.context(parallel_groupby_max_threads=2):
            assert lotus_tpu.settings.enable_cache is True  # nested keeps outer
            assert lotus_tpu.settings.parallel_groupby_max_threads == 2
        assert lotus_tpu.settings.parallel_groupby_max_threads == 8
    assert lotus_tpu.settings.enable_cache is False


def test_context_restores_on_exception():
    try:
        with lotus_tpu.settings.context(enable_cache=True):
            raise RuntimeError("boom")
    except RuntimeError:
        pass
    assert lotus_tpu.settings.enable_cache is False


def test_context_rejects_unknown_keys():
    with pytest.raises(ValueError):
        with lotus_tpu.settings.context(bogus=1):
            pass


def test_thread_isolation():
    results = {}

    def worker(tag, value):
        with lotus_tpu.settings.context(parallel_groupby_max_threads=value):
            import time

            time.sleep(0.05)
            results[tag] = lotus_tpu.settings.parallel_groupby_max_threads

    threads = [threading.Thread(target=worker, args=(i, i + 100)) for i in range(4)]
    [t.start() for t in threads]
    [t.join() for t in threads]
    assert results == {0: 100, 1: 101, 2: 102, 3: 103}
    assert lotus_tpu.settings.parallel_groupby_max_threads == 8


def test_asyncio_isolation():
    async def task(value):
        with lotus_tpu.settings.context(parallel_groupby_max_threads=value):
            await asyncio.sleep(0.01)
            return lotus_tpu.settings.parallel_groupby_max_threads

    async def main():
        return await asyncio.gather(task(11), task(22), task(33))

    assert asyncio.run(main()) == [11, 22, 33]
