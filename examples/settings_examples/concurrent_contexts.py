"""settings.context gives each thread / asyncio task an isolated overlay."""

import asyncio
import threading

import lotus_tpu
from lotus_tpu.models import make_fake_lm

lotus_tpu.settings.configure(lm=make_fake_lm(responder=lambda p, m, **kw: "main"), enable_cache=False)


def worker(tag: str, results: dict):
    with lotus_tpu.settings.context(lm=make_fake_lm(responder=lambda p, m, **kw: tag)):
        results[tag] = lotus_tpu.settings.lm([[{"role": "user", "content": "hi"}]]).outputs[0]


results: dict = {}
threads = [threading.Thread(target=worker, args=(f"thread-{i}", results)) for i in range(3)]
[t.start() for t in threads]
[t.join() for t in threads]
print("thread isolation:", results)


async def amain():
    async def task(tag):
        with lotus_tpu.settings.context(enable_cache=True):
            assert lotus_tpu.settings.enable_cache is True
            await asyncio.sleep(0)
        return tag

    print("async isolation ok:", await asyncio.gather(*[task(f"t{i}") for i in range(3)]))
    assert lotus_tpu.settings.enable_cache is False


asyncio.run(amain())
