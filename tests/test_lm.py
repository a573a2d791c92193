"""LM client: caching, rate limiting, usage accounting, logprob formatting."""

import math
import time

import pytest

import lotus_tpu
from lotus_tpu.models import LM, make_fake_lm
from lotus_tpu.models.fake import FakeTransport
from lotus_tpu.models.transport import Completion, CompletionUsage
from lotus_tpu.types import LotusUsageLimitException, TokenLogprob, TopLogprob, UsageLimit


@pytest.fixture(autouse=True)
def reset_settings():
    yield
    lotus_tpu.settings.configure(lm=None, enable_cache=False)


def msgs(text):
    return [{"role": "user", "content": text}]


def test_lm_basic_call_and_stats():
    lm = make_fake_lm(responder=lambda p, m, **kw: "out")
    out = lm([msgs("a"), msgs("b")])
    assert out.outputs == ["out", "out"]
    assert lm.stats.virtual_usage.total_tokens > 0
    assert lm.stats.physical_usage.total_tokens == lm.stats.virtual_usage.total_tokens


def test_message_cache_virtual_vs_physical():
    transport = FakeTransport(responder=lambda p, m, **kw: "x")
    lm = LM(model="fake/m", transport=transport)
    lotus_tpu.settings.configure(lm=lm, enable_cache=True)

    lm([msgs("same")])
    first_phys = lm.stats.physical_usage.total_tokens
    lm([msgs("same")])
    assert lm.stats.cache_hits == 1
    assert len(transport.calls) == 1  # second call served from cache
    assert lm.stats.physical_usage.total_tokens == first_phys  # no new physical
    assert lm.stats.virtual_usage.total_tokens == 2 * first_phys  # still accounted


def test_cache_preserves_order_with_mixed_hits():
    transport = FakeTransport(responder=lambda p, m, **kw: p)
    lm = LM(model="fake/m", transport=transport)
    lotus_tpu.settings.configure(lm=lm, enable_cache=True)
    lm([msgs("a")])
    out = lm([msgs("b"), msgs("a"), msgs("c")])
    assert out.outputs == ["b", "a", "c"]


def test_rate_limit_delays_between_batches():
    transport = FakeTransport(responder=lambda p, m, **kw: "x")
    lm = LM(model="fake/m", transport=transport, rate_limit=600, max_batch_size=2)
    t0 = time.time()
    lm([msgs(str(i)) for i in range(4)])  # 2 batches; 600rpm -> 0.1s/req
    elapsed = time.time() - t0
    assert elapsed >= 0.15  # first batch sleeps 2 * 0.1s


def test_tpm_limit_blocks_oversized_row():
    lm = LM(model="fake/m", transport=FakeTransport(), tpm_limit=600, max_tokens=512)
    with pytest.raises(ValueError, match="TPM"):
        lm([msgs("word " * 500)])


def test_usage_limit_virtual():
    lm = LM(
        model="fake/m",
        transport=FakeTransport(responder=lambda p, m, **kw: "y" * 400),
        virtual_usage_limit=UsageLimit(total_tokens_limit=50),
    )
    with pytest.raises(LotusUsageLimitException):
        lm([msgs("hello")])


def test_get_completion_response_format():
    from pydantic import BaseModel

    class Out(BaseModel):
        x: int

    lm = make_fake_lm(responder=lambda p, m, **kw: '{"x": 7}')
    parsed = lm.get_completion("sys", "user", response_format=Out)
    assert parsed.x == 7


def test_format_logprobs_for_filter_cascade():
    lm = make_fake_lm()
    logprobs = [[
        TokenLogprob(
            token="True",
            logprob=math.log(0.8),
            top_logprobs=[
                TopLogprob(token="True", logprob=math.log(0.8)),
                TopLogprob(token="False", logprob=math.log(0.2)),
            ],
        )
    ]]
    out = lm.format_logprobs_for_filter_cascade(logprobs)
    assert abs(out.positive_probs[0] - 0.8) < 1e-6


def test_format_logprobs_fallback_token_match():
    lm = make_fake_lm()
    logprobs = [[TokenLogprob(token="True", logprob=-0.1, top_logprobs=[])]]
    out = lm.format_logprobs_for_filter_cascade(logprobs)
    assert out.positive_probs == [1.0]


def test_reasoning_model_default_budget():
    assert LM(model="openai/gpt-5-mini", transport=FakeTransport()).max_tokens == 8192
    assert LM(model="gpt-4o-mini", transport=FakeTransport()).max_tokens == 512


def test_truncation_warning_logged(caplog):
    def responder(p, m, **kw):
        return Completion(text="partial", finish_reason="length", usage=CompletionUsage(1, 1, 2))

    lm = make_fake_lm(responder=responder)
    with caplog.at_level("WARNING"):
        lm([msgs("hi")])
    assert any("truncated" in r.message for r in caplog.records)


def test_callable_transport_order_and_exception_passthrough():
    """The batch adapter preserves order under parallelism, wraps bare
    strings in Completion, and surfaces worker exceptions to the caller."""
    import time

    from lotus_tpu.models.transport import CallableTransport, Completion

    def fn(messages, **kw):
        i = int(messages[-1]["content"])
        time.sleep(0.01 * (5 - i))  # later items finish first
        return str(i * 10)

    t = CallableTransport(fn)
    batch = [[{"role": "user", "content": str(i)}] for i in range(5)]
    out = t.complete_batch("m", batch, max_workers=5)
    assert [c.text for c in out] == ["0", "10", "20", "30", "40"]
    assert all(isinstance(c, Completion) for c in out)

    def boom(messages, **kw):
        raise RuntimeError("provider down")

    with pytest.raises(RuntimeError, match="provider down"):
        CallableTransport(boom).complete_batch("m", batch)


def test_usage_reporting_and_reset(capsys):
    lm = make_fake_lm(responder=lambda p, m, **kw: "four tokens of text")
    lm([[{"role": "user", "content": "count me"}]], show_progress_bar=False)
    assert lm.stats.virtual_usage.total_tokens > 0
    lm.print_total_usage()
    printed = capsys.readouterr().out
    assert "tokens" in printed.lower() or "usage" in printed.lower()
    lm.reset_stats()
    assert lm.stats.virtual_usage.total_tokens == 0
    assert lm.stats.physical_usage.total_tokens == 0
