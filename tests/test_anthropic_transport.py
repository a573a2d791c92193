"""AnthropicTransport: message conversion, retry policy, normalization —
fully offline (urlopen faked)."""

from __future__ import annotations

import io
import json
import urllib.error

import pytest

from lotus_tpu.models.anthropic_transport import AnthropicTransport


def make_transport(**kw) -> AnthropicTransport:
    return AnthropicTransport(base_url="http://fake", api_key="k", **kw)


def fake_response(text="hi", stop="end_turn", in_tok=3, out_tok=2):
    return {
        "model": "claude-test",
        "content": [{"type": "text", "text": text}],
        "stop_reason": stop,
        "usage": {"input_tokens": in_tok, "output_tokens": out_tok,
                  "cache_read_input_tokens": 1, "cache_creation_input_tokens": 0},
    }


class _Resp:
    def __init__(self, payload: dict):
        self._data = json.dumps(payload).encode()

    def read(self):
        return self._data

    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False


def test_system_turn_lifted_and_parts_converted(monkeypatch):
    captured = {}

    def fake_urlopen(req, timeout=None):
        captured["body"] = json.loads(req.data)
        return _Resp(fake_response())

    monkeypatch.setattr("urllib.request.urlopen", fake_urlopen)
    t = make_transport()
    msgs = [
        {"role": "system", "content": "be brief"},
        {"role": "user", "content": [
            {"type": "text", "text": "look:"},
            {"type": "image_url", "image_url": {"url": "data:image/jpeg;base64,QUJD"}},
        ]},
    ]
    out = t.complete_batch("claude-test", [msgs], temperature=0.0, max_completion_tokens=64)
    body = captured["body"]
    assert body["system"] == "be brief"
    assert body["max_tokens"] == 64 and body["temperature"] == 0.0
    assert [m["role"] for m in body["messages"]] == ["user"]
    parts = body["messages"][0]["content"]
    assert parts[0] == {"type": "text", "text": "look:"}
    assert parts[1]["source"] == {"type": "base64", "media_type": "image/jpeg", "data": "QUJD"}
    assert out[0].text == "hi"
    assert out[0].usage.prompt_tokens == 3 and out[0].usage.cached_prompt_tokens == 1
    assert out[0].finish_reason == "end_turn"


def test_litellm_provider_prefix_stripped(monkeypatch):
    captured = {}

    def fake_urlopen(req, timeout=None):
        captured["body"] = json.loads(req.data)
        return _Resp(fake_response())

    monkeypatch.setattr("urllib.request.urlopen", fake_urlopen)
    make_transport().complete_batch("anthropic/claude-x", [[{"role": "user", "content": "q"}]])
    assert captured["body"]["model"] == "claude-x"


def test_retry_on_529_then_success(monkeypatch):
    calls = {"n": 0}

    def fake_urlopen(req, timeout=None):
        calls["n"] += 1
        if calls["n"] < 3:
            raise urllib.error.HTTPError("u", 529, "overloaded", {}, io.BytesIO(b"{}"))
        return _Resp(fake_response(text="ok"))

    monkeypatch.setattr("urllib.request.urlopen", fake_urlopen)
    monkeypatch.setattr("time.sleep", lambda s: None)
    t = make_transport()
    out = t.complete_batch("claude-test", [[{"role": "user", "content": "q"}]])
    assert out[0].text == "ok" and calls["n"] == 3 and t.retry_count == 2


def test_non_retryable_status_raises_with_detail(monkeypatch):
    def fake_urlopen(req, timeout=None):
        raise urllib.error.HTTPError("u", 400, "bad", {}, io.BytesIO(b'{"error":"nope"}'))

    monkeypatch.setattr("urllib.request.urlopen", fake_urlopen)
    with pytest.raises(RuntimeError, match="400"):
        make_transport().complete_batch("claude-test", [[{"role": "user", "content": "q"}]])


def test_retry_budget_exhausted_raises(monkeypatch):
    def fake_urlopen(req, timeout=None):
        raise urllib.error.HTTPError("u", 503, "down", {}, io.BytesIO(b"{}"))

    monkeypatch.setattr("urllib.request.urlopen", fake_urlopen)
    monkeypatch.setattr("time.sleep", lambda s: None)
    with pytest.raises(RuntimeError, match="503"):
        make_transport(max_retries=2).complete_batch(
            "claude-test", [[{"role": "user", "content": "q"}]]
        )


def test_logprobs_request_rejected():
    with pytest.raises(ValueError, match="logprobs"):
        make_transport().complete_batch(
            "claude-test", [[{"role": "user", "content": "q"}]], logprobs=True
        )


def test_missing_key_raises(monkeypatch):
    monkeypatch.delenv("ANTHROPIC_API_KEY", raising=False)
    # ValueError (configuration), NOT ImportError (optional-dependency).
    with pytest.raises(ValueError, match="API key"):
        AnthropicTransport(base_url="http://fake")


def test_sampling_kwargs_forwarded_and_unknown_warned(monkeypatch, caplog):
    captured = {}

    def fake_urlopen(req, timeout=None):
        captured["body"] = json.loads(req.data)
        return _Resp(fake_response())

    monkeypatch.setattr("urllib.request.urlopen", fake_urlopen)
    t = make_transport()
    t.complete_batch(
        "claude-test", [[{"role": "user", "content": "q"}]],
        top_p=0.5, stop="END", frobnicate=1,
    )
    assert captured["body"]["top_p"] == 0.5
    assert captured["body"]["stop_sequences"] == ["END"]
    assert "frobnicate" not in captured["body"]


def test_lm_default_transport_falls_back_to_anthropic(monkeypatch):
    """Without litellm, LM('claude-…') must pick AnthropicTransport when a
    key is present (the SDK-free environment path)."""
    try:
        import litellm  # noqa: F401

        pytest.skip("litellm installed: the default transport is litellm")
    except ImportError:
        pass
    monkeypatch.setenv("ANTHROPIC_API_KEY", "k")
    from lotus_tpu.models import LM

    lm = LM("claude-test")
    assert type(lm.transport).__name__ == "AnthropicTransport"
