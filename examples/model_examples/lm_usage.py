"""LM configuration: usage stats, limits, custom transports."""

from lotus_tpu.models import CallableTransport, LM
from lotus_tpu.types import UsageLimit

# Any callable can serve as the provider: here, a trivial local "model".
lm = LM(
    model="local/echo",
    transport=CallableTransport(lambda messages, **kw: messages[-1]["content"].upper()),
    virtual_usage_limit=UsageLimit(total_tokens_limit=10_000),
)

out = lm([[{"role": "user", "content": "hello world"}]])
print(out.outputs)
lm.print_total_usage()

# Real providers (requires litellm + API key):
#   lm = LM(model="gpt-4o-mini", rate_limit=60, tpm_limit=200_000)
