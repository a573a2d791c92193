"""Test configuration: force CPU with 8 virtual devices BEFORE any test runs.

Mirrors the survey's test discipline (SURVEY.md §4): kernels are validated
against numpy oracles on CPU; sharding is validated on a simulated
multi-device mesh via --xla_force_host_platform_device_count.

Note: the environment presets JAX_PLATFORMS=axon (a live TPU); the env var
alone does not reliably override the plugin, so we also set the jax config
flag directly before any device backend is initialized.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
