"""Test harness: force an 8-device virtual CPU mesh before any test runs.

Multi-chip sharding paths are validated on fake CPU devices
(``xla_force_host_platform_device_count``); the real TPU chip is reserved
for benches. An environment sitecustomize may pre-register a TPU plugin
and pin ``jax_platforms`` — override through jax.config, which wins as
long as no backend has been initialized yet.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: multi-process / long-compile tests"
    )
