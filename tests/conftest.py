"""Test harness: force an 8-device virtual CPU mesh before importing JAX.

Multi-chip sharding paths are validated on fake CPU devices
(``xla_force_host_platform_device_count``); the real TPU chip is reserved
for benches.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"
