"""Test harness: force an 8-device virtual CPU mesh before JAX loads.

Mirrors SURVEY.md §4(d): multi-chip sharding is validated on a host-platform
device mesh (`--xla_force_host_platform_device_count=8`), so the suite runs
anywhere while exercising the same pjit/NamedSharding code paths as a real
TPU slice.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
