"""Test harness: force an 8-device virtual CPU mesh before JAX backends init.

Mirrors SURVEY.md §4(d): multi-chip sharding is validated on a host-platform
device mesh, so the suite runs anywhere while exercising the same
pjit/NamedSharding code paths as a real TPU slice.

Note: this environment's sitecustomize pins ``JAX_PLATFORMS=axon`` (the real
TPU tunnel), so the platform must be overridden programmatically — env vars
alone are not honoured.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# persistent compile cache: repeat suite runs skip most XLA CPU compiles
jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/mst_jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
try:
    jax.config.update("jax_num_cpu_devices", 8)
except AttributeError:  # older jax: the XLA_FLAGS path covers it
    pass

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
