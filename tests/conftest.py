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


def _cpu_fingerprint():
    """Hash of this host's CPU identity, to key the compile cache.

    This VM migrates between physical hosts; XLA's persistent cache key
    does NOT cover the host CPU's feature set, so an executable cached on
    one host can SIGABRT mid-``block_until_ready`` on another (observed:
    sequence-dependent 'Fatal Python error: Aborted' in the suite).
    Keying the cache dir by CPU model+flags makes foreign-host entries
    unreachable instead of fatal.
    """
    import hashlib
    try:
        # family/model/stepping matter even when the virtualized
        # "model name" is a generic string: LLVM keys microarch
        # scheduling pseudo-features (prefer-no-gather/-scatter) off
        # them, and an executable AOT-compiled with a mismatched set
        # aborts at dispatch (observed: Sapphire→Emerald Rapids
        # migration with identical model name + flags).
        with open("/proc/cpuinfo") as f:
            lines = [ln for ln in f
                     if ln.startswith(("model name", "flags", "vendor_id",
                                       "cpu family", "model\t", "model :",
                                       "stepping"))]
        ident = "".join(sorted(set(lines)))
    except OSError:
        import platform
        ident = platform.processor() or platform.machine()
    return hashlib.sha256(ident.encode()).hexdigest()[:10]


# persistent compile cache: repeat suite runs skip most XLA CPU compiles
jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser(f"~/.cache/mst_jax_cache-{_cpu_fingerprint()}"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
try:
    jax.config.update("jax_num_cpu_devices", 8)
except AttributeError:  # older jax: the XLA_FLAGS path covers it
    pass

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_configure(config):
    # suite-hygiene marker (VERDICT r2 item 8): the five slowest tests
    # (~7.5 of the ~14 suite minutes — the multichip dryrun subprocess
    # alone is ~5) carry @pytest.mark.slow, so the edit-test loop can run
    # `pytest -m "not slow"` (~6.5 min). CI / round checks run the FULL
    # suite: plain `pytest tests/` includes them.
    config.addinivalue_line(
        "markers", "slow: long-running e2e/subprocess tests; deselect "
                   "with -m 'not slow' for the quick loop")


@pytest.fixture
def rng():
    return np.random.default_rng(0)


# ---------------------------------------------------------------------------
# reference-source imports (cross-framework parity tests)
# ---------------------------------------------------------------------------

#: packages genuinely absent from this image — ONLY these may be mocked.
#: Mocking installed ones (sympy, einops, scipy, ...) plants MagicMocks in
#: sys.modules that poison torch internals and every later test.
REFERENCE_MOCK_ROOTS = ("colorcet", "bokeh", "plotly", "albumentations",
                        "fvcore", "neptune", "timm", "nibabel",
                        "torchvision", "medpy")


def reference_import(*names):
    """Context manager importing modules from ``/root/reference/src`` with
    the genuinely-absent heavy deps mocked.

    Restores ``sys.modules`` on exit: both the MagicMocks and the
    reference's generic top-level module names (``utils``, ``data``,
    ``metrics``, ...) must not leak into the rest of the suite.
    """
    import contextlib
    import importlib
    import importlib.abc
    import importlib.util
    import sys
    from unittest.mock import MagicMock

    class _Loader(importlib.abc.Loader):
        def create_module(self, spec):
            mod = MagicMock()
            mod.__name__ = spec.name
            mod.__path__ = []
            mod.__spec__ = spec
            return mod

        def exec_module(self, module):
            pass

    class _Finder(importlib.abc.MetaPathFinder):
        def find_spec(self, fullname, path=None, target=None):
            if fullname.split(".")[0] in REFERENCE_MOCK_ROOTS:
                return importlib.util.spec_from_loader(
                    fullname, _Loader(), is_package=True)
            return None

    @contextlib.contextmanager
    def ctx():
        finder = _Finder()
        before = set(sys.modules)
        sys.meta_path.insert(0, finder)
        sys.path.insert(0, "/root/reference/src")
        try:
            yield tuple(importlib.import_module(n) for n in names)
        finally:
            sys.meta_path.remove(finder)
            sys.path.remove("/root/reference/src")
            for name in set(sys.modules) - before:
                mod = sys.modules.get(name)
                src = getattr(mod, "__file__", "") or ""
                is_mock = name.split(".")[0] in REFERENCE_MOCK_ROOTS
                # only drop the MagicMocks and the reference's own
                # modules; popping third-party modules imported lazily
                # inside the context (torch._inductor & co) breaks their
                # re-import (duplicate TORCH_LIBRARY registrations)
                if is_mock or src.startswith("/root/reference/"):
                    sys.modules.pop(name, None)

    return ctx()
