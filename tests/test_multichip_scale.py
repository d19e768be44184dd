"""Multi-chip shape calculus beyond the 8-device conftest mesh.

The conftest pins the in-process backend to 8 virtual CPU devices, so
16- and 32-device meshes run in pristine subprocesses via the SAME
re-exec + rendezvous-hardening contract the driver uses
(``__graft_entry__._dryrun_subprocess`` — one source of truth for the
platform override, collective-timeout flags, cache disable, and
retry-on-signal).  Each child executes ``_dryrun_impl(n,
flagship=False)`` — the exact mesh shape calculus of the driver dryrun
(dp×tp with tp=2, dp×pp with 8 pipe stages at n>=16 and ``shard_io``,
dp×sp with spatial=4) on a depth-2 toy U-Net, so baked-in-8
assumptions (divisibility, stage counts, halo layouts) are exercised at
slice-like device counts inside the suite's time envelope.  The FULL
flagship ``dryrun_multichip(16)`` (depth-4 U-Net at 64², dp8×tp2 +
dp2×pp8 + dp4×sp4) also passes, measured 349.5 s wall on this 1-core
host (r4, 2026-08-20) — too slow for the suite, hence the toy-model
variant here.  Equivalent being scaled: the reference's whole
parallelism story is ``torch.nn.DataParallel``
(``/root/reference/src/train_model.py:192-194``); this framework claims
slice-scale readiness, which must not silently mean "8".
"""
import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import __graft_entry__  # noqa: E402


def _run_child(n_devices: int, timeout_s: float = 560.0) -> None:
    env_before = os.environ.get("MST_DRYRUN_TIMEOUT_S")
    os.environ["MST_DRYRUN_TIMEOUT_S"] = str(timeout_s)
    try:
        __graft_entry__._dryrun_subprocess(n_devices, flagship=False)
    finally:
        if env_before is None:
            os.environ.pop("MST_DRYRUN_TIMEOUT_S", None)
        else:
            os.environ["MST_DRYRUN_TIMEOUT_S"] = env_before


def test_16_device_mesh():
    """dp8×tp2 toy train step + dp2×pp8 (shard_io) + dp4×sp4 at 16
    virtual devices (~110 s on this host)."""
    _run_child(16)


@pytest.mark.slow
def test_32_device_mesh():
    """dp16×tp2 + dp4×pp8 (shard_io) + dp8×sp4 at 32 virtual devices —
    32 device threads on this 1-core host serialize hard, so slow-marked."""
    _run_child(32)
