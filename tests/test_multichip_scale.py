"""Multi-chip shape calculus beyond the 8-device conftest mesh.

The conftest pins the in-process backend to 8 virtual CPU devices, so
16- and 32-device meshes run in pristine subprocesses (the same
re-exec + rendezvous-hardening contract as ``__graft_entry__``).  Each
child executes ``_dryrun_impl(n, flagship=False)`` — the EXACT mesh
shape calculus the driver dryrun uses (dp×tp with tp=2, dp×pp with
8 pipe stages at n>=16 and ``shard_io``, dp×sp with spatial=4) on a
depth-2 toy U-Net, so baked-in-8 assumptions (divisibility, stage
counts, halo layouts) are exercised at slice-like device counts inside
the suite's time envelope.  The FULL flagship ``dryrun_multichip(16)``
(depth-4 U-Net at 64², dp8×tp2 + dp2×pp8 + dp4×sp4) also passes,
measured 349.5 s wall on this 1-core host (r4, 2026-08-20) — too slow
for the suite, hence the toy-model variant here.  Equivalent being scaled: the reference's
whole parallelism story is ``torch.nn.DataParallel``
(``/root/reference/src/train_model.py:192-194``); this framework claims
slice-scale readiness, which must not silently mean "8".
"""
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_RENDEZVOUS_FLAGS = (
    "--xla_cpu_collective_timeout_seconds=600"
    " --xla_cpu_collective_call_terminate_timeout_seconds=600")


def _run_child(n_devices: int, timeout: float = 560.0) -> None:
    code = (
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        f"jax.config.update('jax_num_cpu_devices', {n_devices})\n"
        "jax.config.update('jax_enable_compilation_cache', False)\n"
        "import __graft_entry__\n"
        f"__graft_entry__._dryrun_impl({n_devices}, flagship=False)\n"
        "print('SCALE_OK')\n"
    )
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    flags = env.get("XLA_FLAGS", "")
    if "xla_cpu_collective_timeout_seconds" not in flags:
        env["XLA_FLAGS"] = (flags + " " + _RENDEZVOUS_FLAGS).strip()
    env["JAX_ENABLE_COMPILATION_CACHE"] = "false"
    for attempt in range(2):
        proc = subprocess.run([sys.executable, "-c", code], cwd=REPO,
                              env=env, capture_output=True, text=True,
                              timeout=timeout)
        if proc.returncode == 0:
            assert "SCALE_OK" in proc.stdout
            return
        if proc.returncode >= 0 or attempt:
            raise AssertionError(
                f"{n_devices}-device scale child failed "
                f"(rc={proc.returncode}): {proc.stderr[-2000:]}")
        # signal death = XLA CPU rendezvous abort class; retry once


def test_16_device_mesh():
    """dp8×tp2 toy train step + dp2×pp8 (shard_io) + dp4×sp4 at 16
    virtual devices."""
    _run_child(16)


@pytest.mark.slow
def test_32_device_mesh():
    """dp16×tp2 + dp4×pp8 (shard_io) + dp8×sp4 at 32 virtual devices —
    32 device threads on this 1-core host serialize hard, so slow-marked."""
    _run_child(32)
