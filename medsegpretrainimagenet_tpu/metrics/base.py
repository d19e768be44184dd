"""Metric protocol: device-side accumulator state + host finalisation.

The reference mutates Python metric objects per batch fragment
(``/root/reference/src/metrics/metric_wrapper.py``), pulling tensors to the
CPU inside the hot loop.  TPU-native design: every metric is a **spec**
owning a slice of a device-side state pytree; ``update`` is a pure jittable
function folded into the train/eval step (no host sync per batch), and
``finalize`` runs on host numpy once per epoch.

State dtypes: counters are float32 — epoch pixel counts reach ~1e9 where
f32 ulp is ~64, giving relative error ~3e-5, far below the 0.005 Dice
tolerance the reference publishes across seeds (BASELINE.md), while keeping
the train step free of emulated 64-bit arithmetic on TPU.
"""
from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import jax
import numpy as np

__all__ = ["MetricSpec", "threshold_tag", "snake_name"]


from ..utils.naming import snake_name  # noqa: E402 — re-exported


def threshold_tag(threshold: float) -> str:
    """Format a threshold exactly like the reference string-formats it."""
    return str(threshold)


class MetricSpec:
    """One metric (or a shared parent accumulator like a confusion matrix).

    Subclasses define:

    * ``key``: unique state key in the calculator's state dict
    * ``init_state() -> pytree`` of device arrays
    * ``update(state, prediction, batch) -> (state, per_batch: dict)`` —
      jittable; ``per_batch`` values are 0-dim device arrays logged per
      optimizer step
    * ``finalize(host_state) -> dict[str, float]`` — host-side epoch values
    """

    key: str = "metric"
    requires_last_pass: bool = False
    evaluate_at_end: Optional[Callable] = None

    def init_state(self):
        raise NotImplementedError

    def update(self, state, prediction, batch: Dict[str, Any]):
        raise NotImplementedError

    def finalize(self, host_state) -> Dict[str, float]:
        raise NotImplementedError

    # metrics that only *read* another spec's state (CM-derived family)
    reads: Tuple[str, ...] = ()

    def finalize_from(self, own_state, read_states: Dict[str, Any]) -> Dict[str, float]:
        """Finalize with access to the states this spec ``reads``."""
        return self.finalize(own_state)
