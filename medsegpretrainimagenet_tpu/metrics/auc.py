"""AUROC / Average Precision as exact, sort-based XLA computations.

Capability parity with ``/root/reference/src/metrics/metrics.py:372-450``:
per-(virtual-)batch AUROC (sklearn ``roc_auc_score``) and average precision
(sklearn ``average_precision_score``) over all flattened pixels, averaged
over the valid batches of the epoch; degenerate batches (all-positive /
all-negative targets) contribute 0 and are excluded from the average.

TPU-native design: the reference ships every batch's full prediction tensor
to the CPU and calls sklearn; here both metrics are computed *on device*
with one sort per batch — AUROC via tie-averaged ranks (Mann-Whitney U,
exactly sklearn's trapezoid value) and AP via tie-grouped cumulative
precision/recall (exactly sklearn's step-wise sum).  Only two scalars per
epoch ever reach the host.
"""
from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from .base import MetricSpec

__all__ = ["auroc", "average_precision", "AUCSpec"]


def _tie_groups(sorted_vals):
    """Group ids for runs of equal values in a sorted array (0-based)."""
    n = sorted_vals.shape[0]
    new_group = jnp.concatenate(
        [jnp.ones((1,), jnp.int32),
         (sorted_vals[1:] != sorted_vals[:-1]).astype(jnp.int32)])
    return jnp.cumsum(new_group) - 1  # (n,) in [0, n)


def auroc(scores, labels):
    """Tie-corrected rank AUROC == sklearn.metrics.roc_auc_score.

    Returns (value, valid): valid is False when labels are degenerate.
    """
    s = scores.reshape(-1).astype(jnp.float32)
    y = labels.reshape(-1).astype(jnp.float32)
    n = s.shape[0]
    order = jnp.argsort(s)
    s_sorted = s[order]
    y_sorted = y[order]
    gid = _tie_groups(s_sorted)
    pos_1n = jnp.arange(1, n + 1, dtype=jnp.float32)
    group_sum = jax.ops.segment_sum(pos_1n, gid, num_segments=n)
    group_cnt = jax.ops.segment_sum(jnp.ones_like(pos_1n), gid,
                                    num_segments=n)
    avg_rank = (group_sum / jnp.maximum(group_cnt, 1.0))[gid]
    p = jnp.sum(y)
    neg = n - p
    rank_sum_pos = jnp.sum(avg_rank * y_sorted)
    value = (rank_sum_pos - p * (p + 1) / 2.0) / jnp.maximum(p * neg, 1.0)
    valid = (p > 0) & (neg > 0)
    return jnp.where(valid, value, 0.0), valid


def average_precision(scores, labels):
    """Tie-grouped AP == sklearn.metrics.average_precision_score."""
    s = scores.reshape(-1).astype(jnp.float32)
    y = labels.reshape(-1).astype(jnp.float32)
    n = s.shape[0]
    order = jnp.argsort(-s)
    y_sorted = y[order]
    s_sorted = s[order]
    tps = jnp.cumsum(y_sorted)
    fps = jnp.cumsum(1.0 - y_sorted)
    p = jnp.sum(y)
    # threshold points = last index of each tie group (descending scores)
    is_end = jnp.concatenate(
        [(s_sorted[:-1] != s_sorted[1:]), jnp.ones((1,), bool)])
    gid = _tie_groups(-s_sorted)  # same grouping, descending
    group_pos = jax.ops.segment_sum(y_sorted, gid, num_segments=n)
    precision = tps / jnp.maximum(tps + fps, 1.0)
    # AP = sum over groups of (positives in group / P) * precision@group end
    contrib = jnp.where(is_end, group_pos[gid] / jnp.maximum(p, 1.0)
                        * precision, 0.0)
    value = jnp.sum(contrib)
    valid = (p > 0) & (p < n)
    return jnp.where(valid, value, 0.0), valid


class AUCSpec(MetricSpec):
    """Mean-over-valid-batches accumulator for AUROC / AP."""

    KINDS = {"area_under_roc": auroc,
             "average_precision_score": average_precision}

    def __init__(self, kind: str = "area_under_roc",
                 label_type: str = "mask"):
        assert kind in self.KINDS
        self.name = kind
        self.key = kind
        self.label_type = label_type
        self._fn = self.KINDS[kind]

    def init_state(self):
        return {"sum": jnp.zeros((), jnp.float32),
                "count": jnp.zeros((), jnp.float32)}

    def update(self, state, prediction, batch):
        value, valid = self._fn(prediction, batch[self.label_type])
        new_state = {
            "sum": state["sum"] + jnp.where(valid, value, 0.0),
            "count": state["count"] + valid.astype(jnp.float32),
        }
        return new_state, {self.name: value}

    def finalize(self, host_state) -> Dict[str, float]:
        count = float(host_state["count"])
        if count == 0:
            return {self.name: 0.0}
        return {self.name: float(host_state["sum"]) / count}
