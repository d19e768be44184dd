"""AUROC / Average Precision as exact, sort-based XLA computations.

Capability parity with ``/root/reference/src/metrics/metrics.py:372-450``:
the reference accumulates every batch's flattened predictions/targets on
the host and computes one sklearn ``roc_auc_score`` /
``average_precision_score`` over the whole epoch (plus per-batch values in
``batch_logs.csv``).

TPU-native design: per-batch values are computed *on device* with one sort
per batch — AUROC via tie-averaged ranks (Mann-Whitney U, exactly
sklearn's trapezoid value) and AP via tie-grouped cumulative
precision/recall (exactly sklearn's step-wise sum).

Epoch semantics follow the reference exactly (``metrics.py:424-432``):
the reference's ``AUC.evaluate_epoch`` returns ``value / num_batches``
— the MEAN of the per-(virtual-)batch sklearn scores over batches with
non-degenerate labels — so the epoch column here accumulates the
per-batch device values and their valid count.  An *additional*
``<name>_pooled`` column reports the whole-epoch pooled score from
device-side score histograms (``N_BINS`` exact int32 buckets over
[0, 1]; both metrics are rank statistics, so the only deviation from
the unbinned pooled value is score-quantization granularity) — this is
the epoch-exact value the reference never computes, kept because
mean-of-batch-AUCs is statistically biased at small batch counts.
"""
from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .base import MetricSpec

__all__ = ["auroc", "average_precision", "AUCSpec", "score_histogram",
           "auroc_from_counts", "average_precision_from_counts", "N_BINS"]

N_BINS = 65536


def score_histogram(scores, labels, n_bins: int = N_BINS,
                    squash: bool = False) -> Tuple[jax.Array, jax.Array]:
    """Positive/negative score-count histograms over [0, 1] (jittable).

    ``squash`` maps unbounded scores (logits) through a sigmoid first —
    AUROC and AP depend only on the score *ranking*, which any strictly
    monotone map preserves.
    """
    s = scores.reshape(-1).astype(jnp.float32)
    if squash:
        s = jax.nn.sigmoid(s)
    # int32 counts: exact to 2^31 per bin (f32 weights silently round
    # away +1 increments once a bin passes 2^24 ≈ 16.7M pixels, reachable
    # in one long segmentation epoch of saturated predictions)
    y = jnp.round(labels.reshape(-1).astype(jnp.float32)).astype(jnp.int32)
    idx = jnp.clip((s * n_bins).astype(jnp.int32), 0, n_bins - 1)
    pos = jnp.bincount(idx, weights=y, length=n_bins).astype(jnp.int32)
    neg = jnp.bincount(idx, weights=1 - y, length=n_bins).astype(jnp.int32)
    return pos, neg


def auroc_from_counts(pos: np.ndarray, neg: np.ndarray):
    """Tie-averaged rank AUROC from score histograms (host, numpy)."""
    pos = np.asarray(pos, np.float64)
    neg = np.asarray(neg, np.float64)
    p, n = pos.sum(), neg.sum()
    if p == 0 or n == 0:
        return 0.0, False
    cum_neg_below = np.cumsum(neg) - neg
    u = np.sum(pos * (cum_neg_below + 0.5 * neg))
    return float(u / (p * n)), True


def average_precision_from_counts(pos: np.ndarray, neg: np.ndarray):
    """Tie-grouped AP from score histograms (each bin = one tie group)."""
    pos = np.asarray(pos, np.float64)
    neg = np.asarray(neg, np.float64)
    p, total = pos.sum(), pos.sum() + neg.sum()
    if p == 0 or p == total:
        return 0.0, False
    pos_desc, neg_desc = pos[::-1], neg[::-1]
    tps = np.cumsum(pos_desc)
    fps = np.cumsum(neg_desc)
    precision = tps / np.maximum(tps + fps, 1.0)
    return float(np.sum(pos_desc / p * precision)), True


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
    """Binary AUROC / AP: exact per-batch values; the epoch column is the
    reference's mean over valid batches (``AUC.evaluate_epoch``,
    ``metrics.py:424-432``), plus an extra ``<name>_pooled`` column with
    the epoch-exact pooled score from device-side histograms."""

    KINDS = {"area_under_roc": auroc,
             "average_precision_score": average_precision}
    FROM_COUNTS = {"area_under_roc": auroc_from_counts,
                   "average_precision_score": average_precision_from_counts}

    def __init__(self, kind: str = "area_under_roc",
                 label_type: str = "mask"):
        assert kind in self.KINDS
        self.name = kind
        self.key = kind
        self.label_type = label_type
        self._fn = self.KINDS[kind]
        self._from_counts = self.FROM_COUNTS[kind]

    #: carry base for the two-word int32 bin accumulators: per-batch bin
    #: increments are bounded by the batch pixel count (< 2^24 even for
    #: batch-64 512² masks), so the low word never wraps before its carry
    #: is moved to the high word; total capacity ~2^60 counts per bin
    CARRY = 1 << 30

    def init_state(self):
        zeros = lambda: jnp.zeros((N_BINS,), jnp.int32)
        return {"pos": zeros(), "pos_hi": zeros(),
                "neg": zeros(), "neg_hi": zeros(),
                "sum": jnp.zeros((), jnp.float32),
                "count": jnp.zeros((), jnp.float32)}

    def _carry_add(self, lo, hi, add):
        lo = lo + add
        carry = lo // self.CARRY
        return lo - carry * self.CARRY, hi + carry

    def update(self, state, prediction, batch):
        target = batch[self.label_type]
        value, valid = self._fn(prediction, target)
        # squash=True: the prediction may be raw logits (final_activation
        # null) — the sigmoid is monotone so the rank statistics are
        # unchanged, and N_BINS=65536 keeps [0, 1]-prob inputs (which land
        # in sigma's [0.5, 0.73] band) at finer resolution than a direct
        # 8k-bin [0, 1] histogram
        pos, neg = score_histogram(prediction, target, squash=True)
        pos_lo, pos_hi = self._carry_add(state["pos"], state["pos_hi"], pos)
        neg_lo, neg_hi = self._carry_add(state["neg"], state["neg_hi"], neg)
        new_state = {"pos": pos_lo, "pos_hi": pos_hi,
                     "neg": neg_lo, "neg_hi": neg_hi,
                     "sum": state["sum"] + jnp.where(valid, value, 0.0),
                     "count": state["count"] + valid.astype(jnp.float32)}
        return new_state, {self.name: value}

    def finalize(self, host_state) -> Dict[str, float]:
        count = float(host_state["count"])
        epoch = float(host_state["sum"]) / count if count else 0.0
        rebuild = lambda lo, hi: (np.asarray(hi, np.float64) * self.CARRY
                                  + np.asarray(lo, np.float64))
        pooled, _ = self._from_counts(
            rebuild(host_state["pos"], host_state["pos_hi"]),
            rebuild(host_state["neg"], host_state["neg_hi"]))
        return {self.name: epoch, self.name + "_pooled": pooled}
