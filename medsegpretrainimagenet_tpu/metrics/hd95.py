"""HD95 (95th-percentile symmetric surface distance) as a jittable XLA op.

Capability parity with ``/root/reference/src/metrics/metrics.py:304-369`` +
the vendored medpy surface-distance code (``medpy_metrics.py:358-403,
1199-1231``): borders extracted by cross-shaped binary erosion, exact
Euclidean distance transform, 95th percentile (linear interpolation) of the
symmetric surface distances, with samples skipped when either mask is empty.

TPU-native design: the reference pulls every mask/prediction to the CPU and
runs scipy per sample — a major sync cost (SURVEY.md §3.2).  Here the
distance transform is an exact two-pass separable EDT built from cumulative
minima (horizontal pass) and a broadcast parabola minimisation (vertical
pass), entirely in XLA; the masked percentile is a sort + dynamic gather.
Everything stays on device; one scalar pair per batch reaches the state.
"""
from __future__ import annotations

from functools import partial
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from .base import MetricSpec, threshold_tag

__all__ = ["edt", "border", "hd95_single", "HD95Spec"]

_BIG = 1.0e9


def _last_axis_pass(mask, step: float = 1.0):
    """1D distance (``step * |Δindex|``) to the nearest True element along
    the LAST axis, any rank — two cumulative minima, O(n)."""
    n = mask.shape[-1]
    last = mask.ndim - 1          # lax.cummin rejects negative axes
    d0 = jnp.where(mask, 0.0, _BIG)
    pos = jnp.arange(n, dtype=jnp.float32) * step
    fwd = jax.lax.cummin(d0 - pos, axis=last) + pos   # min_{k<=j} d0+p_j-p_k
    bwd = (jax.lax.cummin((d0 + pos)[..., ::-1], axis=last)[..., ::-1] - pos)
    return jnp.minimum(fwd, bwd)


def _parabola_pass(d2, axis: int, step: float):
    """Exact 1D squared-distance transform along *axis* given squared
    distances from the previous passes: the lower envelope of parabolas
    ``d2[k] + (step*(i-k))^2``, evaluated by a broadcast min — O(n^2 m)
    fused multiply-adds, which the VPU eats for typical medical masks."""
    moved = jnp.moveaxis(d2, axis, 0)
    n = moved.shape[0]
    flat = moved.reshape(n, -1)
    pos = jnp.arange(n, dtype=jnp.float32) * step
    dk2 = (pos[:, None] - pos[None, :]) ** 2              # (i, k)
    out = jnp.min(dk2[:, :, None] + flat[None, :, :], axis=1)
    return jnp.moveaxis(out.reshape(moved.shape), 0, axis)


def edt(mask, spacing=None):
    """Exact Euclidean distance from every element to the nearest True one.

    Boolean array of any rank -> float32 distances (empty masks give huge
    values).  ``spacing`` is the per-axis element spacing (scalar or
    length-ndim sequence; medpy's ``voxelspacing``), default unit.

    TPU-native separable EDT (Felzenszwalb applied to squared distances
    axis by axis, all in XLA): the last axis resolves in O(n) via two
    cumulative minima; every other axis applies the exact parabola
    lower-envelope pass.  2D keeps the original two-pass structure
    (vs-scipy tests in ``tests/test_metrics.py``)."""
    nd = mask.ndim
    if spacing is None:
        steps = (1.0,) * nd
    else:
        steps = tuple(float(s) for s in np.broadcast_to(
            np.asarray(spacing, dtype=np.float64), (nd,)))
    g = _last_axis_pass(mask, steps[-1])
    d2 = jnp.minimum(g, _BIG) ** 2
    for axis in range(nd - 2, -1, -1):
        d2 = _parabola_pass(d2, axis, steps[axis])
    return jnp.sqrt(d2)


def _structure_offsets(nd: int, connectivity: int):
    """Offsets of scipy's ``generate_binary_structure(nd, connectivity)``:
    neighbours within L1 distance <= connectivity (the centre excluded)."""
    import itertools
    return [off for off in itertools.product((-1, 0, 1), repeat=nd)
            if any(off) and sum(abs(o) for o in off) <= connectivity]


@partial(jax.jit, static_argnames=("connectivity",))
def object_border(mask, connectivity: int = 1):
    """1-element border line of the binary objects: ``mask ^ erosion(mask)``
    with scipy's connectivity-*c* structure and a zero boundary
    (medpy_metrics.py:1222-1224).  N-dimensional; the erosion unrolls to
    one shifted-slice AND per structure offset, which XLA fuses into a
    single elementwise kernel."""
    mask = mask.astype(bool)
    nd = mask.ndim
    padded = jnp.pad(mask, 1, constant_values=False)
    eroded = mask
    for off in _structure_offsets(nd, connectivity):
        shifted = tuple(slice(1 + o, (-1 + o) or None) for o in off)
        eroded = eroded & padded[shifted]
    return mask & ~eroded


def border(mask):
    """Object border: pixels that do not survive a cross-shaped erosion
    (medpy: ``binary_erosion`` with connectivity-1 structure, zero border).
    Alias of :func:`object_border` at connectivity 1."""
    return object_border(mask, 1)


def _masked_percentile(values, valid, q: float):
    """q-th percentile (linear interpolation) of ``values[valid]``."""
    flat = jnp.where(valid.reshape(-1), values.reshape(-1), jnp.inf)
    ordered = jnp.sort(flat)
    n = jnp.sum(valid)
    pos = q / 100.0 * jnp.maximum(n - 1, 0).astype(jnp.float32)
    lo = jnp.floor(pos).astype(jnp.int32)
    hi = jnp.ceil(pos).astype(jnp.int32)
    frac = pos - lo.astype(jnp.float32)
    v_lo = ordered[jnp.clip(lo, 0, flat.shape[0] - 1)]
    v_hi = ordered[jnp.clip(hi, 0, flat.shape[0] - 1)]
    return v_lo * (1.0 - frac) + v_hi * frac


def hd95_single(pred_mask, true_mask):
    """(hd95, valid) for one sample of binary (H, W) masks."""
    pred_mask = pred_mask.astype(bool)
    true_mask = true_mask.astype(bool)
    pb = border(pred_mask)
    tb = border(true_mask)
    dt_true = edt(tb)
    dt_pred = edt(pb)
    values = jnp.concatenate([dt_true.reshape(-1), dt_pred.reshape(-1)])
    valid = jnp.concatenate([pb.reshape(-1), tb.reshape(-1)])
    value = _masked_percentile(values, valid, 95.0)
    is_valid = jnp.any(true_mask) & jnp.any(pred_mask)
    return jnp.where(is_valid, value, 0.0), is_valid


class HD95Spec(MetricSpec):
    """Average HD95 over valid samples (reference
    ``ModifiedHausdorffDistance``): per batch, samples where either mask is
    empty are skipped; the epoch value averages the nonzero batch values."""

    def __init__(self, threshold: float = 0.5, label_type: str = "mask"):
        self.threshold = threshold
        self.label_type = label_type
        tag = threshold_tag(threshold)
        self.name = f"modified_hausdorff_distance_threshold_{tag}"
        self.key = self.name

    def init_state(self):
        return {"sum": jnp.zeros((), jnp.float32),
                "count": jnp.zeros((), jnp.float32)}

    def update(self, state, prediction, batch):
        target = batch[self.label_type]
        if prediction.ndim and prediction.shape[-1] == 1:
            prediction = prediction[..., 0]
        target = target.reshape(prediction.shape)
        pred_bin = prediction >= self.threshold
        values, valids = jax.lax.map(
            lambda ab: hd95_single(ab[0], ab[1]),
            (pred_bin, target.astype(bool)))
        num_valid = jnp.sum(valids)
        batch_value = jnp.where(
            num_valid > 0, jnp.sum(values) / jnp.maximum(num_valid, 1), 0.0)
        new_state = {
            "sum": state["sum"] + batch_value,
            "count": state["count"] + (batch_value != 0).astype(jnp.float32),
        }
        return new_state, {self.name: batch_value}

    def finalize(self, host_state) -> Dict[str, float]:
        count = float(host_state["count"])
        if count == 0:
            return {self.name: 0.0}
        return {self.name: float(host_state["sum"]) / count}
