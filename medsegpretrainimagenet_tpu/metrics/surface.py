"""Full surface-distance / overlap metric API (vendored-medpy parity).

Capability parity with the reference's vendored medpy code
(``/root/reference/src/metrics/medpy_metrics.py``; upstream
https://github.com/loli/medpy): the complete public surface — ``dc``,
``jc``, ``precision``, ``recall``, ``sensitivity``, ``specificity``,
``true_negative_rate``, ``true_positive_rate``,
``positive_predictive_value``, ``hd``, ``hd95``, ``assd``, ``asd``,
``ravd``, ``volume_correlation``, ``volume_change_correlation`` and the
object-correspondence family ``obj_assd`` / ``obj_asd`` / ``obj_fpr`` /
``obj_tpr``.  Only ``hd95`` is exercised by the reference's training loop
(``metrics.py:8``); the rest exists for analysis-script compatibility.

TPU-native design: the expensive part of every distance metric is the
Euclidean distance transform — computed on device by the separable XLA
EDT in :mod:`.hd95` (anisotropic ``voxelspacing`` supported), with border
extraction as an XLA erosion.  The cheap finalisation (masked
percentile / mean / max over the border pixels) runs in numpy with the
exact medpy semantics (``numpy.percentile`` linear interpolation).
Pearson correlations (with two-sided p-values) are computed natively via
``jax.scipy.special.betainc`` — no scipy dependency.  The ``obj_*``
family needs connected-component labelling, an inherently sequential
flood fill: it runs host-side via ``scipy.ndimage.label`` when scipy is
importable (identical C-scan-order labelings) with a pure-numpy flood
fill as fallback (these are offline analysis metrics, never inside the
jitted step).
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .hd95 import _structure_offsets, edt, object_border

__all__ = [
    "dc", "jc", "precision", "recall", "sensitivity", "specificity",
    "true_negative_rate", "true_positive_rate", "positive_predictive_value",
    "hd", "hd95", "assd", "asd", "ravd",
    "volume_correlation", "volume_change_correlation",
    "obj_assd", "obj_asd", "obj_fpr", "obj_tpr",
    "object_border", "surface_distances", "connected_components",
]


def _binary(x) -> np.ndarray:
    return np.atleast_1d(np.asarray(x)).astype(bool)


# ---------------------------------------------------------------------------
# overlap metrics (medpy_metrics.py:38-309)
# ---------------------------------------------------------------------------

@jax.jit
def _overlap_counts(result, reference):
    r = result.astype(bool).reshape(-1)
    g = reference.astype(bool).reshape(-1)
    return (jnp.sum(r & g), jnp.sum(r), jnp.sum(g),
            jnp.sum(r | g), jnp.sum(~r & ~g))


def _counts(result, reference) -> Tuple[float, ...]:
    return tuple(float(v) for v in
                 jax.device_get(_overlap_counts(_binary(result),
                                                _binary(reference))))


def dc(result, reference) -> float:
    """Dice coefficient 2|A∩B| / (|A|+|B|) (medpy_metrics.py:38);
    both-empty gives 0.0 (the reference catches the zero division)."""
    tp, n_r, n_g, _, _ = _counts(result, reference)
    return 2.0 * tp / (n_r + n_g) if n_r + n_g else 0.0


def jc(result, reference) -> float:
    """Jaccard coefficient |A∩B| / |A∪B| (medpy_metrics.py:87); an empty
    union raises ZeroDivisionError exactly like the reference."""
    tp, _, _, union, _ = _counts(result, reference)
    return tp / union  # ZeroDivisionError on empty union, like medpy


def precision(result, reference) -> float:
    """TP / (TP + FP) with empty-result -> 0.0 (medpy_metrics.py:122)."""
    tp, n_r, _, _, _ = _counts(result, reference)
    return tp / n_r if n_r else 0.0


def recall(result, reference) -> float:
    """TP / (TP + FN) with empty-reference -> 0.0 (medpy_metrics.py:169)."""
    tp, _, n_g, _, _ = _counts(result, reference)
    return tp / n_g if n_g else 0.0


def sensitivity(result, reference) -> float:
    """Alias of :func:`recall` (medpy_metrics.py:216)."""
    return recall(result, reference)


def specificity(result, reference) -> float:
    """TN / (TN + FP) (medpy_metrics.py:227), empty negatives -> 0.0."""
    _, n_r, n_g, union, tn = _counts(result, reference)
    total = tn + (n_r - (n_r + n_g - union))  # TN + FP
    return tn / total if total else 0.0


def true_negative_rate(result, reference) -> float:
    """Alias of :func:`specificity` (medpy_metrics.py:274)."""
    return specificity(result, reference)


def true_positive_rate(result, reference) -> float:
    """Alias of :func:`recall` (medpy_metrics.py:286)."""
    return recall(result, reference)


def positive_predictive_value(result, reference) -> float:
    """Alias of :func:`precision` (medpy_metrics.py:298)."""
    return precision(result, reference)


def ravd(result, reference) -> float:
    """Relative absolute volume difference (|R|-|G|)/|G|
    (medpy_metrics.py:569); empty reference raises RuntimeError."""
    _, n_r, n_g, _, _ = _counts(result, reference)
    if n_g == 0:
        raise RuntimeError(
            "The second supplied array does not contain any binary object.")
    return (n_r - n_g) / n_g


# ---------------------------------------------------------------------------
# surface distances (medpy_metrics.py:310-568, 1199-1231)
# ---------------------------------------------------------------------------

# _structure_offsets / object_border live in .hd95 (single N-D XLA
# implementation; hd95.border is its connectivity-1 alias)

def _border_np(mask: np.ndarray, connectivity: int) -> np.ndarray:
    """numpy twin of :func:`object_border` for the small-array host path."""
    padded = np.pad(mask, 1, constant_values=False)
    eroded = mask.copy()
    for off in _structure_offsets(mask.ndim, connectivity):
        shifted = tuple(slice(1 + o, (-1 + o) or None) for o in off)
        eroded &= padded[shifted]
    return mask & ~eroded


def _edt_np(mask: np.ndarray, spacing) -> np.ndarray:
    """numpy twin of the separable XLA EDT (same algorithm, float64):
    used for the many tiny per-object windows of the ``obj_*`` family,
    where jitting one XLA program per window shape would cost far more
    than the arithmetic."""
    nd = mask.ndim
    steps = (1.0,) * nd if spacing is None else tuple(
        float(s) for s in np.broadcast_to(
            np.asarray(spacing, dtype=np.float64), (nd,)))
    big = 1.0e9
    d2 = np.where(mask, 0.0, big ** 2)
    for axis in range(nd - 1, -1, -1):
        moved = np.moveaxis(d2, axis, 0)
        n = moved.shape[0]
        flat = moved.reshape(n, -1)
        pos = np.arange(n, dtype=np.float64) * steps[axis]
        dk2 = (pos[:, None] - pos[None, :]) ** 2
        out = np.min(dk2[:, :, None] + flat[None, :, :], axis=1)
        d2 = np.moveaxis(out.reshape(moved.shape), 0, axis)
    return np.sqrt(d2)


@partial(jax.jit, static_argnames=("connectivity", "spacing"))
def _border_and_dt(result, reference, spacing, connectivity):
    """(result border, EDT to the reference border) — the device part."""
    rb = object_border(result, connectivity)
    gb = object_border(reference, connectivity)
    return rb, edt(gb, None if spacing is None else spacing)


def surface_distances(result, reference, voxelspacing=None,
                      connectivity: int = 1) -> np.ndarray:
    """Distances from every surface voxel of ``result`` to the nearest
    surface voxel of ``reference`` (medpy_metrics.py:1199 — the directed
    building block of hd/hd95/asd/assd).  Raises RuntimeError when either
    input is empty, like the reference."""
    result, reference = _binary(result), _binary(reference)
    if not result.any():
        raise RuntimeError(
            "The first supplied array does not contain any binary object.")
    if not reference.any():
        raise RuntimeError(
            "The second supplied array does not contain any binary object.")
    spacing = None
    if voxelspacing is not None:
        spacing = tuple(float(s) for s in np.broadcast_to(
            np.asarray(voxelspacing, dtype=np.float64), (result.ndim,)))
    if result.size < 16384:
        # small arrays (and the many odd-shaped per-object windows of the
        # obj_* family) stay on host: one XLA compile per distinct window
        # shape would dwarf the arithmetic
        rb = _border_np(result, connectivity)
        dt = _edt_np(_border_np(reference, connectivity), spacing)
        return dt[rb]
    rb, dt = jax.device_get(
        _border_and_dt(result, reference, spacing, connectivity))
    return np.asarray(dt)[np.asarray(rb)]


def hd(result, reference, voxelspacing=None, connectivity: int = 1) -> float:
    """Symmetric Hausdorff distance: max over both directed surface
    distance sets (medpy_metrics.py:310)."""
    d1 = surface_distances(result, reference, voxelspacing, connectivity)
    d2 = surface_distances(reference, result, voxelspacing, connectivity)
    return float(max(d1.max(), d2.max()))


def hd95(result, reference, voxelspacing=None,
         connectivity: int = 1) -> float:
    """95th percentile of the symmetric surface distances
    (medpy_metrics.py:358).  The jittable streaming version used inside
    the training step lives in :class:`.hd95.HD95Spec`; this is the
    array-in/float-out analysis API."""
    d1 = surface_distances(result, reference, voxelspacing, connectivity)
    d2 = surface_distances(reference, result, voxelspacing, connectivity)
    return float(np.percentile(np.hstack((d1, d2)), 95))


def asd(result, reference, voxelspacing=None,
        connectivity: int = 1) -> float:
    """Directed average surface distance (medpy_metrics.py:460)."""
    return float(surface_distances(result, reference, voxelspacing,
                                   connectivity).mean())


def assd(result, reference, voxelspacing=None,
         connectivity: int = 1) -> float:
    """Average symmetric surface distance: mean of the two directed
    ``asd`` values (medpy_metrics.py:406)."""
    return float(np.mean((asd(result, reference, voxelspacing, connectivity),
                          asd(reference, result, voxelspacing,
                              connectivity))))


# ---------------------------------------------------------------------------
# volume correlations (medpy_metrics.py:656-726)
# ---------------------------------------------------------------------------

@jax.jit
def _pearson(x, y):
    """(r, two-sided p) of Pearson's product-moment correlation — the
    scipy.stats.pearsonr contract, natively: p from the exact t-distribution
    via the regularised incomplete beta function."""
    x = x.astype(jnp.float64) if jax.config.jax_enable_x64 \
        else x.astype(jnp.float32)
    y = y.astype(x.dtype)
    n = x.shape[0]
    xm = x - jnp.mean(x)
    ym = y - jnp.mean(y)
    r = jnp.sum(xm * ym) / jnp.sqrt(jnp.sum(xm ** 2) * jnp.sum(ym ** 2))
    r = jnp.clip(r, -1.0, 1.0)
    df = n - 2
    if df <= 0:
        # scipy.stats.pearsonr special case: with n == 2, r is ±1 by
        # construction and p is defined as 1.0 (df = 0 leaves no room
        # to reject the null); n < 2 raises there, callers guard it
        return r, jnp.ones((), x.dtype)
    # p = I_{df/(df+t^2)}(df/2, 1/2) with t^2 = r^2 df / (1-r^2)
    # => df/(df+t^2) = 1 - r^2
    p = jax.scipy.special.betainc(df / 2.0, 0.5,
                                  jnp.clip(1.0 - r * r, 0.0, 1.0))
    p = jnp.where(jnp.abs(r) >= 1.0, 0.0, p)
    return r, p


def _volumes(arrays) -> np.ndarray:
    stack = np.atleast_2d(np.array(arrays).astype(bool))
    return np.asarray([np.count_nonzero(a) for a in stack], np.float64)


def volume_correlation(results, references) -> Tuple[float, float]:
    """Pearson (r, p) between per-image binary volumes
    (medpy_metrics.py:656)."""
    r, p = jax.device_get(_pearson(jnp.asarray(_volumes(results)),
                                   jnp.asarray(_volumes(references))))
    return float(r), float(p)


def volume_change_correlation(results, references) -> Tuple[float, float]:
    """Pearson (r, p) between successive volume CHANGES
    (medpy_metrics.py:690)."""
    rv = np.diff(_volumes(results))
    gv = np.diff(_volumes(references))
    r, p = jax.device_get(_pearson(jnp.asarray(rv), jnp.asarray(gv)))
    return float(r), float(p)


# ---------------------------------------------------------------------------
# object-correspondence family (medpy_metrics.py:727-1198)
# ---------------------------------------------------------------------------

def connected_components(mask, connectivity: int = 1
                         ) -> Tuple[np.ndarray, int]:
    """Label distinct binary objects (scipy ``label`` semantics with the
    connectivity-*c* structure).  Uses scipy's C implementation when
    available (both label in C scan order, so the labelings are
    identical); the pure-python flood fill below is the no-scipy
    fallback — this family is offline analysis, never inside the jitted
    step, but realistic CT volumes make the interpreted fill
    minutes-slow, so the fast path matters."""
    mask = _binary(mask)
    try:
        from scipy import ndimage as _ndi
    except ImportError:
        _ndi = None
    if _ndi is not None:
        structure = _ndi.generate_binary_structure(mask.ndim, connectivity)
        labels, n = _ndi.label(mask, structure=structure)
        return labels.astype(np.int32, copy=False), int(n)
    offsets = _structure_offsets(mask.ndim, connectivity)
    labels = np.zeros(mask.shape, np.int32)
    current = 0
    for seed in zip(*np.nonzero(mask)):
        if labels[seed]:
            continue
        current += 1
        labels[seed] = current
        stack = [seed]
        while stack:
            p = stack.pop()
            for off in offsets:
                q = tuple(pi + oi for pi, oi in zip(p, off))
                if all(0 <= qi < s for qi, s in zip(q, mask.shape)) \
                        and mask[q] and not labels[q]:
                    labels[q] = current
                    stack.append(q)
    return labels, current


def _bounding_windows(labels: np.ndarray, n: int):
    """scipy ``find_objects``: per label, the tuple of bounding slices."""
    try:
        from scipy import ndimage as _ndi
    except ImportError:
        _ndi = None
    if _ndi is not None:
        return _ndi.find_objects(labels, max_label=n)
    out = []
    for lid in range(1, n + 1):
        pos = np.nonzero(labels == lid)
        out.append(tuple(slice(int(p.min()), int(p.max()) + 1)
                         for p in pos))
    return out


def _object_correspondences(reference, result, connectivity: int = 1):
    """Verbatim mirror of ``__distinct_binary_object_correspondences``
    (medpy_metrics.py:1145): labels the objects of both inputs and builds
    a 1-to-1 mapping from labels of ``reference`` to overlapping (one
    voxel suffices) labels of ``result`` — unambiguous overlaps first,
    then the one-to-many cases greedily, shortest candidate set first
    with an arbitrary (set-order) pick.  Returns
    ``(labels(result), labels(reference), n_result, n_reference,
    mapping)`` — the callers' argument swaps are mirrored from the
    reference too, so the public obj_* results match it exactly."""
    labels1, n1 = connected_components(result, connectivity)
    labels2, n2 = connected_components(reference, connectivity)
    windows = _bounding_windows(labels2, n2)
    mapping: dict = {}
    used: set = set()
    ambiguous = []
    for ref_id, window in enumerate(windows, start=1):
        inside = labels2[window] == ref_id
        res_ids = np.unique(labels1[window][inside])
        res_ids = res_ids[res_ids != 0]
        if len(res_ids) == 1:
            res_id = int(res_ids[0])
            if res_id not in used:
                mapping[ref_id] = res_id
                used.add(res_id)
        elif len(res_ids) > 1:
            ambiguous.append((ref_id, set(int(i) for i in res_ids)))
    while True:
        ambiguous = [(rid, cands - used) for rid, cands in ambiguous]
        ambiguous = sorted((a for a in ambiguous if a[1]),
                           key=lambda a: len(a[1]))
        if not ambiguous:
            break
        ref_id, cands = ambiguous[0]
        res_id = cands.pop()   # arbitrary pick, like the reference
        mapping[ref_id] = res_id
        used.add(res_id)
        ambiguous = ambiguous[1:]
    return labels1, labels2, n1, n2, mapping


def _merge_windows(w1, w2):
    return tuple(slice(min(a.start, b.start), max(a.stop, b.stop))
                 for a, b in zip(w1, w2))


def obj_asd(result, reference, voxelspacing=None,
            connectivity: int = 1) -> float:
    """Directed average surface distance over CORRESPONDING object pairs
    only (medpy_metrics.py:782): unmatched (false-positive/-negative)
    objects are excluded; distances pool over all matched pairs before
    averaging.  NOTE the argument plumbing (which side is labelled as
    'reference' inside the correspondence helper, and which object of a
    matched pair the distances are measured FROM) is mirrored verbatim
    from medpy_metrics.py:913-921 — including its surprising direction —
    because parity with the executed reference code is the contract."""
    labels1, labels2, _, _, mapping = _object_correspondences(
        result, reference, connectivity)
    windows1 = _bounding_windows(labels1, int(labels1.max()))
    windows2 = _bounding_windows(labels2, int(labels2.max()))
    pooled = []
    for lid2, lid1 in mapping.items():
        window = _merge_windows(windows1[lid1 - 1], windows2[lid2 - 1])
        object1 = labels1[window] == lid1
        object2 = labels2[window] == lid2
        pooled.extend(surface_distances(object1, object2, voxelspacing,
                                        connectivity))
    return float(np.mean(pooled))


def obj_assd(result, reference, voxelspacing=None,
             connectivity: int = 1) -> float:
    """Symmetric version of :func:`obj_asd` (medpy_metrics.py:727)."""
    return float(np.mean((obj_asd(result, reference, voxelspacing,
                                  connectivity),
                          obj_asd(reference, result, voxelspacing,
                                  connectivity))))


def obj_fpr(result, reference, connectivity: int = 1) -> float:
    """Fraction of unmatched ('false positive') objects
    (medpy_metrics.py:924, call wiring at :1032 mirrored verbatim)."""
    _, _, _, n_obj_reference, mapping = _object_correspondences(
        reference, result, connectivity)
    return (n_obj_reference - len(mapping)) / float(n_obj_reference)


def obj_tpr(result, reference, connectivity: int = 1) -> float:
    """Fraction of matched ('true positive') objects
    (medpy_metrics.py:1035, call wiring at :1142 mirrored verbatim)."""
    _, _, n_obj_result, _, mapping = _object_correspondences(
        reference, result, connectivity)
    return len(mapping) / float(n_obj_result)
