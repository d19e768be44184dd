"""Multiclass metrics on a device-side K x K confusion matrix.

Capability parity with ``/root/reference/src/metrics/multiclass_metrics.py``:
``MultiClassConfusionMatrix`` (pooled K x K counts + class counts),
``Accuracy`` (mean of per-step accuracies — the reference's exact epoch
semantics), ``Top5Accuracy`` (pooled correct/total), the
``AverageBinaryCMMetric`` family (macro one-vs-rest Dice / Jaccard /
balanced accuracy over classes present in the epoch, with optional
classwise logging), and macro one-vs-rest AUROC / AveragePrecision / HD95.

The K x K update is a single ``bincount`` over ``y * K + y_hat`` — one fused
gather/scatter on device (the reference calls sklearn per batch on host).
"""
from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .auc import auroc, average_precision
from .base import MetricSpec
from .confusion import derived_cm_value
from .hd95 import hd95_single

__all__ = ["MultiClassCMSpec", "MCAccuracySpec", "Top5AccuracySpec",
           "AverageBinaryCMSpec", "ClasswiseBinaryCMSpec",
           "AverageContinuousSpec", "MCHD95Spec"]


def _labels_from(prediction, batch, label_type):
    """Integer class targets from a label/mask column (argmax if one-hot)."""
    y = batch.get(label_type)
    if y is None:
        y = batch.get("label", batch.get("mask"))
    if y.shape == prediction.shape:
        y = jnp.argmax(y, axis=-1)
    if y.ndim and y.shape[-1] == 1 and y.ndim == prediction.ndim:
        y = y[..., 0]
    return y.astype(jnp.int32)


class MultiClassCMSpec(MetricSpec):
    """Pooled K x K confusion matrix (rows = truth, cols = prediction)."""

    def __init__(self, num_classes: int, label_type: str = "label"):
        self.num_classes = num_classes
        self.label_type = label_type
        self.key = "multiclass_cm"

    def init_state(self):
        k = self.num_classes
        # (the reference also tracks per-class truth counts, but they are
        # exactly the CM's row sums — cm.sum(axis=1) — so no separate
        # accumulator is kept)
        return {"cm": jnp.zeros((k, k), jnp.float32)}

    def update(self, state, prediction, batch):
        k = self.num_classes
        y = _labels_from(prediction, batch, self.label_type).reshape(-1)
        y_hat = jnp.argmax(prediction, axis=-1).reshape(-1).astype(jnp.int32)
        flat = y * k + y_hat
        cm = jnp.bincount(flat, length=k * k).reshape(k, k) \
            .astype(jnp.float32)
        return {"cm": state["cm"] + cm}, {}

    def finalize(self, host_state) -> Dict[str, float]:
        return {}


def binary_cm_from_multiclass(cm: np.ndarray, idx: int):
    """One-vs-rest (tp, fp, tn, fn) for class *idx* of a K x K matrix."""
    tp = cm[idx, idx]
    fn = cm[idx, :].sum() - tp
    fp = cm[:, idx].sum() - tp
    tn = cm.sum() - tp - fn - fp
    return tp, fp, tn, fn


class MCAccuracySpec(MetricSpec):
    """Mean of per-step accuracies (reference ``multiclass_metrics.Accuracy``
    averages batch accuracies over the epoch rather than pooling).
    Self-contained: computes from predictions, not the K×K CM."""

    reads = ()

    def __init__(self, num_classes: int, label_type: str = "label"):
        self.num_classes = num_classes
        self.label_type = label_type
        self.key = "accuracy"
        self.name = "accuracy"

    def init_state(self):
        return {"sum": jnp.zeros((), jnp.float32),
                "count": jnp.zeros((), jnp.float32)}

    def update(self, state, prediction, batch):
        y = _labels_from(prediction, batch, self.label_type).reshape(-1)
        y_hat = jnp.argmax(prediction, axis=-1).reshape(-1)
        value = jnp.mean((y == y_hat).astype(jnp.float32))
        return ({"sum": state["sum"] + value, "count": state["count"] + 1},
                {self.name: value})

    def finalize(self, host_state) -> Dict[str, float]:
        count = float(host_state["count"])
        return {self.name: float(host_state["sum"]) / count if count else 0.0}


class Top5AccuracySpec(MetricSpec):
    """Pooled top-5 accuracy (reference ``Top5Accuracy``)."""

    def __init__(self, label_type: str = "label", n: int = 5):
        self.label_type = label_type
        self.n = n
        self.key = "top_5_accuracy"
        self.name = "top_5_accuracy"

    def init_state(self):
        return {"correct": jnp.zeros((), jnp.float32),
                "total": jnp.zeros((), jnp.float32)}

    def update(self, state, prediction, batch):
        y = _labels_from(prediction, batch, self.label_type)
        flat_pred = prediction.reshape(-1, prediction.shape[-1])
        flat_y = y.reshape(-1)
        _, top_n = jax.lax.top_k(flat_pred, self.n)
        correct = jnp.any(top_n == flat_y[:, None], axis=-1)
        num_correct = jnp.sum(correct).astype(jnp.float32)
        total = jnp.asarray(correct.shape[0], jnp.float32)
        value = num_correct / total
        return ({"correct": state["correct"] + num_correct,
                 "total": state["total"] + total}, {self.name: value})

    def finalize(self, host_state) -> Dict[str, float]:
        total = float(host_state["total"])
        return {self.name: float(host_state["correct"]) / total
                if total else 0.0}


class AverageBinaryCMSpec(MetricSpec):
    """Macro one-vs-rest CM metric over classes present in the epoch
    (reference ``AverageBinaryCMMetric``), with optional classwise values.

    With classwise logging on, the reference additionally sets
    ``REQUIRES_LAST_PASS`` (``multiclass_metrics.py:189``) — triggering the
    trainer's extra no-grad pass — and exports a combined history plot of
    the classwise columns at the end of training
    (``multiclass_metrics.py:247-260``); both are mirrored here."""

    reads = ("multiclass_cm",)

    def __init__(self, base_name: str, name: str,
                 include_background: bool = False,
                 classwise: bool = False,
                 class_names: Optional[Sequence[str]] = None,
                 eps: Optional[float] = None,
                 num_classes: Optional[int] = None,
                 plural_name: Optional[str] = None,
                 validate: bool = True):
        self.base_name = base_name    # e.g. 'dice_index'
        self.name = name              # e.g. 'mean_dice_index'
        self.start = int(not include_background)
        self.classwise = classwise
        self.class_names = list(class_names or [])
        self.eps = eps
        self.key = name
        self.num_classes = num_classes
        self.plural_name = plural_name or base_name + "s"
        self.validate = validate
        # reference multiclass_metrics.py:189: only the classwise-logging
        # variant forces the extra last pass
        self.requires_last_pass = bool(classwise)

    def init_state(self):
        return {}

    def update(self, state, prediction, batch):
        return state, {}

    def _class_label(self, idx: int, num_classes: int) -> str:
        names = list(self.class_names)
        # reference strips a leading 'background' entry when the list is
        # longer than the averaged classes (multiclass_metrics.py:176-178)
        if len(names) > num_classes - self.start:
            names = names[1:]
        offset = idx - self.start
        if 0 <= offset < len(names):
            return f"{self.base_name}_" + str(names[offset]).replace(" ", "_")
        return f"{self.base_name}_class_{idx}"

    def finalize_from(self, own_state, read_states) -> Dict[str, float]:
        cm = np.asarray(read_states["multiclass_cm"]["cm"])
        values, out = [], {}
        neutral = {"dice_index": 1, "jaccard_index": 1}.get(self.base_name, 0)
        for idx in range(self.start, cm.shape[0]):
            present = cm[idx, :].sum() + cm[:, idx].sum() > 0
            if present:
                tp, fp, tn, fn = binary_cm_from_multiclass(cm, idx)
                value = derived_cm_value(self.base_name, tp, fp, tn, fn,
                                         self.eps)
                values.append(value)
            if self.classwise:
                # absent classes still emit their (neutral) key: the CSV
                # writer pins its header to the first epoch's row, so the
                # key set must be stable across epochs
                out[self._class_label(idx, cm.shape[0])] = \
                    float(value) if present else float(neutral)
        out[self.name] = float(np.mean(values)) if values else float(neutral)
        return out

    def _legend_label(self, metric_name: str) -> str:
        # reference legend labels are the class names with underscores as
        # spaces (multiclass_metrics.py:252-255 uses self.labels)
        return metric_name[len(self.base_name) + 1:].replace("_", " ")

    def evaluate_at_end(self, save_path: Optional[str] = None,
                        extensions: Sequence[str] = (), **kwargs) -> None:
        """Combined classwise history plot at end of training (reference
        ``AverageBinaryCMMetric.evaluate_at_end``,
        ``multiclass_metrics.py:247-260``): reads the classwise
        ``val_metrics/`` columns back out of ``epoch_logs.csv`` and
        exports ``plots/<plural_name>_plot``."""
        if not self.classwise or not self.validate or not save_path \
                or not self.num_classes:
            return
        import csv
        import os
        path = os.path.join(save_path, "epoch_logs.csv")
        if not os.path.isfile(path):
            return
        with open(path, newline="") as fh:
            rows = list(csv.DictReader(fh))
        if not rows:
            return
        names = [self._class_label(idx, self.num_classes)
                 for idx in range(self.start, self.num_classes)]
        cols = [(n, f"val_metrics/{n}") for n in names
                if f"val_metrics/{n}" in rows[0]]
        if not cols:
            return
        ys = [[float(r[col]) for r in rows] for _, col in cols]
        from ..plotting import GeneralPlotter, export_plot
        plotter = GeneralPlotter(dict(
            Ys=ys, xlabel="epoch", ylabel=self.base_name,
            title=f"Validation {self.plural_name}".replace("_", " "),
            legend={"labels": [self._legend_label(n) for n, _ in cols]},
            dirname=os.path.join(save_path, "plots"),
            fname=f"{self.plural_name}_plot"))
        export_plot(plotter, extensions)


class ClasswiseBinaryCMSpec(AverageBinaryCMSpec):
    """Classwise-only variant (reference ``ClasswiseBinaryCMMetric``)."""

    def __init__(self, *args, **kwargs):
        kwargs["classwise"] = True
        super().__init__(*args, **kwargs)
        # the reference's ClasswiseBinaryCMMetric defines evaluate_at_end
        # but does NOT set REQUIRES_LAST_PASS (multiclass_metrics.py:326+)
        self.requires_last_pass = False

    def _legend_label(self, metric_name: str) -> str:
        # reference ClasswiseBinaryCMMetric.evaluate_at_end:387 legends
        # with the full metric names, not the bare class names
        return metric_name

    def finalize_from(self, own_state, read_states) -> Dict[str, float]:
        out = super().finalize_from(own_state, read_states)
        out.pop(self.name, None)
        return out


class AverageContinuousSpec(MetricSpec):
    """Macro one-vs-rest AUROC / AP over class probability channels
    (reference ``AverageBinaryContinuousMetric``).

    Reference semantics reproduced exactly
    (``multiclass_metrics.py:521-523`` → per-class ``AUC.evaluate_epoch``,
    ``metrics.py:424-432``): the per-batch logged value is the mean over
    ALL classes (``evaluate_batch`` at ``multiclass_metrics.py:514-516``
    has no presence filter — degenerate classes contribute their neutral
    0); the epoch value is the mean over all classes of each class's MEAN
    of per-batch sklearn scores over that class's valid batches
    (degenerate classes contribute 0).  Each class accumulates only a
    (sum, count) scalar pair on device — per-batch values come from one
    batched vmapped sort.
    """

    FNS = {"area_under_roc": auroc,
           "average_precision_score": average_precision}

    def __init__(self, kind: str, num_classes: int,
                 include_background: bool = False, apply_softmax: bool = False,
                 label_type: str = "label"):
        self.kind = kind
        self.num_classes = num_classes
        self.start = int(not include_background)
        self.apply_softmax = apply_softmax
        self.label_type = label_type
        # reference names: 'area_under_roc' / 'average_precision_score'
        # (multiclass_metrics.py:549-569)
        self.name = kind
        self.key = self.name

    def init_state(self):
        k = self.num_classes - self.start
        return {"sum": jnp.zeros((k,), jnp.float32),
                "count": jnp.zeros((k,), jnp.float32)}

    def update(self, state, prediction, batch):
        if self.apply_softmax:
            prediction = jax.nn.softmax(prediction, axis=-1)
        y = _labels_from(prediction, batch, self.label_type)
        fn = self.FNS[self.kind]
        class_ids = jnp.arange(self.start, self.num_classes)
        scores = jnp.moveaxis(
            prediction[..., self.start:], -1, 0).reshape(
            self.num_classes - self.start, -1)          # (K', n)
        targets = (y.reshape(-1)[None, :] == class_ids[:, None])
        # one batched sort for all classes' per-batch values
        values, valids = jax.vmap(fn)(scores, targets)
        valids = valids.astype(jnp.float32)
        # reference evaluate_batch (multiclass_metrics.py:514-516): mean
        # over ALL classes, degenerate ones contributing their neutral 0
        batch_value = jnp.mean(values)
        new_state = {"sum": state["sum"] + values * valids,
                     "count": state["count"] + valids}
        return new_state, {self.name: batch_value}

    def finalize(self, host_state) -> Dict[str, float]:
        sums = np.asarray(host_state["sum"], np.float64)
        cnts = np.asarray(host_state["count"], np.float64)
        per_class = np.where(cnts > 0, sums / np.maximum(cnts, 1), 0.0)
        return {self.name: float(np.mean(per_class)) if per_class.size
                else 0.0}


class MCHD95Spec(MetricSpec):
    """Macro one-vs-rest HD95 over class channels (reference
    ``AverageBinaryDiscreteMetric`` -> ``ModifiedHausdorffDistance``).

    Reference semantics: predictions binarize by **argmax** (not a
    threshold — ``multiclass_metrics.py:589``); the logged name is
    ``modified_hausdorff_distance``.  The per-batch logged value is the
    mean over classes PRESENT in the batch — the ``add_to_average`` gate
    (``multiclass_metrics.py:595-600,603-607``) admits a class when its
    argmax prediction or target is nonempty anywhere in the virtual
    batch; absent classes are excluded from that mean (neutral 0 when no
    class is present).  The epoch value is the mean over ALL classes of
    each class's mean of per-batch values — a batch's value is the mean
    hd95 over its valid samples (both masks nonzero), and like the
    reference (``metrics.py:348-354``: ``if value != 0``) only batches
    with a nonzero value count toward the per-class mean; classes with no
    such batch contribute 0.
    """

    def __init__(self, num_classes: int,
                 include_background: bool = False, label_type: str = "mask"):
        self.num_classes = num_classes
        self.start = int(not include_background)
        self.label_type = label_type
        self.name = "modified_hausdorff_distance"
        self.key = self.name

    def init_state(self):
        k = self.num_classes - self.start
        return {"sum": jnp.zeros((k,), jnp.float32),
                "count": jnp.zeros((k,), jnp.float32)}

    def update(self, state, prediction, batch):
        y = _labels_from(prediction, batch, self.label_type)
        y_hat = jnp.argmax(prediction, axis=-1)
        per_class_value, per_class_present = [], []
        for idx in range(self.start, self.num_classes):
            pred_bin = y_hat == idx
            true_bin = y == idx
            values, valids = jax.lax.map(
                lambda ab: hd95_single(ab[0], ab[1]), (pred_bin, true_bin))
            num_valid = jnp.sum(valids)
            per_class_value.append(jnp.where(
                num_valid > 0, jnp.sum(values) / jnp.maximum(num_valid, 1),
                0.0))
            per_class_present.append(jnp.any(pred_bin) | jnp.any(true_bin))
        values = jnp.stack(per_class_value)       # per-class batch values
        present = jnp.stack(per_class_present).astype(jnp.float32)
        valids = (values != 0).astype(jnp.float32)
        # reference evaluate_batch (multiclass_metrics.py:603-607): mean
        # over classes PRESENT in the batch (the add_to_average gate at
        # :595-600), neutral 0 when none are
        n_present = jnp.sum(present)
        batch_value = jnp.where(
            n_present > 0,
            jnp.sum(values * present) / jnp.maximum(n_present, 1.0), 0.0)
        # per-class mean of per-batch values, counting only nonzero batch
        # values (the reference's `if value != 0` cumulation guard)
        new_state = {"sum": state["sum"] + values,
                     "count": state["count"] + valids}
        return new_state, {self.name: batch_value}

    def finalize(self, host_state) -> Dict[str, float]:
        sums = np.asarray(host_state["sum"], np.float64)
        cnts = np.asarray(host_state["count"], np.float64)
        per_class = np.where(cnts > 0, sums / np.maximum(cnts, 1), 0.0)
        return {self.name: float(np.mean(per_class)) if per_class.size
                else 0.0}
