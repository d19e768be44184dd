"""MetricsCalculator: config -> metric DAG over a device state pytree.

Capability parity with ``/root/reference/src/metrics/metric_wrapper.py``
(``MetricsCalculator``): threshold fan-out (one CM + derived family per
threshold), shared parent accumulators (the confusion matrix is computed
once, derived metrics read it), loss values in the same dict, ``metrics/``
key prefixing, and the per-step / per-epoch value protocol feeding
``batch_logs.csv`` / ``epoch_logs.csv``.

TPU-native protocol (replaces the reference's 3-phase host-object dance):

* ``init_state()`` -> pytree of device accumulators
* ``update(state, prediction, batch)`` — pure/jittable, folded into the
  train & eval steps; returns (new_state, per-step scalars)
* ``finalize_epoch(state)`` — one host sync per epoch producing the
  ``{'metrics/<name>': value, '<loss_name>': value}`` row
"""
from __future__ import annotations

from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ConfigDict
from .auc import AUCSpec
from .base import MetricSpec, threshold_tag
from .confusion import (ConfusionMatrixSpec, DerivedCMSpec,
                        is_cm_count_name)
from .hd95 import HD95Spec
from .multiclass import (AverageBinaryCMSpec, AverageContinuousSpec,
                         ClasswiseBinaryCMSpec, MCAccuracySpec, MCHD95Spec,
                         MultiClassCMSpec, Top5AccuracySpec)

__all__ = ["MetricsCalculator"]


def _host_logger_names():
    from .host_loggers import HOST_LOGGER_NAMES
    return HOST_LOGGER_NAMES

def cm_log_epochs(calc_config) -> tuple:
    """(active_epochs, do_last) for CM-image export — reference
    ``multiclass_metrics.py:64-70``: ``log_confusion_matrix_at`` defaults
    to 'last', so per-epoch export only happens for listed epochs.  The
    single source of truth for this parsing: the trainer's export
    schedule and the calculator's REQUIRES_LAST_PASS flag must agree."""
    if not calc_config.get("log_confusion_matrix", False):
        return [], False
    at = calc_config.get("log_confusion_matrix_at", "last")
    if isinstance(at, (str, int)):
        at = [at]
    at = list(at)
    return [int(e) for e in at if e != "last"], "last" in at


_BINARY_DERIVED = {
    "metrics.Accuracy": "accuracy",
    "metrics.BalancedAccuracy": "balanced_accuracy",
    "metrics.Sensitivity": "sensitivity",
    "metrics.Specificity": "specificity",
    "metrics.Precision": "precision",
    "metrics.DiceIndex": "dice_index",
    "metrics.JaccardIndex": "jaccard_index",
    "metrics.MCC": "mcc",
}


class MetricsCalculator:
    """Builds and drives the metric suite described by a config."""

    METRIC_CALC_PATH = "metrics/calculation"
    METRICS_PATH = "metrics/metrics"
    PARAMS = {"thresholds": 0.5}

    #: defaults injected into metrics/calculation per requested metric
    _FILL_DEFAULTS = {
        "metrics.multiclass_metrics": {
            "number_of_classes": 1000,
            "log_confusion_matrix": False,
            "include_background_in_averages": False,
        },
        "metrics.multiclass_metrics.DiceIndex": {
            "log_classwise_dice_idcs": True},
        "metrics.multiclass_metrics.JaccardIndex": {
            "log_classwise_jaccard_idcs": False},
        "metrics.multiclass_metrics.AUROC": {"apply_softmax": False},
        "metrics.multiclass_metrics.AveragePrecision": {
            "apply_softmax": False},
        "metrics.ConfusionMatrix": {"multilabel": False, "ignore_nans": True},
    }

    @staticmethod
    def fill_kwargs(config_dict: ConfigDict):
        calc = config_dict.get_or_update(MetricsCalculator.METRIC_CALC_PATH,
                                         {"calculation": {"default": {}}})
        if not isinstance(calc, ConfigDict):
            calc = ConfigDict()
            config_dict[MetricsCalculator.METRIC_CALC_PATH] = calc
        names = config_dict.get_str_tuple(MetricsCalculator.METRICS_PATH)
        table = MetricsCalculator._FILL_DEFAULTS
        calc.get_or_update("label_type", "mask")
        needs_threshold = any(not name.startswith(
            "metrics.multiclass_metrics") for name in names)
        if needs_threshold:
            calc.get_or_update("thresholds",
                               MetricsCalculator.PARAMS["thresholds"])
        for name in names:
            if name.startswith("metrics.multiclass_metrics"):
                calc.fill_with_defaults(table["metrics.multiclass_metrics"])
            for key in (name, "metrics.ConfusionMatrix"
                        if name in _BINARY_DERIVED else None):
                if key in table:
                    calc.fill_with_defaults(table[key])
        if calc.get("log_confusion_matrix", False):
            # reference multiclass_metrics.py:19: CM-image export epochs
            # default to 'last' only
            calc.get_or_update("log_confusion_matrix_at", "last")
        return config_dict

    def __init__(self, config_dict: ConfigDict, loss=None,
                 class_names: Optional[Sequence[str]] = None,
                 validate: bool = True, *args, **kwargs):
        MetricsCalculator.fill_kwargs(config_dict)
        calc: ConfigDict = config_dict[self.METRIC_CALC_PATH]
        names = config_dict.get_str_tuple(self.METRICS_PATH)

        thresholds = calc.get("thresholds", 0.5)
        if isinstance(thresholds, (int, float)):
            thresholds = [thresholds]
        thresholds = list(thresholds)

        label_type = calc.get("label_type", "mask")
        if isinstance(label_type, ConfigDict):
            label_type = label_type.key()
        multilabel = bool(calc.get("multilabel", False))
        ignore_nans = bool(calc.get("ignore_nans", True))
        num_classes = int(calc.get("number_of_classes", 1000))
        include_bg = bool(calc.get("include_background_in_averages", False))
        apply_softmax = bool(calc.get("apply_softmax", False))
        self.label_type = label_type

        self.specs: Dict[str, MetricSpec] = {}

        def add(spec: MetricSpec):
            self.specs.setdefault(spec.key, spec)

        def ensure_cm(threshold: float):
            key = f"cm_{threshold_tag(threshold)}"
            if key not in self.specs:
                add(ConfusionMatrixSpec(threshold=threshold,
                                        label_type=label_type,
                                        multilabel=multilabel,
                                        ignore_nans=ignore_nans,
                                        num_classes=num_classes))
            return key

        def ensure_mc_cm():
            if "multiclass_cm" not in self.specs:
                add(MultiClassCMSpec(num_classes, label_type=label_type))

        if calc.get("log_confusion_matrix", False):
            # the epoch CM image export needs the K x K accumulator even
            # when no multiclass metric reads it
            ensure_mc_cm()

        # reference Dice/Jaccard/Tversky read eps from the calc dict
        # (``metrics.py:248-250,262,274`` via the PARAMS fill)
        cm_eps = float(calc.get("eps", 1))

        for name in names:
            if name in _BINARY_DERIVED:
                for t in thresholds:
                    ensure_cm(t)
                    eps = cm_eps if _BINARY_DERIVED[name] in (
                        "dice_index", "jaccard_index") else None
                    add(DerivedCMSpec(_BINARY_DERIVED[name], threshold=t,
                                      eps=eps))
            elif name == "metrics.TverskyIndex":
                # general Tversky: name + weights from the calc dict
                # (reference ``metrics.py:237-259``, defaults (1, 1, 1))
                weights = (float(calc.get("weight_of_tps", 1)),
                           float(calc.get("weight_of_fps", 1)),
                           float(calc.get("weight_of_fns", 1)))
                tname = str(calc.get("name", "tversky_index"))
                for t in thresholds:
                    ensure_cm(t)
                    add(DerivedCMSpec("tversky_index", threshold=t,
                                      eps=cm_eps, weights=weights,
                                      display_name=tname))
            elif name == "metrics.ConfusionMatrix":
                for t in thresholds:
                    ensure_cm(t)
            elif name == "metrics.ModifiedHausdorffDistance":
                for t in thresholds:
                    add(HD95Spec(threshold=t, label_type=label_type))
            elif name == "metrics.AUROC":
                add(AUCSpec("area_under_roc", label_type=label_type))
            elif name == "metrics.AveragePrecision":
                add(AUCSpec("average_precision_score",
                            label_type=label_type))
            elif name == "metrics.multiclass_metrics.Accuracy":
                add(MCAccuracySpec(num_classes, label_type=label_type))
            elif name == "metrics.multiclass_metrics.Top5Accuracy":
                add(Top5AccuracySpec(label_type=label_type))
            elif name == "metrics.multiclass_metrics.DiceIndex":
                ensure_mc_cm()
                add(AverageBinaryCMSpec(
                    "dice_index", "mean_dice_index",
                    include_background=include_bg,
                    classwise=bool(calc.get("log_classwise_dice_idcs", True)),
                    class_names=class_names, eps=1,
                    num_classes=num_classes, plural_name="dice_indices",
                    validate=validate))
            elif name == "metrics.multiclass_metrics.JaccardIndex":
                ensure_mc_cm()
                add(AverageBinaryCMSpec(
                    "jaccard_index", "mean_jaccard_index",
                    include_background=include_bg,
                    classwise=bool(calc.get("log_classwise_jaccard_idcs",
                                            False)),
                    class_names=class_names, eps=1,
                    num_classes=num_classes, plural_name="jaccard_indices",
                    validate=validate))
            elif name == "metrics.multiclass_metrics.BalancedAccuracy":
                ensure_mc_cm()
                add(AverageBinaryCMSpec(
                    "balanced_accuracy", "mean_balanced_accuracy",
                    include_background=include_bg,
                    class_names=class_names, num_classes=num_classes,
                    validate=validate))
            elif name == "metrics.multiclass_metrics.ClasswiseAccuracies":
                ensure_mc_cm()
                add(ClasswiseBinaryCMSpec(
                    "accuracy", "classwise_accuracies",
                    include_background=include_bg, class_names=class_names,
                    num_classes=num_classes, plural_name="accuracies",
                    validate=validate))
            elif name == ("metrics.multiclass_metrics."
                          "ClasswiseBalancedAccuracies"):
                ensure_mc_cm()
                add(ClasswiseBinaryCMSpec(
                    "balanced_accuracy", "classwise_balanced_accuracies",
                    include_background=include_bg, class_names=class_names,
                    num_classes=num_classes,
                    plural_name="balanced_accuracies", validate=validate))
            elif name == "metrics.multiclass_metrics.ClasswiseDiceIndices":
                ensure_mc_cm()
                add(ClasswiseBinaryCMSpec(
                    "dice_index", "classwise_dice_indices",
                    include_background=include_bg, class_names=class_names,
                    eps=1, num_classes=num_classes,
                    # 'dice_indicies' preserves the reference's artifact
                    # name verbatim (multiclass_metrics.py:410 typo)
                    plural_name="dice_indicies", validate=validate))
            elif name == "metrics.multiclass_metrics.AUROC":
                add(AverageContinuousSpec(
                    "area_under_roc", num_classes,
                    include_background=include_bg,
                    apply_softmax=apply_softmax, label_type=label_type))
            elif name == "metrics.multiclass_metrics.AveragePrecision":
                add(AverageContinuousSpec(
                    "average_precision_score", num_classes,
                    include_background=include_bg,
                    apply_softmax=apply_softmax, label_type=label_type))
            elif name == ("metrics.multiclass_metrics."
                          "ModifiedHausdorffDistance"):
                # argmax binarization — not threshold-dependent
                add(MCHD95Spec(num_classes, include_background=include_bg,
                               label_type=label_type))
            elif name in _host_logger_names():
                # host-side epoch loggers, attached by the trainer
                continue
            else:
                import warnings
                warnings.warn(f"Unknown metric {name!r}; skipping.")

        self.loss = loss
        self.loss_name = getattr(loss, "name", "loss")
        if "multiclass_cm" in self.specs:
            # reference multiclass_metrics.py:70: REQUIRES_LAST_PASS when
            # the CM-image epochs include 'last'
            _, do_last = cm_log_epochs(calc)
            if do_last:
                self.specs["multiclass_cm"].requires_last_pass = True
        self.requires_last_pass = any(
            getattr(s, "requires_last_pass", False)
            for s in self.specs.values())

    # ------------------------------------------------------------------
    # device-side protocol
    # ------------------------------------------------------------------

    def init_state(self):
        state = {key: spec.init_state() for key, spec in self.specs.items()}
        state["__loss__"] = {"sum": jnp.zeros((), jnp.float32),
                             "count": jnp.zeros((), jnp.float32)}
        return state

    def update(self, state, prediction, batch,
               loss_value=None) -> Tuple[dict, Dict[str, Any]]:
        """Jittable: fold one (virtual) batch into the state."""
        if hasattr(prediction, "dtype") and prediction.dtype == jnp.bfloat16:
            prediction = prediction.astype(jnp.float32)  # mixed-precision
        new_state = dict(state)
        per_batch: Dict[str, Any] = {}
        for key, spec in self.specs.items():
            new_slice, values = spec.update(state[key], prediction, batch)
            new_state[key] = new_slice
            per_batch.update(values)
        if loss_value is not None:
            new_state["__loss__"] = {
                "sum": state["__loss__"]["sum"] + loss_value,
                "count": state["__loss__"]["count"] + 1.0}
            per_batch[self.loss_name] = loss_value
        return new_state, per_batch

    # ------------------------------------------------------------------
    # host-side protocol
    # ------------------------------------------------------------------

    def finalize_epoch(self, state) -> Dict[str, float]:
        host = jax.device_get(state)
        values: Dict[str, float] = {}
        for key, spec in self.specs.items():
            out = spec.finalize_from(host[key],
                                     {r: host[r] for r in spec.reads}) \
                if spec.reads else spec.finalize(host[key])
            for name, value in out.items():
                if is_cm_count_name(name):
                    continue   # reference filter: metric_wrapper.py:281
                if isinstance(value, (int, float, np.floating, np.integer)):
                    values[f"metrics/{name}"] = float(value)
        loss_state = host.get("__loss__")
        if loss_state is not None and self.loss is not None:
            count = float(loss_state["count"])
            values[self.loss_name] = float(loss_state["sum"]) / count \
                if count else 0.0
        return values

    def evaluate_at_end(self, *args, **kwargs) -> None:
        """End-of-training export hooks (reference
        ``metric_wrapper.py:324-329``): invoked once after the optional
        last pass; specs with an ``evaluate_at_end`` callable export their
        accumulated artifacts (classwise histories etc.).  Each hook is
        isolated: one failing export (a malformed CSV cell, a plotting
        backend error) must not abort every later spec's export — the
        trainer wraps this whole call in a single ``swallow``."""
        from ..utils.errors import swallow
        for name, spec in self.specs.items():
            hook = getattr(spec, "evaluate_at_end", None)
            if callable(hook):
                with swallow(f"Exception in the end-of-training hook "
                             f"of metric {name!r}."):
                    hook(*args, **kwargs)

    def epoch_confusion_matrix(self, state):
        """Host copy of the pooled K x K confusion matrix, or None.

        Consumed by the trainer when ``metrics/calculation/
        log_confusion_matrix`` is on (reference
        ``multiclass_metrics.py:129-153`` logs CM images at epochs)."""
        if "multiclass_cm" not in self.specs:
            return None
        return np.asarray(jax.device_get(state["multiclass_cm"]["cm"]))

    def batch_values(self, per_batch: Dict[str, Any]) -> Dict[str, float]:
        """Host view of one step's metric scalars (for batch_logs.csv),
        including derived CM values computed from the step's counts."""
        # ONE transfer for the whole dict: per-entry device_get costs a
        # host<->device roundtrip each (ruinous over a remote TPU tunnel).
        # The training loop batches further still — it device_gets a whole
        # window of steps at once and feeds each through batch_values_host.
        return self.batch_values_host(jax.device_get(per_batch))

    def batch_values_host(self, per_batch: Dict[str, Any]) -> Dict[str, float]:
        """``batch_values`` over scalars that are ALREADY on the host (the
        loop's per-epoch batched readback) — no device sync in here."""
        host = {k: np.asarray(v) for k, v in per_batch.items()}
        values = {}
        for key, value in host.items():
            if value.ndim == 0 and not is_cm_count_name(key):
                values[key] = float(value)
        for spec in self.specs.values():
            if isinstance(spec, DerivedCMSpec):
                try:
                    values.update(spec.batch_value(host))
                except KeyError:
                    pass
        unprefixed = (self.loss_name, "gradient_magnitude", "learning_rate")
        prefixed = {}
        for key, value in values.items():
            prefix = "" if key in unprefixed else "metrics/"
            prefixed[prefix + key] = value
        return prefixed
