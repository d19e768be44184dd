"""Jittable metric suite: device accumulators + host finalisation."""
from .auc import AUCSpec, auroc, average_precision  # noqa: F401
from .base import MetricSpec  # noqa: F401
from .calculator import MetricsCalculator  # noqa: F401
from .confusion import (ConfusionMatrixSpec, DerivedCMSpec,  # noqa: F401
                        DERIVED_CM_METRICS, derived_cm_value)
from .hd95 import HD95Spec, border, edt, hd95_single  # noqa: F401
from .host_loggers import (ImageLogger, PrecisionRecallCurve,  # noqa: F401
                           ROCCurve, build_host_loggers)
from .multiclass import (AverageBinaryCMSpec,  # noqa: F401
                         AverageContinuousSpec, MCAccuracySpec, MCHD95Spec,
                         MultiClassCMSpec, Top5AccuracySpec)
from . import surface  # noqa: F401  (full vendored-medpy API parity)

__all__ = ["MetricsCalculator", "MetricSpec", "ConfusionMatrixSpec",
           "DerivedCMSpec", "AUCSpec", "HD95Spec", "MultiClassCMSpec",
           "auroc", "average_precision", "edt", "border", "hd95_single",
           "ImageLogger", "ROCCurve", "PrecisionRecallCurve",
           "build_host_loggers"]
