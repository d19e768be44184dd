"""Loss + binary metric parity against the reference's actual torch
implementations (mock-imported from /root/reference)."""
import importlib.abc
import importlib.util
import sys
from unittest.mock import MagicMock

import jax.numpy as jnp
import numpy as np
import pytest
import torch

from medsegpretrainimagenet_tpu.config import ConfigDict
from medsegpretrainimagenet_tpu.losses import (BCELoss, CrossEntropyLoss,
                                               DiceLoss)

from conftest import reference_import  # noqa: E402


@pytest.fixture(scope="module")
def reference():
    with reference_import("segmentation.losses.losses",
                          "classification.losses",
                          "metrics.metrics") as (seg, cls, met):
        yield {"seg_losses": seg, "cls_losses": cls, "metrics": met}


# ---------------------------------------------------------------------------
# losses: NHWC (ours) vs NCHW (reference), same numbers
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("batchwise", [True, False])
@pytest.mark.parametrize("include_background", [True, False])
def test_dice_loss_binary_matches_reference(reference, batchwise,
                                            include_background):
    rng = np.random.default_rng(0)
    pred = rng.random((4, 8, 8, 1)).astype(np.float32)
    mask = rng.integers(0, 2, (4, 8, 8)).astype(np.int64)

    ours = DiceLoss(batchwise=batchwise,
                    include_background=include_background,
                    smoothing_term=1e-5)(jnp.asarray(pred),
                                         jnp.asarray(mask))
    ref = reference["seg_losses"].DiceLoss(
        batchwise=batchwise, include_background=include_background,
        smoothing_term=1e-5)(
        torch.tensor(pred.transpose(0, 3, 1, 2)),
        torch.tensor(mask[:, None]))
    np.testing.assert_allclose(float(ours), float(ref), rtol=1e-5)


@pytest.mark.parametrize("apply_softmax", [True, False])
def test_dice_loss_multiclass_matches_reference(reference, apply_softmax):
    rng = np.random.default_rng(1)
    logits = rng.random((3, 8, 8, 4)).astype(np.float32)
    mask = rng.integers(0, 4, (3, 8, 8)).astype(np.int64)

    ours = DiceLoss(batchwise=True, include_background=True,
                    apply_softmax=apply_softmax)(jnp.asarray(logits),
                                                 jnp.asarray(mask))
    ref = reference["seg_losses"].DiceLoss(
        batchwise=True, include_background=True,
        apply_softmax=apply_softmax)(
        torch.tensor(logits.transpose(0, 3, 1, 2)),
        torch.tensor(mask[:, None]))
    np.testing.assert_allclose(float(ours), float(ref), rtol=1e-5)


def test_bce_loss_matches_reference(reference):
    rng = np.random.default_rng(2)
    pred = rng.uniform(0.05, 0.95, (16,)).astype(np.float32)
    label = rng.integers(0, 2, (16,)).astype(np.float32)
    ours = BCELoss()(jnp.asarray(pred), jnp.asarray(label))
    ref = reference["cls_losses"].BCELoss()(torch.tensor(pred),
                                            torch.tensor(label))
    np.testing.assert_allclose(float(ours), float(ref), rtol=1e-5)


def test_cross_entropy_matches_reference(reference):
    rng = np.random.default_rng(3)
    logits = rng.standard_normal((8, 5)).astype(np.float32)
    label = rng.integers(0, 5, (8, 1)).astype(np.int64)
    for smoothing in (0.0, 0.1):
        ours = CrossEntropyLoss(label_smoothing=smoothing)(
            jnp.asarray(logits), jnp.asarray(label))
        ref = reference["cls_losses"].CrossEntropyLoss(
            label_smoothing=smoothing)(torch.tensor(logits),
                                       torch.tensor(label))
        np.testing.assert_allclose(float(ours), float(ref), rtol=1e-5,
                                   err_msg=f"smoothing={smoothing}")


def test_cross_entropy_no_softmax_matches_reference(reference):
    rng = np.random.default_rng(4)
    probs = rng.dirichlet(np.ones(4), size=(6, 8 * 8)).astype(np.float32)
    probs = probs.transpose(0, 2, 1).reshape(6, 8, 8, 4)
    label = rng.integers(0, 4, (6, 8, 8)).astype(np.int64)
    ours = CrossEntropyLoss(label_smoothing=0.1, apply_softmax=False)(
        jnp.asarray(probs), jnp.asarray(label))
    ref = reference["cls_losses"].CrossEntropyLoss(
        label_smoothing=0.1, apply_softmax=False)(
        torch.tensor(probs.transpose(0, 3, 1, 2)),
        torch.tensor(label))
    np.testing.assert_allclose(float(ours), float(ref), rtol=1e-4)


# ---------------------------------------------------------------------------
# binary CM metric stream parity
# ---------------------------------------------------------------------------

def test_cm_metrics_match_reference_over_epoch(reference):
    """Stream several batches through both CM accumulators; the epoch
    values of the derived metrics must agree."""
    from medsegpretrainimagenet_tpu.losses import Loss
    from medsegpretrainimagenet_tpu.metrics import MetricsCalculator

    ref_m = reference["metrics"]
    # reference Metric objects need a _config_dict; build a minimal one
    import importlib as _il
    sys.path.insert(0, "/root/reference/src")
    try:
        ref_utils = _il.import_module("utils")
        RefCD = ref_utils.config_dict.ConfigDict
        cfg_ref = RefCD({
            "metrics": {"calculation": {"thresholds": (0.5,),
                                        "label_type": "mask",
                                        "multilabel": False,
                                        "ignore_nans": False}},
            "meta": {"technical": {"log to device": False,
                                   "log to neptune": False}},
            "experiment": {"number of epochs": 1},
        })
    finally:
        sys.path.remove("/root/reference/src")

    ref_cm = ref_m.ConfusionMatrix(threshold=0.5, _config_dict=cfg_ref)
    ref_derived = {
        "accuracy": ref_m.Accuracy(threshold=0.5, _config_dict=cfg_ref),
        "dice_index": ref_m.DiceIndex(threshold=0.5, _config_dict=cfg_ref),
        "balanced_accuracy": ref_m.BalancedAccuracy(threshold=0.5,
                                                    _config_dict=cfg_ref),
        "jaccard_index": ref_m.JaccardIndex(threshold=0.5,
                                            _config_dict=cfg_ref),
        "matthews_correlation_coefficient": ref_m.MCC(
            threshold=0.5, _config_dict=cfg_ref),
    }

    calc = MetricsCalculator(ConfigDict({"metrics": {
        "metrics": ("metrics.Accuracy", "metrics.DiceIndex",
                    "metrics.BalancedAccuracy", "metrics.JaccardIndex",
                    "metrics.MCC"),
        "calculation": {"thresholds": 0.5, "label_type": "mask"}}}),
        loss=None)
    state = calc.init_state()

    def _bare(cm_dict):
        # the reference MetricsCalculator strips '_threshold_*' before
        # handing parent values to derived metrics
        return {k.split("_threshold_")[0]: v for k, v in cm_dict.items()}

    rng = np.random.default_rng(5)
    for _ in range(4):
        pred = rng.random((2, 8, 8, 1)).astype(np.float32)
        mask = rng.integers(0, 2, (2, 8, 8)).astype(np.int64)
        ref_cm.calculate_batch(prediction=torch.tensor(
            pred.transpose(0, 3, 1, 2)), mask=torch.tensor(mask[:, None]))
        batch_cm = _bare(ref_cm.evaluate_batch(flush=False))
        for metric in ref_derived.values():
            metric.evaluate_batch(parent_value=batch_cm)
        state, _ = calc.update(state, jnp.asarray(pred), {"mask":
                                                          jnp.asarray(mask)})

    ref_cm_value = _bare(ref_cm.evaluate_epoch())
    ref_values = {}
    for name, metric in ref_derived.items():
        out = metric.evaluate_epoch(parent_value=ref_cm_value)
        ref_values.update(out)

    ours = calc.finalize_epoch(state)
    # every scalar the reference emits must exist under our metrics/ key
    # and match — a count-based guard would let one metric's key drift
    # while others keep the total up
    compared = []
    for key, value in ref_values.items():
        if not isinstance(value, (int, float, np.floating)):
            continue
        our_key = f"metrics/{key}"
        assert our_key in ours, \
            f"{our_key} missing from {sorted(ours)}"
        np.testing.assert_allclose(ours[our_key], float(value),
                                   rtol=1e-5, err_msg=key)
        compared.append(key)
    assert len(compared) >= 5, f"only compared {compared}"
