import jax.numpy as jnp
import numpy as np
import pytest

from medsegpretrainimagenet_tpu.config import ConfigDict
from medsegpretrainimagenet_tpu.losses import (BCELoss, CrossEntropyLoss,
                                               DiceLoss, Loss)

torch = pytest.importorskip("torch")


def test_dice_loss_against_reference_formula(rng):
    """Golden check vs the reference algebra (squared-pred denominator,
    batchwise pooling, background class from 1-channel predictions)."""
    pred = rng.random((2, 8, 8, 1)).astype(np.float32)
    mask = (rng.random((2, 8, 8)) > 0.5).astype(np.float32)

    loss = DiceLoss(batchwise=True, include_background=True,
                    smoothing_term=1e-5)
    got = float(loss(jnp.asarray(pred), jnp.asarray(mask)))

    # independent numpy computation of the documented formula
    eps = 1e-5
    p = np.concatenate([1 - pred, pred], axis=-1)
    scores = []
    for i in range(2):
        y = (mask == i).astype(np.float32)
        y_hat = p[..., i]
        inter = (y * y_hat).sum()
        scores.append((2 * inter + eps) / (y.sum() + (y_hat ** 2).sum() + eps))
    expected = 1 - np.mean(scores)
    assert abs(got - expected) < 1e-6


def test_dice_loss_perfect_prediction():
    mask = np.zeros((1, 4, 4), np.float32)
    mask[0, :2] = 1
    pred = mask[..., None]
    loss = DiceLoss()
    assert float(loss(jnp.asarray(pred), jnp.asarray(mask))) < 1e-4


def test_dice_loss_multiclass_softmax(rng):
    logits = rng.standard_normal((2, 4, 4, 3)).astype(np.float32)
    mask = rng.integers(0, 3, (2, 4, 4))
    loss = DiceLoss(apply_softmax=True, include_background=False)
    value = float(loss(jnp.asarray(logits), jnp.asarray(mask)))
    assert 0.0 <= value <= 1.0


def test_bce_matches_torch(rng):
    p = rng.uniform(0.01, 0.99, (4, 5)).astype(np.float32)
    y = (rng.random((4, 5)) > 0.5).astype(np.float32)
    got = float(BCELoss()(jnp.asarray(p), jnp.asarray(y)))
    expected = float(torch.nn.functional.binary_cross_entropy(
        torch.tensor(p), torch.tensor(y)))
    assert abs(got - expected) < 1e-4


def test_cross_entropy_matches_torch(rng):
    logits = rng.standard_normal((8, 10)).astype(np.float32)
    labels = rng.integers(0, 10, (8,))
    for smoothing in (0.0, 0.1):
        got = float(CrossEntropyLoss(label_smoothing=smoothing)(
            jnp.asarray(logits), jnp.asarray(labels)))
        expected = float(torch.nn.functional.cross_entropy(
            torch.tensor(logits), torch.tensor(labels),
            label_smoothing=smoothing))
        assert abs(got - expected) < 1e-5, smoothing


def test_cross_entropy_one_hot_targets(rng):
    logits = rng.standard_normal((4, 6)).astype(np.float32)
    labels = rng.integers(0, 6, (4,))
    onehot = np.eye(6, dtype=np.float32)[labels]
    a = float(CrossEntropyLoss()(jnp.asarray(logits), jnp.asarray(labels)))
    b = float(CrossEntropyLoss()(jnp.asarray(logits), jnp.asarray(onehot)))
    assert abs(a - b) < 1e-6


def test_loss_wrapper_label_selection(rng):
    cfg = ConfigDict({"label type": "mask", "batchwise": True})
    wrapper = Loss(DiceLoss, cfg)
    assert wrapper.name == "dice_loss"
    pred = jnp.asarray(rng.random((1, 4, 4, 1)).astype(np.float32))
    batch = {"x": jnp.zeros((1, 4, 4, 3)),
             "mask": jnp.asarray((rng.random((1, 4, 4)) > 0.5)
                                 .astype(np.float32))}
    value = wrapper(pred, batch)
    assert value.shape == ()


def test_loss_wrapper_from_registry():
    from medsegpretrainimagenet_tpu.config import registry
    cfg = ConfigDict({"torch.nn.CrossEntropyLoss": {
        "label_smoothing": 0.1, "label_type": "label"}})
    wrapper = registry.build(cfg, wrapper=Loss)
    assert wrapper.label_type == "label"
    assert wrapper.calculator.smooth == 0.1


def test_loss_wrapper_default_prediction_index():
    """Multi-output fallback: with no train_prediction_index on the loss,
    the GLOBAL training/prediction_index selects the trained head
    (reference loss.py:47-50 consumes batch['prediction'] =
    pred[training/prediction_index], train_model.py:66)."""
    from medsegpretrainimagenet_tpu.losses import DiceLoss, Loss

    pred_a = jnp.full((2, 4, 4, 1), 0.9, jnp.float32)
    pred_b = jnp.full((2, 4, 4, 1), 0.1, jnp.float32)
    mask = jnp.ones((2, 4, 4), jnp.float32)
    wrapper = Loss(DiceLoss, ConfigDict({"label type": "mask"}),
                   default_prediction_index=1)
    picked = float(wrapper((pred_a, pred_b), {"mask": mask}))
    direct = float(wrapper(pred_b, {"mask": mask}))
    assert picked == pytest.approx(direct)
    # an explicit train_prediction_index still wins
    wrapper0 = Loss(DiceLoss, ConfigDict({"label type": "mask",
                                          "train prediction index": 0}),
                    default_prediction_index=1)
    picked0 = float(wrapper0((pred_a, pred_b), {"mask": mask}))
    assert picked0 == pytest.approx(float(wrapper0(pred_a, {"mask": mask})))


def test_loss_wrapper_null_label_type_passes_all_inputs():
    """`label type: null` routes to the pass-all-inputs path (reference
    loss.py:46-47) instead of crashing on batch[None]."""
    from medsegpretrainimagenet_tpu.losses import Loss

    class EveryInput:
        name = "every_input"

        def __call__(self, prediction=None, **batch):
            assert "mask" in batch and "x" not in batch
            return jnp.mean(prediction) + 0.0 * jnp.sum(batch["mask"])

    wrapper = Loss(lambda **kw: EveryInput(),
                   ConfigDict({"label type": None}))
    value = float(wrapper(jnp.ones((2, 2)),
                          {"x": jnp.zeros((2, 2)),
                           "mask": jnp.ones((2, 2))}))
    assert value == pytest.approx(1.0)
