"""Regression tests for the config/CLI review findings (round 2).

Pins: list-path ConfigDict semantics, process-stable default seed,
name_fields falsy fallback, device-augment p=0, spatial-aware batch cap,
prediction_index selection for multi-output models, min-metric
soft_best_index.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from medsegpretrainimagenet_tpu.config import ConfigDict


# ---------------------------------------------------------------------------
# ConfigDict list-path semantics (reference config_dict.py:42-128)
# ---------------------------------------------------------------------------

def test_setitem_through_list_raises():
    """Setting through a multi-element list intermediate must fail loudly
    (the reference indexes into the list -> TypeError) instead of silently
    replacing the list and dropping sibling entries."""
    cd = ConfigDict({"metrics": {"metrics": [{"A": {}}, {"B": {}}]}})
    with pytest.raises(TypeError, match="metrics"):
        cd["metrics/metrics/A/threshold"] = 0.5
    # the list survived intact
    elements = list(cd["metrics/metrics"])
    assert len(elements) == 2


def test_getitem_list_no_match_returns_list():
    """Descending into a multi-element list with no matching single-key
    element returns the list itself (reference __getitem__ falls through
    its match loop, config_dict.py:68-75)."""
    cd = ConfigDict({"data": {"transforms": {"train": [{"A": {}},
                                                       {"B": {}}]}}})
    value = cd["data/transforms/train/C"]
    assert isinstance(value, (list, tuple)) and len(value) == 2


# ---------------------------------------------------------------------------
# experiment defaults / orchestration helpers
# ---------------------------------------------------------------------------

def test_default_seed_stable_per_process():
    """The seed default is drawn once per process (reference
    default_dict.py:6 builds the table at import), so grid sweeps without
    an explicit seed share one seed."""
    from medsegpretrainimagenet_tpu.config.defaults import (
        default_experiment_config)
    a = default_experiment_config()["meta/technical/seed"]
    b = default_experiment_config()["meta/technical/seed"]
    assert a == b


def test_name_fields_empty_list_falls_back_to_config():
    """An empty name_fields argument falls back to the config's own
    name_fields (reference run_experiment.py:441 uses falsy `or`), so
    past-experiment comparison tags come from their config.yaml."""
    from medsegpretrainimagenet_tpu.cli.run_experiment import (
        fill_dict_with_name_fields)
    cd = ConfigDict({
        "meta": {"technical": {"name_fields": ["experiment/number_of_epochs"],
                               "log_to_device": False}},
        "experiment": {"number_of_epochs": 5}})
    tags = fill_dict_with_name_fields(cd, name_fields=[])
    assert tags == ["number_of_epochs: 5"]


def test_device_augment_matches_host_falsy_p_coercion(monkeypatch):
    """The device-lifted RandomRotation applies the SAME falsy-p coercion
    as the host/reference path (wrapped_transforms.py:81: ``p or 1``), so
    toggling device_augmentation never changes the train distribution."""
    from medsegpretrainimagenet_tpu.cli import run_experiment as re_mod
    from medsegpretrainimagenet_tpu.data.transforms.core import (
        build_transform)
    from medsegpretrainimagenet_tpu.ops import augment as augment_mod
    captured = {}

    def fake_make(**kwargs):
        captured.update(kwargs)
        return lambda rng, batch: batch

    monkeypatch.setattr(augment_mod, "make_device_augment", fake_make)
    cfg = {"segmentation.transforms.wrapped_transforms.RandomRotation":
           {"p": 0}}
    device_augment, host = re_mod._split_device_augment([ConfigDict(cfg)])
    assert device_augment is not None
    host_p = build_transform(ConfigDict(cfg), seed=0).p
    assert captured["rotation_probability"] == host_p == 1
    assert host == []


def test_effective_batch_size_respects_spatial_sharding():
    """With spatial_sharding=4 of 8 devices only 2 data devices remain, so
    the per-device cap must bind 4x earlier."""
    from medsegpretrainimagenet_tpu.cli.run_experiment import (
        effective_batch_size)
    # no spatial sharding: 8 data devices, 64/8 = 8 <= 8 -> full batch ok
    assert effective_batch_size(64, 8, 8, 1) == 64
    # spatial 4: 2 data devices -> 64/2 = 32 > 8; largest ok divisor is 16
    assert effective_batch_size(64, 8, 8, 4) == 16
    # single device baseline (reference semantics)
    assert effective_batch_size(64, 8, 1, 1) == 8


def test_argmixes_min_metric_soft_best():
    """Documented deviation (PARITY.md): min metrics compare
    negated-vs-negated, so soft_best_index is the first epoch at least as
    good as the final one — not the reference's always-1."""
    from medsegpretrainimagenet_tpu.cli.run_experiment import get_argmixes
    out = get_argmixes([5.0, 4.0, 2.0, 2.5, 2.5])
    assert out["best_index"] == 3
    assert out["soft_best_index"] == 3  # first epoch <= final 2.5
    out_max = get_argmixes([0.1, 0.8, 0.7])
    assert out_max["best_index"] == 2
    assert out_max["soft_best_index"] == 2


# ---------------------------------------------------------------------------
# prediction_index for multi-output models (reference train_model.py:62-76)
# ---------------------------------------------------------------------------

def test_prediction_index_selects_metric_output():
    import flax.linen as nn

    from medsegpretrainimagenet_tpu.losses import DiceLoss, Loss
    from medsegpretrainimagenet_tpu.metrics import MetricsCalculator
    from medsegpretrainimagenet_tpu.train import (TrainState,
                                                  make_eval_step)

    class TwoHead(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            body = nn.Conv(4, (3, 3))(x)
            aux = nn.Conv(1, (1, 1))(body)
            main = jax.nn.sigmoid(nn.Conv(1, (1, 1))(body))
            return aux, main

    module = TwoHead()
    x = jnp.zeros((2, 8, 8, 3), jnp.float32)
    variables = module.init(jax.random.key(0), x)
    state = TrainState.create(variables, opt_state=None,
                              rng=jax.random.key(1))
    loss = Loss(DiceLoss, ConfigDict({"label type": "mask",
                                      "train prediction index": 1}))
    calc = MetricsCalculator(ConfigDict({"metrics": {
        "metrics": ("metrics.DiceIndex",),
        "calculation": {"thresholds": 0.5, "label_type": "mask"}}}),
        loss=loss)
    step = make_eval_step(module, loss, calc, donate=False,
                          prediction_index=1)
    metrics_state = calc.init_state()
    batch_stack = {
        "x": jnp.asarray(np.random.default_rng(0)
                         .random((1, 2, 8, 8, 3)), jnp.float32),
        "mask": jnp.ones((1, 2, 8, 8), jnp.int32)}
    metrics_state, per_batch = step(state, metrics_state, batch_stack)
    values = calc.finalize_epoch(metrics_state)
    # the sigmoid head (index 1) feeds metrics: dice is well-defined and
    # bounded; the raw aux head would have produced identical counts only
    # by coincidence
    assert 0.0 <= values["metrics/dice_index_threshold_0.5"] <= 1.0
    assert np.isfinite(values[loss.name])
