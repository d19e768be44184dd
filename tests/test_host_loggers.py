"""ImageLogger + ROC/PR curve epoch loggers (reference
``img_vis.py`` / ``metrics.py:452-651``)."""
import glob
import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from medsegpretrainimagenet_tpu.config import ConfigDict
from medsegpretrainimagenet_tpu.metrics import (ImageLogger,
                                                PrecisionRecallCurve,
                                                ROCCurve, build_host_loggers)


def _config(metrics=("metrics.DiceIndex",
                     "segmentation.image_logging.ImageLogger",
                     "metrics.ROCCurve",
                     "metrics.PrecisionRecallCurve"),
            calculation=None, epochs=3):
    calc = {"thresholds": (0.3, 0.5), "label_type": "mask",
            "number_of_images_to_save": 2,
            "save_sample_images_at": (1, "last"),
            "calculate_curves_at": "last",
            "number_of_batches_to_sample_curves_from": 2,
            "draw_mask_contour": True}
    calc.update(calculation or {})
    return ConfigDict({
        "metrics": {"metrics": tuple(metrics), "calculation": calc},
        "experiment": {"number_of_epochs": epochs},
        "meta": {"technical": {"export_plots_as": ("json",)}},
    })


def _batches(n_batches=3, bs=4, size=16, seed=0):
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(n_batches):
        x = rng.random((bs, size, size, 1)).astype(np.float32)
        mask = (x[..., 0] > 0.6).astype(np.int32)
        out.append({"x": x, "mask": mask})
    return out


def _forward(x):
    # fake "prediction": smoothed input channel
    x = jnp.asarray(x)
    return x[..., 0] * 0.8 + 0.1


def test_build_host_loggers_from_config(tmp_path):
    loggers = build_host_loggers(_config(), str(tmp_path))
    kinds = [type(lg).__name__ for lg in loggers]
    assert kinds == ["ImageLogger", "ROCCurve", "PrecisionRecallCurve"]


def test_active_epoch_semantics(tmp_path):
    logger = ImageLogger(_config(), str(tmp_path))
    assert logger.active(1)
    assert not logger.active(2)
    assert not logger.active(3)           # 'last' handled via last=True
    assert logger.active(3, last=True)
    assert logger.do_last


def test_image_logger_binary_panels(tmp_path):
    logger = ImageLogger(_config(), str(tmp_path))
    logger.log(1, _batches(), _forward, train=True)
    logger.log(1, _batches(), _forward, train=False)
    train_imgs = sorted(glob.glob(str(
        tmp_path / "Sample images" / "epoch_1" / "train" / "*.png")))
    val_imgs = sorted(glob.glob(str(
        tmp_path / "Sample images" / "epoch_1" / "val" / "*.png")))
    assert len(train_imgs) == 2 and len(val_imgs) == 2


def test_image_logger_multiclass_panels(tmp_path):
    cfg = _config(calculation={"number_of_classes": 4})
    logger = ImageLogger(cfg, str(tmp_path),
                         class_names=("bg", "RV", "myo", "LV"))
    rng = np.random.default_rng(0)
    batches = [{"x": rng.random((2, 16, 16, 1)).astype(np.float32),
                "mask": rng.integers(0, 4, (2, 16, 16))}]

    def forward(x):
        return jnp.asarray(rng.random((2, 16, 16, 4)), jnp.float32)

    logger.log(1, batches, forward, train=False)
    imgs = glob.glob(str(
        tmp_path / "Sample images" / "epoch_1" / "val" / "*.png"))
    assert len(imgs) == 2


def test_roc_and_pr_curves_export_json(tmp_path):
    cfg = _config()
    roc = ROCCurve(cfg, str(tmp_path))
    pr = PrecisionRecallCurve(cfg, str(tmp_path))
    # 'last' only: inactive during regular epochs
    assert not roc.active(1) and roc.active(3, last=True)
    roc.log(3, _batches(), _forward, train=False, last=True)
    pr.log(3, _batches(), _forward, train=True, last=True)
    roc_files = glob.glob(str(tmp_path / "ROC_curves" / "*.json"))
    pr_files = glob.glob(str(tmp_path / "Precision-recall_curves" /
                             "*.json"))
    assert len(roc_files) == 1 and "val_" in os.path.basename(roc_files[0])
    assert len(pr_files) == 1
    with open(roc_files[0]) as fh:
        payload = json.load(fh)
    assert payload["xlabel"] == "false positive rate"
    assert len(payload["Ys"][0]) > 2


def test_curves_skip_all_negative_batches(tmp_path):
    cfg = _config()
    roc = ROCCurve(cfg, str(tmp_path))
    batches = [{"x": np.zeros((2, 8, 8, 1), np.float32),
                "mask": np.zeros((2, 8, 8), np.int32)}]
    roc.log(3, batches, _forward, train=True, last=True)
    assert not glob.glob(str(tmp_path / "ROC_curves" / "*"))


def test_loggers_through_train_model(tmp_path):
    """Full loop integration: panels + curves written during training."""
    from medsegpretrainimagenet_tpu.data import BalancedDataLoader
    from medsegpretrainimagenet_tpu.losses import DiceLoss, Loss
    from medsegpretrainimagenet_tpu.metrics import MetricsCalculator
    from medsegpretrainimagenet_tpu.models import UNet
    from medsegpretrainimagenet_tpu.optim import Optimizer
    from medsegpretrainimagenet_tpu.train import (TrainState, train_model)

    data = _batches(1, bs=8)[0]
    loader_cfg = ConfigDict({"epoch": {"uniform": {}},
                             "batch": {"uniform": {}},
                             "relative_size": 1.0, "sort_by": None,
                             "pad_with": None})
    loader = BalancedDataLoader(data, loader_cfg, bs=4, actual_bs=4,
                                seed=0, drop_last=True)
    module = UNet(img_ch=1, output_ch=1, channels=[4, 8], depth=1)
    variables = module.init(jax.random.key(0), jnp.zeros((1, 16, 16, 1)))
    optimizer = Optimizer(ConfigDict({"sgd": {
        "learning_rate": {"constant": {"base": 0.05}}}}),
        num_epochs=2, batches_per_epoch=2)
    state = TrainState.create(variables, optimizer.tx.init(
        variables["params"]), jax.random.key(1))
    loss = Loss(DiceLoss, ConfigDict({"label type": "mask"}))
    cfg = _config(epochs=2)
    cfg["meta/technical/absolute path"] = str(tmp_path) + "/"
    cfg["meta/technical/log to device"] = True
    cfg["meta/technical/log_best_model"] = False
    calculator = MetricsCalculator(cfg, loss=loss)
    loggers = build_host_loggers(cfg, str(tmp_path) + "/run/")

    train_model(module, loader, loader, None, cfg, optimizer, state,
                loss=loss, metrics_and_loss=calculator, name="run",
                virtual_batch_size=4, true_batch_size=4, verbose=False,
                host_loggers=loggers)

    assert glob.glob(str(tmp_path / "run" / "Sample images" / "epoch_1" /
                         "train" / "*.png"))
    assert glob.glob(str(tmp_path / "run" / "Sample images" / "epoch_2" /
                         "*" / "*.png"))          # 'last' pass
    assert glob.glob(str(tmp_path / "run" / "ROC_curves" / "*.json"))
    assert glob.glob(str(tmp_path / "run" /
                         "Precision-recall_curves" / "*.json"))


def test_image_logger_scans_past_negative_batches_by_default(tmp_path):
    """A rare-positive split (first 10 batches all-negative) still yields
    the requested images — the reference scans until the count is
    collected (img_vis.py); the stall window is opt-in and never applies
    on the 'last' pass."""
    rng = np.random.default_rng(0)
    negatives = [{"x": rng.random((2, 16, 16, 1)).astype(np.float32),
                  "mask": np.zeros((2, 16, 16), np.int32)}
                 for _ in range(10)]
    positive = {"x": rng.random((2, 16, 16, 1)).astype(np.float32),
                "mask": np.ones((2, 16, 16), np.int32)}
    loader = negatives + [positive]

    logger = ImageLogger(_config(
        calculation={"number_of_images_to_save": 1}), str(tmp_path))
    logger.log(1, loader, _forward, train=True)
    assert len(glob.glob(str(tmp_path / "Sample images" / "epoch_1"
                             / "train" / "*.png"))) == 1

    # opt-in stall window (3 fruitless batches) stops the scan early ...
    logger2 = ImageLogger(_config(
        calculation={"number_of_images_to_save": 1,
                     "image_scan_stall_window": 3}),
        str(tmp_path / "b"))
    logger2.log(1, loader, _forward, train=True)
    assert not glob.glob(str(tmp_path / "b" / "Sample images" / "epoch_1"
                             / "train" / "*.png"))

    # ... but never on the 'last' pass, where completeness wins
    logger2.log(2, loader, _forward, train=True, last=True)
    assert len(glob.glob(str(tmp_path / "b" / "Sample images" / "epoch_2"
                             / "train" / "*.png"))) == 1
