"""End-to-end pretraining -> downstream encoder transfer (the paper's
core workflow): ImageNet-style classification pretraining of a U-Net
encoder inside a FeedForwardModel, epoch-tagged checkpointing, then a
COVID-QU downstream run initialised from that checkpoint
(reference ``unet_models.py:555-588`` / ``config/pretraining`` +
``config/downstream``)."""
import csv
import glob
import json
import os

import numpy as np
import pytest

from medsegpretrainimagenet_tpu.cli import experiment
from medsegpretrainimagenet_tpu.config import ConfigDict
from medsegpretrainimagenet_tpu.train.checkpoint import (
    load_encoder_params, load_params_file)


@pytest.fixture
def imagenet_env(tmp_path, monkeypatch, rng):
    root = tmp_path / "data" / "imagenet"
    root.mkdir(parents=True)
    labels = {}
    for i in range(20):
        name = f"{'val' if i >= 16 else 'train'}_{i:03d}.npy"
        np.save(root / name,
                (rng.random((3, 16, 16)) * 255).astype(np.uint8))
        labels[name] = int(rng.integers(1, 6))  # classes 1..5
    with open(root / "labels.json", "w") as fh:
        json.dump(labels, fh)
    monkeypatch.setenv("MST_DATA_DIR", str(tmp_path / "data"))
    monkeypatch.chdir(tmp_path)
    return tmp_path


def pretraining_config(tmp_path, epochs=2):
    """config/pretraining/unet_encoder/simple.yaml, scaled down."""
    return {
        "experiment": {"number_of_epochs": epochs},
        "data": {
            "data": "classification.datasets.ImageNet",
            "sampling": {"batch_size": 4},
            "transforms": {"casting": {"label": "torch.LongTensor"}},
        },
        "model": {"model.FeedForwardModel": {
            "layers": (
                {"segmentation.models.UNet_encoder": {
                    "in_channel_size": 3, "channels": (4, 8), "depth": 1}},
                {"torch.nn.AdaptiveAvgPool2d": {"output_size": 1}},
                "torch.nn.Flatten",
                {"torch.nn.Linear": {"in_features": 8,
                                     "out_features": 5}},
            ),
            "weight_init": {"torch.nn.init.kaiming_normal_": {
                "nonlinearity": "relu"}},
        }},
        "training": {
            "loss": {"classification.losses.CrossEntropyLoss": {
                "label_smoothing": 0.1, "label_type": "label"}},
            "optimizer": {"torch.optim.AdamW": {
                "learning_rate": {
                    "optim.scheduler.LinearWarmupScheduler": {
                        "base": 0.004, "warmup_length": 2,
                        "main_scheduler": {
                            "torch.optim.lr_scheduler.CosineAnnealingLR":
                                {"eta_min": 1.0e-06, "T_max": "auto"}},
                        "iteration_unit": "batch"}},
                "betas": (0.9, 0.999), "weight_decay": 0.05}},
        },
        "metrics": {
            "metrics": ("metrics.multiclass_metrics.Accuracy",
                        "metrics.multiclass_metrics.AUROC"),
            "calculation": {"include_background_in_averages": True,
                            "apply_softmax": True,
                            "number_of_classes": 5,
                            "label_type": "label",
                            "log_confusion_matrix": True,
                            # per-epoch export (the default is 'last' only,
                            # reference multiclass_metrics.py:19)
                            "log_confusion_matrix_at": (1, 2)},
        },
        "meta": {"technical": {
            "experiment_name": "pretrain_test",
            "verbose": False,
            "maximum_actual_batch_size": 4,
            "model_log_checkpoints": (1,),
            "log_to_device": True,
            "log_best_model": False,
            "log_last_model": True,
            "seed": 1,
            "export_plots_as": ("json",),
            "save_destination": str(tmp_path / "logs"),
        }},
    }


def downstream_config(tmp_path, weights_path):
    return {
        "data": {
            "data": {"segmentation.datasets.COVIDQUDataset": {
                "lung_or_infection": "inf", "image_sizes": 16,
                "validate_on_test": True, "seed": 1}},
            "sampling": {"batch_size": 4},
            "transforms": {"train": "transform.RepeatChannels",
                           "val": "transform.RepeatChannels",
                           "casting": {"mask": "torch.LongTensor"}},
        },
        "model": {"segmentation.models.UNet": {
            "architecture": {
                "in_channel_size": 3, "out_channel_size": 1,
                "channels": (4, 8), "depth": 1,
                "activation_function": {"final": "sigmoid"}},
            "weight_init": {
                "random": {"torch.nn.init.kaiming_normal_": {
                    "nonlinearity": "relu"}},
                "encoder": {"weights": weights_path, "strict": False,
                            "pretrained_encoder": True}},
        }},
        "training": {
            "loss": "segmentation.losses.DiceLoss",
            "optimizer": {"sgd": {"learning_rate": {
                "constant": {"base": 0.01}}}},
        },
        "metrics": {
            "calculation": {"thresholds": 0.5, "label_type": "mask"},
            "metrics": ("metrics.DiceIndex",),
        },
        "experiment": {"number_of_epochs": 1},
        "meta": {"technical": {
            "experiment_name": "downstream_test",
            "maximum_actual_batch_size": 4,
            "seed": 2, "verbose": False,
            "export_plots_as": ("json",),
            "log_best_model": False, "log_last_model": True,
            "save_destination": str(tmp_path / "logs"),
        }},
    }


def test_pretrain_then_transfer(imagenet_env, tmp_path, monkeypatch, rng):
    # --- pretraining run --------------------------------------------------
    experiment(ConfigDict(pretraining_config(tmp_path)))
    run_dir = glob.glob(str(tmp_path / "logs" / "*" / "pretrain_test"))[0]
    ckpt_path = os.path.join(run_dir, "run_1",
                             "model_state_dict_epoch_1.msgpack")
    assert os.path.isfile(ckpt_path)
    with open(os.path.join(run_dir, "run_1", "epoch_logs.csv")) as fh:
        rows = list(csv.DictReader(fh))
    assert len(rows) == 2
    acc_col = [c for c in rows[0] if "accuracy" in c and
               not c.startswith("val_")]
    assert acc_col, f"no accuracy column in {list(rows[0])}"
    assert 0.0 <= float(rows[-1][acc_col[0]]) <= 1.0
    # strict: a fully-errored epoch logs empty-state means (loss exactly
    # 0.0); a real untrained-CE epoch is strictly positive
    loss_col = [c for c in rows[0] if c.endswith("cross_entropy_loss")
                and not c.startswith("val_")]
    assert loss_col, f"no CE loss column in {list(rows[0])}"
    assert float(rows[-1][loss_col[0]]) > 0.0
    # exact reference column name (multiclass_metrics.py:549-556): a
    # fuzzy match here previously hid a mean_area_under_roc misnaming
    assert "metrics/area_under_roc" in rows[0], list(rows[0])
    assert 0.0 <= float(rows[-1]["metrics/area_under_roc"]) <= 1.0

    # checkpoint has the FeedForwardModel layer structure
    encoder_tree = load_encoder_params(ckpt_path)
    assert "stem_block" in encoder_tree

    # confusion-matrix images logged at the configured epochs, train and
    # validation passes each (reference multiclass_metrics.py:124-153)
    for prefix in ("train_", "val_"):
        cms = glob.glob(os.path.join(
            run_dir, "run_1", "Confusion_matrices",
            f"{prefix}confusion_matrix_epoch_*.json"))
        assert len(cms) == 2, (prefix, cms)

    # --- downstream run with encoder transfer ------------------------------
    # build COVID-QU data
    root = tmp_path / "data" / "COVID_QU" / "Inf_segm" / "data arrays" \
        / "COVID-19"
    for part, n in (("train and val", 8), ("test", 4)):
        d = root / part
        d.mkdir(parents=True)
        np.save(d / "imgs.npy",
                (rng.random((n, 1, 16, 16)) * 255).astype(np.uint8))
        masks = np.zeros((n, 1, 16, 16), np.uint8)
        masks[:, :, 5:11, 5:11] = 2
        np.save(d / "inf_masks.npy", masks)

    experiment(ConfigDict(downstream_config(tmp_path, ckpt_path)))
    ds_dir = glob.glob(str(tmp_path / "logs" / "*" / "downstream_test"))[0]
    final = load_params_file(os.path.join(
        ds_dir, "run_1", "last_model_state_dict.msgpack"))

    # the downstream encoder started from the pretrained weights: after one
    # tiny epoch it should still be closer to the checkpoint than a fresh
    # random init would be
    pre_stem = np.asarray(encoder_tree["stem_block"]["Conv_0"]["kernel"])
    post_stem = np.asarray(final["params"]["enc"]["stem_block"]["Conv_0"]
                           ["kernel"])
    assert pre_stem.shape == post_stem.shape
    assert np.abs(pre_stem - post_stem).mean() < 0.05


def test_encoder_transfer_restores_bn_running_stats(tmp_path):
    """Native pretraining checkpoints carry BN running stats; encoder
    transfer must graft them (eval forwards otherwise normalize with
    init mean=0/var=1)."""
    import jax
    import numpy as np

    from medsegpretrainimagenet_tpu.config import ConfigDict
    from medsegpretrainimagenet_tpu.models import Model, UNet
    from medsegpretrainimagenet_tpu.train import checkpoint as ckpt

    model = Model(UNet, ConfigDict({}))
    model.module = UNet(img_ch=1, output_ch=1, channels=[4, 8], depth=1)
    variables = model.init(jax.random.key(0),
                           {"x": np.zeros((1, 16, 16, 1), np.float32)})

    # fake a pretraining checkpoint: the encoder subtree under layers_0,
    # with recognisable running stats
    fake_stats = jax.tree_util.tree_map(
        lambda x: np.full_like(np.asarray(x), 0.123),
        variables["batch_stats"]["enc"])
    ckpt.save_params_file(
        str(tmp_path / "pre.msgpack"),
        {"params": {"layers_0": variables["params"]["enc"]},
         "batch_stats": {"layers_0": fake_stats}})

    cfg = ConfigDict({"weight_init": {
        "encoder": {"weights": str(tmp_path / "pre.msgpack")}}})
    out = model._encoder_transfer(cfg, variables)
    leaves = jax.tree_util.tree_leaves(out["batch_stats"]["enc"])
    assert all(np.allclose(np.asarray(l), 0.123) for l in leaves)
