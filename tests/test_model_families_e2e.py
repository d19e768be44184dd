"""Tiny end-to-end experiment runs for the non-basic model families:
Swin U-Net and ResNet Attention U-Net (the shapes of
``config/downstream/*/swin_unet.yaml`` and
``*/resnet50_attention_unet.yaml``)."""
import csv
import glob
import os

import numpy as np
import pytest

from medsegpretrainimagenet_tpu.cli import experiment
from medsegpretrainimagenet_tpu.config import ConfigDict


@pytest.fixture
def covidqu_env(tmp_path, monkeypatch, rng):
    root = tmp_path / "data" / "COVID_QU" / "Inf_segm" / "data arrays" \
        / "COVID-19"
    for part, n in (("train and val", 8), ("test", 4)):
        d = root / part
        d.mkdir(parents=True)
        np.save(d / "imgs.npy",
                (rng.random((n, 1, 32, 32)) * 255).astype(np.uint8))
        masks = np.zeros((n, 1, 32, 32), np.uint8)
        masks[:, :, 10:22, 10:22] = 2
        np.save(d / "inf_masks.npy", masks)
    monkeypatch.setenv("MST_DATA_DIR", str(tmp_path / "data"))
    monkeypatch.chdir(tmp_path)
    return tmp_path


def _base_config(tmp_path, name):
    return {
        "data": {
            "data": {"segmentation.datasets.COVIDQUDataset": {
                "lung_or_infection": "inf", "image_sizes": 32,
                "validate_on_test": True, "seed": 1}},
            "sampling": {"batch_size": 4},
            "transforms": {"train": "transform.RepeatChannels",
                           "val": "transform.RepeatChannels",
                           "casting": {"mask": "torch.LongTensor"}},
        },
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
            "experiment_name": name, "maximum_actual_batch_size": 4,
            "seed": 3, "verbose": False, "export_plots_as": ("json",),
            "log_best_model": False, "log_last_model": True,
            "name_fields": (),
            "save_destination": str(tmp_path / "logs"),
        }},
    }


def _run_and_check(tmp_path, cd, name):
    experiment(ConfigDict(cd))
    run_dir = glob.glob(str(tmp_path / "logs" / "*" / (name + "*")))[0]
    with open(os.path.join(run_dir, "run_1", "epoch_logs.csv")) as fh:
        rows = list(csv.DictReader(fh))
    assert len(rows) == 1
    dice = float(rows[0]["metrics/dice_index_threshold_0.5"])
    # STRICT bounds: a fully-errored epoch (every batch swallowed by the
    # catch-log-continue envelope) logs the empty-state means — dice
    # exactly 1.0 and loss exactly 0.0 — which the old `0 <= dice <= 1`
    # bound accepted.  That hid a real toy-config bug (ResNet-encoder
    # decoder one upsample short -> 16x16 output vs 32x32 masks,
    # TypeError every batch, green test).
    assert 0.0 < dice < 1.0
    assert float(rows[0]["dice_loss"]) > 0.0
    assert os.path.isfile(os.path.join(
        run_dir, "run_1", "last_model_state_dict.msgpack"))


def test_swin_unet_family_e2e(covidqu_env):
    """The swin_unet.yaml model shape at toy scale."""
    cd = _base_config(covidqu_env, "swin_e2e")
    cd["model"] = {"segmentation.models.UNet": {
        "architecture": {
            "activation_function": {"final": "sigmoid"},
            "mixing_block": {
                "segmentation.models.blocks.ConcatLinearBlock": {
                    "halve_channels": True, "pass_all_input": True}},
            "basic_block": {
                "segmentation.models.blocks.SwinTransformerBlock": {
                    "img_size": 32, "patch_size": 4, "embed_dim": 8,
                    "num_heads_layers": (2, 4), "window_size": 4}},
            "channels": (8, 16),
            "change_channels_in_block": False,
            "depth": 1, "width": 2,
            "downsampling": {
                "segmentation.models.blocks.PatchMerging": {}},
            "final_block": {
                "segmentation.models.blocks.FinalPatchExpand_X4": {
                    "dim_scale": 4}},
            "in_channel_size": 3, "out_channel_size": 1,
            "trainable_downsampling": True,
            "stem": {"segmentation.models.blocks.PatchEmbed": {
                "patch_size": 4}},
            "upsampling": {"segmentation.models.blocks.PatchExpand": {
                "dim_scale": 2}},
            "stochastic_depth_rate": 0.1},
        "weight_init": {"random": {"timm.models.layers.trunc_normal_": {
            "std": 0.02}}},
    }}
    _run_and_check(covidqu_env, cd, "swin_e2e")


def test_resnet_attention_unet_family_e2e(covidqu_env):
    """The resnet50_attention_unet.yaml model shape at toy scale."""
    cd = _base_config(covidqu_env, "attn_e2e")
    cd["model"] = {"segmentation.models.UNet": {
        "architecture": {
            "activation_function": {"final": "sigmoid"},
            "encoder": {"classification.models.DeepResNet": {
                "version": "v1", "bottleneck": True,
                "channel_sizes": (8, 16), "widths": (1, 1),
                "in_channels": 3, "base_channel_size": 4}},
            "mixing_block": {
                "segmentation.models.blocks.AttentionBlock": {}},
            "out_channel_size": 1,
            # depth+1 decoder ups, like the reference's real config
            # (5 entries for the depth-4 resnet50 yaml): the extra up
            # undoes the resnet stem's /2 so the logits match the mask
            # resolution
            "decoder_channels": (8, 4, 4)},
        "weight_init": {"random": {"torch.nn.init.kaiming_normal_": {
            "nonlinearity": "relu"}}},
    }}
    _run_and_check(covidqu_env, cd, "attn_e2e")


def test_idrid_experiment_end_to_end(tmp_path, monkeypatch, rng):
    """IDRiD reader + RandomPick/Partition transforms through the full
    experiment path (the idrid/unet.yaml shape, scaled down)."""
    from PIL import Image

    base = tmp_path / "data" / "idrid" / "Segmentation" / "A. Segmentation"
    imgs = base / "1. Original Images"
    masks = base / "2. All Segmentation Groundtruths"
    size = (64, 224)
    idx = 1
    for part, n in (("a. Training Set", 4), ("b. Testing Set", 2)):
        (imgs / part).mkdir(parents=True)
        (masks / part / "1. Microaneurysms").mkdir(parents=True)
        for _ in range(n):
            arr = np.zeros((*size, 3), np.uint8)
            arr[8:-8, 16:-16] = rng.integers(100, 255,
                                             (size[0] - 16, size[1] - 32, 3))
            Image.fromarray(arr).save(imgs / part / f"IDRiD_{idx:02d}.jpg")
            m = np.zeros(size, np.uint8)
            m[10:20, 100:120] = 255
            Image.fromarray(m).save(
                masks / part / "1. Microaneurysms" /
                f"IDRiD_{idx:02d}_MA.tif")
            idx += 1
    monkeypatch.setenv("MST_DATA_DIR", str(tmp_path / "data"))
    monkeypatch.chdir(tmp_path)

    cd = _base_config(tmp_path, "idrid_e2e")
    cd["data"]["data"] = {"segmentation.datasets.IDRiD": {
        "task": "MA", "base_image_sizes": (32, 48),
        "cropped_image_sizes": (32, 32), "train_crop_stride": (16, 16),
        "darkness_threshold": 1.1,  # keep all crops of the tiny tree
        "validation_set": "test", "train_set_size": 4}}
    cd["data"]["transforms"] = {
        "train": (
            {"segmentation.transforms.wrapped_transforms.RandomPick": {
                "crop_size": 16}},
            {"segmentation.transforms.wrapped_transforms.RandomFlip": {}},
        ),
        "val": {"segmentation.transforms.wrapped_transforms.Partition": {
            "number_of_partitions": (2, 2), "size": 16}},
        "casting": {"mask": "torch.LongTensor"},
    }
    cd["model"] = {"segmentation.models.UNet": {
        "architecture": {
            "in_channel_size": 3, "out_channel_size": 1,
            "channels": (4, 8), "depth": 1,
            "activation_function": {"final": "sigmoid"}},
        "weight_init": {"random": {"torch.nn.init.kaiming_normal_": {
            "nonlinearity": "relu"}}},
    }}
    _run_and_check(tmp_path, cd, "idrid_e2e")
