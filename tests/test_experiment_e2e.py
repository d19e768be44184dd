"""End-to-end: the full experiment path on a tiny synthetic COVID-QU.

Mirrors SURVEY.md §4(c): a COVID-QU-shaped synthetic npy dataset driven
through the reference-config structure (grid parse -> experiment() ->
trials -> train/val/test -> CSV logs -> checkpoints -> resume).
"""
import csv
import glob
import os

import numpy as np
import pytest
import yaml

from medsegpretrainimagenet_tpu.config import ConfigDict
from medsegpretrainimagenet_tpu.cli import experiment
from medsegpretrainimagenet_tpu.cli.run_experiment import check_for_continued


@pytest.fixture
def covidqu_env(tmp_path, monkeypatch, rng):
    root = tmp_path / "data" / "COVID_QU" / "Inf_segm" / "data arrays" \
        / "COVID-19"
    for part, n in (("train and val", 12), ("test", 4)):
        d = root / part
        d.mkdir(parents=True)
        imgs = (rng.random((n, 1, 20, 20)) * 255).astype(np.uint8)
        masks = np.zeros((n, 1, 20, 20), np.uint8)
        masks[:, :, 6:14, 6:14] = 2
        np.save(d / "imgs.npy", imgs)
        np.save(d / "inf_masks.npy", masks)
    monkeypatch.setenv("MST_DATA_DIR", str(tmp_path / "data"))
    monkeypatch.chdir(tmp_path)
    return tmp_path


def minimal_config(tmp_path, epochs=2):
    """Structure of config/downstream/covidqu/unet.yaml, scaled down."""
    return {
        "data": {
            "data": {"segmentation.datasets.COVIDQUDataset": {
                "load_distance_maps": False, "load_masks": True,
                "lung_or_infection": "inf", "image_sizes": 16,
                "validate_on_test": True, "seed": 20231027}},
            "sampling": {"batch_size": 4},
            "transforms": {
                "train": (
                    {"segmentation.transforms.wrapped_transforms."
                     "RandomRotation": {
                         "border_mode": "BORDER_CONSTANT", "limit": 180,
                         "value": 0, "mask_value": 0}},
                    {"segmentation.transforms.wrapped_transforms."
                     "RandomFlip": {"vertical": True, "horizontal": False,
                                    "probability": 0.5}},
                    "transform.RepeatChannels",
                ),
                "val": "transform.RepeatChannels",
                "casting": {"mask": "torch.LongTensor"},
            },
        },
        "model": {"segmentation.models.UNet": {
            "model": "basic U-Net",
            "architecture": {
                "in_channel_size": 3, "out_channel_size": 1,
                "channels": (4, 8), "depth": 1,
                "residual_connections": False,
                "activation_function": {"final": "sigmoid"}},
            "weight_init": {"random": {"torch.nn.init.kaiming_normal_": {
                "a": 0, "mode": "fan_in", "nonlinearity": "relu"}}},
        }},
        "training": {
            "loss": {"segmentation.losses.DiceLoss": {
                "batchwise": True, "include_background": True,
                "apply_softmax": False, "smoothing_term": 1.0e-05}},
            "optimizer": {"sgd": {
                "weight_decay": 0.0001, "momentum": 0.9,
                "learning_rate": {
                    "optim.scheduler.PolyLearningRateDecay": {
                        "base": 0.05, "exponent": 0.9,
                        "iteration_unit": "batch",
                        "number_of_iterations": "auto"}},
                "nesterov_momentum": False, "momentum_dampening": 0.0}},
        },
        "metrics": {
            "calculation": {"thresholds": 0.5, "label_type": "mask"},
            "metrics": ("metrics.DiceIndex", "metrics.BalancedAccuracy"),
        },
        "experiment": {"number_of_epochs": epochs, "number_of_trials": 1},
        "meta": {"technical": {
            "log_metric_and_loss_plots": True,
            "log_to_device": True,
            "maximum_actual_batch_size": 4,
            "model_evaluation": {
                "metric": "val_metrics/dice_index_threshold_0.5",
                "mode": "max"},
            "seed": 123124,
            "verbose": False,
            "export_plots_as": ("json",),
            "log_best_model": True,
            "log_last_model": True,
            "save_destination": str(tmp_path / "logs"),
            "experiment_name": "e2e_test",
            "name_fields": (
                "model/segmentation.models.UNet/model",
                "data/data",
            ),
        }},
    }


def test_experiment_end_to_end(covidqu_env):
    tmp_path = covidqu_env
    cfg = ConfigDict(minimal_config(tmp_path))
    log_data = experiment(cfg, original=None, modifiers=[])

    assert log_data["current_experiment"]
    save_path = log_data["save_path"]
    # experiment-name tagging from name_fields
    assert "basic U-Net" in log_data["exp_name"] \
        or "U-Net" in log_data["exp_name"]

    run_dir = os.path.join(save_path, "run_1")
    assert os.path.isfile(os.path.join(save_path, "config.yaml"))
    assert os.path.isfile(os.path.join(save_path, "environment.txt"))
    with open(os.path.join(run_dir, "epoch_logs.csv")) as fh:
        rows = list(csv.DictReader(fh))
    assert len(rows) == 2
    assert "metrics/dice_index_threshold_0.5" in rows[0]
    assert "val_metrics/dice_index_threshold_0.5" in rows[0]
    assert "val_metrics/balanced_accuracy_threshold_0.5" in rows[0]
    assert "dice_loss" in rows[0]
    # learning rate decays (poly schedule)
    assert float(rows[1]["learning_rate"]) < float(rows[0]["learning_rate"])
    # test pass ran (validate_on_test -> no test split here, but val exists)
    assert os.path.isfile(os.path.join(
        run_dir, "last_model_state_dict.msgpack"))
    assert os.path.isfile(os.path.join(
        run_dir, "best_model_state_dict.msgpack"))
    # history plots (json export)
    assert glob.glob(os.path.join(run_dir, "plots", "*.json"))
    assert os.path.isfile(os.path.join(run_dir, "best_scores.csv"))
    # dumped config has defaults filled in
    with open(os.path.join(save_path, "config.yaml")) as fh:
        dumped = yaml.full_load(fh)
    assert dumped["experiment"]["number_of_epochs"] == 2


def test_experiment_resume(covidqu_env):
    tmp_path = covidqu_env
    cfg = ConfigDict(minimal_config(tmp_path, epochs=2))
    log_data = experiment(cfg, original=None, modifiers=[])
    save_path = log_data["save_path"]

    # resume for 2 more epochs
    resumed_cfg = ConfigDict(minimal_config(tmp_path, epochs=4))
    resumed_cfg["meta/technical/absolute_path"] = save_path
    continued, run_start, epoch_start = check_for_continued(
        ["--continued"], resumed_cfg)
    assert continued and run_start == 1 and epoch_start == 2

    experiment(resumed_cfg, original=None, modifiers=["--continued"])
    with open(os.path.join(save_path, "run_1", "epoch_logs.csv")) as fh:
        rows = list(csv.DictReader(fh))
    assert len(rows) == 4  # 2 original + 2 resumed
    # checkpoint backups created on resume
    assert os.path.isfile(os.path.join(
        save_path, "run_1", "last_model_state_dict_checkpoint.msgpack"))


def test_acdc_experiment_end_to_end(tmp_path, monkeypatch, rng):
    """ACDC reader -> full experiment path (the acdc/unet.yaml shape)."""
    from medsegpretrainimagenet_tpu.data.readers import save_nii

    root = tmp_path / "data" / "ACDC"
    for part, n in (("training", 3), ("testing", 2)):
        for p in range(n):
            d = root / part / f"patient{p:03d}"
            d.mkdir(parents=True)
            for frame in (1, 12):
                img = (rng.random((20, 20, 2)) * 60).astype(np.float32)
                gt = rng.integers(0, 4, (20, 20, 2)).astype(np.uint8)
                save_nii(str(d / f"patient{p:03d}_frame{frame:02d}.nii.gz"),
                         img)
                save_nii(str(d / f"patient{p:03d}_frame{frame:02d}"
                             "_gt.nii.gz"), gt)
    monkeypatch.setenv("MST_DATA_DIR", str(tmp_path / "data"))
    monkeypatch.chdir(tmp_path)

    cd = minimal_config(tmp_path, epochs=1)
    cd["data"]["data"] = {"segmentation.datasets.ACDC": {
        "image_sizes": 16, "validate_on_test": True}}
    cd["meta"]["technical"]["experiment_name"] = "acdc_e2e"
    experiment(ConfigDict(cd))

    run_dir = glob.glob(str(tmp_path / "logs" / "*" / "acdc_e2e*"))[0]
    with open(os.path.join(run_dir, "run_1", "epoch_logs.csv")) as fh:
        rows = list(csv.DictReader(fh))
    assert len(rows) == 1
    assert "metrics/dice_index_threshold_0.5" in rows[0]
    assert "val_dice_loss" in rows[0]


def test_multi_trial_variance_statistics(covidqu_env):
    cd = minimal_config(covidqu_env, epochs=1)
    cd["experiment"]["number_of_trials"] = 2
    cd["meta"]["technical"]["experiment_name"] = "variance_test"
    cd["meta"]["technical"]["name_fields"] = ()
    experiment(ConfigDict(cd))
    exp_dir = glob.glob(str(covidqu_env / "logs" / "*" /
                            "variance_test*"))[0]
    assert os.path.isdir(os.path.join(exp_dir, "run_1"))
    assert os.path.isdir(os.path.join(exp_dir, "run_2"))
    stats_path = os.path.join(exp_dir, "variance_comparisons",
                              "statistics.json")
    assert os.path.isfile(stats_path)
    import json
    with open(stats_path) as fh:
        stats = json.load(fh)
    # mean/median/std of last+best values per metric
    flat = json.dumps(stats)
    assert "mean" in flat and "std" in flat


def test_grid_expansion_runs_all_experiments(covidqu_env):
    cd = minimal_config(covidqu_env, epochs=1)
    # a LIST is a sweep axis: two learning rates -> two experiments
    cd["training"]["optimizer"]["sgd"]["learning_rate"][
        "optim.scheduler.PolyLearningRateDecay"]["base"] = [0.05, 0.01]
    cd["meta"]["technical"]["experiment_name"] = "grid_test"
    cd["meta"]["technical"]["name_fields"] = ()
    from medsegpretrainimagenet_tpu.cli.experiment import (
        run_experiment_from_dict)
    cfg_path = str(covidqu_env / "grid.yaml")
    with open(cfg_path, "w") as fh:
        # yaml.dump keeps tuples as !!python/tuple (literals, not sweep
        # axes) exactly like the shipped reference configs
        yaml.dump(cd, fh)
    run_experiment_from_dict(cfg_path, [])
    dirs = sorted(glob.glob(str(covidqu_env / "logs" / "*" /
                                "grid_test*")))
    assert len(dirs) == 2, dirs
    for d in dirs:
        assert os.path.isfile(os.path.join(d, "run_1", "epoch_logs.csv"))
        # cross-experiment comparisons written into each run dir
        comp = glob.glob(os.path.join(d, "run_1", "comparisons", "*"))
        assert comp, f"no comparison outputs in {d}"


def test_bad_experiment_does_not_kill_the_grid(covidqu_env):
    """Catch-log-continue envelope (SURVEY §5.3): an experiment with an
    unknown component fails non-fatally; the next grid entry still runs."""
    good = minimal_config(covidqu_env, epochs=1)
    good["meta"]["technical"]["experiment_name"] = "envelope_test"
    good["meta"]["technical"]["name_fields"] = ()
    # a LIST of two models: first bogus, second fine
    good["model"] = [
        {"segmentation.models.DoesNotExist": {}},
        good["model"],
    ]
    cfg_path = str(covidqu_env / "envelope.yaml")
    with open(cfg_path, "w") as fh:
        yaml.dump(good, fh)
    from medsegpretrainimagenet_tpu.cli.experiment import (
        run_experiment_from_dict)
    run_experiment_from_dict(cfg_path, [])
    dirs = sorted(glob.glob(str(covidqu_env / "logs" / "*" /
                                "envelope_test*")))
    # at least one run dir produced logs despite the bogus sibling
    done = [d for d in dirs
            if os.path.isfile(os.path.join(d, "run_1", "epoch_logs.csv"))]
    assert done, dirs
    # exactly the good entry completed: the bogus one failed non-fatally
    # (its short traceback goes to stderr; only >1000-char ones are dumped
    # to exceptions/, matching the reference's handle_exception)
    assert len(done) == 1, dirs


def test_mixed_dataset_experiment_end_to_end(covidqu_env):
    """data.MixedDataset as the experiment dataset: virtual columns flow
    through the loader's load_function protocol inside the full path."""
    cd = minimal_config(covidqu_env, epochs=1)
    inner = cd["data"]["data"]
    cd["data"]["data"] = {"data.MixedDataset": {
        "datasets": (inner, inner),
        "switch_frequency": 2,
        "preserve_order": True,
        "balancing_strategy": {"train": "under", "val": "under"},
    }}
    cd["meta"]["technical"]["experiment_name"] = "mixed_e2e"
    cd["meta"]["technical"]["name_fields"] = ()
    experiment(ConfigDict(cd))
    run_dir = glob.glob(str(covidqu_env / "logs" / "*" / "mixed_e2e*"))[0]
    with open(os.path.join(run_dir, "run_1", "epoch_logs.csv")) as fh:
        rows = list(csv.DictReader(fh))
    assert len(rows) == 1
    # strict: a fully-errored epoch logs the empty-state means (dice
    # exactly 1.0, loss exactly 0.0) — [0,1] bounds would accept it
    assert 0.0 < float(rows[0]["metrics/dice_index_threshold_0.5"]) < 1.0
    assert float(rows[0]["dice_loss"]) > 0.0


def test_experiment_with_tensor_parallel_matches_unsharded(covidqu_env):
    """meta/technical/tensor_parallel: 2 runs the full CLI path on a
    ('data', 'model') mesh with big kernels' output channels sharded
    (parallel/tp.py, min_channels lowered so the tiny test model really
    shards) — and the loss trajectory equals the unsharded run's: TP is
    a layout change, not a numerics change."""
    import copy

    tmp_path = covidqu_env
    base = minimal_config(tmp_path, epochs=2)

    def trajectory(cfg_dict, name):
        cfg_dict = copy.deepcopy(cfg_dict)
        cfg_dict["meta"]["technical"]["experiment_name"] = name
        log_data = experiment(ConfigDict(cfg_dict), original=None,
                              modifiers=[])
        run_dir = os.path.join(log_data["save_path"], "run_1")
        with open(os.path.join(run_dir, "epoch_logs.csv")) as fh:
            rows = list(csv.DictReader(fh))
        assert len(rows) == 2
        return [(float(r["dice_loss"]), float(r["val_dice_loss"]),
                 float(r["metrics/dice_index_threshold_0.5"]))
                for r in rows]

    ref = trajectory(base, "e2e_dp")
    tp_cfg = copy.deepcopy(base)
    tp_cfg["meta"]["technical"]["tensor_parallel"] = 2
    tp_cfg["meta"]["technical"]["tensor_parallel_min_channels"] = 4
    got = trajectory(tp_cfg, "e2e_tp")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=1e-6)


def test_experiment_rejects_tp_plus_spatial(covidqu_env):
    """The 3-D composition is refused because jax 0.9.0 miscompiles conv
    gradients on >2-axis meshes (test_parallel.py::
    test_3axis_mesh_conv_grad_upstream_bug is the strict-xfail canary
    that flags when an upgrade makes it safe to enable)."""
    tmp_path = covidqu_env
    cfg_dict = minimal_config(tmp_path, epochs=1)
    cfg_dict["meta"]["technical"]["tensor_parallel"] = 2
    cfg_dict["meta"]["technical"]["spatial_sharding"] = 2
    # the CLI error envelope catches and logs; the run must produce no
    # epoch logs (the experiment dies before training starts)
    log_data = experiment(ConfigDict(cfg_dict), original=None, modifiers=[])
    run_dir = os.path.join(log_data["save_path"], "run_1")
    assert not os.path.isfile(os.path.join(run_dir, "epoch_logs.csv"))


def test_experiment_rejects_tp_exceeding_devices(covidqu_env):
    """A sharding request the host cannot honor is refused up front —
    validation runs OUTSIDE the multi-device branch, so a 1-device host
    fails the same way instead of silently running unsharded."""
    tmp_path = covidqu_env
    cfg_dict = minimal_config(tmp_path, epochs=1)
    cfg_dict["meta"]["technical"]["tensor_parallel"] = 16  # mesh has 8
    log_data = experiment(ConfigDict(cfg_dict), original=None, modifiers=[])
    run_dir = os.path.join(log_data["save_path"], "run_1")
    assert not os.path.isfile(os.path.join(run_dir, "epoch_logs.csv"))


def test_experiment_with_spatial_sharding(covidqu_env):
    """meta/technical/spatial_sharding: 2 drives the full CLI path on a
    ('data', 'spatial') mesh — the image-height dim sharded over two
    devices with XLA halo exchanges — and still trains/logs normally.
    Also rides profile: true to pin the profiling artifacts (step_times +
    the per-epoch train/val/ckpt phase split)."""
    tmp_path = covidqu_env
    cfg_dict = minimal_config(tmp_path, epochs=1)
    cfg_dict["meta"]["technical"]["spatial_sharding"] = 2
    cfg_dict["meta"]["technical"]["profile"] = True
    cfg = ConfigDict(cfg_dict)
    log_data = experiment(cfg, original=None, modifiers=[])
    run_dir = os.path.join(log_data["save_path"], "run_1")
    with open(os.path.join(run_dir, "epoch_logs.csv")) as fh:
        rows = list(csv.DictReader(fh))
    assert len(rows) == 1
    assert 0 <= float(rows[0]["metrics/dice_index_threshold_0.5"]) <= 1
    assert float(rows[0]["dice_loss"]) > 0
    with open(os.path.join(run_dir, "profile", "epoch_times.csv")) as fh:
        seg_rows = list(csv.DictReader(fh))
    assert len(seg_rows) == 1
    for col in ("train_s", "cm_export_s", "val_s", "ckpt_s", "total_s"):
        assert float(seg_rows[0][col]) >= 0
    # attribution sanity: total is the sum of the phases
    phases = [v for k, v in seg_rows[0].items()
              if k.endswith("_s") and k != "total_s"]
    assert abs(sum(map(float, phases))
               - float(seg_rows[0]["total_s"])) < 0.01
    assert os.path.isfile(os.path.join(run_dir, "profile",
                                       "step_times.csv"))
