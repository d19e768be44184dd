import csv
import os
import time

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from medsegpretrainimagenet_tpu.config import ConfigDict
from medsegpretrainimagenet_tpu.data import BalancedDataLoader
from medsegpretrainimagenet_tpu.losses import DiceLoss, Loss
from medsegpretrainimagenet_tpu.metrics import MetricsCalculator
from medsegpretrainimagenet_tpu.models import Model, UNet
from medsegpretrainimagenet_tpu.optim import Optimizer
from medsegpretrainimagenet_tpu.parallel import create_mesh, replicated
from medsegpretrainimagenet_tpu.train import (TrainState, make_eval_step,
                                              make_train_step, train_model)


def synthetic_segmentation_data(n=16, size=16, rng=None):
    """Learnable toy task: mask = bright blob region."""
    rng = rng or np.random.default_rng(0)
    xs, masks = [], []
    for _ in range(n):
        x = rng.random((size, size, 1)).astype(np.float32) * 0.3
        cx, cy = rng.integers(4, size - 4, 2)
        x[cx - 3:cx + 3, cy - 3:cy + 3] += 0.7
        mask = (x[..., 0] > 0.5).astype(np.int32)
        xs.append(x)
        masks.append(mask)
    return {"x": np.stack(xs), "mask": np.stack(masks)}


def make_loader(data, bs=4):
    cfg = ConfigDict({"epoch": {"uniform": {}}, "batch": {"uniform": {}},
                      "relative_size": 1.0, "sort_by": None,
                      "pad_with": None})
    return BalancedDataLoader(data, cfg, bs=bs, actual_bs=bs, seed=0,
                              drop_last=True)


def build_training(tmp_path, channels=(4, 8), epochs=2):
    model = Model(UNet, ConfigDict({"architecture": {
        "channels": tuple(channels), "depth": len(channels) - 1,
        "in channel size": 1}}))
    # Model wrapper consumes PARAMS-style config paths; build directly:
    model.module = UNet(img_ch=1, output_ch=1, channels=list(channels),
                        depth=len(channels) - 1)
    variables = model.init(jax.random.key(0),
                           {"x": jnp.zeros((1, 16, 16, 1))})
    opt_cfg = ConfigDict({"sgd": {
        "momentum": 0.9, "weight_decay": 0.0,
        "learning_rate": {"constant": {"base": 0.1}}}})
    optimizer = Optimizer(opt_cfg, num_epochs=epochs, batches_per_epoch=4)
    state = TrainState.create(variables, optimizer.tx.init(
        variables["params"]), jax.random.key(1))
    loss = Loss(DiceLoss, ConfigDict({"label type": "mask"}))
    metrics_cfg = ConfigDict({"metrics": {
        "metrics": ("metrics.DiceIndex", "metrics.BalancedAccuracy"),
        "calculation": {"thresholds": 0.5, "label_type": "mask"}}})
    calculator = MetricsCalculator(metrics_cfg, loss=loss)
    config = ConfigDict({
        "meta": {"technical": {
            "absolute path": str(tmp_path) + "/",
            "log to device": True,
            "log_last_model": True,
            "log_best_model": True,
            "model_evaluation": {
                "metric": "val_metrics/dice_index_threshold_0.5",
                "mode": "max"},
        }},
        "experiment": {"number of epochs": epochs},
    })
    return model, optimizer, state, loss, calculator, config


def test_train_step_decreases_loss(tmp_path):
    model, optimizer, state, loss, calculator, _ = build_training(tmp_path)
    data = synthetic_segmentation_data()
    step = make_train_step(model, loss, calculator, optimizer)
    metrics_state = calculator.init_state()
    batch = {k: jnp.asarray(v[None, :8]) for k, v in data.items()}
    losses = []
    for _ in range(12):
        state, metrics_state, per_batch = step(state, metrics_state, batch)
        losses.append(float(per_batch["dice_loss"]))
    assert losses[-1] < losses[0]
    assert "gradient_magnitude" in per_batch


def test_gradient_accumulation_equivalence(tmp_path):
    """2 fragments of 4 must give the same grads as 1 fragment of 8
    (up to BN batch-statistics differences — so disable update effects by
    comparing the resulting loss trajectory shape only loosely)."""
    model, optimizer, state, loss, calculator, _ = build_training(tmp_path)
    data = synthetic_segmentation_data(n=8)
    step = make_train_step(model, loss, calculator, optimizer, donate=False)
    # one virtual batch split two ways
    whole = {k: jnp.asarray(v[None]) for k, v in data.items()}
    split = {k: jnp.asarray(v.reshape((2, 4) + v.shape[1:]))
             for k, v in data.items()}
    s1, ms1, pb1 = step(state, calculator.init_state(), whole)
    s2, ms2, pb2 = step(state, calculator.init_state(), split)
    # losses agree (same data, same params; fragment mean == full mean
    # because fragments are equal-sized)
    assert float(pb1["dice_loss"]) == pytest.approx(
        float(pb2["dice_loss"]), rel=1e-3)


def test_train_model_end_to_end(tmp_path):
    model, optimizer, state, loss, calculator, config = build_training(
        tmp_path, epochs=2)
    data = synthetic_segmentation_data(n=16)
    train_loader = make_loader(data)
    val_loader = make_loader(synthetic_segmentation_data(
        n=8, rng=np.random.default_rng(7)))

    state = train_model(model, train_loader, val_loader, val_loader,
                        config, optimizer, state, loss=loss,
                        metrics_and_loss=calculator, name="run",
                        virtual_batch_size=4, true_batch_size=4,
                        verbose=False)
    run_dir = tmp_path / "run"
    assert (run_dir / "epoch_logs.csv").exists()
    assert (run_dir / "last_model_state_dict.msgpack").exists()
    assert (run_dir / "best_model_state_dict.msgpack").exists()
    assert (run_dir / "test_logs.csv").exists()
    with open(run_dir / "epoch_logs.csv") as fh:
        rows = list(csv.DictReader(fh))
    assert len(rows) == 2
    assert "metrics/dice_index_threshold_0.5" in rows[0]
    assert "val_metrics/dice_index_threshold_0.5" in rows[0]
    assert "dice_loss" in rows[0]
    assert "learning_rate" in rows[0]


def test_train_step_multichip_mesh(tmp_path):
    """DP mesh: batch axis sharded, params replicated.

    Uses a 2-device submesh — 8-way CPU collectives starve the 1-core test
    host (the full 8-device layout is exercised by dryrun_multichip, which
    runs tiny shapes only).
    """
    assert jax.device_count() == 8
    model, optimizer, state, loss, calculator, _ = build_training(tmp_path)
    mesh = create_mesh(("data",), devices=jax.devices()[:2])
    state = jax.device_put(state, replicated(mesh))
    step = make_train_step(model, loss, calculator, optimizer)
    data = synthetic_segmentation_data(n=16)
    from medsegpretrainimagenet_tpu.parallel import shard_batch
    batch = shard_batch({k: v[None] for k, v in data.items()}, mesh,
                        batch_dim=1)
    metrics_state = jax.device_put(calculator.init_state(), replicated(mesh))
    state, metrics_state, per_batch = step(state, metrics_state, batch)
    values = calculator.finalize_epoch(metrics_state)
    assert 0 <= values["metrics/dice_index_threshold_0.5"] <= 1
    # params stay replicated after the step
    leaf = jax.tree_util.tree_leaves(state.params)[0]
    assert leaf.sharding.is_fully_replicated


def test_resume_reproduces_stream(tmp_path):
    model, optimizer, state, loss, calculator, _ = build_training(tmp_path)
    data = synthetic_segmentation_data(n=8)
    batch = {k: jnp.asarray(v[None]) for k, v in data.items()}
    step = make_train_step(model, loss, calculator, optimizer, donate=False)

    s1, _, _ = step(state, calculator.init_state(), batch)
    s2a, _, pba = step(s1, calculator.init_state(), batch)

    # "resume": rebuild state from the same pieces at step 1
    resumed = TrainState(params=s1.params, batch_stats=s1.batch_stats,
                         opt_state=s1.opt_state, step=s1.step,
                         rng_base=s1.rng_base)
    s2b, _, pbb = step(resumed, calculator.init_state(), batch)
    assert float(pba["dice_loss"]) == pytest.approx(float(pbb["dice_loss"]))
    la = jax.tree_util.tree_leaves(s2a.params)[0]
    lb = jax.tree_util.tree_leaves(s2b.params)[0]
    np.testing.assert_allclose(np.asarray(la), np.asarray(lb))


def test_mixed_precision_training(tmp_path):
    """bf16 activations: loss still decreases, state/logs stay f32."""
    from medsegpretrainimagenet_tpu.models.blocks import (compute_dtype,
                                                          set_compute_dtype)
    set_compute_dtype(jnp.bfloat16)
    try:
        model, optimizer, state, loss, calculator, _ = build_training(
            tmp_path)
        data = synthetic_segmentation_data()
        step = make_train_step(model, loss, calculator, optimizer)
        metrics_state = calculator.init_state()
        batch = {k: jnp.asarray(v[None, :8]) for k, v in data.items()}
        losses = []
        for _ in range(12):
            state, metrics_state, per_batch = step(state, metrics_state,
                                                   batch)
            losses.append(float(per_batch["dice_loss"]))
        assert losses[-1] < losses[0]
        # parameters remain f32 master copies
        assert all(p.dtype == jnp.float32 for p in
                   jax.tree_util.tree_leaves(state.params))
    finally:
        set_compute_dtype(None)


def test_profiling_hooks(tmp_path):
    """profile: true writes step-time stats (trace capture is best-effort)."""
    model, optimizer, state, loss, calculator, config = build_training(
        tmp_path, epochs=1)
    config["meta/technical/profile"] = True
    data = synthetic_segmentation_data(n=16)
    loader = make_loader(data)
    train_model(model, loader, None, None, config, optimizer, state,
                loss=loss, metrics_and_loss=calculator, name="prof",
                virtual_batch_size=4, true_batch_size=4, verbose=False)
    assert os.path.isfile(str(tmp_path / "prof" / "profile" /
                              "step_times.csv"))


def test_device_augmentation_end_to_end(tmp_path):
    """Standard chain moves on device: pipeline splits, step trains, and
    metrics see the augmented masks."""
    from medsegpretrainimagenet_tpu.cli.run_experiment import (
        build_transform_pipelines)

    cfg = ConfigDict({"data": {"transforms": {
        "train": (
            ConfigDict({"segmentation.transforms.wrapped_transforms"
                        ".RandomRotation": {
                            "border_mode": "BORDER_CONSTANT", "limit": 180,
                            "value": 0, "mask_value": 0}}),
            ConfigDict({"segmentation.transforms.wrapped_transforms"
                        ".RandomFlip": {"vertical": True,
                                        "probability": 0.5}}),
            "transform.RepeatChannels",
        ),
        "val": ("transform.RepeatChannels",),
        "casting": {"mask": "torch.LongTensor"},
    }}})
    train_tr, val_tr, _, _, device_augment = build_transform_pipelines(
        cfg, seed=0, device_augmentation=True)
    assert device_augment is not None
    # the host train pipeline kept nothing but the caster
    assert len(train_tr.transforms) == 1

    model, optimizer, state, loss, calculator, _ = build_training(tmp_path)
    # 1-channel input stays 1-channel on host; device chain repeats to 3?
    # our toy model takes 1 channel, so rebuild augment without repeat:
    from medsegpretrainimagenet_tpu.ops.augment import make_device_augment
    device_augment = make_device_augment(rotation_limit=180,
                                         flip_vertical=True)
    data = synthetic_segmentation_data()
    step = make_train_step(model, loss, calculator, optimizer,
                           device_augment=device_augment, donate=False)
    metrics_state = calculator.init_state()
    batch = {k: jnp.asarray(v[None, :8]) for k, v in data.items()}
    losses = []
    state0 = state
    for _ in range(15):
        state, metrics_state, per_batch = step(state, metrics_state, batch)
        losses.append(float(per_batch["dice_loss"]))
    assert losses[-1] < losses[0]
    # augmentation is active: the same batch yields different losses
    # across steps beyond what pure optimisation noise would give
    assert len(set(round(l, 6) for l in losses)) > 5


def test_training_converges_on_learnable_task(tmp_path):
    """The full loop learns: high train+val Dice on an easy synthetic
    segmentation task after a few epochs (loss/optimizer/schedule/metrics
    coherence check)."""
    model, optimizer, state, loss, calculator, config = build_training(
        tmp_path, channels=(8, 16), epochs=12)
    optimizer = Optimizer(ConfigDict({"sgd": {
        "momentum": 0.9, "weight_decay": 0.0,
        "learning_rate": {"constant": {"base": 0.2}}}}),
        num_epochs=12, batches_per_epoch=8)
    state = TrainState.create(state.variables, optimizer.tx.init(
        state.params), jax.random.key(1))
    train_loader = make_loader(synthetic_segmentation_data(
        n=32, rng=np.random.default_rng(1)))
    val_loader = make_loader(synthetic_segmentation_data(
        n=8, rng=np.random.default_rng(2)))
    state = train_model(model, train_loader, val_loader, None, config,
                        optimizer, state, loss=loss,
                        metrics_and_loss=calculator, name="conv",
                        virtual_batch_size=4, true_batch_size=4,
                        verbose=False)
    with open(str(tmp_path / "conv" / "epoch_logs.csv")) as fh:
        rows = list(csv.DictReader(fh))
    final = rows[-1]
    assert float(final["val_metrics/dice_index_threshold_0.5"]) > 0.85, final
    assert float(final["val_dice_loss"]) < 0.2
    # loss decreased monotonically-ish
    assert float(rows[-1]["dice_loss"]) < float(rows[0]["dice_loss"]) * 0.5


def test_uint8_device_dequantization(tmp_path):
    """uint8 batches train identically to pre-scaled f32 batches (the /255
    happens inside the jitted step)."""
    model, optimizer, state, loss, calculator, _ = build_training(tmp_path)
    data = synthetic_segmentation_data()
    step = make_train_step(model, loss, calculator, optimizer, donate=False)
    f32_batch = {k: jnp.asarray(v[None, :8]) for k, v in data.items()}
    u8_batch = dict(f32_batch)
    u8_batch["x"] = jnp.asarray(
        np.round(data["x"][None, :8] * 255)).astype(jnp.uint8)

    s_f32, _, pb_f32 = step(state, calculator.init_state(), {
        "x": jnp.round(f32_batch["x"] * 255) / 255.0,
        "mask": f32_batch["mask"]})
    s_u8, _, pb_u8 = step(state, calculator.init_state(), u8_batch)
    np.testing.assert_allclose(float(pb_f32["dice_loss"]),
                               float(pb_u8["dice_loss"]), rtol=1e-5)


def test_uint8_mask_device_widening(tmp_path):
    """uint8 masks widen to int32 on device and train identically."""
    model, optimizer, state, loss, calculator, _ = build_training(tmp_path)
    data = synthetic_segmentation_data()
    step = make_train_step(model, loss, calculator, optimizer, donate=False)
    base = {"x": jnp.asarray(data["x"][None, :8]),
            "mask": jnp.asarray(data["mask"][None, :8])}
    u8 = dict(base)
    u8["mask"] = base["mask"].astype(jnp.uint8)
    _, _, pb_a = step(state, calculator.init_state(), base)
    _, _, pb_b = step(state, calculator.init_state(), u8)
    np.testing.assert_allclose(float(pb_a["dice_loss"]),
                               float(pb_b["dice_loss"]), rtol=1e-6)


def test_partial_trailing_group_applies_update(tmp_path):
    """A partial (smaller-than-accumulation_scale) group is a REAL
    optimizer step: the reference steps on the epoch's last fragment too
    (train_model.py:55, ``or i == len(ds) - 1``), so applied steps per
    epoch == ceil(len/acc) == the schedulers' batches_per_epoch."""
    model, optimizer, state, loss, calculator, _ = build_training(tmp_path)
    data = synthetic_segmentation_data()
    # donate=False so the pre-step state stays readable for comparison
    # (the epoch loop also runs without donation for its error envelope)
    step = make_train_step(model, loss, calculator, optimizer, donate=False)
    batch = {k: jnp.asarray(v[None, :8]) for k, v in data.items()}
    ms0 = calculator.init_state()
    new_state, ms1, per_batch = step(state, ms0, batch)
    changed_params = any(
        not np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree_util.tree_leaves(state.params),
                        jax.tree_util.tree_leaves(new_state.params)))
    assert changed_params
    assert int(new_state.step) == int(state.step) + 1
    row = calculator.finalize_epoch(ms1)
    assert "metrics/dice_index_threshold_0.5" in row


def test_virtual_batches_grouping():
    from medsegpretrainimagenet_tpu.train.loop import _virtual_batches

    def frags(shapes):
        for n in shapes:
            yield {"x": np.zeros((n, 4, 4, 1), np.float32),
                   "mask": np.zeros((n, 4, 4), np.int32)}

    # scale 4 over [8]*5: one full group of 4 + a partial tail of 1 —
    # BOTH are optimizer steps (ceil(5/4) = 2, reference train_model.py:55)
    out = list(_virtual_batches(frags([8] * 5), 4))
    assert [s["x"].shape[0] for s in out] == [4, 1]
    assert out[0]["x"].shape == (4, 8, 4, 4, 1)
    # scale 1: every fragment is a group, ragged tail included
    out = list(_virtual_batches(frags([8, 8, 2]), 1))
    assert [s["x"].shape[0] for s in out] == [1, 1, 1]
    # shape change mid-group flushes a partial group
    out = list(_virtual_batches(frags([8, 8, 2, 8, 8]), 2))
    assert [s["x"].shape[0] for s in out] == [2, 1, 2]


@pytest.mark.parametrize("threaded", [False, True])
def test_prefetch_yields_each_batch_once_and_skips_bad(threaded):
    from medsegpretrainimagenet_tpu.data.loader import prefetch_to_device

    batches = [{"x": np.full((2, 2), i, np.float32)} for i in range(6)]
    got = list(prefetch_to_device(iter(batches), size=2,
                                  put=lambda b: b, threaded=threaded))
    assert [int(b["x"][0, 0]) for b in got] == [0, 1, 2, 3, 4, 5]

    def flaky():
        for i in range(5):
            yield {"x": np.full((2, 2), i, np.float32)}

    errors = []

    def bad_put(b):
        if int(b["x"][0, 0]) == 2:
            raise RuntimeError("transfer failed")
        return b

    got = list(prefetch_to_device(flaky(), size=2, put=bad_put,
                                  on_error=errors.append, threaded=threaded))
    assert [int(b["x"][0, 0]) for b in got] == [0, 1, 3, 4]
    assert len(errors) == 1


@pytest.mark.parametrize("threaded", [False, True])
def test_prefetch_iterator_error_semantics(threaded):
    """An iterator exception ends the stream through on_error; without
    on_error it re-raises in the consumer (both prefetch modes)."""
    from medsegpretrainimagenet_tpu.data.loader import prefetch_to_device

    def dies_after_two():
        yield {"x": np.zeros((1,), np.float32)}
        yield {"x": np.ones((1,), np.float32)}
        raise ValueError("source died")

    errors = []
    got = list(prefetch_to_device(dies_after_two(), size=2,
                                  put=lambda b: b, on_error=errors.append,
                                  threaded=threaded))
    assert len(got) == 2 and len(errors) == 1

    with pytest.raises(ValueError, match="source died"):
        list(prefetch_to_device(dies_after_two(), size=2,
                                put=lambda b: b, threaded=threaded))


def test_threaded_prefetch_worker_exits_on_abandonment():
    """Abandoning the consumer mid-stream (an epoch crash) must not leak
    a blocked worker thread."""
    import threading

    from medsegpretrainimagenet_tpu.data.loader import prefetch_to_device

    def endless():
        i = 0
        while True:
            yield {"x": np.full((1,), i, np.float32)}
            i += 1

    # a stream that is created but NEVER iterated must not start (and
    # therefore not leak) a worker at all — the worker starts lazily on
    # the first next()
    never = prefetch_to_device(endless(), size=2, put=lambda b: b,
                               threaded=True)
    assert not any(t.name == "mst-prefetch" and t.is_alive()
                   for t in threading.enumerate())
    never.close()

    gen = prefetch_to_device(endless(), size=2, put=lambda b: b,
                             threaded=True)
    next(gen)
    gen.close()  # GeneratorExit at the yield point
    for _ in range(50):
        if not any(t.name == "mst-prefetch" and t.is_alive()
                   for t in threading.enumerate()):
            break
        time.sleep(0.1)
    assert not any(t.name == "mst-prefetch" and t.is_alive()
                   for t in threading.enumerate())


def test_run_epoch_ragged_tail_steps_and_counts_metrics(tmp_path):
    """Through run_epoch: 10 samples in fragments of 4 with accumulation
    scale 2 -> one full virtual batch + the ragged tail, BOTH optimizer
    steps: the reference steps on the epoch's last fragment too
    (train_model.py:55), ceil(3 fragments / 2) = 2 steps."""
    from medsegpretrainimagenet_tpu.train.loop import run_epoch

    model, optimizer, state, loss, calculator, _ = build_training(tmp_path)
    data = synthetic_segmentation_data(n=10)
    step = make_train_step(model, loss, calculator, optimizer, donate=False)

    def loader():
        for lo in (0, 4, 8):  # fragments of 4, 4, 2
            yield {k: v[lo:lo + 4] for k, v in data.items()}

    ms = calculator.init_state()
    state2, ms = run_epoch(step, state, ms, loader(),
                           accumulation_scale=2, train=True)
    assert int(state2.step) == 2          # full group AND ragged tail step
    assert int(state2.micro_step) == 2
    row = calculator.finalize_epoch(ms)
    # raw CM counts never reach the logged row (reference filter,
    # metric_wrapper.py:281) ...
    assert not any("true_positives" in k for k in row)
    # ... but all 10 samples' pixels were folded into the CM state
    # (4+4 full + 2 tail)
    cm = jax.device_get(ms["cm_0.5"])
    total = float(cm["tp"] + cm["fp"] + cm["tn"] + cm["fn"])
    assert total == 10 * 16 * 16


def test_remat_matches_numerics_and_cuts_peak_memory(tmp_path):
    """``set_remat(True)`` keeps the param tree and one-step numerics
    identical (the HBM-for-FLOPs production knob).  XLA:CPU's
    memory_analysis does not reflect activation-liveness savings (measured
    flat-to-slightly-higher temp bytes on this backend), so the memory
    delta is only reported, not asserted, off-TPU."""
    from medsegpretrainimagenet_tpu.models import blocks as B

    data = synthetic_segmentation_data(n=8)
    batch = {k: jnp.asarray(v[None]) for k, v in data.items()}

    def one_step(remat):
        B.set_remat(remat)
        try:
            model, optimizer, state, loss, calculator, _ = build_training(
                tmp_path, channels=(8, 16))
            step = make_train_step(model, loss, calculator, optimizer,
                                   donate=False)
            new_state, _, pb = step(state, calculator.init_state(), batch)
            lowered = step.lower(state, calculator.init_state(), batch)
            mem = lowered.compile().memory_analysis()
            temp = getattr(mem, "temp_size_in_bytes", None)
            return (jax.tree_util.tree_structure(state.params),
                    jax.device_get(new_state.params),
                    float(pb["dice_loss"]), temp)
        finally:
            B.set_remat(False)

    tree_off, params_off, loss_off, temp_off = one_step(False)
    tree_on, params_on, loss_on, temp_on = one_step(True)

    assert tree_off == tree_on          # checkpoint-compatible
    assert loss_off == pytest.approx(loss_on, rel=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(params_off),
                    jax.tree_util.tree_leaves(params_on)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)
    if temp_off is not None and temp_on is not None \
            and jax.devices()[0].platform == "tpu":
        assert temp_on < temp_off, (temp_on, temp_off)


def test_async_checkpointing_produces_identical_files(tmp_path):
    """``async_checkpointing: true`` writes the same checkpoint bytes as
    the synchronous path (worker-thread msgpack writes, atomic rename),
    drained before train_model returns."""
    data = synthetic_segmentation_data(n=8)

    def run(sub, async_ckpt):
        model, optimizer, state, loss, calculator, config = build_training(
            tmp_path / sub, epochs=1)
        config["meta/technical/async_checkpointing"] = async_ckpt
        train_model(model, make_loader(data), None, None, config,
                    optimizer, state, loss=loss,
                    metrics_and_loss=calculator, name="run",
                    virtual_batch_size=4, true_batch_size=4, verbose=False)
        return (tmp_path / sub / "run" / "last_model_state_dict.msgpack"
                ).read_bytes()

    (tmp_path / "sync").mkdir()
    (tmp_path / "async").mkdir()
    sync_bytes = run("sync", False)
    async_bytes = run("async", True)
    assert sync_bytes == async_bytes


def test_train_model_without_calculator_still_trains(tmp_path):
    """metrics_and_loss=None (loss-only training) must still run real
    optimizer steps and write epoch rows — it used to die on
    None.init_state() inside the per-epoch envelope, silently no-opping
    every epoch."""
    model, optimizer, state, loss, _calc, config = build_training(
        tmp_path, epochs=1)
    data = synthetic_segmentation_data(n=8)
    before = jax.tree_util.tree_leaves(state.params)[0].copy()

    out = train_model(model, make_loader(data), make_loader(data),
                      make_loader(data), config, optimizer, state,
                      loss=loss, metrics_and_loss=None, name="nocalc",
                      virtual_batch_size=4, true_batch_size=4,
                      verbose=False)
    after = jax.tree_util.tree_leaves(out.params)[0]
    assert np.abs(np.asarray(after) - np.asarray(before)).max() > 0
    assert int(out.step) == 2  # 8 samples / vbs 4
    with open(tmp_path / "nocalc" / "epoch_logs.csv") as fh:
        rows = list(csv.DictReader(fh))
    assert len(rows) == 1 and "learning_rate" in rows[0]


def test_global_norm_matches_concat_reference():
    from medsegpretrainimagenet_tpu.train.step import global_norm

    rng = np.random.default_rng(0)
    tree = {"a": jnp.asarray(rng.standard_normal((3, 4)), jnp.float32),
            "b": {"c": jnp.asarray(rng.standard_normal(7), jnp.float32)}}
    flat = np.concatenate([np.abs(np.asarray(v).ravel())
                           for v in (tree["a"], tree["b"]["c"])])
    for p in (2.0, 3.0, 1.0):
        want = (flat ** p).sum() ** (1.0 / p)
        np.testing.assert_allclose(float(global_norm(tree, p)), want,
                                   rtol=1e-5)
    np.testing.assert_allclose(float(global_norm(tree, float("inf"))),
                               flat.max(), rtol=1e-6)


def test_sync_checkpoint_save_is_atomic_and_overwrites(tmp_path):
    from medsegpretrainimagenet_tpu.train import checkpoint as ckpt

    path = str(tmp_path / "state.msgpack")
    ckpt.save_params_file(path, {"w": jnp.ones((2, 2))})
    first = ckpt.load_params_file(path)
    ckpt.save_params_file(path, {"w": jnp.zeros((2, 2))})
    second = ckpt.load_params_file(path)
    assert float(np.asarray(first["w"]).sum()) == 4.0
    assert float(np.asarray(second["w"]).sum()) == 0.0
    # no leftover temp file once the write completes
    assert not (tmp_path / "state.msgpack.tmp").exists()


def test_epoch_checkpoints_share_one_gather(tmp_path, monkeypatch):
    """An epoch's last/best/epoch-tagged model sinks write IDENTICAL state
    through ONE device->host gather (repeated params-sized D2H — not the
    step — dominated per-epoch time on slow device links)."""
    import medsegpretrainimagenet_tpu.parallel as par
    import medsegpretrainimagenet_tpu.parallel.mesh as par_mesh

    calls = []
    orig = par_mesh.gather_tree_to_host

    def counting(tree):
        leaves = jax.tree_util.tree_leaves(tree)
        # only DEVICE gathers count — encode paths re-run _to_host on the
        # already-gathered numpy payload, which is a free no-op
        if any(isinstance(leaf, jax.Array) for leaf in leaves):
            calls.append(leaves[0].size)
        return orig(tree)

    # patch BOTH import sites: loop.py resolves via the package
    # (`from ..parallel import ...` at call time), checkpoint.py's
    # _to_host via the mesh module — a regression re-adding per-sink
    # gathers inside checkpoint.py must not escape the count
    monkeypatch.setattr(par, "gather_tree_to_host", counting)
    monkeypatch.setattr(par_mesh, "gather_tree_to_host", counting)

    model, optimizer, state, loss, calculator, config = build_training(
        tmp_path, epochs=1)
    config["meta/technical/model_log_checkpoints"] = (1,)
    data = synthetic_segmentation_data(n=8)
    train_model(model, make_loader(data), make_loader(data), None, config,
                optimizer, state, loss=loss, metrics_and_loss=calculator,
                name="run", virtual_batch_size=4, true_batch_size=4,
                verbose=False)
    run_dir = tmp_path / "run"
    last = (run_dir / "last_model_state_dict.msgpack").read_bytes()
    # best is written in the same epoch (first value always improves on
    # None) and the epoch-1 tagged checkpoint too: all three identical
    assert (run_dir / "best_model_state_dict.msgpack").read_bytes() == last
    assert (run_dir / "model_state_dict_epoch_1.msgpack"
            ).read_bytes() == last
    # exactly 2 gathers for the epoch: one shared model gather (three
    # sinks) + one optimizer-state gather
    assert len(calls) == 2


def test_batch_log_flush_batches_readbacks_identically(tmp_path, monkeypatch):
    """batch_logs.csv per-step rows must be byte-identical whether read
    back streaming (log_flush=1, one blocking device_get per step — the
    reference's write-as-you-go shape) or batched (default: the whole
    window fetched in ONE jax.device_get, ~one tunnel round-trip per
    epoch instead of one per step — the remote-TPU CLI-epoch lever)."""
    from medsegpretrainimagenet_tpu.train.loop import run_epoch

    data = synthetic_segmentation_data(n=16)

    def loader():
        for lo in range(0, 16, 4):
            yield {k: v[lo:lo + 4] for k, v in data.items()}

    def run(log_flush, log_path):
        # fresh identical state per run: rows must match across modes
        model, optimizer, state, loss, calculator, _ = \
            build_training(tmp_path)
        step = make_train_step(model, loss, calculator, optimizer,
                               donate=False)
        gets = []
        orig = jax.device_get

        def counting(tree):
            gets.append(1)
            return orig(tree)

        monkeypatch.setattr(jax, "device_get", counting)
        try:
            run_epoch(step, state, calculator.init_state(), loader(),
                      train=True, log_path=str(log_path),
                      calculator=calculator, log_flush=log_flush)
        finally:
            monkeypatch.setattr(jax, "device_get", orig)
        with open(log_path) as fh:
            return list(csv.DictReader(fh)), len(gets)

    streamed, n_stream = run(1, tmp_path / "stream.csv")
    batched, n_batch = run(512, tmp_path / "batched.csv")
    windowed, n_win = run(3, tmp_path / "windowed.csv")

    assert len(streamed) == 4 and streamed == batched == windowed
    assert float(streamed[0]["dice_loss"]) > 0
    # streaming: one readback per step; default: ONE for the whole epoch;
    # a 3-step window over 4 steps: full window + tail flush = 2
    assert n_stream == 4 and n_batch == 1 and n_win == 2


def test_async_checkpoint_d2h_runs_on_worker_thread(tmp_path, monkeypatch):
    """Single-host async mode must NOT gather on the epoch-loop thread:
    the device->host transfer (the dominant epoch-tail cost on a slow
    device link) belongs to the AsyncCheckpointer worker so it drains
    under the next epoch's compute.  Sync mode keeps the caller-thread
    gather (and multi-host would too — the gather is a collective)."""
    import threading

    from medsegpretrainimagenet_tpu import parallel as par
    from medsegpretrainimagenet_tpu.parallel import mesh as par_mesh

    data = synthetic_segmentation_data(n=8)
    orig = par_mesh.gather_tree_to_host

    def run(sub, async_ckpt):
        gather_threads = []

        def recording(tree):
            if any(isinstance(leaf, jax.Array)
                   for leaf in jax.tree_util.tree_leaves(tree)):
                gather_threads.append(threading.current_thread().name)
            return orig(tree)

        monkeypatch.setattr(par, "gather_tree_to_host", recording)
        monkeypatch.setattr(par_mesh, "gather_tree_to_host", recording)
        try:
            model, optimizer, state, loss, calculator, config = \
                build_training(tmp_path / sub, epochs=1)
            config["meta/technical/async_checkpointing"] = async_ckpt
            train_model(model, make_loader(data), None, None, config,
                        optimizer, state, loss=loss,
                        metrics_and_loss=calculator, name="run",
                        virtual_batch_size=4, true_batch_size=4,
                        verbose=False)
        finally:
            monkeypatch.setattr(par, "gather_tree_to_host", orig)
            monkeypatch.setattr(par_mesh, "gather_tree_to_host", orig)
        return gather_threads

    (tmp_path / "sync").mkdir()
    (tmp_path / "async").mkdir()
    sync_threads = run("sync", False)
    async_threads = run("async", True)
    assert sync_threads and all(t == "MainThread" for t in sync_threads)
    assert async_threads and not any(t == "MainThread"
                                     for t in async_threads)


def test_resume_best_value_reseeds_from_csv(tmp_path):
    """--continued must not let a worse post-resume epoch clobber
    best_model_state_dict.msgpack: the tracker re-seeds from the
    already-logged rows instead of restarting at +/-inf."""
    from medsegpretrainimagenet_tpu.train.loop import _resume_best_value

    path = str(tmp_path / "epoch_logs.csv")
    with open(path, "w") as fh:
        fh.write("epoch,val_dice\n1,0.55\n2,0.91\n3,0.70\n")
    assert _resume_best_value(path, "val_dice", max, 3) == 0.91
    # only rows BEFORE epoch_start count (rolled-back epochs excluded)
    assert _resume_best_value(path, "val_dice", max, 2) == 0.91
    assert _resume_best_value(path, "val_dice", max, 1) == 0.55
    assert _resume_best_value(path, "val_dice", min, 3) == 0.55
    assert _resume_best_value(path, "missing_metric", max, 3) is None
    assert _resume_best_value(str(tmp_path / "nope.csv"),
                              "val_dice", max, 3) is None


def test_resume_best_value_skips_nan_and_duplicate_epochs(tmp_path):
    """Two regression guards on the re-seeding: (1) a NaN metric value
    must be skipped — max() over a list containing NaN returns NaN, and
    pick(nan, current) == current is always False, permanently disabling
    best-checkpoint updates; (2) after crash+resume appends duplicate
    epoch rows, seeding keys on the epoch column (LAST row per epoch
    <= epoch_start), not on row position."""
    from medsegpretrainimagenet_tpu.train.loop import _resume_best_value

    path = str(tmp_path / "epoch_logs.csv")
    with open(path, "w") as fh:
        fh.write("epoch,val_dice\n1,nan\n2,0.6\n")
    assert _resume_best_value(path, "val_dice", max, 2) == 0.6
    with open(path, "w") as fh:
        fh.write("epoch,val_dice\n1,nan\n")
    assert _resume_best_value(path, "val_dice", max, 1) is None

    # crash at epoch 3 (rows 1-3 logged, stamp said 1) -> resume re-ran
    # epochs 2-3 with worse scores; a 2nd resume from epoch_start=3 must
    # seed from the RE-RUN rows (whose best writes landed), not the
    # pre-crash 0.9 whose best_model write never hit disk
    with open(path, "w") as fh:
        fh.write("epoch,val_dice\n"
                 "1,0.5\n2,0.9\n3,0.85\n"     # pre-crash (2,3 rolled back)
                 "2,0.6\n3,0.7\n")            # post-resume re-runs
    assert _resume_best_value(path, "val_dice", max, 3) == 0.7
    # positional fallback still works for pre-upgrade CSVs (no epoch col)
    with open(path, "w") as fh:
        fh.write("val_dice\n0.5\n0.9\n0.85\n")
    assert _resume_best_value(path, "val_dice", max, 2) == 0.9


def test_async_close_failure_raises_on_clean_exit(tmp_path, monkeypatch):
    """A failure in the LAST epoch's async checkpoint writes is only
    observable at close() (per-epoch poll() runs before the worker
    drained that epoch) — on a clean exit it must RAISE, not log a
    successful run whose final checkpoints never landed."""
    from medsegpretrainimagenet_tpu.train import checkpoint as ckpt

    model, optimizer, state, loss, calculator, config = build_training(
        tmp_path, epochs=1)
    config["meta/technical/async_checkpointing"] = True
    data = synthetic_segmentation_data(n=8)

    def boom(self):
        raise RuntimeError("final-epoch write failed")
    monkeypatch.setattr(ckpt.AsyncCheckpointer, "close", boom)
    with pytest.raises(RuntimeError, match="final-epoch write failed"):
        train_model(model, make_loader(data), None, None, config,
                    optimizer, state, loss=loss,
                    metrics_and_loss=calculator, name="run_1",
                    virtual_batch_size=4, true_batch_size=4,
                    verbose=False)


def test_async_checkpointer_poll_and_error_aggregation():
    """poll() surfaces background failures without blocking forever,
    and wait() reports EVERY failed path (a second failing sink must
    not be silently dropped)."""
    from medsegpretrainimagenet_tpu.train import checkpoint as ckpt

    writer = ckpt.AsyncCheckpointer()
    # /dev/null is a file, so these dirs can never be created
    writer.save("/dev/null/a/x.msgpack", {"w": np.zeros(2)})
    writer.save("/dev/null/b/y.msgpack", {"w": np.zeros(2)})
    writer._queue.join()
    with pytest.raises(RuntimeError) as exc:
        writer.poll()
    msg = str(exc.value)
    assert "/dev/null/a/x.msgpack" in msg and "/dev/null/b/y.msgpack" in msg
    writer.poll()           # errors were drained; now a no-op
    writer.close()          # clean shutdown, no further errors


def test_checkpoint_epoch_stamp_written_and_resume_uses_min(tmp_path):
    """The durable-epoch stamp rides the same writer AFTER the epoch's
    model/optimizer files, and --continued resumes from
    min(csv_rows, stamp) when a crash left the CSV ahead."""
    from medsegpretrainimagenet_tpu.cli.run_experiment import \
        check_for_continued
    from medsegpretrainimagenet_tpu.train import checkpoint as ckpt

    model, optimizer, state, loss, calculator, config = build_training(
        tmp_path, epochs=1)
    config["meta/technical/async_checkpointing"] = True
    data = synthetic_segmentation_data(n=8)
    train_model(model, make_loader(data), None, None, config,
                optimizer, state, loss=loss, metrics_and_loss=calculator,
                name="run_1", virtual_batch_size=4, true_batch_size=4,
                verbose=False)
    stamp_path = tmp_path / "run_1" / "checkpoint_epoch.msgpack"
    assert stamp_path.exists()
    assert int(ckpt.load_params_file(str(stamp_path))["epoch"]) == 1

    # simulate an async-mode crash: CSV claims 3 epochs, stamp says 1
    csv_path = tmp_path / "run_1" / "epoch_logs.csv"
    with open(csv_path) as fh:
        header, first = fh.read().splitlines()[:2]
    with open(csv_path, "w") as fh:
        fh.write("\n".join([header, first, first, first]) + "\n")
    resume_cfg = ConfigDict({
        "meta": {"technical": {"absolute_path": str(tmp_path) + "/"}},
        "experiment": {"number_of_epochs": 5}})
    continued, run_start, epoch_start = check_for_continued(
        ["--continued"], resume_cfg)
    assert continued and run_start == 1
    assert epoch_start == 1     # the stamp, not the 3 CSV rows


def test_resume_does_not_clobber_better_best_checkpoint(tmp_path):
    """Integration: with epoch_start>0 and an epoch_logs.csv recording a
    better pre-crash best, a worse post-resume epoch must NOT overwrite
    best_model_state_dict.msgpack."""
    model, optimizer, state, loss, calculator, config = build_training(
        tmp_path, epochs=2)
    config["meta/technical/model_evaluation"] = ConfigDict(
        {"metric": "val_metrics/dice_index_threshold_0.5", "mode": "max"})
    dest = tmp_path / "run_1"
    dest.mkdir()
    # pre-crash history: epoch 1 scored an unbeatable 0.99
    with open(dest / "epoch_logs.csv", "w") as fh:
        fh.write("learning_rate,val_metrics/dice_index_threshold_0.5\n"
                 "0.1,0.99\n")
    sentinel = b"pre-crash best checkpoint bytes"
    (dest / "best_model_state_dict.msgpack").write_bytes(sentinel)

    data = synthetic_segmentation_data(n=8)
    train_model(model, make_loader(data), make_loader(data), None, config,
                optimizer, state, loss=loss, metrics_and_loss=calculator,
                name="run_1", virtual_batch_size=4, true_batch_size=4,
                verbose=False, epoch_start=1)
    # the resumed epoch trains a near-random toy net: its val dice is
    # far below 0.99, so the sentinel must survive
    assert (dest / "best_model_state_dict.msgpack").read_bytes() \
        == sentinel
    # but last_model was rewritten by the resumed epoch
    assert (dest / "last_model_state_dict.msgpack").stat().st_size > 1000
