"""Batch-inference CLI (``python -m medsegpretrainimagenet_tpu.predict``).

Serving path beyond reference parity: the reference produces predictions
only inside the training loop's test pass (``train_model.py:16-130``).
"""
import json

import numpy as np
import pytest
import yaml

from medsegpretrainimagenet_tpu.predict import main, predict_from_config


MODEL_YAML = {
    "model": {"segmentation.models.UNet": {
        "architecture": {
            "in_channel_size": 3, "out_channel_size": 1,
            "channels": (4, 8), "depth": 1,
        },
        "final_activation": "sigmoid",
    }},
}


@pytest.fixture()
def trained_checkpoint(tmp_path):
    """Init a tiny U-Net and save its variables as a native checkpoint."""
    import jax

    from medsegpretrainimagenet_tpu.config import ConfigDict, registry
    from medsegpretrainimagenet_tpu.models import Model
    from medsegpretrainimagenet_tpu.train import checkpoint as ckpt

    cd = ConfigDict({k: dict(v) for k, v in MODEL_YAML.items()})
    cd.expand()
    registry.fill_spec(cd, "model")
    model = registry.build(cd, key="model", wrapper=Model)
    variables = model.init(jax.random.key(0),
                           {"x": np.zeros((2, 16, 16, 3), np.float32)})
    path = tmp_path / "best_model_state_dict.msgpack"
    ckpt.save_params_file(str(path), variables)
    return path


def _write_config(tmp_path):
    cfg = tmp_path / "cfg.yaml"
    cfg.write_text(yaml.safe_dump(
        {"model": {"segmentation.models.UNet": {
            "architecture": {"in_channel_size": 3, "out_channel_size": 1,
                             "channels": [4, 8], "depth": 1},
            "final_activation": "sigmoid"}}}))
    return cfg


def test_predict_probabilities_channels_first_uint8(tmp_path,
                                                    trained_checkpoint):
    """(N,1,H,W) uint8 stack (the reference npy layout) -> NHWC probs;
    grayscale auto-repeats to the model's 3 input channels."""
    imgs = (np.random.default_rng(0).random((5, 1, 16, 16)) * 255) \
        .astype(np.uint8)
    np.save(tmp_path / "imgs.npy", imgs)
    stats = predict_from_config(
        str(_write_config(tmp_path)), str(trained_checkpoint),
        str(tmp_path / "imgs.npy"), str(tmp_path / "preds.npy"),
        batch_size=2)
    preds = np.load(tmp_path / "preds.npy")
    assert preds.shape == (5, 16, 16, 1)
    assert preds.dtype == np.float32
    assert 0.0 <= preds.min() and preds.max() <= 1.0  # sigmoid head
    assert stats["images"] == 5 and stats["images_per_sec"] > 0


def test_predict_cli_threshold_masks(tmp_path, trained_checkpoint, capsys):
    imgs = (np.random.default_rng(1).random((3, 16, 16, 3)) * 255) \
        .astype(np.uint8)
    np.save(tmp_path / "imgs.npy", imgs)
    rc = main([str(_write_config(tmp_path)),
               "--checkpoint", str(trained_checkpoint),
               "--input", str(tmp_path / "imgs.npy"),
               "--output", str(tmp_path / "masks.npy"),
               "--batch", "4", "--threshold", "0.5"])
    assert rc == 0
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    masks = np.load(tmp_path / "masks.npy")
    assert masks.shape == (3, 16, 16)
    assert masks.dtype == np.uint8
    assert set(np.unique(masks)) <= {0, 1}
    assert stats["shape"] == [3, 16, 16]


def test_predict_float_0_255_inputs_normalize(tmp_path, trained_checkpoint):
    """float32 stacks scaled 0-255 normalize exactly like uint8 stacks."""
    rng = np.random.default_rng(3)
    raw = (rng.random((3, 16, 16, 3)) * 255).astype(np.uint8)
    np.save(tmp_path / "u8.npy", raw)
    np.save(tmp_path / "f32.npy", raw.astype(np.float32))
    cfg = _write_config(tmp_path)
    for name in ("u8", "f32"):
        predict_from_config(
            str(cfg), str(trained_checkpoint), str(tmp_path / f"{name}.npy"),
            str(tmp_path / f"{name}_out.npy"), batch_size=3)
    np.testing.assert_allclose(np.load(tmp_path / "u8_out.npy"),
                               np.load(tmp_path / "f32_out.npy"),
                               rtol=1e-6, atol=1e-6)


def test_predict_empty_stack_and_torch_pt_error(tmp_path,
                                                trained_checkpoint):
    np.save(tmp_path / "empty.npy", np.zeros((0, 16, 16, 3), np.uint8))
    cfg = _write_config(tmp_path)
    with pytest.raises(ValueError, match="empty"):
        predict_from_config(str(cfg), str(trained_checkpoint),
                            str(tmp_path / "empty.npy"),
                            str(tmp_path / "out.npy"))
    np.save(tmp_path / "one.npy", np.zeros((1, 16, 16, 3), np.uint8))
    with pytest.raises(ValueError, match="msgpack"):
        predict_from_config(str(cfg), str(tmp_path / "weights.pt"),
                            str(tmp_path / "one.npy"),
                            str(tmp_path / "out.npy"))


def test_predict_matches_direct_apply(tmp_path, trained_checkpoint):
    """The CLI's prediction equals a direct eval-mode apply."""
    import jax

    from medsegpretrainimagenet_tpu.config import ConfigDict, registry
    from medsegpretrainimagenet_tpu.models import Model
    from medsegpretrainimagenet_tpu.train import checkpoint as ckpt

    imgs = (np.random.default_rng(2).random((4, 16, 16, 3)) * 255) \
        .astype(np.uint8)
    np.save(tmp_path / "imgs.npy", imgs)
    predict_from_config(
        str(_write_config(tmp_path)), str(trained_checkpoint),
        str(tmp_path / "imgs.npy"), str(tmp_path / "preds.npy"),
        batch_size=3)  # exercises last-batch padding
    preds = np.load(tmp_path / "preds.npy")

    cd = ConfigDict({k: dict(v) for k, v in MODEL_YAML.items()})
    cd.expand()
    registry.fill_spec(cd, "model")
    model = registry.build(cd, key="model", wrapper=Model)
    variables = ckpt.load_params_file(str(trained_checkpoint))
    x = imgs.astype(np.float32) / 255.0
    ref = np.asarray(model.apply(
        {"params": variables["params"],
         "batch_stats": variables.get("batch_stats", {})}, x, train=False))
    np.testing.assert_allclose(preds, ref, rtol=1e-5, atol=1e-5)


def test_predict_restores_global_compute_dtype(tmp_path,
                                               trained_checkpoint):
    """predict_from_config flips the process-global compute dtype for its
    own forward but must restore the caller's setting afterwards (review
    finding: a bf16 predict used to leak bf16 into later models)."""
    import jax.numpy as jnp

    from medsegpretrainimagenet_tpu.models.blocks import (compute_dtype,
                                                          set_compute_dtype)

    imgs = (np.random.default_rng(4).random((2, 16, 16, 3)) * 255) \
        .astype(np.uint8)
    np.save(tmp_path / "imgs.npy", imgs)
    cfg = _write_config(tmp_path)
    assert compute_dtype() is None
    try:
        predict_from_config(str(cfg), str(trained_checkpoint),
                            str(tmp_path / "imgs.npy"),
                            str(tmp_path / "out.npy"), batch_size=2,
                            mixed_precision=True)
        assert compute_dtype() is None
        set_compute_dtype(jnp.bfloat16)
        predict_from_config(str(cfg), str(trained_checkpoint),
                            str(tmp_path / "imgs.npy"),
                            str(tmp_path / "out.npy"), batch_size=2,
                            mixed_precision=False)
        assert compute_dtype() == jnp.bfloat16
        # restored even when the run raises (empty stack)
        np.save(tmp_path / "empty.npy", np.zeros((0, 16, 16, 3), np.uint8))
        set_compute_dtype(None)
        with pytest.raises(ValueError):
            predict_from_config(str(cfg), str(trained_checkpoint),
                                str(tmp_path / "empty.npy"),
                                str(tmp_path / "out.npy"),
                                mixed_precision=True)
        assert compute_dtype() is None
    finally:
        set_compute_dtype(None)


def test_predict_cli_tristate_flags(tmp_path, trained_checkpoint, capsys):
    """--no-mixed-precision must force f32 even when the config enables
    mixed precision (store_true could never turn it off)."""
    cfg = tmp_path / "mp_cfg.yaml"
    cfg.write_text(yaml.safe_dump(
        {"model": {"segmentation.models.UNet": {
            "architecture": {"in_channel_size": 3, "out_channel_size": 1,
                             "channels": [4, 8], "depth": 1},
            "final_activation": "sigmoid"}},
         "meta": {"technical": {"mixed_precision": True}}}))
    imgs = (np.random.default_rng(5).random((2, 16, 16, 3)) * 255) \
        .astype(np.uint8)
    np.save(tmp_path / "imgs.npy", imgs)
    rc = main([str(cfg), "--checkpoint", str(trained_checkpoint),
               "--input", str(tmp_path / "imgs.npy"),
               "--output", str(tmp_path / "out.npy"),
               "--no-mixed-precision", "--no-repeat-channels"])
    assert rc == 0
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["mixed_precision"] is False
