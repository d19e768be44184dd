"""Batch inference (serving) CLI — beyond-parity TPU deployment path.

The reference only produces predictions inside the training loop's test
pass (``train_model.py:16-130``); deploying a trained model means writing
ad-hoc torch code.  Here a trained checkpoint (native msgpack —
``last/best_model_state_dict.msgpack`` from any experiment run) serves
directly:

    python -m medsegpretrainimagenet_tpu.predict config.yaml \
        --checkpoint run_1/best_model_state_dict.msgpack \
        --input imgs.npy --output preds.npy [--batch 32] [--threshold 0.5]

TPU-first serving choices:

* one jitted forward for the whole pipeline: uint8 batches ship over
  PCIe/tunnel as-is and dequantize (f32/255) on device (4x less H2D
  traffic), thresholding/argmax happens on device so only the final uint8
  masks come back;
* static shapes: the last partial batch is zero-padded to the compiled
  batch size and the padding dropped on the host;
* ``--mixed-precision`` flips all block compute to bf16 (the Pallas
  window-attention forward kernel engages automatically for Swin models —
  the no-grad bf16 path is exactly what this CLI runs);
* eval-mode BatchNorm uses the checkpoint's running statistics.
"""
from __future__ import annotations

import json
import os
import time
from typing import Any, Dict, Optional

import numpy as np

from ..config import ConfigDict
from ..config import registry
from ..utils.errors import handle_exception

__all__ = ["predict_from_config", "main"]


def _to_nhwc(imgs: np.ndarray) -> np.ndarray:
    """Accept (N,H,W), (N,C,H,W) channels-first or (N,H,W,C) and return
    NHWC (the reference stores npy stacks channels-first, e.g. COVID-QU
    ``imgs.npy`` (N,1,H,W) — ``segmentation/datasets/datasets.py:51-64``)."""
    if imgs.ndim == 3:
        return imgs[..., None]
    if imgs.ndim != 4:
        raise ValueError(f"expected 3-D or 4-D image stack, got {imgs.shape}")
    # channels-first if the channel axis is small and the trailing axes are
    # not (H, W, C<=4 with H==C is ambiguous only for degenerate sizes)
    if imgs.shape[1] <= 4 < imgs.shape[-1]:
        return np.transpose(imgs, (0, 2, 3, 1))
    return imgs


def _model_in_channels(config_dict: ConfigDict) -> Optional[int]:
    # ``config_dict["model"].value()`` descends through the single class
    # name to its parameter dict (ConfigDict single-entry semantics)
    spec = config_dict["model"].value()
    for path in ("architecture/in_channel_size", "in_channel_size",
                 "architecture/img_ch", "img_ch"):
        value = spec.get(path) if hasattr(spec, "get") else None
        if value is not None:
            try:
                return int(value)
            except (TypeError, ValueError):
                return None
    return None


def predict_from_config(config: Any, checkpoint: str, input_path: str,
                        output_path: str, batch_size: int = 16,
                        threshold: Optional[float] = None,
                        argmax: bool = False,
                        mixed_precision: Optional[bool] = None,
                        repeat_channels: Optional[bool] = None,
                        image_size: Optional[Any] = None,
                        ) -> Dict[str, Any]:
    """Run batched inference; returns a stats dict (also printed by the
    CLI as one JSON line)."""
    import jax
    import jax.numpy as jnp

    from ..models import Model
    from ..models.blocks import compute_dtype, set_compute_dtype
    from ..train import checkpoint as ckpt

    if not isinstance(config, ConfigDict):
        config = ConfigDict.from_yaml(config)
    config.expand()
    registry.fill_spec(config, "model")

    tech = config.get("meta/technical", ConfigDict({}))
    if mixed_precision is None:
        mixed_precision = bool(tech.get("mixed_precision", False))
    # the compute dtype is process-global; restore it on exit so an
    # in-process caller's later models are not silently flipped to bf16
    # (or back to f32) by a predict call
    prev_dtype = compute_dtype()
    set_compute_dtype(jnp.bfloat16 if mixed_precision else None)
    try:
        return _predict(config, checkpoint, input_path, output_path,
                        batch_size, threshold, argmax, mixed_precision,
                        repeat_channels, image_size)
    finally:
        set_compute_dtype(prev_dtype)


def _predict(config, checkpoint, input_path, output_path, batch_size,
             threshold, argmax, mixed_precision, repeat_channels,
             image_size) -> Dict[str, Any]:
    import jax
    import jax.numpy as jnp

    from ..models import Model
    from ..train import checkpoint as ckpt

    model = registry.build(config, key="model", wrapper=Model)

    imgs = np.load(input_path, mmap_mode="r")
    n_total = imgs.shape[0]
    if n_total == 0:
        raise ValueError(f"input stack {input_path!r} is empty "
                         f"(shape {imgs.shape})")
    imgs_nhwc_shape = _to_nhwc(imgs[:1]).shape  # probe layout cheaply
    channels = imgs_nhwc_shape[-1]
    # float stacks scaled 0-255 normalize like the readers do (uint8
    # normalizes on device; the probe is host-side so shapes stay
    # static).  Probe a stride-sampled subset across the whole series —
    # the first frames alone can be near-black (blank lead slices) and
    # would misclassify a 0-255 stack as [0, 1]
    scale_float = False
    if imgs.dtype != np.uint8:
        stride = max(1, n_total // 64)
        scale_float = float(np.asarray(imgs[::stride]).max()) > 1.5
    if repeat_channels is None:
        want = _model_in_channels(config)
        repeat_channels = bool(want and want == 3 and channels == 1)

    if image_size is not None and np.ndim(image_size) == 0:
        image_size = (int(image_size), int(image_size))

    def host_batch(lo: int, hi: int) -> np.ndarray:
        x = _to_nhwc(np.asarray(imgs[lo:hi]))
        if image_size is not None and tuple(x.shape[1:3]) != tuple(image_size):
            import cv2
            # cv2 dsize is (W, H); bilinear matches the readers' image path
            x = np.stack([cv2.resize(img, (image_size[1], image_size[0]))
                          for img in x])
            if x.ndim == 3:  # cv2 drops a singleton channel axis
                x = x[..., None]
        if repeat_channels:
            x = np.repeat(x, 3, axis=-1)
        if x.shape[0] < batch_size:  # zero-pad the last partial batch
            pad = np.zeros((batch_size - x.shape[0],) + x.shape[1:], x.dtype)
            x = np.concatenate([x, pad], axis=0)
        return x

    if str(checkpoint).endswith((".pt", ".pth")):
        # torch .pt translation only exists for *encoder* checkpoints
        # (train/torch_mapping.py — the reference's released pretraining
        # weights); a bare encoder cannot serve a full model.
        raise ValueError(
            "torch .pt serving is not supported: only encoder checkpoints "
            "have a torch->flax translation (used by the encoder-transfer "
            "training path). Train/fine-tune through the experiment CLI "
            "and serve the resulting *_model_state_dict.msgpack.")

    # initialise on host CPU (shape inference only), then load weights
    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        sample = host_batch(0, min(batch_size, n_total)).astype(np.float32)
        if sample.max() > 1.5:
            sample = sample / 255.0
        variables = model.init(jax.random.key(0), {"x": sample})
    loaded = ckpt.load_params_file(checkpoint)
    if "params" not in loaded:
        loaded = {"params": loaded}
    # one H2D transfer of the weights up front — forward would otherwise
    # re-ship the full tree (host numpy after msgpack restore) every batch
    variables = jax.device_put(
        {"params": loaded["params"],
         "batch_stats": loaded.get("batch_stats",
                                   variables.get("batch_stats", {}))})

    @jax.jit
    def forward(variables, x):
        if x.dtype == jnp.uint8:
            x = x.astype(jnp.float32) / 255.0
        elif scale_float:
            x = x.astype(jnp.float32) / 255.0
        pred = model.apply(variables, x, train=False)
        pred = pred.astype(jnp.float32)
        if argmax and pred.shape[-1] > 1:
            return jnp.argmax(pred, axis=-1).astype(jnp.uint8)
        if threshold is not None:
            return (pred[..., 0] >= threshold).astype(jnp.uint8) \
                if pred.shape[-1] == 1 else \
                (pred >= threshold).astype(jnp.uint8)
        return pred

    outs = []
    # pipelined dispatch: enqueue batch i+1 before fetching batch i, so the
    # H2D copy and the forward overlap (one device_get per batch)
    pending = None
    t0 = time.perf_counter()
    for lo in range(0, n_total, batch_size):
        x = host_batch(lo, min(lo + batch_size, n_total))
        dev_out = forward(variables, x)
        if pending is not None:
            outs.append(jax.device_get(pending))
        pending = dev_out
    if pending is not None:
        outs.append(jax.device_get(pending))
    dt = time.perf_counter() - t0

    preds = np.concatenate(outs, axis=0)[:n_total]
    os.makedirs(os.path.dirname(output_path) or ".", exist_ok=True)
    np.save(output_path, preds)
    return {"images": int(n_total), "seconds": round(dt, 4),
            "images_per_sec": round(n_total / dt, 2),
            "output": output_path, "shape": list(preds.shape),
            "dtype": str(preds.dtype),
            "mixed_precision": bool(mixed_precision)}


def main(argv=None) -> int:
    import argparse

    parser = argparse.ArgumentParser(
        prog="python -m medsegpretrainimagenet_tpu.predict",
        description="Batched TPU inference from an experiment config + "
                    "checkpoint.")
    parser.add_argument("config", help="experiment YAML (model section is "
                                       "used)")
    parser.add_argument("--checkpoint", required=True,
                        help="native msgpack model checkpoint "
                             "(*_model_state_dict.msgpack)")
    parser.add_argument("--input", required=True,
                        help=".npy image stack: (N,H,W), (N,C,H,W) or "
                             "(N,H,W,C); uint8 stacks ship as-is and "
                             "dequantize on device")
    parser.add_argument("--output", required=True, help="output .npy path")
    parser.add_argument("--batch", type=int, default=16)
    parser.add_argument("--threshold", type=float, default=None,
                        help="binarize sigmoid outputs at this threshold "
                             "(uint8 output)")
    parser.add_argument("--argmax", action="store_true",
                        help="argmax multiclass outputs to class ids")
    # tri-state: omitted -> None (inherit from the config / auto-detect),
    # --x -> True, --no-x -> False (a plain store_true could never force
    # OFF a config that enables mixed precision)
    parser.add_argument("--mixed-precision",
                        action=argparse.BooleanOptionalAction,
                        default=None, help="bf16 block compute (default: "
                                           "the config's "
                                           "meta/technical/mixed_precision)")
    parser.add_argument("--repeat-channels",
                        action=argparse.BooleanOptionalAction,
                        default=None,
                        help="repeat grayscale inputs to 3 channels "
                             "(auto-detected from the model config when "
                             "omitted)")
    parser.add_argument("--image-size", type=int, default=None,
                        help="resize inputs to this square size before "
                             "inference (match the training image_sizes)")
    args = parser.parse_args(argv)
    try:
        stats = predict_from_config(
            args.config, args.checkpoint, args.input, args.output,
            batch_size=args.batch, threshold=args.threshold,
            argmax=args.argmax, mixed_precision=args.mixed_precision,
            repeat_channels=args.repeat_channels,
            image_size=args.image_size)
    except Exception as exc:  # noqa: BLE001 — CLI envelope
        handle_exception(exc, "Exception during prediction.")
        return 1
    print(json.dumps(stats))
    return 0
