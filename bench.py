"""Headline benchmark: images/sec/chip, basic U-Net 256² forward+backward.

Matches the BASELINE.json metric ("images/sec/chip U-Net 256² fwd+bwd");
``vs_baseline`` is the speedup over a PyTorch-CPU forward+backward of the
equivalent model measured on this host (the reference is CUDA/CPU PyTorch,
``src/segmentation/models/unet_models.py``; >5x is the north star).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
from __future__ import annotations

import functools
import json
import os
import sys
import time

BATCH = int(os.environ.get("BENCH_BATCH", "16"))
SIZE = int(os.environ.get("BENCH_SIZE", "256"))
STEPS = int(os.environ.get("BENCH_STEPS", "20"))
TORCH_STEPS = int(os.environ.get("BENCH_TORCH_STEPS", "2"))


def bench_jax() -> float:
    import jax
    import jax.numpy as jnp
    import optax

    from medsegpretrainimagenet_tpu.models import UNet
    from medsegpretrainimagenet_tpu.models.blocks import set_compute_dtype

    if os.environ.get("BENCH_MP", "1") == "1":
        set_compute_dtype(jnp.bfloat16)  # bf16 activations (params f32)
    module = UNet(img_ch=3, output_ch=1, depth=4)
    x = jnp.zeros((BATCH, SIZE, SIZE, 3), jnp.bfloat16)
    y = jnp.zeros((BATCH, SIZE, SIZE), jnp.float32)
    variables = module.init(jax.random.key(0), x, train=True)
    params, batch_stats = variables["params"], variables.get(
        "batch_stats", {})
    tx = optax.sgd(1e-3, momentum=0.9)
    opt_state = tx.init(params)

    def loss_fn(params, batch_stats, x, y):
        pred, updates = module.apply(
            {"params": params, "batch_stats": batch_stats}, x, train=True,
            mutable=["batch_stats"])
        pred = pred[..., 0].astype(jnp.float32)
        eps = 1e-5
        inter = jnp.sum(pred * y)
        dice = (2 * inter + eps) / (jnp.sum(y) + jnp.sum(pred ** 2) + eps)
        return 1 - dice, updates["batch_stats"]

    @functools.partial(jax.jit, donate_argnums=(0, 1, 2))
    def train_step(params, batch_stats, opt_state, x, y):
        (loss, batch_stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, batch_stats, x, y)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, batch_stats, opt_state, loss

    # compile + warmup; sync via scalar readback (block_until_ready does
    # not drain the remote-TPU execution queue on every backend)
    params, batch_stats, opt_state, loss = train_step(
        params, batch_stats, opt_state, x, y)
    float(loss)

    t0 = time.perf_counter()
    for _ in range(STEPS):
        params, batch_stats, opt_state, loss = train_step(
            params, batch_stats, opt_state, x, y)
    float(loss)  # the step chain serializes on params; this drains it
    dt = time.perf_counter() - t0
    return BATCH * STEPS / dt


def bench_torch_cpu() -> float:
    """PyTorch-CPU fwd+bwd on an equivalent depth-4 U-Net (the baseline)."""
    import torch
    import torch.nn as nn

    torch.set_num_threads(os.cpu_count() or 8)

    def conv_block(cin, cout):
        return nn.Sequential(
            nn.Conv2d(cin, cout, 3, padding=1), nn.BatchNorm2d(cout),
            nn.ReLU(inplace=True))

    class TorchUNet(nn.Module):
        def __init__(self, chans=(64, 128, 256, 512, 1024)):
            super().__init__()
            self.stem = nn.Conv2d(3, chans[0], 3, padding=1)
            self.enc = nn.ModuleList(
                [conv_block(chans[i], chans[i]) for i in range(4)])
            self.down = nn.ModuleList(
                [conv_block(chans[i], chans[i + 1]) for i in range(4)])
            self.pool = nn.MaxPool2d(2)
            self.up = nn.ModuleList([nn.Sequential(
                nn.Upsample(scale_factor=2),
                nn.Conv2d(chans[i + 1], chans[i], 3, padding=1))
                for i in reversed(range(4))])
            self.dec = nn.ModuleList(
                [conv_block(2 * chans[i], chans[i])
                 for i in reversed(range(4))])
            self.head = nn.Conv2d(chans[0], 1, 1)

        def forward(self, x):
            x = self.stem(x)
            skips = []
            for enc, down in zip(self.enc, self.down):
                x = enc(x)
                skips.append(x)
                x = down(self.pool(x))
            for up, dec, skip in zip(self.up, self.dec, reversed(skips)):
                x = up(x)
                x = dec(torch.cat([x, skip], dim=1))
            return torch.sigmoid(self.head(x))

    model = TorchUNet()
    x = torch.zeros((max(1, BATCH // 8), 3, SIZE, SIZE))
    y = torch.zeros((max(1, BATCH // 8), 1, SIZE, SIZE))
    opt = torch.optim.SGD(model.parameters(), lr=1e-3, momentum=0.9)
    model(x)  # warmup
    t0 = time.perf_counter()
    for _ in range(TORCH_STEPS):
        opt.zero_grad()
        pred = model(x)
        eps = 1e-5
        inter = (pred * y).sum()
        loss = 1 - (2 * inter + eps) / (y.sum() + (pred ** 2).sum() + eps)
        loss.backward()
        opt.step()
    dt = time.perf_counter() - t0
    return x.shape[0] * TORCH_STEPS / dt


def _cached_baseline():
    """Measure the torch-CPU baseline once per (batch, size) and cache it:
    a 1-core contended host makes fresh measurements swing several-fold."""
    cache_path = os.path.join(os.path.expanduser("~"), ".cache",
                              f"mst_bench_torch_{BATCH}_{SIZE}.json")
    try:
        with open(cache_path) as fh:
            return json.load(fh)["img_per_sec"]
    except (OSError, ValueError, KeyError):
        pass
    value = bench_torch_cpu()
    try:
        os.makedirs(os.path.dirname(cache_path), exist_ok=True)
        with open(cache_path, "w") as fh:
            json.dump({"img_per_sec": value}, fh)
    except OSError:
        pass
    return value


def main():
    value = bench_jax()
    try:
        baseline = _cached_baseline()
    except Exception:
        baseline = None
    print(json.dumps({
        "metric": "unet256_train_images_per_sec_per_chip",
        "value": round(value, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(value / baseline, 2) if baseline else None,
    }))


if __name__ == "__main__":
    sys.exit(main())
