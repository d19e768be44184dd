"""Manual TPU bench: Swin U-Net 224² bf16 train step, XLA vs Pallas attention.

Not collected by pytest.  Run on a TPU host:

    PYTHONPATH=/root/repo:$PYTHONPATH python tests/perf_swin_step.py
"""
from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import optax

import medsegpretrainimagenet_tpu.ops as ops_pkg
from medsegpretrainimagenet_tpu.config import ConfigDict
from medsegpretrainimagenet_tpu.models import UNet
from medsegpretrainimagenet_tpu.models.blocks import set_compute_dtype
from medsegpretrainimagenet_tpu.ops.window_attention import (
    window_attention_core)

BATCH, SIZE, STEPS = 24, 224, 20


def swin_unet():
    return UNet(
        img_ch=3, output_ch=1, depth=3, width=2,
        channels=[96, 192, 384, 768], change_channels_in_block=False,
        trainable_downsampling=True, stochastic_depth_rate=0.2,
        final_activation="sigmoid",
        basic_block=ConfigDict(
            {"segmentation.models.blocks.SwinTransformerBlock": {
                "img_size": SIZE, "patch_size": 4, "embed_dim": 96,
                "num_heads_layers": (3, 6, 12, 24), "window_size": 7}}),
        mixing_block=ConfigDict(
            {"segmentation.models.blocks.ConcatLinearBlock": {
                "halve_channels": True, "pass_all_input": True}}),
        preproc_block=ConfigDict(
            {"segmentation.models.blocks.PatchEmbed": {"patch_size": 4}}),
        downsampling_block=ConfigDict(
            {"segmentation.models.blocks.PatchMerging": {}}),
        upsampling_block=ConfigDict(
            {"segmentation.models.blocks.PatchExpand": {"dim_scale": 2}}),
        final_block=ConfigDict(
            {"segmentation.models.blocks.FinalPatchExpand_X4": {
                "dim_scale": 4}}),
    )


def bench(force):
    if force is None:
        ops_pkg.window_attention_core = window_attention_core
    else:
        ops_pkg.window_attention_core = functools.partial(
            window_attention_core, force=force)
    set_compute_dtype(jnp.bfloat16)
    module = swin_unet()
    x = jnp.zeros((BATCH, SIZE, SIZE, 3), jnp.bfloat16)
    y = jnp.zeros((BATCH, SIZE, SIZE), jnp.float32)
    variables = module.init(jax.random.key(0), x, train=False)
    params = variables["params"]
    tx = optax.sgd(1e-3, momentum=0.9)
    opt_state = tx.init(params)
    rng = jax.random.key(1)

    def loss_fn(params, x, y, rng):
        pred = module.apply({"params": params}, x, train=True,
                            rngs={"dropout": rng})
        pred = pred[..., 0].astype(jnp.float32)
        eps = 1e-5
        inter = jnp.sum(pred * y)
        return 1 - (2 * inter + eps) / (jnp.sum(y) + jnp.sum(pred**2) + eps)

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt_state, x, y, rng):
        loss, grads = jax.value_and_grad(loss_fn)(params, x, y, rng)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    params, opt_state, loss = step(params, opt_state, x, y, rng)
    float(loss)
    t0 = time.perf_counter()
    for _ in range(STEPS):
        params, opt_state, loss = step(params, opt_state, x, y, rng)
    float(loss)
    dt = time.perf_counter() - t0
    return BATCH * STEPS / dt


def bench_eval(force):
    if force is None:
        ops_pkg.window_attention_core = window_attention_core
    else:
        ops_pkg.window_attention_core = functools.partial(
            window_attention_core, force=force)
    set_compute_dtype(jnp.bfloat16)
    module = swin_unet()
    x = jnp.zeros((BATCH, SIZE, SIZE, 3), jnp.bfloat16)
    variables = module.init(jax.random.key(0), x, train=False)

    @jax.jit
    def fwd(variables, x):
        return module.apply(variables, x, train=False)

    out = fwd(variables, x)
    float(jnp.sum(out))
    t0 = time.perf_counter()
    for _ in range(STEPS):
        out = fwd(variables, x)
    float(jnp.sum(out))
    return BATCH * STEPS / (time.perf_counter() - t0)


def main():
    import sys
    mode = sys.argv[1] if len(sys.argv) > 1 else "train"
    print(f"backend={jax.default_backend()} mode={mode}")
    if mode == "train":
        for force, tag in ((None, "dispatch(default)"), ("xla", "force-xla")):
            print(f"train {tag:18s} {bench(force):7.1f} img/s")
    else:
        for force, tag in (("pallas", "force-pallas"), ("xla", "force-xla")):
            print(f"eval  {tag:18s} {bench_eval(force):7.1f} img/s")


if __name__ == "__main__":
    main()
