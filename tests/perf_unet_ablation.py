"""Manual TPU ablation: where does the U-Net-256 train step time go?

Times the bf16 train step with (a) the full model, (b) BatchNorm swapped
for identity (isolates BN's stats+normalize cost), (c) forward-only.
Run on a TPU host:  PYTHONPATH=... python tests/perf_unet_ablation.py
"""
from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import optax

import flax.linen as nn

from medsegpretrainimagenet_tpu.models import UNet
from medsegpretrainimagenet_tpu.models import blocks as blocks_mod
from medsegpretrainimagenet_tpu.models.blocks import set_compute_dtype

BATCH, SIZE, STEPS = 16, 256, 20


class _IdentityNorm(nn.Module):
    def __call__(self, x):
        return x


def bench(no_bn: bool = False, fwd_only: bool = False) -> float:
    set_compute_dtype(jnp.bfloat16)
    orig = blocks_mod._batch_norm
    if no_bn:
        blocks_mod._batch_norm = lambda train: _IdentityNorm()
    try:
        module = UNet(img_ch=3, output_ch=1, depth=4)
        x = jnp.zeros((BATCH, SIZE, SIZE, 3), jnp.bfloat16)
        y = jnp.zeros((BATCH, SIZE, SIZE), jnp.float32)
        variables = module.init(jax.random.key(0), x, train=True)
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
        tx = optax.sgd(1e-3, momentum=0.9)
        opt_state = tx.init(params)

        def loss_fn(params, batch_stats, x, y):
            kw = {}
            if batch_stats:
                kw = dict(mutable=["batch_stats"])
                out = module.apply({"params": params,
                                    "batch_stats": batch_stats}, x,
                                   train=True, **kw)
                pred, updates = out
                new_stats = updates["batch_stats"]
            else:
                pred = module.apply({"params": params}, x, train=True)
                new_stats = {}
            pred = pred[..., 0].astype(jnp.float32)
            eps = 1e-5
            inter = jnp.sum(pred * y)
            dice = (2 * inter + eps) / (jnp.sum(y) + jnp.sum(pred**2) + eps)
            return 1 - dice, new_stats

        if fwd_only:
            @functools.partial(jax.jit, donate_argnums=(1,))
            def step(params, batch_stats, opt_state, x, y):
                loss, new_stats = loss_fn(params, batch_stats, x, y)
                return params, new_stats, opt_state, loss
        else:
            @functools.partial(jax.jit, donate_argnums=(0, 1, 2))
            def step(params, batch_stats, opt_state, x, y):
                (loss, new_stats), grads = jax.value_and_grad(
                    loss_fn, has_aux=True)(params, batch_stats, x, y)
                updates, opt_state = tx.update(grads, opt_state, params)
                return (optax.apply_updates(params, updates), new_stats,
                        opt_state, loss)

        params, batch_stats, opt_state, loss = step(
            params, batch_stats, opt_state, x, y)
        float(loss)
        t0 = time.perf_counter()
        for _ in range(STEPS):
            params, batch_stats, opt_state, loss = step(
                params, batch_stats, opt_state, x, y)
        float(loss)
        return BATCH * STEPS / (time.perf_counter() - t0)
    finally:
        blocks_mod._batch_norm = orig


def main():
    print(f"backend={jax.default_backend()}")
    for tag, kw in (("full fwd+bwd", {}),
                    ("no-BN fwd+bwd", {"no_bn": True}),
                    ("full fwd-only", {"fwd_only": True})):
        print(f"{tag:14s} {bench(**kw):7.1f} img/s")


if __name__ == "__main__":
    main()
