"""Manual TPU ablation: where does the U-Net-256 train step time go?

Times the bf16 train step with (a) the full model, (b) BatchNorm swapped
for identity (isolates BN's stats+normalize cost), (c) forward-only.
Run on a TPU host:  PYTHONPATH=... python tests/perf_unet_ablation.py

Measured A/B log (v5e, batch 16, bf16 — don't re-run falsified ones):

* r2: full 267.8 / no-BN 308.3 / fwd-only 854.4 img/s — BN costs ~13 %,
  required for parity semantics; custom BN kernel not worth it.
* r2: ``remat: true`` −27 % peak HBM for −16 % step time.
* r4 (2026-08-20): reshape+max fast pool (``ops/pooling.py``, custom
  first-tie VJP replacing the select-and-scatter maxpool backward —
  the lever named by MFU_CLOSURE.json's per-op split, 2.5 % of step):
  **falsified** — 244.5 vs 269.7 img/s (65.45 vs 59.32 ms/step), the
  elementwise eq/cumsum mask backward costs more HBM traffic than
  select-and-scatter and breaks the pool's producer fusion.  Pool path
  stays ``nn.max_pool``; see ``--fast-pool`` below to reproduce.
* r4 closure (MFU_CLOSURE.json): the step is ~73 % conv-fusion time at
  127.5 TF/s achieved (65 % of MXU peak: deep convs run at 80-95 %,
  the 64-channel top-level convs at ~25-50 % — 128-lane MXU under-fill,
  a geometry floor under the reference's channel ladder), BN stat
  reduce/broadcast at 768-844 GB/s (94-103 % of HBM peak — speed of
  light), loop fusions at ~70 % HBM.  No unfalsified lever remains.
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


def bench_fast_pool() -> float:
    """The falsified r4 pool A/B (kept reproducible): patch MaxPool2d to
    the reshape+max custom-VJP path and time the full step."""
    from medsegpretrainimagenet_tpu.ops.pooling import (
        fast_max_pool, fast_max_pool_applicable)
    orig = blocks_mod.MaxPool2d.__call__

    def patched(self, x, train=False):
        k = blocks_mod._pair(self.kernel_size)
        s = blocks_mod._pair(self.stride) if self.stride is not None else k
        if self.padding == 0 and fast_max_pool_applicable(
                x.shape, k, s, "VALID"):
            return fast_max_pool(x, tuple(k))
        return orig(self, x, train)

    blocks_mod.MaxPool2d.__call__ = patched
    try:
        return bench()
    finally:
        blocks_mod.MaxPool2d.__call__ = orig


def main():
    import sys
    print(f"backend={jax.default_backend()}")
    for tag, kw in (("full fwd+bwd", {}),
                    ("no-BN fwd+bwd", {"no_bn": True}),
                    ("full fwd-only", {"fwd_only": True})):
        print(f"{tag:14s} {bench(**kw):7.1f} img/s")
    if "--fast-pool" in sys.argv:
        print(f"{'fast-pool A/B':14s} {bench_fast_pool():7.1f} img/s")


if __name__ == "__main__":
    main()
