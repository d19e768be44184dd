"""Manual TPU ablation: where does the Swin U-Net train step's time go?

Not collected by pytest.  Run on a TPU host:

    PYTHONPATH=/root/repo:$PYTHONPATH python tests/perf_swin_ablation.py

Context: bench.py measures Swin-224 train at ~365 img/s ≈ 0.07 MFU —
far below the conv U-Net's 0.46.  The window attention matmuls are
intrinsically small (49×32 tiles on a 128×128 MXU), but they are only
part of the FLOPs; this ablation separates the other suspects:

  baseline        — the bench configuration (stoch depth 0.2, dropout rng)
  no_stochdepth   — stochastic_depth_rate = 0 (removes per-block bernoulli
                    + where over full activations)
  no_dropout_rng  — stoch depth 0 AND no 'dropout' rng collection plumbed
                    (stoch depth needs the rng, so this composes with
                    no_stochdepth; the delta vs no_stochdepth is the rng
                    folding cost alone)
  fwd_only        — value only, no backward (bounds the bwd share)
  ln_half_out     — LayerNorms keep f32 statistics but emit bf16 outputs
                    (models/blocks.set_ln_half_out), flipping the whole
                    residual stream — rolls, window-partition transposes,
                    residual adds — from f32 to bf16 bytes.  NOT the
                    falsified bf16-*stats* LN A/B (which measured 327 vs
                    364 img/s); this one attacks the byte ceiling the
                    round-2 roofline analysis named (8.9 flop/byte).
"""
from __future__ import annotations

import functools
import time

import os

import jax
import jax.numpy as jnp
import optax

import sys
sys.path.insert(0, "/root/repo")

# persistent compile cache: a killed/retried A/B skips the ~minutes-long
# Swin train-step compile over the tunnel (TPU executables are
# host-portable, unlike the CPU-mesh case conftest fingerprints)
jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/mst_jax_cache_tpu"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from medsegpretrainimagenet_tpu.models.blocks import set_compute_dtype

BATCH, SIZE, STEPS = 24, 224, 20


def swin_unet(stoch_depth=0.2):
    """The bench's Swin U-Net config (single source of truth)."""
    import bench
    return bench._swin_module(SIZE, stoch_depth)


def _aot(jitted, *args):
    """AOT-compile once; return (executable, bytes accessed, flops) —
    compiling separately for cost analysis would double the (slow) Swin
    compile, the same pitfall bench._compile_with_flops avoids."""
    try:
        compiled = jitted.lower(*args).compile()
    except Exception:
        return jitted, None, None
    try:
        cost = compiled.cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        return compiled, float(cost.get("bytes accessed", 0.0)), \
            float(cost.get("flops", 0.0))
    except Exception:
        return compiled, None, None


def run(tag, stoch_depth=0.2, use_rng=True, backward=True,
        ln_half_out=False, report_bytes=False):
    from medsegpretrainimagenet_tpu.models.blocks import set_ln_half_out
    set_compute_dtype(jnp.bfloat16)
    set_ln_half_out(ln_half_out)
    module = swin_unet(stoch_depth)
    x = jnp.zeros((BATCH, SIZE, SIZE, 3), jnp.bfloat16)
    y = jnp.zeros((BATCH, SIZE, SIZE), jnp.float32)
    variables = module.init(jax.random.key(0), x, train=False)
    params = variables["params"]
    tx = optax.sgd(1e-3, momentum=0.9)
    opt_state = tx.init(params)
    rng = jax.random.key(1)

    def loss_fn(params, x, y, rng):
        rngs = {"dropout": rng} if use_rng else {}
        pred = module.apply({"params": params}, x, train=True, rngs=rngs)
        pred = pred[..., 0].astype(jnp.float32)
        eps = 1e-5
        inter = jnp.sum(pred * y)
        return 1 - (2 * inter + eps) / (jnp.sum(y) + jnp.sum(pred**2) + eps)

    if backward:
        @functools.partial(jax.jit, donate_argnums=(0, 1))
        def step(params, opt_state, x, y, rng):
            loss, grads = jax.value_and_grad(loss_fn)(params, x, y, rng)
            updates, opt_state = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

        if report_bytes:
            step, nbytes, nflops = _aot(step, params, opt_state, x, y, rng)
            if nbytes:
                print(f"{tag:16s} {nbytes / 1e9:8.2f} GB accessed/step, "
                      f"{nflops / 1e9:8.1f} GF "
                      f"({nflops / nbytes:.1f} flop/byte)", flush=True)
        params, opt_state, loss = step(params, opt_state, x, y, rng)
        float(loss)
        t0 = time.perf_counter()
        for _ in range(STEPS):
            params, opt_state, loss = step(params, opt_state, x, y, rng)
        float(loss)
    else:
        fwd = jax.jit(loss_fn)
        float(fwd(params, x, y, rng))
        t0 = time.perf_counter()
        for _ in range(STEPS):
            loss = fwd(params, x, y, rng)
        float(loss)
    dt = time.perf_counter() - t0
    print(f"{tag:16s} {BATCH * STEPS / dt:8.1f} img/s", flush=True)


if __name__ == "__main__":
    print("backend:", jax.devices()[0].platform, flush=True)
    only = os.environ.get("ABLATE", "")
    variants = {
        "baseline": lambda: run("baseline", report_bytes=True),
        "ln_half_out": lambda: run("ln_half_out", ln_half_out=True,
                                   report_bytes=True),
        "no_stochdepth": lambda: run("no_stochdepth", stoch_depth=0.0),
        "no_dropout_rng": lambda: run("no_dropout_rng", stoch_depth=0.0,
                                      use_rng=False),
        "fwd_only": lambda: run("fwd_only", backward=False),
    }
    for name in (only.split(",") if only else variants):
        variants[name]()
