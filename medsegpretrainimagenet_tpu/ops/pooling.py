"""TPU-fast non-overlapping max pooling.

``flax.linen.max_pool`` lowers to ``reduce_window`` whose backward is a
``select-and-scatter`` HLO — measured at ~50 % of HBM peak and 2.5-5.7 %
of the U-Net-256 / pretrain-224 train steps on v5e (MFU_CLOSURE.json,
per-op profiler split).  For the non-overlapping case (kernel == stride,
VALID padding, divisible dims — the reference U-Net's 2×2/2 downsampling,
``/root/reference/src/segmentation/models/unet_models.py`` MaxPool2d
usage) the pool is a reshape + max over the window axes, and the
backward becomes a fuseable elementwise mask — no select-and-scatter.

The custom VJP reproduces torch/XLA *first-tie* gradient routing
(``torch.nn.MaxPool2d`` backward sends the cotangent to the first
row-major argmax of each window, as does XLA's ``ge``-select
select-and-scatter): ties are resolved by an ordered prefix count, so
trajectories stay bit-compatible with the ``nn.max_pool`` path —
pinned by ``tests/test_fast_pool.py`` against the lax reference on
tie-heavy (post-ReLU zero) inputs.

MEASURED OUTCOME (v5e, 2026-08-20, full unet256 bench step A/B): the
fast path is 9 % SLOWER end-to-end (65.45 vs 59.32 ms/step, 244.5 vs
269.7 img/s) — the elementwise eq/cumsum backward materializes the
(B, H/2, 2, W/2, 2, C) mask intermediates, costing more HBM traffic
than the select-and-scatter it replaces saves, and the pool loses its
producer fusion.  The default model path therefore stays on
``nn.max_pool``; this module is kept as the recorded falsified
experiment (with bit-equality tests) — don't re-try it without a
hardware change.  See MFU_CLOSURE.json / tests/perf_unet_ablation.py.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp


def _window_view(x: jax.Array, kh: int, kw: int) -> jax.Array:
    b, h, w, c = x.shape
    return x.reshape(b, h // kh, kh, w // kw, kw, c)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def fast_max_pool(x: jax.Array, window: Tuple[int, int]) -> jax.Array:
    """Non-overlapping NHWC max pool (kernel == stride, VALID padding).

    Requires ``H % kh == 0 and W % kw == 0`` — callers gate on
    :func:`fast_max_pool_applicable`.
    """
    kh, kw = window
    return _window_view(x, kh, kw).max(axis=(2, 4))


def _fwd(x, window):
    kh, kw = window
    out = _window_view(x, kh, kw).max(axis=(2, 4))
    return out, (x, out)


def _bwd(window, res, g):
    x, out = res
    kh, kw = window
    xw = _window_view(x, kh, kw)
    eq = xw == out[:, :, None, :, None, :]
    # first row-major tie wins (torch/XLA semantics): inclusive ordered
    # prefix count == 1 exactly at the first argmax of each window
    p_row = jnp.cumsum(eq, axis=4)                       # within-row
    row_tot = p_row[:, :, :, :, -1:, :]
    p_prev_rows = jnp.cumsum(row_tot, axis=2) - row_tot  # rows before
    first = jnp.logical_and(eq, (p_row + p_prev_rows) == 1)
    gx = jnp.where(first, g[:, :, None, :, None, :].astype(x.dtype),
                   jnp.zeros((), x.dtype))
    return (gx.reshape(x.shape),)


fast_max_pool.defvjp(_fwd, _bwd)


def fast_max_pool_applicable(shape, k, s, padding) -> bool:
    """True when the reshape fast path computes the identical pool."""
    if padding not in ("VALID", 0):
        return False
    if tuple(k) != tuple(s):
        return False
    if len(shape) != 4:
        return False
    return shape[1] % k[0] == 0 and shape[2] % k[1] == 0
