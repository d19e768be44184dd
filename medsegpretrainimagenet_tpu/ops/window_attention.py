"""Fused window attention: softmax(q k^T * scale + bias [+ mask]) v.

The reference computes this with separate torch matmuls + softmax per
window batch (``blocks.py:192-224``); here the TPU path is a single Pallas
kernel that keeps the (N, N) attention logits in VMEM — they never touch
HBM.  Windows are small (N = window_size² ≤ 49 in every shipped config), so
the kernel batches several windows per grid step to fill the MXU.

The backward pass is pure XLA (a custom VJP over the saved probabilities):
four small batched matmuls that XLA fuses well; the forward is the hot
eval/train path worth hand-fusing.

``window_attention_core(q, k, v, bias, mask, scale)``:
  q, k, v: (B_, H, N, D)   bias: (H, N, N)   mask: (nW, N, N) or None,
  where B_ = batch * nW.  Returns (B_, H, N, D).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp


def _logits(q, k, bias, mask, scale):
    logits = jnp.einsum("bhnd,bhmd->bhnm", q * scale, k,
                        preferred_element_type=jnp.float32)
    logits = logits + bias[None].astype(logits.dtype)
    if mask is not None:
        n_w = mask.shape[0]
        b_, h, n, _ = logits.shape
        logits = logits.reshape(b_ // n_w, n_w, h, n, n) \
            + mask[None, :, None].astype(logits.dtype)
        logits = logits.reshape(b_, h, n, n)
    return logits


def _xla_window_attention(q, k, v, bias, mask, scale):
    logits = _logits(q, k, bias, mask, scale)
    probs = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhnm,bhmd->bhnd", probs.astype(v.dtype), v,
                      preferred_element_type=jnp.float32).astype(v.dtype)


# ---------------------------------------------------------------------------
# Pallas TPU kernel
# ---------------------------------------------------------------------------

def _pallas_kernel(q_ref, k_ref, v_ref, bias_ref, mask_ref, out_ref, *,
                   scale: float, heads: int):
    """One grid step: W_BLK windows x all heads, everything in VMEM.

    (window, head) fold into one batch dim so both matmuls are single
    batched ``dot_general`` calls on the MXU; logits/probs never leave
    VMEM."""
    w_blk, hh, n, d = q_ref.shape
    # keep the input dtype on the MXU (bf16 inputs run the systolic array at
    # full rate; accumulation is f32 via preferred_element_type) — mirrors
    # the XLA path's `q * scale` + einsum dtype handling exactly
    q = (q_ref[...] * jnp.asarray(scale, q_ref.dtype)).reshape(
        w_blk * hh, n, d)
    k = k_ref[...].reshape(w_blk * hh, n, d)
    v = v_ref[...].reshape(w_blk * hh, n, d)
    logits = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32).reshape(w_blk, hh, n, n)
    logits = logits + bias_ref[...][None].astype(jnp.float32)
    if mask_ref is not None:
        logits = logits + mask_ref[...][:, None].astype(jnp.float32)
    logits -= jnp.max(logits, axis=-1, keepdims=True)
    probs = jnp.exp(logits)
    probs /= jnp.sum(probs, axis=-1, keepdims=True)
    out = jax.lax.dot_general(
        probs.astype(v.dtype).reshape(w_blk * hh, n, n), v,
        (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    out_ref[...] = out.reshape(w_blk, hh, n, d).astype(out_ref.dtype)


def _pallas_window_attention(q, k, v, bias, mask, scale, w_blk=8):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b_, heads, n, d = q.shape
    n_w = 1 if mask is None else mask.shape[0]
    # pick a window block that divides B_ and aligns with the mask period
    while w_blk > 1 and (b_ % w_blk or (mask is not None and n_w % w_blk
                                        and w_blk % n_w)):
        w_blk //= 2
    grid = (b_ // w_blk,)

    qkv_spec = pl.BlockSpec((w_blk, heads, n, d), lambda i: (i, 0, 0, 0),
                            memory_space=pltpu.VMEM)
    bias_spec = pl.BlockSpec((heads, n, n), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM)
    in_specs = [qkv_spec, qkv_spec, qkv_spec, bias_spec]
    operands = [q, k, v, bias]
    if mask is not None:
        if w_blk <= n_w:
            # block i covers windows [i*w_blk, (i+1)*w_blk) mod nW
            mask_spec = pl.BlockSpec(
                (w_blk, n, n), lambda i: (i % (n_w // w_blk), 0, 0),
                memory_space=pltpu.VMEM)
            operands.append(mask)
        else:
            tiled = jnp.tile(mask, (w_blk // n_w, 1, 1))
            mask_spec = pl.BlockSpec((w_blk, n, n), lambda i: (0, 0, 0),
                                     memory_space=pltpu.VMEM)
            operands.append(tiled)
        in_specs.append(mask_spec)

    kernel = functools.partial(
        _pallas_kernel_with_mask if mask is not None else
        _pallas_kernel_no_mask, scale=scale, heads=heads)
    flops = 2 * 2 * b_ * heads * n * n * d
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=qkv_spec,
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=flops, transcendentals=b_ * heads * n * n,
            bytes_accessed=4 * b_ * heads * n * d * q.dtype.itemsize),
    )(*operands)


def _pallas_kernel_no_mask(q_ref, k_ref, v_ref, bias_ref, out_ref, *,
                           scale, heads):
    _pallas_kernel(q_ref, k_ref, v_ref, bias_ref, None, out_ref,
                   scale=scale, heads=heads)


def _pallas_kernel_with_mask(q_ref, k_ref, v_ref, bias_ref, mask_ref,
                             out_ref, *, scale, heads):
    _pallas_kernel(q_ref, k_ref, v_ref, bias_ref, mask_ref, out_ref,
                   scale=scale, heads=heads)


# ---------------------------------------------------------------------------
# custom VJP: Pallas forward, XLA backward over recomputed probs
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def _fused(q, k, v, bias, mask, scale):
    return _pallas_window_attention(q, k, v, bias, mask, scale)


def _fused_fwd(q, k, v, bias, mask, scale):
    return _pallas_window_attention(q, k, v, bias, mask, scale), \
        (q, k, v, bias, mask)


def _fused_bwd(scale, residuals, g):
    q, k, v, bias, mask = residuals
    probs = jax.nn.softmax(_logits(q, k, bias, mask, scale), axis=-1)
    g32 = g.astype(jnp.float32)
    dv = jnp.einsum("bhnm,bhnd->bhmd", probs, g32,
                    preferred_element_type=jnp.float32)
    dprobs = jnp.einsum("bhnd,bhmd->bhnm", g32, v.astype(jnp.float32),
                        preferred_element_type=jnp.float32)
    dlogits = probs * (dprobs - jnp.sum(dprobs * probs, axis=-1,
                                        keepdims=True))
    dq = scale * jnp.einsum("bhnm,bhmd->bhnd", dlogits,
                            k.astype(jnp.float32),
                            preferred_element_type=jnp.float32)
    dk = scale * jnp.einsum("bhnm,bhnd->bhmd", dlogits,
                            q.astype(jnp.float32),
                            preferred_element_type=jnp.float32)
    dbias = jnp.sum(dlogits, axis=0)
    if mask is None:
        dmask = None
    else:
        # mask broadcasts as (1, nW, 1, N, N) into the (B_/nW, nW, H, N, N)
        # logits (_logits above), so its cotangent sums over the batch
        # groups and heads — a zeros placeholder here would silently wrong
        # any caller differentiating through the Pallas path w.r.t. mask
        # (e.g. input-saliency passes over the eval forward)
        n_w = mask.shape[0]
        b_, h, n, _ = dlogits.shape
        dmask = dlogits.reshape(b_ // n_w, n_w, h, n, n).sum(axis=(0, 2))
        dmask = dmask.astype(mask.dtype)
    return (dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype),
            dbias.astype(bias.dtype), dmask)


_fused.defvjp(_fused_fwd, _fused_bwd)


# ---------------------------------------------------------------------------
# Fused image-layout path: window partition + head split + attention +
# head merge + window reverse in ONE kernel (the r4 "Mosaic windowed
# gathers" lever).  The XLA path materialises the partition / head-split
# / unsplit / reverse transposes as HBM round-trips — 25 % (train) / 39 %
# (eval) of Swin device time per MFU_CLOSURE.json; here the BlockSpec
# index map reads one row-of-windows tile straight from the (B, R, R, 3C)
# layout and every repack happens in VMEM.
# ---------------------------------------------------------------------------

def _xla_image_attention(qkv, bias, mask, scale, window: int):
    """Reference/fallback: the exact op sequence the fused kernel
    replaces.  qkv: (B, R, R, 3C) -> out: (B, R, R, C)."""
    b, r, _, c3 = qkv.shape
    c = c3 // 3
    heads = bias.shape[0]
    d = c // heads
    n = window * window
    t = qkv.reshape(b, r // window, window, r // window, window, c3)
    t = t.transpose(0, 1, 3, 2, 4, 5).reshape(-1, n, 3, heads, d)
    t = t.transpose(2, 0, 3, 1, 4)                    # (3, B_, H, N, D)
    out = _xla_window_attention(t[0], t[1], t[2], bias, mask, scale)
    out = out.transpose(0, 2, 1, 3).reshape(
        b, r // window, r // window, window, window, c)
    return out.transpose(0, 1, 3, 2, 4, 5).reshape(b, r, r, c)


def _pallas_image_kernel(qkv_ref, bias_ref, mask_ref, out_ref, *,
                         scale: float, heads: int, window: int):
    """One grid step: ONE window position across the whole batch,
    image layout in and out.

    qkv_ref: (B, w, w, 3C) — the (i, j) window tile of every image,
    gathered by the BlockSpec index map's strided DMA; out_ref:
    (B, w, w, C).  Mosaic on this backend rejects minor-dim reshapes
    (``(B,7,7,288)->(B,49,288)`` is an "unsupported shape cast"), so
    the token flatten rides a sublane CONCAT of the w row slices, heads
    ride lane-dim slices (offsets h*D — sub-128, a deliberate
    misaligned-relayout cost this kernel A/Bs), and the un-flatten is w
    strided row stores."""
    b, _, w, _, _, c3 = qkv_ref.shape
    c = c3 // 3
    d = c // heads
    t = qkv_ref[...].reshape(b, w, w, c3)     # squeeze the unit dims
    t = jnp.concatenate([t[:, a] for a in range(w)], axis=1)  # (B, N, 3C)
    bias = bias_ref[...]
    scale_c = jnp.asarray(scale, t.dtype)
    outs = []
    for h in range(heads):
        q = t[:, :, h * d:(h + 1) * d] * scale_c
        k = t[:, :, c + h * d:c + (h + 1) * d]
        v = t[:, :, 2 * c + h * d:2 * c + (h + 1) * d]
        logits = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)           # (B, N, N)
        logits = logits + bias[h][None].astype(jnp.float32)
        if mask_ref is not None:
            logits = logits + mask_ref[...].astype(jnp.float32)  # (1,N,N)
        logits -= jnp.max(logits, axis=-1, keepdims=True)
        probs = jnp.exp(logits)
        probs /= jnp.sum(probs, axis=-1, keepdims=True)
        outs.append(jax.lax.dot_general(
            probs.astype(t.dtype), v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32).astype(out_ref.dtype))
    o = jnp.concatenate(outs, axis=-1)                    # (B, N, C)
    for a in range(w):
        out_ref[:, 0, a, 0] = o[:, a * w:(a + 1) * w]


def _pallas_image_kernel_no_mask(qkv_ref, bias_ref, out_ref, *, scale,
                                 heads, window):
    _pallas_image_kernel(qkv_ref, bias_ref, None, out_ref, scale=scale,
                         heads=heads, window=window)


def _pallas_image_attention(qkv, bias, mask, scale, window: int):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, r, _, c3 = qkv.shape
    c = c3 // 3
    heads = bias.shape[0]
    n = window * window
    n_wc = r // window
    # batch block: whole-B window tiles overflow the ~16 MB VMEM budget
    # at the deep (fat-C) levels — pick the largest divisor of B whose
    # double-buffered in+out tiles fit comfortably
    per_img = window * window * (c3 + c) * qkv.dtype.itemsize
    b_blk = next((d for d in range(b, 0, -1)
                  if b % d == 0 and d * per_img * 3 <= 4 * 1024 * 1024), 1)
    grid = (b // b_blk, n_wc, n_wc)
    # 6-D windowed VIEW (free row-major reshape): Pallas requires a
    # block's last two dims to be 8/128-divisible OR equal to the array
    # dims — a (.., 7, 288) window block of the raw (B, R, R, 3C) image
    # violates that, but on (B, nWr, w, nWc, w, 3C) the (w, 3C) block
    # tail EQUALS the array tail, so the per-window strided gather is
    # legal and the DMA engine does it
    qkv6 = qkv.reshape(b, n_wc, window, n_wc, window, c3)
    qkv_spec = pl.BlockSpec((b_blk, 1, window, 1, window, c3),
                            lambda bi, i, j: (bi, i, 0, j, 0, 0),
                            memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((b_blk, 1, window, 1, window, c),
                            lambda bi, i, j: (bi, i, 0, j, 0, 0),
                            memory_space=pltpu.VMEM)
    bias_spec = pl.BlockSpec((heads, n, n), lambda bi, i, j: (0, 0, 0),
                             memory_space=pltpu.VMEM)
    in_specs = [qkv_spec, bias_spec]
    operands = [qkv, bias]
    if mask is not None:
        # window (i, j)'s additive mask lives at row i*nWc + j
        in_specs.append(pl.BlockSpec(
            (1, n, n), lambda bi, i, j, _n=n_wc: (i * _n + j, 0, 0),
            memory_space=pltpu.VMEM))
        operands.append(mask)
        kernel = functools.partial(_pallas_image_kernel, scale=scale,
                                   heads=heads, window=window)
    else:
        kernel = functools.partial(_pallas_image_kernel_no_mask,
                                   scale=scale, heads=heads, window=window)
    d = c // heads
    flops = 2 * 2 * (b * n_wc * n_wc) * heads * n * n * d
    operands[0] = qkv6
    out6 = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct(
            (b, n_wc, window, n_wc, window, c), qkv.dtype),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            transcendentals=b * n_wc * n_wc * heads * n * n,
            bytes_accessed=(qkv.size + b * r * r * c) * qkv.dtype.itemsize),
    )(*operands)
    return out6.reshape(b, r, r, c)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _fused_image(qkv, bias, mask, scale, window):
    return _pallas_image_attention(qkv, bias, mask, scale, window)


def _fused_image_fwd(qkv, bias, mask, scale, window):
    return _pallas_image_attention(qkv, bias, mask, scale, window), \
        (qkv, bias, mask)


def _fused_image_bwd(scale, window, residuals, g):
    # backward rides the XLA op sequence (same policy as _fused: under
    # training the XLA path wins, so grads through the fused path are a
    # correctness fallback, not a hot path)
    qkv, bias, mask = residuals
    if mask is None:
        _, pull = jax.vjp(
            lambda a, b2: _xla_image_attention(a, b2, None, scale, window),
            qkv, bias)
        dqkv, dbias = pull(g)
        return dqkv, dbias, None
    _, pull = jax.vjp(
        lambda a, b2, m: _xla_image_attention(a, b2, m, scale, window),
        qkv, bias, mask)
    return pull(g)


_fused_image.defvjp(_fused_image_fwd, _fused_image_bwd)


#: model-level dispatch for the fused image path: "off" (default — the
#: windows-layout XLA pipeline, whose layout copies XLA already folds
#: optimally per tools/swin_layout_ab.py), "on" (force, A/B tooling),
#: "auto" (bf16 no-grad forward on TPU, like the windows-layout kernel).
_FUSED_IMAGE_MODE = "off"


def set_fused_image_mode(mode: str) -> None:
    assert mode in ("auto", "on", "off"), mode
    global _FUSED_IMAGE_MODE
    _FUSED_IMAGE_MODE = mode


def use_fused_image(train: bool, dtype) -> bool:
    """Should SwinTransformerBlock route attention through the fused
    image-layout kernel?  *dtype* is the COMPUTE dtype (the qkv Dense
    output dtype), not the LN-output dtype."""
    if _FUSED_IMAGE_MODE == "off":
        return False
    if _FUSED_IMAGE_MODE == "on":
        return True
    return (not train and dtype == jnp.bfloat16
            and jax.default_backend() in ("tpu", "axon"))


def fused_image_window_attention(qkv, bias, mask, scale, window: int,
                                 force: Optional[str] = None,
                                 train: bool = False):
    """Image-layout window attention: qkv (B, R, R, 3C) -> (B, R, R, C).

    Dispatch mirrors :func:`window_attention_core`: the Pallas kernel
    serves the bf16 no-grad forward on TPU; everything else takes the
    XLA op sequence (whose transposes XLA optimises freely)."""
    impl = force or ("pallas" if (not train and qkv.dtype == jnp.bfloat16
                                  and jax.default_backend()
                                  in ("tpu", "axon")) else "xla")
    if impl == "pallas":
        return _fused_image(qkv, bias, mask, scale, window)
    return _xla_image_attention(qkv, bias, mask, scale, window)


def window_attention_core(q, k, v, bias,
                          mask: Optional[jax.Array], scale: float,
                          force: Optional[str] = None,
                          train: bool = False) -> jax.Array:
    """Dispatch: Pallas for the bf16 no-grad forward on TPU, XLA otherwise.

    The kernel feeds the MXU in the input dtype (f32 accumulation), so
    bf16 runs the systolic array at full rate.  Measured on v5e at the
    reference Swin U-Net shapes (N=49, D=32; level 0: 1536 windows x 3
    heads, level 1: 384 x 6), the bf16 Pallas *forward* wins every case,
    masked (SW-MSA) included: 1759-2596 us vs XLA 2638-2985 us.  Under
    training the picture flips: the custom VJP recomputes logits+softmax
    in the backward, and the full Swin U-Net 224² bf16 train step measures
    364 img/s forced-XLA vs 328 img/s with the Pallas forward — so
    ``train=True`` takes the XLA path (XLA's autodiff shares the forward
    probs with the backward).  For f32 the two are within noise of each
    other, so f32 also stays on XLA.  ``force`` ∈ {None, 'xla', 'pallas'}
    pins the implementation (tests)."""
    impl = force or ("pallas" if (not train and q.dtype == jnp.bfloat16
                                  and jax.default_backend()
                                  in ("tpu", "axon")) else "xla")
    if impl == "pallas":
        return _fused(q, k, v, bias, mask, scale)
    return _xla_window_attention(q, k, v, bias, mask, scale)
