"""A/B: fused window-partition layout for Swin attention (experiment).

The r4 MFU closure (MFU_CLOSURE.json) shows "data formatting" — pure
copies/reshapes — is 39 % of swin224 EVAL device time and 25 % of TRAIN,
dwarfing the Pallas attention kernel itself (7.9 %).  The stock path
(models/swin.py, mirroring the reference ``blocks.py:225-275``)
materialises FOUR layout copies per attention: window_partition (c),
the qkv head-split 5-D transpose (3c), the attention-output transpose
(c) and window_reverse (c) — ~6c of HBM round-trips per block.

The variant here restructures to ONE fused transpose each way, with
bit-identical window/head ordering, by reordering the (all linear,
token-pointwise) ops around the attention core:

    stock:   partition -> qkv dense -> head-split transpose -> core
             -> out transpose -> proj dense -> reverse
    variant: qkv dense (on tokens) -> ONE 8-D transpose
             (partition+head-split fused) -> core
             -> ONE inverse transpose -> proj dense (on tokens)

~4c moved instead of ~6c, in both directions (it is pure XLA, so
autodiff gives the same restructuring to the backward).  The attention
core (``ops/window_attention.py`` — Pallas on the bf16 no-grad forward,
XLA otherwise) receives the exact same (B_, H, N, D) operands in the
same order, so numerics are unchanged.

Implemented as SUBCLASSES + a registry override so the package (and
with it bench.py's resume-entry src_hash) stays untouched while the
experiment runs; adoption into models/swin.py is a separate decision
that costs a full bench re-capture.

Usage:
    python tools/swin_layout_ab.py parity      # CPU, f32
    python tools/swin_layout_ab.py ab          # real-TPU ABBA (eval+train)
    python tools/swin_layout_ab.py hlo        # optimized-HLO histogram diff

VERDICT (measured 2026-08-21, v5e, code_rev 1a2a53a): **FALSIFIED** —
do not integrate.  CPU and on-device outputs are bitwise identical
(max delta 0.0, eval and train), but so is the SPEED: ABBA gains were
noise (eval -0.4 % / +1.0 %, train +0.1 % / -1.9 %).  The ``hlo`` mode
explains why: both programs compile to IDENTICAL optimized-HLO fusion
histograms (26 kCustom / 292 kLoop / 68 kOutput) — XLA's transpose
folding already canonicalises the stock partition->head-split chain
into the same minimal copy set the fused source form produces.  The
25-39 % "data formatting" share in MFU_CLOSURE.json is therefore the
canonical minimum for this computation AS EXPRESSED IN XLA; removing it
would require windowing inside a Mosaic kernel's BlockSpec index maps,
which the lane-tiling rules price at misaligned-relayout cost (c=96,
3c=288 are not 128-lane multiples at the hot level) — expected to give
back more than the copies save.
"""
from __future__ import annotations

import json
import os
import sys
import time
from typing import Optional

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)

import flax.linen as nn  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from medsegpretrainimagenet_tpu.models import swin as S  # noqa: E402
from medsegpretrainimagenet_tpu.models import blocks as B  # noqa: E402
from medsegpretrainimagenet_tpu.models.blocks import (  # noqa: E402
    compute_dtype)


class WindowAttentionFused(S.WindowAttention):
    """Param-tree-compatible WindowAttention taking TOKEN input.

    ``__call__(x: (b, L, c), mask, train)`` — window partition and the
    head split ride one fused transpose (see module docstring); the
    attention core and all param names/shapes match the stock class.
    """

    @nn.compact
    def __call__(self, x, mask: Optional[jax.Array] = None,
                 train: bool = False):
        b, length, c = x.shape
        side = S._tokens_hw(length)
        w = self.window_size[0]
        nwr = side // w
        heads = self.num_heads
        head_dim = c // heads
        scale = self.qk_scale or head_dim ** -0.5
        n = w * w

        qkv = nn.Dense(3 * c, use_bias=self.qkv_bias, name="qkv",
                       dtype=compute_dtype())(x)
        # ONE transpose: (b, L, 3c) -> (3, B_, H, N, D) with the exact
        # window order window_partition produces ((b, nWr, nWc) raster)
        # and the exact head order of the stock 5-D split
        qkv = qkv.reshape(b, nwr, w, nwr, w, 3, heads, head_dim)
        qkv = qkv.transpose(5, 0, 1, 3, 6, 2, 4, 7)
        qkv = qkv.reshape(3, b * nwr * nwr, heads, n, head_dim)
        q, k, v = qkv[0], qkv[1], qkv[2]

        ws = self.window_size
        table = self.param(
            "relative_position_bias_table", S._trunc02,
            ((2 * ws[0] - 1) * (2 * ws[1] - 1), heads))
        index = S._relative_position_index(ws)
        bias = table[index.reshape(-1)].reshape(
            ws[0] * ws[1], ws[0] * ws[1], heads).transpose(2, 0, 1)

        from medsegpretrainimagenet_tpu.ops import window_attention_core
        if self.attn_drop and train:
            from medsegpretrainimagenet_tpu.ops.window_attention import \
                _logits
            probs = jax.nn.softmax(_logits(q, k, bias, mask, scale),
                                   axis=-1)
            probs = nn.Dropout(rate=self.attn_drop,
                               deterministic=False)(probs)
            out = jnp.einsum("bhnm,bhmd->bhnd", probs.astype(v.dtype), v,
                             preferred_element_type=jnp.float32
                             ).astype(v.dtype)
        else:
            out = window_attention_core(q, k, v, bias, mask, scale,
                                        train=train)
        # ONE inverse transpose back to tokens; proj is token-pointwise
        # so proj(reverse(y)) == reverse(proj(y)) exactly
        out = out.reshape(b, nwr, nwr, heads, w, w, head_dim)
        out = out.transpose(0, 1, 4, 2, 5, 3, 6).reshape(b, length, c)
        out = nn.Dense(c, name="proj", dtype=compute_dtype())(out)
        if self.proj_drop:
            out = nn.Dropout(rate=self.proj_drop,
                             deterministic=not train)(out)
        return out


class SwinTransformerBlockFused(S.SwinTransformerBlock):
    """Stock block minus window_partition/window_reverse (the fused
    attention consumes tokens directly); everything else byte-for-byte
    the stock behaviour."""

    def setup(self):
        level, resolution, window, shift = self._geometry()
        heads = list(self.num_heads_layers)[level]
        self.norm1 = B.make_layer_norm()
        self.attn = WindowAttentionFused(
            dim=self.in_channels, window_size=(window, window),
            num_heads=heads, qkv_bias=self.qkv_bias,
            qk_scale=self.qk_scale, attn_drop=self.attn_drop,
            proj_drop=self.drop)
        self.norm2 = B.make_layer_norm()
        self.mlp = S.Mlp(
            in_features=self.in_channels,
            hidden_features=int(self.in_channels * self.mlp_ratio),
            activations=self.activations, drop=self.drop)
        self._attn_mask = (
            jnp.asarray(S._shift_attn_mask((resolution, resolution),
                                           window, shift))
            if shift > 0 else None)

    def __call__(self, x, train: bool = False):
        _, resolution, window, shift = self._geometry()
        b, length, c = x.shape
        assert length == resolution * resolution

        shortcut = x
        x = self.norm1(x)
        if shift > 0:
            x = x.reshape(b, resolution, resolution, c)
            x = jnp.roll(x, (-shift, -shift), axis=(1, 2))
            x = x.reshape(b, length, c)
        x = self.attn(x, mask=self._attn_mask, train=train)
        if shift > 0:
            x = x.reshape(b, resolution, resolution, c)
            x = jnp.roll(x, (shift, shift), axis=(1, 2))
            x = x.reshape(b, length, c)

        x = shortcut + B.drop_path(self, x, self.stochastic_depth_rate,
                                   train)
        return x + B.drop_path(self, self.mlp(self.norm2(x), train=train),
                               self.stochastic_depth_rate, train)


# flax auto-names anonymous submodules by CLASS name — pin it so the
# variant's param tree is key-identical to the stock model's
SwinTransformerBlockFused.__name__ = "SwinTransformerBlock"


def _override_registry():
    from medsegpretrainimagenet_tpu.config import registry
    registry.resolve("segmentation.models.UNet")  # force _populate()
    for name in ("segmentation.models.blocks.SwinTransformerBlock",
                 "swin_transformer_block"):
        registry._COMPONENTS[name] = SwinTransformerBlockFused


def _restore_registry():
    from medsegpretrainimagenet_tpu.config import registry
    for name in ("segmentation.models.blocks.SwinTransformerBlock",
                 "swin_transformer_block"):
        registry._COMPONENTS[name] = S.SwinTransformerBlock


def _build(size, variant: bool):
    import bench
    if variant:
        _override_registry()
    try:
        return bench._swin_module(size)
    finally:
        _restore_registry()


def _small_module(size):
    """bench._swin_module's shape at CPU-parity scale: levels R=28
    (masked SW-MSA), 14, bottleneck 7."""
    from medsegpretrainimagenet_tpu.config import ConfigDict
    from medsegpretrainimagenet_tpu.models import UNet
    return UNet(
        img_ch=3, output_ch=1, depth=2, width=2,
        channels=[32, 64, 128], change_channels_in_block=False,
        trainable_downsampling=True, stochastic_depth_rate=0.2,
        final_activation="sigmoid",
        basic_block=ConfigDict(
            {"segmentation.models.blocks.SwinTransformerBlock": {
                "img_size": size, "patch_size": 4, "embed_dim": 32,
                "num_heads_layers": (2, 2, 2, 2), "window_size": 7}}),
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


def parity() -> None:
    """CPU f32 check: identical param trees, near-identical outputs
    (stock vs fused layout), shifted windows and masks included."""
    jax.config.update("jax_platforms", "cpu")
    size = 112  # levels at R=28 (SW-MSA shift=3, masked), 14, 7
    _restore_registry()
    stock = _small_module(size)
    _override_registry()
    try:
        fused = _small_module(size)
    finally:
        _restore_registry()
    x = jnp.asarray(np.random.default_rng(0).normal(
        0, 1, (2, size, size, 3)), jnp.float32)
    vs = stock.init(jax.random.key(0), x, train=False)
    vf = fused.init(jax.random.key(0), x, train=False)
    ts, tf = (jax.tree_util.tree_structure(v) for v in (vs, vf))
    assert ts == tf, f"param tree mismatch:\n{ts}\nvs\n{tf}"
    ys = stock.apply(vs, x, train=False)
    yf = fused.apply(vs, x, train=False)  # STOCK params through fused
    delta = float(jnp.max(jnp.abs(ys - yf)))
    # train-mode path too (XLA core + dropout rngs off, stoch depth on)
    ys_t = stock.apply(vs, x, train=True,
                       rngs={"dropout": jax.random.key(7)},
                       mutable=["batch_stats"])[0]
    yf_t = fused.apply(vs, x, train=True,
                       rngs={"dropout": jax.random.key(7)},
                       mutable=["batch_stats"])[0]
    delta_t = float(jnp.max(jnp.abs(ys_t - yf_t)))
    print(json.dumps({"parity": {"eval_max_delta": delta,
                                 "train_max_delta": delta_t,
                                 "tol": 1e-5,
                                 "ok": delta < 1e-5 and delta_t < 1e-5}}))
    assert delta < 1e-5 and delta_t < 1e-5


def _sync(v):
    float(np.asarray(v).reshape(-1)[0])


def _time(fn, n):
    out = fn()
    _sync(out)
    t0 = time.time()
    for _ in range(n):
        out = fn()
    _sync(out)
    return (time.time() - t0) / n


def ab(steps: int = 20, reps: int = 2) -> None:
    """Real-TPU ABBA of the bench swin224 eval forward + train step."""
    import functools

    import optax

    from medsegpretrainimagenet_tpu.models.blocks import set_compute_dtype

    set_compute_dtype(jnp.bfloat16)
    size, batch = 224, 24
    stock = _build(size, variant=False)
    fused = _build(size, variant=True)
    x = jnp.zeros((batch, size, size, 3), jnp.bfloat16)
    y = jnp.zeros((batch, size, size), jnp.float32)
    params = stock.init(jax.random.key(0), x, train=False)["params"]
    assert (jax.tree_util.tree_structure(
        fused.init(jax.random.key(0), x, train=False)["params"])
        == jax.tree_util.tree_structure(params))

    def make_eval(module):
        @jax.jit
        def fwd(p, x):
            return module.apply({"params": p}, x, train=False)
        return lambda: fwd(params, x)

    def make_train(module):
        tx = optax.sgd(1e-3, momentum=0.9)
        opt_state = tx.init(params)
        rng = jax.random.key(1)

        def loss_fn(p, x, y, rng):
            pred = module.apply({"params": p}, x, train=True,
                                rngs={"dropout": rng})
            pred = pred[..., 0].astype(jnp.float32)
            eps = 1e-5
            inter = jnp.sum(pred * y)
            return 1 - (2 * inter + eps) / (jnp.sum(y)
                                            + jnp.sum(pred ** 2) + eps)

        @functools.partial(jax.jit, donate_argnums=())
        def step(p, o, x, y):
            loss, grads = jax.value_and_grad(loss_fn)(p, x, y, rng)
            updates, o = tx.update(grads, o, p)
            return optax.apply_updates(p, updates), o, loss

        def run():
            nonlocal params_t, opt_t
            params_t, opt_t, loss = step(params_t, opt_t, x, y)
            return loss

        params_t, opt_t = params, opt_state
        return run

    # on-device parity of the eval forward first (bf16 + Pallas path)
    ys = stock.apply({"params": params}, x + 0.5, train=False)
    yf = fused.apply({"params": params}, x + 0.5, train=False)
    pd = float(jnp.max(jnp.abs(ys.astype(jnp.float32)
                               - yf.astype(jnp.float32))))
    print(json.dumps({"device_parity_eval_max_delta": pd}), flush=True)

    results = {"eval": {"stock": [], "fused": []},
               "train": {"stock": [], "fused": []}}
    for rep in range(reps):
        order = [("stock", stock), ("fused", fused)]
        if rep % 2:
            order.reverse()
        for name, module in order:
            results["eval"][name].append(
                batch / _time(make_eval(module), steps))
        for name, module in order:
            results["train"][name].append(
                batch / _time(make_train(module), steps))
        print(json.dumps({f"rep{rep}": {
            k: {n: round(v[-1], 1) for n, v in d.items() if v}
            for k, d in results.items()}}), flush=True)

    verdict = {}
    for mode, d in results.items():
        gains = [f / s - 1 for s, f in zip(d["stock"], d["fused"])]
        verdict[mode] = {
            "stock_img_s": [round(v, 1) for v in d["stock"]],
            "fused_img_s": [round(v, 1) for v in d["fused"]],
            "gains": [round(g, 4) for g in gains],
            "adopt": bool(gains) and all(g > 0.02 for g in gains),
        }
    print(json.dumps({"verdict": verdict,
                      "device_parity_eval_max_delta": pd}))


def hlo_compare() -> None:
    """Compile both eval forwards for the real backend and diff the
    optimized-HLO op-kind histograms — the mechanism test for a
    measured-noise A/B verdict (XLA transpose folding canonicalizing
    both programs to the same fusions)."""
    import collections
    import re

    from medsegpretrainimagenet_tpu.models.blocks import set_compute_dtype

    set_compute_dtype(jnp.bfloat16)
    size, batch = 224, 24
    stock = _build(size, variant=False)
    fused = _build(size, variant=True)
    x = jnp.zeros((batch, size, size, 3), jnp.bfloat16)
    params = stock.init(jax.random.key(0), x, train=False)["params"]

    def histogram(module):
        def fwd(p, x):
            return module.apply({"params": p}, x, train=False)
        txt = jax.jit(fwd).lower(params, x).compile().as_text()
        ops = collections.Counter()
        for m in re.finditer(r"^\s*(?:ROOT )?[%\w.-]+ = [\w\[\]{},/ ]* "
                             r"(\w[\w-]*)\(", txt, re.M):
            ops[m.group(1)] += 1
        for m in re.finditer(r'kind=(\w+)', txt):
            ops[f"fusion:{m.group(1)}"] += 1
        keep = ("fusion", "copy", "transpose", "bitcast", "reshape",
                "custom-call", "convolution")
        return {k: v for k, v in sorted(ops.items())
                if any(k.startswith(p) for p in keep)}

    hs = histogram(stock)
    hf = histogram(fused)
    diff = {k: (hs.get(k, 0), hf.get(k, 0))
            for k in sorted(set(hs) | set(hf))
            if hs.get(k, 0) != hf.get(k, 0)}
    print(json.dumps({"stock": hs, "fused": hf, "diff_stock_vs_fused":
                      diff, "identical_histograms": not diff}, indent=1))


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "parity"
    if mode == "parity":
        parity()
    elif mode == "hlo":
        hlo_compare()
    else:
        ab()
