"""A/B: fused image-layout window attention (Mosaic windowed gathers).

The LAST named Swin perf lever (VERDICT r4 #2): MFU_CLOSURE.json puts
"data formatting" (layout copies) at 39 % of swin224 EVAL device time /
25 % of TRAIN, and tools/swin_layout_ab.py proved source-level
reorganisation is a no-op (XLA canonicalises both forms to identical
fusions).  The only deeper route is windowing inside a Mosaic kernel:
``ops/window_attention.py:fused_image_window_attention`` reads
(1, w, R, 3C) row-of-windows tiles straight from the image layout via
BlockSpec index maps and does partition -> head split -> attention ->
head merge -> reverse entirely in VMEM — removing ~6C of HBM layout
round-trips per block at the priced risk that C=96 / 3C=288 lane
misalignment makes Mosaic's in-VMEM relayouts cost more than the copies
saved.

Usage:
    python tools/swin_mosaic_ab.py parity    # CPU f32 interpret parity
    python tools/swin_mosaic_ab.py bytes     # XLA cost-analysis bytes diff
    python tools/swin_mosaic_ab.py ab        # real-TPU ABBA (eval fwd)

VERDICT (measured 2026-08-21, v5e, code_rev c64e3eb, 3 window-invariant
ABBA reps of 8-forward fori_loop dispatches): **FALSIFIED for
adoption** — do not enable.  On-device parity is exact (bf16 max delta
0.0) and the MECHANISM works precisely as designed: XLA cost analysis
shows the eval forward's bytes accessed dropping 19.03 -> 13.95 GB
(-26.7 %) with equal flops, i.e. the kernel really does eliminate the
layout-copy HBM round-trips.  But wall clock is DEAD EVEN: stock
964.3-966.1 img/s vs fused 963.8-965.2 (gains +0.03 % / -0.05 % /
-0.16 % — noise).  The priced misaligned-relayout cost (w=7 sublane
concats, h*32 lane slices, strided row stores vs the 8x128 native
grid) consumes in VPU time exactly what the removed copies saved in
HBM time at this arithmetic intensity.  Conclusion: the 25-39 %
"data formatting" share is copies running at full HBM rate that
overlap/neighbor the rest of the pipeline — removing their BYTES does
not shorten the CRITICAL PATH on this geometry; a win would need
lane-aligned channels (C a 128-multiple), i.e. a different model
geometry, not a better kernel.  The dispatch default stays "off"
(equal speed, simpler battle-tested XLA path); the kernel + probes
remain as the documented kill of the LAST named Swin lever.  Bonus
finding: the window-invariant device-loop timing puts the TRUE eval
forward at ~965 img/s — the old swin224_eval row (651-922, window-
dependent) was per-dispatch-RTT-bound, which the new
``swin224_eval_device`` bench metric now captures.
"""
from __future__ import annotations

import json
import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from medsegpretrainimagenet_tpu.ops import set_fused_image_mode  # noqa: E402


def _swin224():
    import bench
    from medsegpretrainimagenet_tpu.models.blocks import set_compute_dtype
    set_compute_dtype(jnp.bfloat16)
    return bench._swin_module(224)


def parity() -> None:
    """CPU f32: fused-image mode through the real Swin U-Net equals the
    stock path (interpret-mode Pallas), shifted/masked levels included."""
    from jax.experimental.pallas import tpu as pltpu

    from swin_layout_ab import _small_module
    jax.config.update("jax_platforms", "cpu")
    size = 112           # levels at R=28 (masked SW-MSA), 14, 7
    module = _small_module(size)
    x = jnp.asarray(np.random.default_rng(0).normal(
        0, 1, (2, size, size, 3)), jnp.float32)
    v = module.init(jax.random.key(0), x, train=False)
    ref = module.apply(v, x, train=False)
    try:
        set_fused_image_mode("on")
        with pltpu.force_tpu_interpret_mode():
            out = module.apply(v, x, train=False)
    finally:
        set_fused_image_mode("off")
    delta = float(jnp.max(jnp.abs(ref - out)))
    print(json.dumps({"parity": {"eval_max_delta": delta, "tol": 1e-5,
                                 "ok": delta < 1e-5}}))
    assert delta < 1e-5


def _eval_fn(module, params, x):
    @jax.jit
    def fwd(p, x):
        return module.apply({"params": p}, x, train=False)
    return fwd


def bytes_diff() -> None:
    """XLA cost-analysis bytes accessed for the eval forward, off vs on
    (the mechanism evidence: the fused path must REMOVE layout-copy
    bytes, else the kernel isn't doing what it claims)."""
    module = _swin224()
    x = jnp.zeros((24, 224, 224, 3), jnp.bfloat16)
    params = module.init(jax.random.key(0), x, train=False)["params"]
    out = {}
    for mode in ("off", "on"):
        set_fused_image_mode(mode)
        try:
            compiled = _eval_fn(module, params, x).lower(params, x).compile()
            cost = compiled.cost_analysis()
            if isinstance(cost, (list, tuple)):
                cost = cost[0]
            out[mode] = {"bytes_accessed_gb":
                         round(float(cost.get("bytes accessed", 0)) / 1e9, 3),
                         "flops_g": round(float(cost.get("flops", 0)) / 1e9,
                                          2)}
        finally:
            set_fused_image_mode("off")
    out["bytes_delta_pct"] = round(
        100 * (out["on"]["bytes_accessed_gb"]
               / max(out["off"]["bytes_accessed_gb"], 1e-9) - 1), 1)
    print(json.dumps(out, indent=1))


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


def ab(steps: int = 4, reps: int = 3, inner: int = 8) -> None:
    """Real-TPU ABBA of the bench swin224 eval forward, fused-image off
    vs on (the no-grad bf16 forward is where the 39 % formatting share
    lives; train already dispatches to XLA by measurement).

    Timing is WINDOW-INVARIANT: each variant runs ``inner`` forwards
    inside one jitted fori_loop dispatch with a single scalar sync
    (same device-loop harness as bench ``swin224_eval_device``), so a
    degraded tunnel's per-dispatch RTTs cannot compress the off/on
    difference into fake noise."""
    batch = 24
    module = _swin224()
    x = jnp.zeros((batch, 224, 224, 3), jnp.bfloat16)
    params = module.init(jax.random.key(0), x, train=False)["params"]

    # on-device parity first (bf16 Pallas vs stock path)
    xp = x + 0.5
    ref = module.apply({"params": params}, xp, train=False)
    set_fused_image_mode("on")
    try:
        out = module.apply({"params": params}, xp, train=False)
    finally:
        set_fused_image_mode("off")
    pd = float(jnp.max(jnp.abs(ref.astype(jnp.float32)
                               - out.astype(jnp.float32))))
    print(json.dumps({"device_parity_eval_max_delta": pd}), flush=True)

    def eval_n(params, x):
        def body(_, carry):
            acc, xc = carry
            out = module.apply({"params": params}, xc, train=False)
            m = out.astype(jnp.float32).mean()
            xc = xc + (m * jnp.float32(1e-24)).astype(xc.dtype)
            return acc + m, xc
        acc, _ = jax.lax.fori_loop(0, inner, body, (jnp.float32(0.0), x))
        return acc

    fns = {}
    for mode in ("off", "on"):
        set_fused_image_mode(mode)
        try:
            compiled = jax.jit(eval_n).lower(params, x).compile()
            fns[mode] = lambda c=compiled: c(params, x)
            _sync(fns[mode]())          # warm
        finally:
            set_fused_image_mode("off")

    results = {"off": [], "on": []}
    for rep in range(reps):
        order = ["off", "on"] if rep % 2 == 0 else ["on", "off"]
        for mode in order:
            results[mode].append(inner * batch / _time(fns[mode], steps))
        print(json.dumps({f"rep{rep}": {m: round(v[-1], 1)
                                        for m, v in results.items()
                                        if v}}), flush=True)
    gains = [o / s - 1 for s, o in zip(results["off"], results["on"])]
    print(json.dumps({"verdict": {
        "stock_img_s": [round(v, 1) for v in results["off"]],
        "fused_img_s": [round(v, 1) for v in results["on"]],
        "gains": [round(g, 4) for g in gains],
        "inner_forwards_per_dispatch": inner,
        "adopt": bool(gains) and all(g > 0.02 for g in gains),
        "device_parity_eval_max_delta": pd}}))


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "parity"
    if mode == "parity":
        parity()
    elif mode == "bytes":
        bytes_diff()
    else:
        ab()
