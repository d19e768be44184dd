"""Real-TPU numerics check of the Pallas window-attention kernel.

The suite pins Pallas-vs-XLA parity in *interpret mode on CPU*
(``tests/test_swin.py::test_window_attention_core_pallas_interpret_parity``)
— which validates the kernel's math but not its Mosaic compilation to
actual TPU hardware (tiling, MXU dtype handling, mask select lanes).
This tool closes that gap: it runs ``ops/window_attention.py``'s
``window_attention_core`` with ``force='pallas'`` and ``force='xla'`` on
the real chip at the reference Swin U-Net shapes (both encoder levels,
W-MSA and masked SW-MSA, bf16 — the dtype the dispatch actually routes
to Pallas) and writes ``PALLAS_TPU.json`` with:

* ``pallas_vs_xla_bf16``: max |Δ| between the two implementations on
  identical bf16 inputs — implementation parity on hardware
* ``*_vs_f32``: each bf16 implementation against the f32 XLA reference —
  shows the Pallas kernel loses no accuracy beyond bf16 itself
  (its accumulation is f32 on the MXU)

Reference attention being matched: ``/root/reference/src/segmentation/
models/blocks.py:227-312`` (WindowAttention with relative position bias
and the shifted-window mask).

Usage (repo root, TPU tunnel healthy)::

    python tools/pallas_tpu_check.py
"""
from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

#: (label, windows*batch, heads, tokens, head_dim) — the two Swin U-Net
#: encoder levels at the 224² COVID-QU resolution (window 7 ⇒ N=49)
SHAPES = [("level0", 1536, 3, 49, 32), ("level1", 384, 6, 49, 32)]


def _max_abs(a, b):
    import numpy as np
    return float(np.max(np.abs(np.asarray(a, np.float32)
                               - np.asarray(b, np.float32))))


def main() -> int:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from medsegpretrainimagenet_tpu.ops import window_attention_core

    dev = jax.devices()[0]
    print(f"device: {dev.device_kind}", flush=True)
    rng = np.random.default_rng(0)
    results = {"generated": time.strftime("%Y-%m-%dT%H:%M:%SZ",
                                          time.gmtime()),
               "device_kind": str(dev.device_kind), "cases": {}}
    worst = 0.0
    for label, bw, h, n, d in SHAPES:
        scale = d ** -0.5
        q32, k32, v32 = (jnp.asarray(rng.normal(0, 1, (bw, h, n, d)),
                                     jnp.float32) for _ in range(3))
        bias = jnp.asarray(rng.normal(0, 0.5, (h, n, n)), jnp.float32)
        n_w = 16  # windows per image at level 0 stride; any divisor of bw
        mask_np = np.zeros((n_w, n, n), np.float32)
        mask_np[n_w // 2:, : n // 2, n // 2:] = -100.0  # SW-MSA pattern
        mask_np[n_w // 2:, n // 2:, : n // 2] = -100.0
        mask = jnp.asarray(mask_np)
        for masked in (False, True):
            m = mask if masked else None
            ref32 = window_attention_core(q32, k32, v32, bias, m, scale,
                                          force="xla")
            qb, kb, vb = (x.astype(jnp.bfloat16) for x in (q32, k32, v32))
            bb = bias.astype(jnp.bfloat16)
            mb = m.astype(jnp.bfloat16) if m is not None else None
            pall = window_attention_core(qb, kb, vb, bb, mb, scale,
                                         force="pallas")
            xla = window_attention_core(qb, kb, vb, bb, mb, scale,
                                        force="xla")
            case = {
                "pallas_vs_xla_bf16": _max_abs(pall, xla),
                "pallas_bf16_vs_f32": _max_abs(pall, ref32),
                "xla_bf16_vs_f32": _max_abs(xla, ref32),
            }
            worst = max(worst, case["pallas_vs_xla_bf16"])
            key = f"{label}_{'sw_msa_masked' if masked else 'w_msa'}"
            results["cases"][key] = case
            print(key, json.dumps(case), flush=True)
    # bf16 has ~8 mantissa bits; outputs are convex combinations of v
    # (|v|~1), so anything << 1e-1 means the two implementations round
    # identically up to bf16 resolution
    results["pass"] = worst < 0.05
    results["criterion"] = "max |pallas - xla| on identical bf16 inputs < 0.05"
    out = os.path.join(REPO, "PALLAS_TPU.json")
    with open(out, "w") as fh:
        json.dump(results, fh, indent=1)
    print(f"wrote {out}; worst pallas-vs-xla bf16 delta = {worst:.5f}",
          flush=True)
    return 0 if results["pass"] else 1


if __name__ == "__main__":
    sys.exit(main())
