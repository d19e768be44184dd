"""Manual TPU micro-bench: Pallas vs XLA window attention at Swin shapes.

Not collected by pytest (no test_ prefix).  Run directly on a TPU host:

    python tests/perf_window_attention.py

Times the forward at the reference Swin U-Net level-0/1 shapes (224 px,
window 7) for f32 and bf16, masked (SW-MSA) and unmasked (W-MSA), and
prints per-impl microseconds.  The dispatch rule in
``ops/window_attention.py::window_attention_core`` is set from these
numbers.
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp

from medsegpretrainimagenet_tpu.ops.window_attention import (
    window_attention_core)


def timeit(fn, *args, iters=30):
    out = fn(*args)
    float(jnp.sum(out))  # drain (block_until_ready unreliable over tunnel)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(jnp.sum(out))
    return (time.perf_counter() - t0) / iters * 1e6


def main():
    key = jax.random.key(0)
    print(f"backend={jax.default_backend()}")
    for dtype in (jnp.float32, jnp.bfloat16):
        # level 0: 24 imgs x 64 windows, 3 heads, N=49, D=32
        # level 1: 24 imgs x 16 windows, 6 heads, N=49, D=32
        for (b_, h, n, d, n_w) in ((24 * 64, 3, 49, 32, 64),
                                   (24 * 16, 6, 49, 32, 16)):
            ks = jax.random.split(key, 5)
            q = jax.random.normal(ks[0], (b_, h, n, d), dtype)
            k = jax.random.normal(ks[1], (b_, h, n, d), dtype)
            v = jax.random.normal(ks[2], (b_, h, n, d), dtype)
            bias = jax.random.normal(ks[3], (h, n, n), jnp.float32)
            mask = jax.random.normal(ks[4], (n_w, n, n), jnp.float32)
            scale = d ** -0.5
            for mask_arg, tag in ((None, "unmasked"), (mask, "masked")):
                row = {}
                for impl in ("xla", "pallas"):
                    fn = jax.jit(lambda q, k, v, b, m: window_attention_core(
                        q, k, v, b, m, scale, force=impl))
                    row[impl] = timeit(fn, q, k, v, bias, mask_arg)
                win = "PALLAS" if row["pallas"] < row["xla"] else "xla"
                print(f"{dtype.__name__:8s} B_={b_:5d} H={h} {tag:8s} "
                      f"xla={row['xla']:8.1f}us pallas={row['pallas']:8.1f}us"
                      f"  -> {win}")


if __name__ == "__main__":
    main()
