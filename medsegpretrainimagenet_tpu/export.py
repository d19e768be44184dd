"""StableHLO model export for serving — beyond-parity deployment path.

The reference has no deployment story at all (predictions only exist
inside its training loop, ``train_model.py:16-130``).  The
:mod:`..predict` CLI serves checkpoints from Python; this module goes one
step further and produces a *self-contained compiled artifact*:

    python -m medsegpretrainimagenet_tpu.export config.yaml \
        --checkpoint run_1/best_model_state_dict.msgpack \
        --output model.shlo [--size 256] [--channels 3] \
        [--batch 0] [--mixed-precision]

The artifact is a serialized ``jax.export.Exported``: the eval-mode
forward traced to StableHLO with the checkpoint weights baked in as
constants.  Loading it needs *no model code, no config, no checkpoint* —
only jax — and it runs on any backend jax supports (the TPU serving
path included), with full shape polymorphism over the batch axis by
default (``--batch 0`` → symbolic ``b``; a positive value pins a static
batch for backends that want fully static programs).

TPU-native rationale: StableHLO is exactly what the XLA TPU compiler
consumes, so the exported artifact preserves every fusion decision the
training stack profits from; bf16 export (``--mixed-precision``) keeps
the serving HBM footprint at half the f32 one.
"""
from __future__ import annotations

import json
import os
import time
from typing import Any, Dict, Optional, Tuple

from .config import ConfigDict, registry

__all__ = ["export_forward", "save_exported", "load_exported",
           "export_from_config", "main"]


def export_forward(model, variables, input_shape: Tuple[int, ...],
                   dtype=None, batch: Optional[int] = None):
    """Trace ``model.apply(variables, x, train=False)`` to a
    ``jax.export.Exported`` with the weights captured as constants.

    ``input_shape`` is the per-sample NHWC shape ``(H, W, C)``;
    ``batch=None`` exports a symbolic batch dimension ``b`` (any batch
    size at call time), a positive int pins it statically.
    """
    import jax
    from jax import export as jexport
    import jax.numpy as jnp

    dtype = dtype or jnp.float32

    def fwd(x):
        return model.apply(variables, x, train=False)

    if batch:
        b: Any = int(batch)
    else:
        (b,) = jexport.symbolic_shape("b")
    arg = jax.ShapeDtypeStruct((b, *input_shape), dtype)
    return jexport.export(jax.jit(fwd))(arg)


def save_exported(exported, path: str) -> int:
    """Serialize to *path*; returns the byte size."""
    blob = exported.serialize()
    tmp = path + ".tmp"
    with open(tmp, "wb") as fh:
        fh.write(blob)
    os.replace(tmp, path)  # atomic: a reader never sees a partial file
    return len(blob)


def load_exported(path: str):
    """Deserialize an artifact; ``.call(x)`` runs it on the local
    backend (no model code or checkpoint required)."""
    from jax import export as jexport

    with open(path, "rb") as fh:
        return jexport.deserialize(fh.read())


def export_from_config(config: Any, checkpoint: str, output_path: str,
                       image_size: int = 256, channels: int = 3,
                       batch: Optional[int] = None,
                       mixed_precision: bool = False) -> Dict[str, Any]:
    """Build the model from a reference-style config, load the msgpack
    checkpoint, export, and write the artifact.  Returns a stats dict."""
    import jax
    import jax.numpy as jnp

    from .models import Model
    from .models.blocks import compute_dtype, set_compute_dtype
    from .train import checkpoint as ckpt

    if not isinstance(config, ConfigDict):
        config = ConfigDict.from_yaml(config)
    config.expand()
    registry.fill_spec(config, "model")

    prev_dtype = compute_dtype()
    set_compute_dtype(jnp.bfloat16 if mixed_precision else None)
    try:
        model = registry.build(config, key="model", wrapper=Model)
        x0 = jnp.zeros((1, image_size, image_size, channels), jnp.float32)
        variables = dict(model.init(jax.random.key(0), x0, train=False))
        loaded = ckpt.load_params_file(checkpoint)
        for coll in ("params", "batch_stats"):
            if coll in loaded:
                variables[coll] = loaded[coll]

        t0 = time.perf_counter()
        exported = export_forward(
            model, variables, (image_size, image_size, channels),
            batch=batch)
        nbytes = save_exported(exported, output_path)
        return {
            "output": output_path,
            "bytes": nbytes,
            "batch": int(batch) if batch else "symbolic",
            "in_shape": [image_size, image_size, channels],
            "out_avals": [str(a) for a in exported.out_avals],
            "platforms": list(exported.platforms),
            "export_seconds": round(time.perf_counter() - t0, 2),
        }
    finally:
        set_compute_dtype(prev_dtype)


def main(argv=None) -> int:
    import argparse

    parser = argparse.ArgumentParser(
        prog="python -m medsegpretrainimagenet_tpu.export",
        description="Export a trained model to a self-contained "
                    "StableHLO serving artifact.")
    parser.add_argument("config", help="experiment config yaml (the "
                        "'model' section drives construction)")
    parser.add_argument("--checkpoint", required=True,
                        help="msgpack state dict "
                             "(last/best_model_state_dict.msgpack)")
    parser.add_argument("--output", required=True,
                        help="artifact path (e.g. model.shlo)")
    parser.add_argument("--size", type=int, default=256,
                        help="square input resolution (default 256)")
    parser.add_argument("--channels", type=int, default=3,
                        help="input channels (default 3)")
    parser.add_argument("--batch", type=int, default=0,
                        help="0 = symbolic batch dim (default); a "
                             "positive value pins a static batch")
    parser.add_argument("--mixed-precision", action="store_true",
                        help="export the bf16 compute path")
    args = parser.parse_args(argv)

    stats = export_from_config(
        args.config, args.checkpoint, args.output,
        image_size=args.size, channels=args.channels,
        batch=args.batch or None, mixed_precision=args.mixed_precision)
    print(json.dumps(stats))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
