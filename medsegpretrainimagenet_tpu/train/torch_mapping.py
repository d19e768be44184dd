"""Translate reference PyTorch encoder checkpoints to flax param trees.

The reference's released pretraining checkpoints are FeedForwardModel state
dicts whose first layer is the encoder; downstream transfer strips the
``layers.0.`` prefix and loads with ``.model.`` wrapper-key tolerance
(``unet_models.py:555-588``, ``model/model.py:200-225``).  Their torch key
families (observed from the reference model definitions):

* ``first_block.{weight,bias}``                       — stem conv
* ``down_layers.{i}.conv{j}.block.{m}.*``             — level ConvBlocks
  (m%3==0 conv, m%3==1 BN; activations hold no params)
* ``bottom_block.conv{j}.block.{m}.*``                — bottom ConvBlocks
* ``down_layers.{i}.shortcut{j}.*``                   — residual shortcuts
* ``down_layers.{i}.downsampl.*``                     — trainable
  downsampling (PatchMerging etc.)

This module maps those onto this framework's flax names
(``stem_block/Conv_0``, ``level_convs_{i}_{j}/Conv_k|BatchNorm_k``,
``bottom_convs_{j}/...``) with conv kernels already transposed OIHW->HWIO
by the loader.  Unknown keys are returned for the caller's non-strict
warning path.
"""
from __future__ import annotations

import re
from typing import Any, Dict, List, Tuple

import numpy as np

__all__ = ["translate_reference_encoder", "looks_like_torch_encoder"]

_BLOCK_RE = re.compile(
    r"^(?:down_layers\.(?P<level>\d+)|(?P<bottom>bottom_block))"
    r"\.conv(?P<j>\d+)\.block\.(?P<m>\d+)\.(?P<leaf>.+)$")
_STEM_RE = re.compile(r"^first_block\.(?P<leaf>weight|bias)$")


def _put(tree: Dict[str, Any], path: Tuple[str, ...], value) -> None:
    node = tree
    for part in path[:-1]:
        node = node.setdefault(part, {})
    node[path[-1]] = np.asarray(value)


def looks_like_torch_encoder(tree: Dict[str, Any]) -> bool:
    """Heuristic: reference torch module names at the top level."""
    keys = set(tree)
    return bool(keys & {"first_block", "down_layers", "bottom_block"})


def _flatten(tree: Dict[str, Any], prefix: str = "") -> Dict[str, Any]:
    flat = {}
    for key, value in tree.items():
        path = f"{prefix}.{key}" if prefix else str(key)
        if isinstance(value, dict):
            flat.update(_flatten(value, path))
        else:
            flat[path] = value
    return flat


def translate_reference_encoder(tree: Dict[str, Any]):
    """torch-named tree -> ({'params': ..., 'batch_stats': ...}, leftover).

    ``leftover`` lists torch keys with no mapping (shortcuts of exotic
    types, downsampling blocks of families not yet mapped) so the caller
    can surface them as non-strict warnings.
    """
    flat = _flatten(tree)
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    leftover: List[str] = []

    for key, value in flat.items():
        key = key.replace(".model.", ".")
        if key.startswith("model."):
            key = key[len("model."):]
        if key.endswith("num_batches_tracked"):
            continue

        stem = _STEM_RE.match(key)
        if stem:
            leaf = "kernel" if stem["leaf"] == "weight" else "bias"
            _put(params, ("stem_block", "Conv_0", leaf), value)
            continue

        block = _BLOCK_RE.match(key)
        if block:
            if block["bottom"]:
                module = f"bottom_convs_{block['j']}"
            else:
                module = f"level_convs_{block['level']}_{block['j']}"
            m = int(block["m"])
            leaf = block["leaf"]
            if m % 3 == 0:      # conv
                name = "kernel" if leaf == "weight" else "bias"
                _put(params, (module, f"Conv_{m // 3}", name), value)
            elif m % 3 == 1:    # batch norm
                bn = f"BatchNorm_{m // 3}"
                if leaf == "weight":
                    _put(params, (module, bn, "scale"), value)
                elif leaf == "bias":
                    _put(params, (module, bn, "bias"), value)
                elif leaf == "running_mean":
                    _put(stats, (module, bn, "mean"), value)
                elif leaf == "running_var":
                    _put(stats, (module, bn, "var"), value)
                else:
                    leftover.append(key)
            else:
                leftover.append(key)
            continue

        leftover.append(key)

    return {"params": params, "batch_stats": stats}, leftover
