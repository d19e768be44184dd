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
* ``down_layers.{i}.downsampl.*``                     — trainable
  downsampling (PatchMerging etc.)

Residual-shortcut / layer-scale key families
(``down_layers.{i}.shortcut{j}.*``, ``layer_scale{j}.*``) are NOT mapped:
none of the reference's released pretraining checkpoints use residual
connections or layer scale, so such keys surface through the caller's
leftover/strict reporting rather than silently translating wrong.

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
_SWIN_RE = re.compile(
    r"^(?:down_layers\.(?P<level>\d+)|(?P<bottom>bottom_block))"
    r"\.conv(?P<j>\d+)\.(?P<rest>(?:norm1|norm2|attn|mlp|attn_mask).*)$")
_DOWNSAMPL_RE = re.compile(
    r"^down_layers\.(?P<level>\d+)\.downsampl\.(?P<rest>.+)$")
_STEM_RE = re.compile(r"^first_block\.(?P<leaf>weight|bias)$")
_SWIN_STEM_RE = re.compile(
    r"^first_block\.(?P<child>proj|norm_layer)\.(?P<leaf>weight|bias)$")
# DeepResNet (reference ``classification/models.py``): stem Sequential
# (v1: conv+BN+ReLU -> 'stem.0'/'stem.1'; v2: bare conv -> 'stem'),
# 'levels.{i}.{j}.conv{k}|bn{k}.*'
_RESNET_STEM_RE = re.compile(
    r"^stem(?:\.(?P<idx>\d+))?\.(?P<leaf>weight|bias|running_mean"
    r"|running_var)$")
_RESNET_BLOCK_RE = re.compile(
    r"^levels\.(?P<level>\d+)\.(?P<j>\d+)"
    r"\.(?P<kind>conv|bn)(?P<k>\d+)\.(?P<leaf>.+)$")

#: torch LayerNorm/BN 'weight' -> flax 'scale'
_NORM_LEAF = {"weight": "scale", "bias": "bias"}


def _swin_block_leaf(rest: str):
    """Map a Swin block's torch sub-key to the flax sub-path, or None for
    buffers (attn_mask, relative_position_index) that must be dropped."""
    parts = rest.split(".")
    if parts[0] in ("attn_mask",):
        return None
    if parts[0] in ("norm1", "norm2"):
        return (parts[0], _NORM_LEAF[parts[1]]), False
    if parts[0] == "attn":
        if parts[1] == "relative_position_index":
            return None
        if parts[1] == "relative_position_bias_table":
            # rank-2 parameter, NOT a linear weight: undo the loader's
            # (out, in) -> (in, out) transpose
            return ("attn", "relative_position_bias_table"), True
        leaf = "kernel" if parts[2] == "weight" else "bias"
        return ("attn", parts[1], leaf), False
    if parts[0] == "mlp":
        dense = {"fc1": "Dense_0", "fc2": "Dense_1"}[parts[1]]
        leaf = "kernel" if parts[2] == "weight" else "bias"
        return ("mlp", dense, leaf), False
    return ("__unknown__",), False


def _put(tree: Dict[str, Any], path: Tuple[str, ...], value) -> None:
    node = tree
    for part in path[:-1]:
        node = node.setdefault(part, {})
    node[path[-1]] = np.asarray(value)


def looks_like_torch_encoder(tree: Dict[str, Any]) -> bool:
    """Heuristic: reference torch module names at the top level."""
    keys = set(tree)
    return bool(keys & {"first_block", "down_layers", "bottom_block",
                        "stem", "levels"})


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

        swin_stem = _SWIN_STEM_RE.match(key)
        if swin_stem:  # PatchEmbed stem: conv proj + LayerNorm
            if swin_stem["child"] == "proj":
                leaf = "kernel" if swin_stem["leaf"] == "weight" else "bias"
                _put(params, ("stem_block", "Conv_0", leaf), value)
            else:
                _put(params, ("stem_block", "LayerNorm_0",
                              _NORM_LEAF[swin_stem["leaf"]]), value)
            continue

        downsampl = _DOWNSAMPL_RE.match(key)
        if downsampl:  # PatchMerging: Linear reduction + LayerNorm
            module = f"downsamples_{downsampl['level']}"
            rest = downsampl["rest"].split(".")
            if rest[0] == "reduction":
                _put(params, (module, "Dense_0", "kernel"), value)
            elif rest[0] == "norm":
                _put(params, (module, "LayerNorm_0", _NORM_LEAF[rest[1]]),
                     value)
            else:
                leftover.append(key)
            continue

        resnet_stem = _RESNET_STEM_RE.match(key)
        if resnet_stem:
            leaf = resnet_stem["leaf"]
            is_bn = resnet_stem["idx"] == "1" or leaf.startswith("running")
            if not is_bn:   # 'stem.0.*' (v1) or bare 'stem.*' (v2) conv
                _put(params, ("stem_conv",
                              "kernel" if leaf == "weight" else "bias"),
                     value)
            elif leaf == "running_mean":
                _put(stats, ("stem_bn", "mean"), value)
            elif leaf == "running_var":
                _put(stats, ("stem_bn", "var"), value)
            else:
                _put(params, ("stem_bn", _NORM_LEAF[leaf]), value)
            continue

        resnet_block = _RESNET_BLOCK_RE.match(key)
        if resnet_block:
            module = (f"levels_{resnet_block['level']}_"
                      f"{resnet_block['j']}")
            k = int(resnet_block["k"]) - 1   # torch names are 1-based
            leaf = resnet_block["leaf"]
            if resnet_block["kind"] == "conv":
                _put(params, (module, f"Conv_{k}",
                              "kernel" if leaf == "weight" else "bias"),
                     value)
            elif leaf == "running_mean":
                _put(stats, (module, f"BatchNorm_{k}", "mean"), value)
            elif leaf == "running_var":
                _put(stats, (module, f"BatchNorm_{k}", "var"), value)
            elif leaf in _NORM_LEAF:
                _put(params, (module, f"BatchNorm_{k}", _NORM_LEAF[leaf]),
                     value)
            else:
                leftover.append(key)
            continue

        swin = _SWIN_RE.match(key)
        if swin:
            mapped = _swin_block_leaf(swin["rest"])
            if mapped is None:
                continue  # precomputed buffer, rebuilt statically here
            path, untranspose = mapped
            if path == ("__unknown__",):
                leftover.append(key)
                continue
            if swin["bottom"]:
                module = f"bottom_convs_{swin['j']}"
            else:
                module = f"level_convs_{swin['level']}_{swin['j']}"
            _put(params, (module, *path),
                 np.asarray(value).T if untranspose else value)
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
