"""Experiment-grid expansion of YAML/JSON configs.

Capability parity with the reference grid parser
(``/root/reference/src/utils/config_parser.py``): inside a config tree,

* every **list** enumerates alternatives — the full config expands into the
  cartesian product over all lists found anywhere in the tree;
* every **tuple** (``!!python/tuple`` in YAML) is a *literal* sequence value
  (its elements are still expanded element-wise, but the tuple itself is not
  a product axis);
* scalars are literals.

One YAML file therefore describes a whole sweep of experiments.
"""
from __future__ import annotations

import itertools
import json
from typing import Any, List

import yaml

__all__ = ["expand_grid", "parse"]


def expand_grid(node: Any, *, literal_list: bool = False) -> List[Any]:
    """Return the list of concrete configs encoded by *node*."""
    if isinstance(node, dict):
        keys = list(node.keys())
        alternative_rows = itertools.product(
            *(expand_grid(node[k]) for k in keys))
        return [dict(zip(keys, row)) for row in alternative_rows]
    if isinstance(node, tuple):
        rows = itertools.product(
            *(expand_grid(v, literal_list=True) for v in node))
        return [tuple(row) for row in rows]
    if isinstance(node, list) and not literal_list:
        expanded: List[Any] = []
        for alternative in node:
            expanded.extend(expand_grid(alternative))
        return expanded
    return [node]


def _load(path: str):
    suffix = str(path).rsplit(".", 1)[-1].lower()
    with open(path) as fh:
        if suffix == "json":
            return json.load(fh)
        if suffix in ("yaml", "yml"):
            return yaml.load(fh, Loader=yaml.FullLoader)
    raise ValueError(f"Unknown config extension: {path}")


def parse(path: str):
    """Load a config file and expand it into its experiment grid.

    Returns ``(configs, original)`` where *configs* is the list of concrete
    config dicts and *original* is the raw parsed tree (kept for dumping a
    ``source_config.yaml`` next to each experiment).
    """
    original = _load(path)
    return expand_grid(original), original
