"""Robustness sweep driver.

The reference publishes ``results/robustness_scores.csv`` (25 200 rows:
dataset x metric x margin x encoder x scheme x pooled x level x
pretraining_length -> robustness) but ships no driver for it; this module
provides one.  ``run_sweep`` walks the cartesian product of probe settings
for a set of encoders and emits rows with the same columns;
``write_scores_csv`` serialises them.
"""
from __future__ import annotations

import csv
import itertools
from typing import Any, Dict, Iterable, List, Optional, Sequence

import jax
import numpy as np

from .distances import DISTANCES
from .eval import Robustness, collect_levels, color_jitter, pool_spatial

__all__ = ["run_sweep", "write_scores_csv", "adapt_channels"]

CSV_COLUMNS = ("dataset", "metric", "margin", "encoder",
               "pretraining_scheme", "pooled", "level",
               "pretraining_length", "robustness")


def run_sweep(encoders: Sequence[Dict[str, Any]],
              datasets: Dict[str, Any],
              metrics: Iterable[str] = ("cosine_distance", "l2",
                                        "inv_pearson"),
              margins: Iterable[float] = (0.0, 0.5),
              levels: Iterable[int] = (1, 2, 3, 4),
              pooled: Iterable[bool] = (False, True),
              batch_size: int = 32,
              seed: int = 0) -> List[Dict[str, Any]]:
    """Score every (encoder, dataset, metric, margin, level, pooled) cell.

    ``encoders``: dicts with ``module``, ``variables`` and metadata keys
    ``name`` / ``pretraining_scheme`` / ``pretraining_length`` (and
    optionally ``method`` for non-standard forward signatures and
    ``in_channels`` to adapt the shared probe images to the encoder's
    input channel count).
    ``datasets``: name -> NHWC image array of probe images.
    Returns one row dict per cell with the mean margin score.
    """
    import jax.numpy as jnp

    rows = []
    base_key = jax.random.key(seed)
    for ds_index, (ds_name, imgs) in enumerate(datasets.items()):
        # the jitter keys depend only on (seed, dataset): every encoder is
        # scored on the SAME two jittered probe views, so the CSV's
        # cross-encoder ranking compares encoders, not RNG draws (the
        # jitter samples one scalar factor per view for the whole batch —
        # per-encoder keys would let one encoder draw a near-identity
        # jitter and another a strong one)
        k0, k1 = jax.random.split(jax.random.fold_in(base_key, ds_index))
        imgs_f = jnp.asarray(imgs, jnp.float32)
        jittered = [color_jitter(k, imgs_f) for k in (k0, k1)]
        for encoder in encoders:
            # the activations depend on none of the (metric, margin, level,
            # pool) axes: run the two jittered views ONCE per (encoder,
            # dataset) and score every cell from the cached per-level
            # arrays (previously each cell re-jitted and re-ran the full
            # forward).  Channel count is adapted per encoder AFTER the
            # shared jitter, so 1- and 3-channel encoders still see the
            # same underlying probe content.
            views = [
                collect_levels(encoder["module"], encoder["variables"],
                               adapt_channels(v,
                                              encoder.get("in_channels")),
                               batch_size=batch_size,
                               method=encoder.get("method"))
                for v in jittered]
            _score_cells(rows, ds_name, encoder, views, metrics, margins,
                         levels, pooled)
    return rows


def adapt_channels(imgs, want: Optional[int]):
    """Match probe images to an encoder's input channel count.

    Grayscale probes repeat up to ``want`` channels (the same op the
    readers' ``RepeatChannelsTransform`` applies for 3-channel encoders);
    multi-channel probes collapse to grayscale by mean for 1-channel
    encoders.  ``want=None`` leaves the images unchanged."""
    import jax.numpy as jnp

    have = imgs.shape[-1]
    if not want or have == want:
        return imgs
    if have == 1:
        return jnp.repeat(imgs, int(want), axis=-1)
    if want == 1:
        return jnp.mean(imgs, axis=-1, keepdims=True)
    raise ValueError(f"cannot adapt {have}-channel probe images to a "
                     f"{want}-channel encoder")


def _score_cells(rows, ds_name, encoder, views, metrics, margins, levels,
                 pooled) -> None:
    # encoders differ in depth (the reference CSV has 4 swin levels vs 5
    # for resnet50/u-net): levels beyond this encoder's
    # ``[*skips, final]`` list are skipped for it, not an error
    available = [lv for lv in levels if -len(views[0]) <= lv
                 < len(views[0])]
    dropped = [lv for lv in levels if lv not in available]
    if dropped:
        import warnings
        warnings.warn(
            f"encoder {encoder.get('name', 'encoder')!r} has "
            f"{len(views[0])} activation levels; skipping requested "
            f"levels {dropped}", stacklevel=2)
    for metric, margin, level, pool in itertools.product(
            metrics, margins, available, pooled):
        scorer = Robustness(DISTANCES[metric], margin)
        p0, p1 = (pool_spatial(v[level]) if pool else v[level]
                  for v in views)
        scores = scorer(p0, p1)
        rows.append({
            "dataset": ds_name,
            "metric": metric,
            "margin": margin,
            "encoder": encoder.get("name", "encoder"),
            "pretraining_scheme": encoder.get("pretraining_scheme",
                                              "none"),
            "pooled": pool,
            "level": level,
            "pretraining_length": encoder.get("pretraining_length", 0),
            "robustness": float(np.mean(np.asarray(scores))),
        })


def write_scores_csv(path: str, rows: Iterable[Dict[str, Any]]) -> None:
    with open(path, "w", newline="") as fh:
        writer = csv.DictWriter(fh, fieldnames=CSV_COLUMNS)
        writer.writeheader()
        for row in rows:
            writer.writerow(row)
