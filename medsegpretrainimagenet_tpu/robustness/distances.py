"""Distance functions over batched representations (reference
``robustness/distance.py:3-10``).  All operate on (N, D) arrays and return
per-sample (N,) distances as pure XLA reductions."""
from __future__ import annotations

import jax.numpy as jnp

__all__ = ["l2_loss", "inv_pearson_corr", "cosine_distance", "DISTANCES"]


def l2_loss(x, y):
    return jnp.mean((x - y) ** 2, axis=1)


def inv_pearson_corr(xs, ys):
    xc = xs - xs.mean(axis=1, keepdims=True)
    yc = ys - ys.mean(axis=1, keepdims=True)
    num = jnp.sum(xc * yc, axis=1)
    den = jnp.sqrt(jnp.sum(xc ** 2, axis=1) * jnp.sum(yc ** 2, axis=1))
    return 1 - num / den


def cosine_distance(x, y):
    return 1 - jnp.sum(x * y, axis=1) / jnp.sqrt(
        jnp.sum(x ** 2, axis=1) * jnp.sum(y ** 2, axis=1))


DISTANCES = {"cosine_distance": cosine_distance,
             "l2": l2_loss,
             "l2_loss": l2_loss,
             "inv_pearson": inv_pearson_corr,
             "inv_pearson_corr": inv_pearson_corr}
