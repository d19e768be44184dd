"""Optional tensor-parallel parameter sharding (beyond reference parity).

The reference scales only by data parallelism (``DataParallel``); on TPU a
second mesh axis is nearly free to support: shard the *output-channel* dim
of large conv/dense kernels over ``'model'`` and let XLA's sharding
propagation insert the ICI collectives for the halves of every matmul.
Parameters keep their pytree structure — only the ``NamedSharding`` of big
kernels changes, so this composes with the existing DP batch sharding and
with checkpointing (save/restore is host numpy either way).

Usage::

    mesh = create_mesh(("data", "model"), shape=(4, 2))
    shardings = tensor_parallel_shardings(params, mesh, min_channels=256)
    params = jax.device_put(params, shardings)
"""
from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["tensor_parallel_shardings", "shard_train_state"]


def _spec_for(path_leaf, value, axis: str, min_channels: int,
              axis_size: int):
    shape = getattr(value, "shape", ())
    name = str(path_leaf[-1]) if path_leaf else ""
    if "kernel" in name and len(shape) >= 2 \
            and shape[-1] >= min_channels and shape[-1] % axis_size == 0:
        # conv kernels (H, W, I, O) / dense kernels (I, O): shard O
        return P(*([None] * (len(shape) - 1) + [axis]))
    if name in ("bias", "scale") and len(shape) == 1 \
            and shape[0] >= min_channels and shape[0] % axis_size == 0:
        return P(axis)
    return P()


def tensor_parallel_shardings(params, mesh: Mesh, axis: str = "model",
                              min_channels: int = 256):
    """NamedSharding pytree: big output-channel dims sharded over *axis*.

    Small parameters stay replicated — sharding tiny tensors costs more in
    collectives than it saves in memory/FLOPs.  Only channel counts
    divisible by the mesh axis size are sharded.
    """
    axis_size = dict(zip(mesh.axis_names, mesh.devices.shape))[axis]

    def to_sharding(path, value):
        return NamedSharding(mesh, _spec_for(path, value, axis,
                                             min_channels, axis_size))
    return jax.tree_util.tree_map_with_path(to_sharding, params)


def shard_train_state(state, mesh: Mesh, axis: str = "model",
                      min_channels: int = 256):
    """Device-put a TrainState with TP params (+matching optimizer moments)
    and replicated everything else."""
    param_sh = tensor_parallel_shardings(state.params, mesh, axis,
                                         min_channels)
    params = jax.device_put(state.params, param_sh)
    repl = NamedSharding(mesh, P())
    # optimizer moments mirror param shapes; match them by shape so they
    # co-locate with their parameters (anything else replicates)
    flat_params, _ = jax.tree_util.tree_flatten(state.params)
    flat_shard, _ = jax.tree_util.tree_flatten(param_sh)
    shape_to_sh = {}
    for p, sh in zip(flat_params, flat_shard):
        shape_to_sh.setdefault(p.shape, sh)

    def put_opt(leaf):
        sh = shape_to_sh.get(getattr(leaf, "shape", None), repl)
        return jax.device_put(leaf, sh)

    opt_state = jax.tree_util.tree_map(put_opt, state.opt_state)
    return state.replace(
        params=params, opt_state=opt_state,
        batch_stats=jax.device_put(state.batch_stats, repl),
        step=jax.device_put(state.step, repl),
        rng_base=jax.device_put(state.rng_base, repl))
