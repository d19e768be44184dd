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
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["tensor_parallel_shardings", "shard_train_state"]


def _put_tree(tree, shardings):
    """Place a host pytree with per-leaf shardings.

    Single-process: one batched ``jax.device_put``.  Multi-host, where
    ``device_put`` refuses non-addressable shardings, every process holds
    the identical full host value (seeded host-side init — the same
    contract as :func:`..mesh.put_replicated`), so each leaf is assembled
    via ``jax.make_array_from_callback`` slicing this process's
    addressable shards out of the full array (a collective-free
    placement; works for sharded AND replicated specs alike).
    """
    if jax.process_count() == 1:
        return jax.device_put(tree, shardings)

    def put(x, sh):
        if isinstance(x, jax.Array) and jax.numpy.issubdtype(
                x.dtype, jax.dtypes.prng_key):
            data = np.asarray(jax.random.key_data(x))
            raw = jax.make_array_from_callback(
                data.shape, sh, lambda idx: data[idx])
            return jax.random.wrap_key_data(raw,
                                            impl=jax.random.key_impl(x))
        x = np.asarray(x)
        return jax.make_array_from_callback(x.shape, sh,
                                            lambda idx: x[idx])

    return jax.tree_util.tree_map(put, tree, shardings)


def _path_keys(path) -> tuple:
    """Normalise a tree_util key path to a tuple of plain strings."""
    keys = []
    for entry in path:
        if hasattr(entry, "key"):
            keys.append(str(entry.key))
        elif hasattr(entry, "name"):
            keys.append(str(entry.name))
        elif hasattr(entry, "idx"):
            keys.append(str(entry.idx))
        else:
            keys.append(str(entry))
    return tuple(keys)


def _spec_for(path_leaf, value, axis: str, min_channels: int,
              axis_size: int):
    shape = getattr(value, "shape", ())
    # extract the KEY from the DictKey entry: str(DictKey) is "['bias']",
    # which broke the exact-name matches below (kernels only survived by
    # substring accident)
    name = _path_keys(path_leaf)[-1] if path_leaf else ""
    if name == "kernel" and len(shape) >= 2 \
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
    and replicated everything else.

    Optimizer moments mirror the param *pytree structure* (optax momenta
    are param-shaped trees nested inside the optimizer state), so each
    opt-state leaf is matched to its parameter by the longest path
    *suffix* that names a param leaf — never by shape, which would
    silently co-locate two same-shaped params with different shardings
    under one spec.  A shape guard keeps scalar bookkeeping (optax
    ``count`` etc.) replicated.
    """
    param_sh = tensor_parallel_shardings(state.params, mesh, axis,
                                         min_channels)
    params = _put_tree(state.params, param_sh)
    repl = NamedSharding(mesh, P())
    by_path = {}
    for (path, sh), (_, p) in zip(
            jax.tree_util.tree_flatten_with_path(param_sh)[0],
            jax.tree_util.tree_flatten_with_path(state.params)[0]):
        by_path[_path_keys(path)] = (sh, getattr(p, "shape", None))

    def opt_sharding(path, leaf):
        keys = _path_keys(path)
        shape = getattr(leaf, "shape", None)
        # longest matching suffix wins (ties impossible: param paths are
        # unique and suffix lengths differ)
        for start in range(len(keys)):
            hit = by_path.get(keys[start:])
            if hit is not None and hit[1] == shape:
                return hit[0]
        return repl

    # build the full sharding pytree FIRST, then batch the transfers into
    # two placement calls — per-leaf eager puts cost a host<->device
    # round-trip each (ruinous over a remote-TPU tunnel at init)
    opt_sh = jax.tree_util.tree_map_with_path(opt_sharding, state.opt_state)
    opt_state = _put_tree(state.opt_state, opt_sh)
    batch_stats, step, rng_base = _put_tree(
        (state.batch_stats, state.step, state.rng_base),
        jax.tree_util.tree_map(
            lambda _: repl, (state.batch_stats, state.step,
                             state.rng_base)))
    return state.replace(
        params=params, opt_state=opt_state,
        batch_stats=batch_stats, step=step, rng_base=rng_base)
