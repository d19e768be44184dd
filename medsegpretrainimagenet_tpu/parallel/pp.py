"""Pipeline parallelism over a ``'pipe'`` mesh axis (beyond parity).

The reference scales only by ``DataParallel`` (``train_model.py:192-194``);
this module adds the TPU-native third axis: GPipe-style microbatch
pipelining, where each device of a ``'pipe'`` mesh axis holds ONE stage of
a homogeneous block stack and activations flow stage-to-stage over ICI via
``lax.ppermute``.  The schedule is expressed as a ``lax.scan`` over
``num_microbatches + num_stages - 1`` ticks inside one ``jax.shard_map``
— a single compiled SPMD program, no host round-trips, and reverse-mode
autodiff through the whole schedule (the transpose of ``ppermute`` is the
reverse ``ppermute``, so ``jax.grad`` yields the backward pipeline for
free).

Scope: the classic homogeneous-pipeline contract — every stage maps
activations of one fixed shape/dtype to the same shape/dtype, and all
stages share one parameter pytree structure (their params are stacked on
a leading stage axis, sharded ``P('pipe')``, so each device holds exactly
its own stage's weights).  That covers the repeated-block bodies where
pipeline parallelism is actually used (transformer/Swin block stacks,
ResNet stages at constant width); stem/head layers stay outside the
pipeline on the first/last stage's data-parallel replicas.

Composes with the existing axes: ``inputs`` may carry a data-parallel
sharding on the sample axis — each tick's stage compute then runs
dp-sharded while ``'pipe'`` carries the stage hand-off.

Memory model (default): the microbatched input (replicated over
``'pipe'``), the output buffer in the scan carry, and the final output
broadcast are all FULL-batch sized on every pipe device — per-device
*activation* memory does not shrink with pipeline depth (only
per-device *parameter* memory does).  Two levers when that matters:
shard the sample axis over ``data_axis`` (dp×pp, each device holds
``B/dp``), or pass ``shard_io=True`` — the microbatch dim of the input
AND output buffers is then sharded over ``'pipe'`` (persistent
activation memory ``~B/S`` per device, shrinking with depth) and each
tick routes one microbatch to stage 0 / from the last stage with a
masked ``psum`` over the pipe axis (two extra one-microbatch
collectives per tick — the price of static SPMD routing; bandwidth-
noticeable only when stages are tiny).

Usage::

    mesh = create_mesh(("pipe",), shape=(4,))
    stacked = stack_stage_params([p0, p1, p2, p3])
    y = pipeline_apply(stage_fn, stacked, x, mesh=mesh,
                       num_microbatches=8)
"""
from __future__ import annotations

from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

__all__ = ["stack_stage_params", "pipeline_apply"]


def stack_stage_params(stage_params: Sequence[Any]):
    """Stack per-stage parameter pytrees on a new leading stage axis.

    All stages must share one pytree structure and per-leaf shapes (the
    homogeneous-pipeline contract).  The result's leaves have shape
    ``(num_stages, *leaf_shape)`` — shard them ``P('pipe')``.
    """
    return jax.tree.map(lambda *leaves: jnp.stack(leaves), *stage_params)


def pipeline_apply(stage_fn: Callable[[Any, jax.Array], jax.Array],
                   stacked_params: Any,
                   inputs: jax.Array,
                   *,
                   mesh: Mesh,
                   axis: str = "pipe",
                   num_microbatches: int | None = None,
                   data_axis: str | None = None,
                   shard_io: bool = False) -> jax.Array:
    """Run ``num_stages`` sequential stages as a GPipe microbatch pipeline.

    ``stage_fn(params_i, x) -> y`` must be shape/dtype-preserving; it is
    traced once and runs on every pipe device every tick (bubble ticks
    compute on zeros — the standard GPipe fill/drain cost of
    ``(S-1)/(M+S-1)`` idle fraction).  Because bubble ticks really
    execute ``stage_fn`` on all-zero activations, the stage must be
    finite at zero input in BOTH forward and VJP (true for conv / norm
    (eps) / attention / MLP stacks): a stage that divides by an
    un-epsiloned norm would inject NaNs that the forward's validity
    gating hides but the backward's ``0-cotangent × NaN-jacobian``
    products would propagate into the parameter gradients.

    Args:
      stage_fn: one stage's forward; pure, no RNG (pass PRNG material
        through ``params`` if a stage needs it).
      stacked_params: pytree with leading stage axis (see
        :func:`stack_stage_params`); leaf shape ``(S, ...)`` where ``S``
        equals the ``axis`` mesh size.
      inputs: ``(B, ...)`` activations entering stage 0.  ``B`` must be
        divisible by ``num_microbatches``.
      mesh: mesh containing ``axis``.
      num_microbatches: ``M``; defaults to ``S`` (bubble fraction ~50 %,
        fine for tests — production wants ``M >= 4*S``).
      data_axis: optional second mesh axis carrying data parallelism —
        each microbatch's sample dim is sharded over it, so every tick's
        stage compute runs dp-sharded while ``axis`` carries the stage
        hand-off (dp×pp on one mesh, one compiled program).
      shard_io: shard the microbatch dim of the input and output buffers
        over ``axis`` (see the module docstring's memory model).  ``M``
        must then divide by ``S``; per tick, stage 0's feed and the last
        stage's drain each ride one masked one-microbatch ``psum``.

    Returns:
      ``(B, ...)`` outputs of the last stage, replicated over ``axis``
      (``shard_io=True``: sharded over it on the microbatch dim) and
      sharded over ``data_axis`` on the sample dim when given.
    """
    num_stages = dict(zip(mesh.axis_names, mesh.devices.shape))[axis]
    # shard_map only checks divisibility: 8 stacked stages on a pipe=4
    # mesh would silently place 2 stages per device and `a[0]` would run
    # stages 0,2,4,6 only — reject any stage-count/mesh mismatch
    for path, leaf in jax.tree_util.tree_flatten_with_path(
            stacked_params)[0]:
        lead = getattr(leaf, "shape", (None,))[0] if getattr(
            leaf, "ndim", 1) else None
        if lead != num_stages:
            raise ValueError(
                f"stacked_params leaf {jax.tree_util.keystr(path)} has "
                f"leading dim {lead}, expected num_stages={num_stages} "
                f"(the '{axis}' mesh axis size)")
    m = num_stages if num_microbatches is None else int(num_microbatches)
    batch = inputs.shape[0]
    if batch % m:
        raise ValueError(f"batch {batch} not divisible by "
                         f"num_microbatches {m}")
    if shard_io and m % num_stages:
        raise ValueError(f"shard_io needs num_microbatches {m} divisible "
                         f"by num_stages {num_stages}")
    per_dev_m = m // num_stages if shard_io else m
    x_mb = inputs.reshape((m, batch // m) + inputs.shape[1:])
    ticks = m + num_stages - 1
    fwd_perm = [(i, i + 1) for i in range(num_stages - 1)]

    def per_device(params, x):
        my_params = jax.tree.map(lambda a: a[0], params)
        idx = lax.axis_index(axis)
        is_first = idx == 0
        is_last = idx == num_stages - 1

        def tick(carry, t):
            incoming, outputs = carry
            mb = jnp.minimum(t, m - 1)     # microbatch entering stage 0
            if shard_io:
                # microbatch mb lives on its owner device's local slot
                # mb % per_dev_m; one masked psum routes it to stage 0
                # (every device pays the collective — static routing)
                cand = lax.dynamic_index_in_dim(x, mb % per_dev_m, 0,
                                                keepdims=False)
                owner = (mb // per_dev_m) == idx
                feed = lax.psum(
                    jnp.where(owner, cand, jnp.zeros_like(cand)), axis)
            else:
                feed = lax.dynamic_index_in_dim(x, mb, 0, keepdims=False)
            feed = jnp.where(t < m, feed, jnp.zeros_like(feed))
            stage_in = jnp.where(is_first, feed, incoming)
            out = stage_fn(my_params, stage_in)
            # hand my activation to the next stage; device 0 receives
            # zeros (the fill bubble)
            shifted = lax.ppermute(out, axis, fwd_perm)
            # the last stage drains microbatch t-(S-1) at tick t
            d = jnp.clip(t - (num_stages - 1), 0, m - 1)
            draining = t >= num_stages - 1
            if shard_io:
                # route the drained microbatch from the last stage to
                # its owner's local output slot d % per_dev_m
                drained = lax.psum(
                    jnp.where(jnp.logical_and(draining, is_last), out,
                              jnp.zeros_like(out)), axis)
                write = jnp.logical_and(draining, (d // per_dev_m) == idx)
                o_idx = d % per_dev_m
                cur = lax.dynamic_index_in_dim(outputs, o_idx, 0,
                                               keepdims=False)
                outputs = lax.dynamic_update_index_in_dim(
                    outputs, jnp.where(write, drained, cur), o_idx, 0)
            else:
                valid = jnp.logical_and(draining, is_last)
                cur = lax.dynamic_index_in_dim(outputs, d, 0,
                                               keepdims=False)
                outputs = lax.dynamic_update_index_in_dim(
                    outputs, jnp.where(valid, out, cur), d, 0)
            return (shifted, outputs), None

        # the carry is device-varying from tick 1 on (each stage holds a
        # different activation), so the zero init must be cast to
        # varying for shard_map's per-axis type check — over exactly the
        # axes the activations vary on ('pipe', plus 'data' when the
        # sample dim is sharded); casting over unused mesh axes would
        # poison the replicated out_spec
        vary_axes = (axis,) + ((data_axis,) if data_axis else ())
        varying = lambda a: lax.pcast(a, vary_axes, to="varying")  # noqa: E731
        zero_act = varying(jnp.zeros(x.shape[1:], x.dtype))
        zero_out = varying(jnp.zeros(x.shape, x.dtype))
        (_, outputs), _ = lax.scan(
            tick, (zero_act, zero_out), jnp.arange(ticks))
        if shard_io:
            # outputs already live on their owners, sharded over 'pipe'
            return outputs
        # only the last stage holds real outputs; one psum replicates
        # them onto every pipe device (callers that keep the result
        # stage-local can instead slice before this broadcast)
        outputs = lax.psum(
            jnp.where(is_last, outputs, jnp.zeros_like(outputs)), axis)
        return outputs

    in_spec = jax.tree.map(lambda _: P(axis), stacked_params)
    mb_axis = axis if shard_io else None
    x_spec = P(mb_axis, data_axis) if data_axis else P(mb_axis)
    mapped = jax.shard_map(per_device, mesh=mesh,
                           in_specs=(in_spec, x_spec), out_specs=x_spec)
    out = mapped(stacked_params, x_mb)
    return out.reshape((batch,) + out.shape[2:])
