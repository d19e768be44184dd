"""Pipeline parallelism (parallel/pp.py): GPipe schedule == sequential.

The reference has no pipeline axis (DataParallel only,
``train_model.py:192-194``); these tests pin the beyond-parity contract:
the shard_map/ppermute microbatch schedule computes EXACTLY the same
function as running the stage stack sequentially — forward and reverse
mode — including composed with data parallelism on a 2-D mesh.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from medsegpretrainimagenet_tpu.parallel import (create_mesh, pipeline_apply,
                                                 stack_stage_params)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs the 8-device virtual mesh")

FEAT = 16


def _stage_fn(params, x):
    return jnp.tanh(x @ params["w"] + params["b"])


def _make_stages(num_stages, seed=0):
    rng = np.random.default_rng(seed)
    stages = [{"w": jnp.asarray(rng.normal(0, 0.4, (FEAT, FEAT)),
                                jnp.float32),
               "b": jnp.asarray(rng.normal(0, 0.1, (FEAT,)), jnp.float32)}
              for _ in range(num_stages)]
    return stages, stack_stage_params(stages)


def _sequential(stages, x):
    for p in stages:
        x = _stage_fn(p, x)
    return x


def test_stack_stage_params_shapes():
    stages, stacked = _make_stages(4)
    assert stacked["w"].shape == (4, FEAT, FEAT)
    assert stacked["b"].shape == (4, FEAT)
    np.testing.assert_array_equal(np.asarray(stacked["w"][2]),
                                  np.asarray(stages[2]["w"]))


@pytest.mark.parametrize("num_microbatches", [4, 8])
def test_pipeline_forward_matches_sequential(num_microbatches):
    stages, stacked = _make_stages(4)
    mesh = create_mesh(("pipe",), shape=(4,), devices=jax.devices()[:4])
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(0, 1, (16, FEAT)), jnp.float32)

    y = pipeline_apply(_stage_fn, stacked, x, mesh=mesh,
                       num_microbatches=num_microbatches)
    ref = _sequential(stages, x)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)


def test_pipeline_gradients_match_sequential():
    """Reverse-mode through the schedule == grads of the plain stack
    (ppermute transposes to the reverse hand-off — the backward
    pipeline comes from autodiff, not hand-written)."""
    stages, stacked = _make_stages(4, seed=2)
    mesh = create_mesh(("pipe",), shape=(4,), devices=jax.devices()[:4])
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(0, 1, (8, FEAT)), jnp.float32)
    target = jnp.asarray(rng.normal(0, 1, (8, FEAT)), jnp.float32)

    def pipe_loss(stacked_params):
        y = pipeline_apply(_stage_fn, stacked_params, x, mesh=mesh,
                           num_microbatches=8)
        return jnp.mean((y - target) ** 2)

    def seq_loss(stacked_params):
        xs = x
        for i in range(4):
            xs = _stage_fn(jax.tree.map(lambda a, i=i: a[i],
                                        stacked_params), xs)
        return jnp.mean((xs - target) ** 2)

    g_pipe = jax.grad(pipe_loss)(stacked)
    g_seq = jax.grad(seq_loss)(stacked)
    np.testing.assert_allclose(float(pipe_loss(stacked)),
                               float(seq_loss(stacked)), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(g_pipe),
                    jax.tree_util.tree_leaves(g_seq)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_pipeline_composes_with_data_parallel():
    """dp2 x pipe4: sample dim sharded over 'data' while 'pipe' carries
    the stage hand-off — one compiled program, same numerics."""
    stages, stacked = _make_stages(4, seed=4)
    mesh = create_mesh(("data", "pipe"), shape=(2, 4))
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(0, 1, (16, FEAT)), jnp.float32)

    y = pipeline_apply(_stage_fn, stacked, x, mesh=mesh,
                       num_microbatches=4, data_axis="data")
    ref = _sequential(stages, x)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)


def test_pipeline_real_swin_stages():
    """Pipeline actual model blocks: 4 DoubleSwin (W-MSA + SW-MSA pair)
    stages — LayerNorms, windowed attention with rel-pos bias and the
    shifted-window mask all inside the per-tick stage fn.  Repeated
    same-config blocks are exactly the homogeneous-stack contract."""
    from medsegpretrainimagenet_tpu.models.swin import (
        DoubleSwinTransformerBlock)

    block = DoubleSwinTransformerBlock(
        in_channels=8, embed_dim=8, img_size=28, patch_size=4, depth=2,
        num_heads_layers=(2, 2, 2, 2), window_size=7)
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(0, 1, (2, 49, 8)), jnp.float32)
    params = [block.init(jax.random.key(i), x)["params"] for i in range(4)]

    def stage_fn(p, h):
        return block.apply({"params": p}, h, train=False)

    mesh = create_mesh(("pipe",), shape=(4,), devices=jax.devices()[:4])
    y = pipeline_apply(stage_fn, stack_stage_params(params), x, mesh=mesh,
                       num_microbatches=2)
    ref = x
    for p in params:
        ref = stage_fn(p, ref)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.slow
def test_pipeline_shard_io_matches_sequential():
    """shard_io=True (microbatch dim of input/output buffers sharded
    over 'pipe', per-tick masked-psum routing) computes the same
    function — forward AND gradients — as the replicated-IO schedule
    and the sequential stack."""
    stages, stacked = _make_stages(4, seed=8)
    mesh = create_mesh(("pipe",), shape=(4,), devices=jax.devices()[:4])
    rng = np.random.default_rng(9)
    x = jnp.asarray(rng.normal(0, 1, (16, FEAT)), jnp.float32)
    target = jnp.asarray(rng.normal(0, 1, (16, FEAT)), jnp.float32)

    y = pipeline_apply(_stage_fn, stacked, x, mesh=mesh,
                       num_microbatches=8, shard_io=True)
    ref = _sequential(stages, x)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)

    def loss(stacked_params, shard_io):
        out = pipeline_apply(_stage_fn, stacked_params, x, mesh=mesh,
                             num_microbatches=8, shard_io=shard_io)
        return jnp.mean((out - target) ** 2)

    g_sharded = jax.grad(lambda p: loss(p, True))(stacked)
    g_repl = jax.grad(lambda p: loss(p, False))(stacked)
    for a, b in zip(jax.tree_util.tree_leaves(g_sharded),
                    jax.tree_util.tree_leaves(g_repl)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_pipeline_shard_io_composes_with_data_parallel():
    """dp2 × pipe4 with shard_io: microbatch dim over 'pipe', sample dim
    over 'data' — persistent activations shrink with BOTH axes."""
    stages, stacked = _make_stages(4, seed=10)
    mesh = create_mesh(("data", "pipe"), shape=(2, 4))
    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.normal(0, 1, (16, FEAT)), jnp.float32)

    y = pipeline_apply(_stage_fn, stacked, x, mesh=mesh,
                       num_microbatches=4, data_axis="data",
                       shard_io=True)
    ref = _sequential(stages, x)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)


def test_pipeline_shard_io_rejects_indivisible_microbatches():
    _, stacked = _make_stages(4)
    mesh = create_mesh(("pipe",), shape=(4,), devices=jax.devices()[:4])
    x = jnp.zeros((12, FEAT), jnp.float32)
    with pytest.raises(ValueError, match="divisible by num_stages"):
        pipeline_apply(_stage_fn, stacked, x, mesh=mesh,
                       num_microbatches=6, shard_io=True)


def test_pipeline_rejects_stage_count_mismatch():
    """8 stacked stages on a pipe=4 mesh must raise, not silently run
    stages 0,2,4,6 (shard_map would accept the divisible shape)."""
    _, stacked = _make_stages(8)
    mesh = create_mesh(("pipe",), shape=(4,), devices=jax.devices()[:4])
    x = jnp.zeros((8, FEAT), jnp.float32)
    with pytest.raises(ValueError, match="leading dim 8, expected"):
        pipeline_apply(_stage_fn, stacked, x, mesh=mesh,
                       num_microbatches=4)


def test_pipeline_rejects_ragged_microbatching():
    _, stacked = _make_stages(4)
    mesh = create_mesh(("pipe",), shape=(4,), devices=jax.devices()[:4])
    x = jnp.zeros((10, FEAT), jnp.float32)
    with pytest.raises(ValueError, match="not divisible"):
        pipeline_apply(_stage_fn, stacked, x, mesh=mesh,
                       num_microbatches=4)
