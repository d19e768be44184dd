"""Data-parallel correctness: the 8-device sharded train step reproduces
single-device numerics (same data, same params -> same loss/params), and
metric-state reductions agree.  Runs on the virtual CPU mesh (conftest)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from medsegpretrainimagenet_tpu.config import ConfigDict
from medsegpretrainimagenet_tpu.losses import DiceLoss, Loss
from medsegpretrainimagenet_tpu.metrics import MetricsCalculator
from medsegpretrainimagenet_tpu.models import UNet
from medsegpretrainimagenet_tpu.optim import Optimizer
from medsegpretrainimagenet_tpu.parallel import (batch_sharding, create_mesh,
                                                 replicated, shard_batch)
from medsegpretrainimagenet_tpu.train import TrainState, make_train_step

pytestmark = pytest.mark.skipif(jax.device_count() < 8,
                                reason="needs the 8-device CPU mesh")


def _setup():
    module = UNet(img_ch=1, output_ch=1, channels=[4, 8], depth=1)
    variables = module.init(jax.random.key(0), jnp.zeros((1, 16, 16, 1)))
    optimizer = Optimizer(ConfigDict({"sgd": {
        "momentum": 0.9,
        "learning_rate": {"constant": {"base": 0.05}}}}),
        num_epochs=1, batches_per_epoch=4)
    state = TrainState.create(variables, optimizer.tx.init(
        variables["params"]), jax.random.key(1))
    loss = Loss(DiceLoss, ConfigDict({"label type": "mask"}))
    calculator = MetricsCalculator(ConfigDict({"metrics": {
        "metrics": ("metrics.DiceIndex",),
        "calculation": {"thresholds": 0.5, "label_type": "mask"}}}),
        loss=loss)
    return module, optimizer, state, loss, calculator


def _batch(n=16, frag=2, rng=None):
    rng = rng or np.random.default_rng(0)
    x = rng.random((frag, n, 16, 16, 1)).astype(np.float32)
    mask = (x[..., 0] > 0.6).astype(np.int32)
    return {"x": x, "mask": mask}


def test_sharded_step_matches_single_device():
    module, optimizer, state, loss, calculator = _setup()
    step = make_train_step(module, loss, calculator, optimizer,
                           donate=False)
    batch = _batch()

    # single device
    s1, m1, pb1 = step(state, calculator.init_state(),
                       jax.device_put(batch, jax.devices()[0]))

    # 8-device data-parallel
    mesh = create_mesh(("data",))
    state_r = jax.device_put(state, replicated(mesh))
    metrics_r = jax.device_put(calculator.init_state(), replicated(mesh))
    batch_s = shard_batch(batch, mesh, batch_dim=1)
    with mesh:
        s8, m8, pb8 = step(state_r, metrics_r, batch_s)

    np.testing.assert_allclose(float(pb1["dice_loss"]),
                               float(pb8["dice_loss"]), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s8.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)
    v1 = calculator.finalize_epoch(m1)
    v8 = calculator.finalize_epoch(m8)
    for key in v1:
        np.testing.assert_allclose(v1[key], v8[key], rtol=1e-5,
                                   err_msg=key)


def test_sharded_batch_layout():
    mesh = create_mesh(("data",))
    batch = _batch()
    sharded = shard_batch(batch, mesh, batch_dim=1)
    sh = sharded["x"].sharding
    assert isinstance(sh, NamedSharding)
    assert sh.spec == P(None, "data")
    assert batch_sharding(mesh).spec == P("data")


@pytest.mark.slow
def test_multichip_dryrun_entrypoint():
    """The driver-facing dryrun compiles + executes, in a FRESH process.

    Subprocess on purpose — this mirrors how the driver invokes it, and
    in-process execution after a long test session is flaky at the XLA
    *CPU* backend level: the virtual-device collective rendezvous
    (``rendezvous.cc``) can time out when one of the tp-subgroup device
    threads is slow to join after hundreds of prior compiles (observed:
    ``Termination timeout for all gather ... only 3 of 4 arrived``
    -> SIGABRT).  That is a CPU-emulation thread-pool artifact, not a
    sharding bug — the same program is deterministic on real chips and
    in a clean process.
    """
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    # dryrun_multichip itself re-execs into a rendezvous-hardened,
    # cache-less grandchild (600 s collective timeouts + one
    # retry-on-signal) — no extra retry loop needed here; the generous
    # timeout covers compile + a possible inner retry on this 1-core
    # host.
    cmd = [sys.executable, "-c",
           "import __graft_entry__; __graft_entry__.dryrun_multichip(8); "
           "print('DRYRUN_OK')"]
    proc = subprocess.run(cmd, cwd=repo, capture_output=True,
                          text=True, timeout=570, env={**os.environ})
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "DRYRUN_OK" in proc.stdout


def test_spatial_sharding_forward_bitwise():
    """Context-parallel analog (SURVEY §2.8): the image-height dim sharded
    over a 'spatial' mesh axis — XLA inserts the conv halo exchanges
    (collective-permute) and the result is bitwise-equal to unsharded."""
    module = UNet(img_ch=1, output_ch=1, channels=[4, 8], depth=1)
    x = jnp.asarray(np.random.default_rng(0).random(
        (2, 64, 64, 1)).astype(np.float32))
    variables = module.init(jax.random.key(0), x, train=False)
    ref = module.apply(variables, x, train=False)

    mesh = create_mesh(("data", "spatial"), shape=(2, 4))
    xs = jax.device_put(x, NamedSharding(mesh, P("data", "spatial")))
    vs = jax.device_put(variables, replicated(mesh))

    fwd = jax.jit(lambda v, x: module.apply(v, x, train=False))
    with mesh:
        out = fwd(vs, xs)
    assert out.sharding.spec == P("data", "spatial")
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
    # the partitioner really sharded spatially: halo exchanges in the HLO
    hlo = fwd.lower(vs, xs).compile().as_text()
    assert "collective-permute" in hlo


def test_spatial_sharding_train_step_matches():
    """Full train step with batch over 'data' x height over 'spatial':
    BN stats and gradients become cross-axis collectives and the numerics
    match the single-device step."""
    module, optimizer, state, loss, calculator = _setup()
    step = make_train_step(module, loss, calculator, optimizer,
                           donate=False)
    batch = _batch()

    s1, _, pb1 = step(state, calculator.init_state(),
                      jax.device_put(batch, jax.devices()[0]))

    mesh = create_mesh(("data", "spatial"), shape=(2, 4))
    state_r = jax.device_put(state, replicated(mesh))
    metrics_r = jax.device_put(calculator.init_state(), replicated(mesh))
    batch_s = shard_batch(batch, mesh, batch_dim=1, spatial_axis="spatial")
    assert batch_s["x"].sharding.spec == P(None, "data", "spatial")
    assert batch_s["mask"].sharding.spec == P(None, "data", "spatial")
    with mesh:
        s8, _, pb8 = step(state_r, metrics_r, batch_s)
    np.testing.assert_allclose(float(pb1["dice_loss"]),
                               float(pb8["dice_loss"]), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s8.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)


def test_spatial_sharding_skips_label_leaves():
    """Scalar (B,) and one-hot (B, K) labels must not get a spatial spec
    — only image-like leaves with both H and W dims do."""
    mesh = create_mesh(("data", "spatial"), shape=(2, 4))
    batch = {"x": np.zeros((1, 8, 64, 64, 1), np.float32),
             "mask": np.zeros((1, 8, 64, 64), np.int32),
             "label": np.zeros((1, 8), np.int32),
             "onehot": np.zeros((1, 8, 7), np.float32)}
    out = shard_batch(batch, mesh, batch_dim=1, spatial_axis="spatial")
    assert out["x"].sharding.spec == P(None, "data", "spatial")
    assert out["mask"].sharding.spec == P(None, "data", "spatial")
    assert out["label"].sharding.spec == P(None, "data")
    assert out["onehot"].sharding.spec == P(None, "data")


def test_three_axis_dp_tp_spatial_step_matches():
    """All three parallelism axes composed — batch over 'data', large
    output channels over 'model', image height over 'spatial' — in ONE
    jitted train step, matching single-device numerics."""
    from medsegpretrainimagenet_tpu.parallel import shard_train_state

    module, optimizer, state, loss, calculator = _setup()
    step = make_train_step(module, loss, calculator, optimizer,
                           donate=False)
    batch = _batch()

    ref_state, _, ref_pb = step(state, calculator.init_state(),
                                jax.device_put(batch, jax.devices()[0]))

    mesh = create_mesh(("data", "model", "spatial"), shape=(2, 2, 2))
    state_3 = shard_train_state(state, mesh, min_channels=8)
    metrics_3 = jax.device_put(calculator.init_state(), replicated(mesh))
    batch_3 = shard_batch(batch, mesh, batch_dim=1, spatial_axis="spatial")
    assert batch_3["x"].sharding.spec == P(None, "data", "spatial")
    with mesh:
        out_state, _, pb = step(state_3, metrics_3, batch_3)
    np.testing.assert_allclose(float(pb["dice_loss"]),
                               float(ref_pb["dice_loss"]), rtol=1e-5)
    # param tolerance looser than the 1/2-axis tests: with all three axes
    # active the SPMD partitioner regroups the cross-axis f32 gradient
    # reductions (and falls back to involuntary remat for some layouts),
    # shifting accumulation order — measured deviation is ~4e-4 on the
    # stem kernel for the 2x2x2 layout, ~3e-8 for 2x1x4 / 1x2x4 / 4x2x1,
    # and HOST-dependent: ~1.7e-3 on an avx512 host whose CPU codegen
    # groups the reductions differently (loss still matches to 1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(ref_state.params),
                    jax.tree_util.tree_leaves(out_state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=5e-3)


def test_tp_optimizer_state_follows_param_paths():
    """Two same-shaped params, one TP-sharded and one not: the optimizer
    moments must co-locate with *their* parameter (matched by pytree
    path), not whichever same-shaped sharding was seen first."""
    from medsegpretrainimagenet_tpu.parallel import shard_train_state

    mesh = create_mesh(("data", "model"), shape=(4, 2))
    # 'kernel' is TP-eligible (output channels 8 >= min_channels); the
    # same-shaped 'table' leaf is not (name rule in tp._spec_for)
    params = {"a": {"kernel": jnp.ones((4, 8))},
              "b": {"table": jnp.ones((4, 8))}}
    optimizer = Optimizer(ConfigDict({"sgd": {
        "momentum": 0.9,
        "learning_rate": {"constant": {"base": 0.05}}}}),
        num_epochs=1, batches_per_epoch=1)
    state = TrainState.create({"params": params},
                              optimizer.tx.init(params), jax.random.key(0))
    state = shard_train_state(state, mesh, min_channels=8)

    assert state.params["a"]["kernel"].sharding.spec == P(None, "model")
    assert state.params["b"]["table"].sharding.spec == P()
    momenta = [leaf for path, leaf in
               jax.tree_util.tree_flatten_with_path(state.opt_state)[0]
               if getattr(leaf, "shape", None) == (4, 8)]
    assert len(momenta) == 2
    specs = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(
            state.opt_state)[0]:
        if getattr(leaf, "shape", None) == (4, 8):
            name = str(path[-1].key if hasattr(path[-1], "key")
                       else path[-1])
            specs[name] = leaf.sharding.spec
    assert specs["kernel"] == P(None, "model")
    assert specs["table"] == P()


def test_tensor_parallel_2d_mesh_step():
    """DP x TP: params' large output channels sharded over 'model', batch
    over 'data'; the jitted step compiles, executes, and matches the
    replicated numerics."""
    from medsegpretrainimagenet_tpu.parallel import (shard_train_state,
                                                     tensor_parallel_shardings)

    module, optimizer, state, loss, calculator = _setup()
    step = make_train_step(module, loss, calculator, optimizer,
                           donate=False)
    batch = _batch()

    ref_state, _, ref_pb = step(state, calculator.init_state(),
                                jax.device_put(batch, jax.devices()[0]))

    mesh = create_mesh(("data", "model"), shape=(4, 2))
    shardings = tensor_parallel_shardings(state.params, mesh,
                                          min_channels=8)
    specs = {s.spec for s in jax.tree_util.tree_leaves(shardings)}
    assert any(spec != P() for spec in specs), "nothing got TP-sharded"

    state_tp = shard_train_state(state, mesh, min_channels=8)
    metrics_tp = jax.device_put(calculator.init_state(), replicated(mesh))
    batch_tp = shard_batch(batch, mesh, batch_dim=1)
    with mesh:
        out_state, _, pb = step(state_tp, metrics_tp, batch_tp)
    np.testing.assert_allclose(float(pb["dice_loss"]),
                               float(ref_pb["dice_loss"]), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(ref_state.params),
                    jax.tree_util.tree_leaves(out_state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)


@pytest.mark.xfail(
    strict=True,
    reason="jax 0.9.0 miscompiles conv gradients on any mesh with >2 "
           "axes when the input is spatially sharded (upstream bug). "
           "When a JAX upgrade makes this PASS, the strict xfail fails "
           "the suite: re-enable spatial_sharding×tensor_parallel in "
           "cli/run_experiment.py and turn this into a real parity test.")
def test_3axis_mesh_conv_grad_upstream_bug():
    """Canary for the upstream bug that blocks the 3-D
    data×spatial×model composition (cli/run_experiment.py refuses it).

    Minimal form: grad of sum(tanh(conv)) with the input sharded
    P('data','spatial').  On any 2-axis mesh the sharded gradient equals
    the single-device one to fp noise (~1e-5); adding a third — even
    completely UNUSED — mesh axis makes it wrong by O(1) under BOTH
    partitioners (measured: 4e-5 → 45.8 max abs diff on this exact
    program).  Shardy additionally scales conv *outputs* by the spatial
    axis size when any conv operand is sharded over the third axis —
    first caught as exactly-2× BatchNorm running means (normalize is
    scale-invariant, so train losses looked fine)."""
    from jax import lax

    rng = np.random.default_rng(0)
    k = jnp.asarray(rng.normal(size=(3, 3, 4, 8)) * 0.1, jnp.float32)
    x = jnp.asarray(rng.normal(size=(8, 16, 16, 4)), jnp.float32)

    def loss(k, x):
        y = lax.conv_general_dilated(
            x, k, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return jnp.sum(jnp.tanh(y))

    gfn = jax.jit(jax.grad(loss))
    ref = np.asarray(gfn(k, x))

    mesh = create_mesh(("data", "spatial", "model"), shape=(2, 2, 2))
    ks = jax.device_put(k, replicated(mesh))
    xs = jax.device_put(x, NamedSharding(mesh, P("data", "spatial")))
    with mesh:
        got = np.asarray(gfn(ks, xs))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_tp_shards_wide_biases_and_scales():
    """DictKey extraction: bias/scale leaves >= min_channels shard over
    'model' (str(DictKey) is "['bias']" — an exact-name match on it never
    fired, silently replicating every TP-eligible bias)."""
    from medsegpretrainimagenet_tpu.parallel.tp import (
        tensor_parallel_shardings)

    mesh = create_mesh(("data", "model"), shape=(4, 2))
    params = {"dense": {"kernel": jnp.ones((128, 512)),
                        "bias": jnp.ones((512,))},
              "norm": {"scale": jnp.ones((512,)),
                       "bias": jnp.ones((8,))}}
    sh = tensor_parallel_shardings(params, mesh, min_channels=256)
    assert sh["dense"]["kernel"].spec == P(None, "model")
    assert sh["dense"]["bias"].spec == P("model")
    assert sh["norm"]["scale"].spec == P("model")
    assert sh["norm"]["bias"].spec == P()   # below min_channels


def test_initialize_distributed_safe_after_backend_init():
    """After the backend is up (any JAX call), the no-kwargs form no-ops
    and the kwargs form raises a clear ordering error instead of the
    confusing jax-internal RuntimeError."""
    from medsegpretrainimagenet_tpu.parallel import initialize_distributed

    jax.devices()  # ensure the backend is initialized
    initialize_distributed()  # must not raise
    with pytest.raises(RuntimeError, match="before any other JAX"):
        initialize_distributed(coordinator_address="127.0.0.1:1",
                               num_processes=2, process_id=0)


def test_shard_batch_ragged_tail_replicates_exactly():
    """A tail fragment indivisible by the data axis is replicated over the
    mesh instead of sharded (or raising — a raise would be swallowed by
    the prefetch error envelope and silently drop the reference-mandated
    tail optimizer step).  Replication keeps the step numerically exact:
    no trimmed samples missing from epoch metrics, no repeated samples
    over-weighted in the mean gradient."""
    import warnings

    from jax.sharding import PartitionSpec as P

    mesh = create_mesh(("data",))  # 8-way
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        tail = {"x": np.arange(11 * 4, dtype=np.float32).reshape(
            1, 11, 4, 1, 1)}
        out = shard_batch(tail, mesh, batch_dim=1)
        # shape and values are EXACT — nothing trimmed, nothing padded
        assert out["x"].shape == (1, 11, 4, 1, 1)
        np.testing.assert_array_equal(np.asarray(out["x"]), tail["x"])
        assert all(p is None for p in out["x"].sharding.spec)
        tiny = {"x": np.arange(3, dtype=np.float32).reshape(1, 3, 1, 1, 1)}
        out2 = shard_batch(tiny, mesh, batch_dim=1)
        assert out2["x"].shape == (1, 3, 1, 1, 1)
        np.testing.assert_array_equal(
            np.asarray(out2["x"]).reshape(-1), [0, 1, 2])
        # a divisible batch still shards
        full = {"x": np.zeros((1, 16, 4, 1, 1), np.float32)}
        out3 = shard_batch(full, mesh, batch_dim=1)
        assert out3["x"].sharding.spec == P(None, "data")
    assert any("replicating" in str(w.message) for w in caught)


def test_gather_tree_to_host_single_process_paths():
    """Single-process: sharded-but-fully-addressable and plain-host leaves
    both take the device_get path (no collective) and come back exact."""
    from medsegpretrainimagenet_tpu.parallel import gather_tree_to_host
    mesh = create_mesh(("model",))
    w = np.arange(32.0, dtype=np.float32).reshape(8, 4)
    sharded = jax.device_put(w, NamedSharding(mesh, P("model")))
    assert sharded.is_fully_addressable
    got = gather_tree_to_host({"w": sharded, "n": 3,
                               "h": np.ones(2, np.int32)})
    np.testing.assert_array_equal(got["w"], w)
    assert got["n"] == 3
    np.testing.assert_array_equal(got["h"], np.ones(2, np.int32))
    assert all(isinstance(v, np.ndarray) for v in (got["w"], got["h"]))
