"""Multi-host input path: REAL 2-process runs (gloo collectives on CPU).

The reference has no multi-host story (single-process ``DataParallel``,
SURVEY §2.8); this framework's ``parallel.shard_batch`` multi-host branch
slices each process's local portion and assembles the global array with
``jax.make_array_from_process_local_data``.  These tests spawn two actual
``jax.distributed`` processes and verify (a) the assembled global batch is
correct under a global reduction and (b) a data-parallel train step over
the 2-process mesh reproduces the single-process loss.
"""
import os
import subprocess
import sys
import textwrap

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = textwrap.dedent("""
    import sys
    rank = int(sys.argv[1])
    port = sys.argv[2]
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 2)
    jax.distributed.initialize(
        coordinator_address="127.0.0.1:" + port,
        num_processes=2, process_id=rank)
    import numpy as np
    import jax.numpy as jnp
    sys.path.insert(0, {repo!r})
    from medsegpretrainimagenet_tpu.config import ConfigDict
    from medsegpretrainimagenet_tpu.losses import DiceLoss, Loss
    from medsegpretrainimagenet_tpu.optim import Optimizer
    from medsegpretrainimagenet_tpu.parallel import create_mesh, shard_batch
    from medsegpretrainimagenet_tpu.train import TrainState, make_train_step
    from medsegpretrainimagenet_tpu.models import UNet

    mesh = create_mesh(("data",))
    # every process holds the same seeded global batch (the loader
    # contract); shard_batch slices the local quarter per device
    rng = np.random.default_rng(0)
    batch = {{"x": rng.random((1, 8, 16, 16, 1)).astype(np.float32)}}
    batch["mask"] = (batch["x"][..., 0] > 0.5).astype(np.int32)
    global_sum = float(np.sum(batch["x"]))
    g = shard_batch(batch, mesh, batch_dim=1)
    assert float(jnp.sum(g["x"])) == global_sum

    # per-host input slicing: each process contributes only its local
    # slice (already_local=True) and the assembled global array matches
    # the full-batch path bit for bit
    local = {{k: v[:, rank * 4:(rank + 1) * 4] for k, v in batch.items()}}
    gl = shard_batch(local, mesh, batch_dim=1, already_local=True)
    assert gl["x"].shape == g["x"].shape, gl["x"].shape
    assert float(jnp.sum(gl["x"])) == global_sum
    # value equality via an on-device reduction (a global array spanning
    # both processes cannot be fetched host-side)
    assert float(jnp.sum((gl["x"] - g["x"]) ** 2)) == 0.0

    # ragged epoch tails must not raise (the prefetch envelope would drop
    # the optimizer step): with a 4-way data axis an indivisible tail is
    # replicated over the mesh — exact values, exact shape
    import warnings
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        tail = {{"x": rng.random((1, 6, 16, 16, 1)).astype(np.float32)}}
        g6 = shard_batch(tail, mesh, batch_dim=1)
        assert g6["x"].shape == (1, 6, 16, 16, 1), g6["x"].shape
        np.testing.assert_array_equal(np.asarray(g6["x"]), tail["x"])
        tiny = {{"x": rng.random((1, 1, 16, 16, 1)).astype(np.float32)}}
        g1 = shard_batch(tiny, mesh, batch_dim=1)
        assert g1["x"].shape == (1, 1, 16, 16, 1), g1["x"].shape
        np.testing.assert_array_equal(np.asarray(g1["x"]),
                                      tiny["x"])

    module = UNet(img_ch=1, output_ch=1, channels=[4, 8], depth=1)
    variables = module.init(jax.random.key(0), jnp.zeros((1, 16, 16, 1)))
    optimizer = Optimizer(ConfigDict({{"sgd": {{
        "momentum": 0.9,
        "learning_rate": {{"constant": {{"base": 0.05}}}}}}}}),
        num_epochs=1, batches_per_epoch=1)
    state = TrainState.create(variables, optimizer.tx.init(
        variables["params"]), jax.random.key(1))
    loss = Loss(DiceLoss, ConfigDict({{"label type": "mask"}}))
    step = make_train_step(module, loss, None, optimizer, donate=False)
    from medsegpretrainimagenet_tpu.parallel import put_replicated
    state = put_replicated(state, mesh)
    with mesh:
        _, _, per_batch = step(state, None, g)

    # host sinks are single-writer: only process 0 appends CSV rows
    import tempfile, os as _os
    from medsegpretrainimagenet_tpu.parallel import is_main_process
    from medsegpretrainimagenet_tpu.train.loop import append_csv_row
    assert is_main_process() == (rank == 0)
    p = tempfile.mkdtemp() + "/row.csv"
    append_csv_row(p, {{"a": 1.0}})
    assert _os.path.isfile(p) == (rank == 0), (rank, _os.path.isfile(p))

    # filesystem-derived decisions (resume position, save-dir dedup
    # suffix) must be process 0's everywhere
    from medsegpretrainimagenet_tpu.parallel import broadcast_from_main
    agreed = broadcast_from_main((100 + rank, 7 * (rank + 1)))
    assert agreed == [100, 7], agreed

    # cross-host-sharded state (multi-host TP/spatial): the checkpoint
    # host transfer is a collective both ranks join, yields the full
    # global array, and round-trips through the msgpack writer — plain
    # device_get would raise on the non-addressable shards
    from jax.sharding import NamedSharding, PartitionSpec as P
    from medsegpretrainimagenet_tpu.parallel import gather_tree_to_host
    from medsegpretrainimagenet_tpu.train import checkpoint as ckptio
    host_w = np.arange(16.0, dtype=np.float32).reshape(4, 4)
    m4 = create_mesh(("model",))          # 4 devices over the 2 processes
    sharded = jax.make_array_from_callback(
        host_w.shape, NamedSharding(m4, P("model")),
        lambda idx: host_w[idx])
    assert not sharded.is_fully_addressable
    got = gather_tree_to_host(dict(w=sharded, n=3))
    np.testing.assert_array_equal(got["w"], host_w)
    assert got["n"] == 3
    p2 = tempfile.mkdtemp() + "/sharded.msgpack"   # rank-local path
    ckptio.save_params_file(p2, dict(w=sharded))
    np.testing.assert_array_equal(
        ckptio.load_params_file(p2)["w"], host_w)

    # multi-host TENSOR PARALLELISM: shard_train_state must place the
    # cross-host 'model'-sharded kernels without device_put (which
    # refuses non-addressable shardings) — each process contributes its
    # addressable shards of the identical seeded host tree.  The dp2xtp2
    # step must reproduce the replicated loss exactly.
    from medsegpretrainimagenet_tpu.parallel import shard_train_state
    mesh2 = create_mesh(("data", "model"), shape=(2, 2))
    state_tp = TrainState.create(variables, optimizer.tx.init(
        variables["params"]), jax.random.key(1))
    state_tp = shard_train_state(state_tp, mesh2, min_channels=4)
    any_sharded = any(
        not leaf.is_fully_addressable
        for leaf in jax.tree_util.tree_leaves(state_tp.params)
        if hasattr(leaf, "is_fully_addressable"))
    assert any_sharded, "TP sharded nothing cross-host"
    g_tp = shard_batch(batch, mesh2, batch_dim=1)
    with mesh2:
        _, _, per_batch_tp = step(state_tp, None, g_tp)
    tp_loss = float(per_batch_tp["loss"])
    assert abs(tp_loss - float(per_batch["loss"])) < 1e-6, \
        (tp_loss, float(per_batch["loss"]))

    print("LOSS", repr(float(per_batch["loss"])), flush=True)
""")


@pytest.mark.skipif(os.environ.get("MST_SKIP_MULTIPROC") == "1",
                    reason="multi-process run disabled")
@pytest.mark.slow
def test_multihost_shard_batch_and_train_step(tmp_path):
    import socket

    worker = tmp_path / "worker.py"
    worker.write_text(WORKER.format(repo=REPO))
    # a free port (bound then released) instead of a hardcoded one:
    # concurrent suites / lingering workers would collide otherwise
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = str(s.getsockname()[1])
    procs = [subprocess.Popen(
        [sys.executable, str(worker), str(rank), port],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env={**os.environ, "JAX_PLATFORMS": "cpu"})
        for rank in range(2)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=240)
        outs.append(out)
        assert p.returncode == 0, out[-2000:]
    losses = []
    for out in outs:
        for line in out.splitlines():
            if line.startswith("LOSS "):
                losses.append(float(eval(line.split(" ", 1)[1])))
    assert len(losses) == 2
    # both processes agree on the global loss
    assert losses[0] == pytest.approx(losses[1], rel=1e-6)

    # ... and it matches the single-process value on the same data
    import jax
    import jax.numpy as jnp

    from medsegpretrainimagenet_tpu.config import ConfigDict
    from medsegpretrainimagenet_tpu.losses import DiceLoss, Loss
    from medsegpretrainimagenet_tpu.models import UNet
    from medsegpretrainimagenet_tpu.optim import Optimizer
    from medsegpretrainimagenet_tpu.train import TrainState, make_train_step

    rng = np.random.default_rng(0)
    batch = {"x": rng.random((1, 8, 16, 16, 1)).astype(np.float32)}
    batch["mask"] = (batch["x"][..., 0] > 0.5).astype(np.int32)
    module = UNet(img_ch=1, output_ch=1, channels=[4, 8], depth=1)
    variables = module.init(jax.random.key(0), jnp.zeros((1, 16, 16, 1)))
    optimizer = Optimizer(ConfigDict({"sgd": {
        "momentum": 0.9,
        "learning_rate": {"constant": {"base": 0.05}}}}),
        num_epochs=1, batches_per_epoch=1)
    state = TrainState.create(variables, optimizer.tx.init(
        variables["params"]), jax.random.key(1))
    loss = Loss(DiceLoss, ConfigDict({"label type": "mask"}))
    step = make_train_step(module, loss, None, optimizer, donate=False)
    _, _, per_batch = step(state, None,
                           {k: jnp.asarray(v) for k, v in batch.items()})
    assert losses[0] == pytest.approx(float(per_batch["loss"]), rel=1e-5)
