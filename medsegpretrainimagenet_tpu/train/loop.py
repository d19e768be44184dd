"""Epoch/step training loop with CSV logging and checkpoint policy.

Capability parity with ``/root/reference/src/train_model.py``: per-epoch
train + validation passes, ``batch_logs.csv`` per optimizer step (train
only, when batch logging is on), ``epoch_logs.csv`` with ``val_``-prefixed
validation columns, learning-rate columns, epoch-unit scheduler updates
(handled inside the schedule), last/best/epoch-tagged model checkpoints +
optimizer state, the optional extra "last pass", final test pass ->
``test_logs.csv``, and the catch-log-continue error envelope per epoch.

TPU-native shape: batches are regrouped host-side into
``(n_fragments, fragment_bs, ...)`` stacks (gradient accumulation happens
inside the jitted step); metric state lives on device and is finalised once
per epoch.
"""
from __future__ import annotations

import csv
import math
import os
import sys
import time
from typing import Any, Callable, Dict, Iterable, Optional

import jax
import numpy as np

from ..config import ConfigDict
from ..utils import handle_exception, swallow
from . import checkpoint as ckpt
from .state import TrainState
from .step import make_eval_step, make_train_step

__all__ = ["train_model", "run_epoch", "append_csv_row"]


def _export_confusion_matrix(calculator, metrics_state, destination: str,
                             epoch: int, config_dict,
                             train: bool = False) -> None:
    """K x K CM image at active epochs (reference
    ``multiclass_metrics.py:124-153``): the train and validation passes
    each export a row-normalised matrix as
    ``Confusion_matrices/{train_|val_}confusion_matrix_epoch_{i}``."""
    cm = calculator.epoch_confusion_matrix(metrics_state)
    if cm is None:
        return
    from ..plotting import ConfMtxPlotter, export_plot
    labels = config_dict.get_str_tuple("metrics/calculation/class_names") \
        or None
    out_dir = os.path.join(destination, "Confusion_matrices")
    os.makedirs(out_dir, exist_ok=True)
    kind = "Train" if train else "Validation"
    prefix = "train_" if train else "val_"
    plotter = ConfMtxPlotter({
        "matrix": cm, "labels": list(labels) if labels else None,
        "title": f"{kind} confusion matrix at epoch {epoch}",
        "dirname": out_dir,
        "fname": f"{prefix}confusion_matrix_epoch_{epoch}"})
    extensions = config_dict.get_str_tuple(
        "meta/technical/export_plots_as") or ("png",)
    export_plot(plotter, extensions)


def _cm_log_epochs(config_dict) -> tuple:
    """(active_epochs, do_last) for CM-image export: the shared parser in
    ``metrics.calculator.cm_log_epochs`` applied to the full experiment
    config (one source of truth with the calculator's last-pass flag)."""
    from ..config import ConfigDict
    from ..metrics.calculator import cm_log_epochs
    return cm_log_epochs(
        config_dict.get("metrics/calculation", ConfigDict()))


def append_csv_row(path: str, row: Dict[str, Any]) -> None:
    from ..parallel import is_main_process
    if not is_main_process():   # multi-host: results are replicated on
        return                  # every process; one writer is correct,
                                # N writers interleave-corrupt the file
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    write_header = not os.path.isfile(path)
    with open(path, "a", newline="") as fh:
        writer = csv.DictWriter(fh, fieldnames=list(row.keys()))
        if write_header:
            writer.writeheader()
        writer.writerow(row)


def _resume_best_value(csv_path: str, metric: str, pick, epoch_start: int):
    """The best already-achieved *metric* over the first *epoch_start*
    epochs of an existing epoch_logs.csv, or None.  A --continued resume
    must re-seed its best-model tracking from this: restarting at
    ±inf would let the first post-resume epoch overwrite
    best_model_state_dict.msgpack even when it is WORSE than the
    pre-crash best.

    When the CSV carries an ``epoch`` column (every row this loop writes
    does), seeding keys on it: the LAST row per epoch number <=
    *epoch_start* wins.  A crash+resume appends duplicate epoch rows, so
    after a SECOND resume ``rows[:epoch_start]`` is no longer "the first
    epoch_start epochs" — positional slicing could seed from a
    pre-first-crash row whose best-model write never landed.  Rows
    without the column (pre-upgrade CSVs) fall back to the positional
    slice.  Non-finite values are skipped either way: max()/min() over a
    list containing NaN returns NaN, and pick(nan, current) == current
    is always False — a NaN seed would permanently disable
    best-checkpoint updates for the resumed run."""
    try:
        with open(csv_path, newline="") as fh:
            rows = list(csv.DictReader(fh))
    except OSError:
        return None
    if rows and "epoch" in rows[0]:
        last_per_epoch: Dict[int, Any] = {}
        for row in rows:
            try:
                ep = int(float(row["epoch"]))
            except (TypeError, ValueError):
                continue
            if ep <= epoch_start:
                last_per_epoch[ep] = row
        rows = [last_per_epoch[ep] for ep in sorted(last_per_epoch)]
    else:
        rows = rows[:epoch_start]
    values = []
    for row in rows:
        try:
            value = float(row[metric])
        except (KeyError, TypeError, ValueError):
            continue
        if math.isfinite(value):
            values.append(value)
    return pick(values) if values else None


def _stack_fragments(fragments):
    """List of equal-shaped fragment dicts -> (n_frag, frag_bs, ...) stack."""
    keys = fragments[0].keys()
    return {k: np.stack([f[k] for f in fragments]) for k in keys}


def _virtual_batches(loader, accumulation_scale: int):
    """Group loader fragments into virtual batches.

    Yields (n_frag, frag_bs, ...) stacks of equal-shaped fragments; a
    shape change or the epoch end flushes a *partial* group.  EVERY group
    — the ragged epoch tail included — is one optimizer step: the
    reference steps at each accumulation boundary AND on the epoch's last
    fragment (``train_model.py:55``: ``step = (i + 1) % accumulation_scale
    == 0 or i == len(ds) - 1``), i.e. ceil(len/acc) steps per epoch, which
    is also what the schedulers' batches_per_epoch horizon counts."""
    pending = []
    for fragment in loader:
        if pending and (fragment.keys() != pending[0].keys() or any(
                fragment[k].shape != pending[0][k].shape
                for k in fragment)):
            yield _stack_fragments(pending)
            pending = []
        pending.append(fragment)
        if len(pending) == accumulation_scale:
            yield _stack_fragments(pending)
            pending = []
    if pending:
        yield _stack_fragments(pending)


def _prefetched(iterator, mesh, depth: int = 2, threaded=None):
    """Device-put *depth* batches ahead so H2D transfer overlaps compute;
    a batch whose sharding/transfer fails is logged and skipped (the
    reference's per-batch error envelope).  ``threaded`` (default: off —
    measured net-slower on remote-device links, see
    ``data/loader.py:prefetch_to_device``) moves batch assembly + H2D to a
    worker thread so they overlap the device step."""
    from ..data.loader import prefetch_to_device
    from ..parallel import shard_batch

    def put(batch):
        # per-host input slicing: the loader marks batches it assembled
        # as this process's local slice (loader.py LOCAL_SLICE_KEY); the
        # mark must never reach the jitted step
        local = isinstance(batch, dict) and \
            batch.pop("_mst_local_slice", None) is not None
        if mesh is not None:
            # a 'spatial' mesh axis (meta/technical/spatial_sharding > 1)
            # additionally shards the image-height dim — halo exchanges
            # are inserted by XLA (parallel/mesh.py shard_batch)
            spatial = "spatial" if "spatial" in mesh.axis_names else None
            return shard_batch(batch, mesh, batch_dim=1,
                               spatial_axis=spatial, already_local=local)
        return jax.device_put(batch)

    def on_error(exc):
        handle_exception(exc, "Exception while transferring a batch.")

    return prefetch_to_device(iterator, size=depth, put=put,
                              on_error=on_error, threaded=threaded)


def run_epoch(step_fn, state, metrics_state, loader,
              accumulation_scale: int = 1, train: bool = True,
              mesh=None, log_path: Optional[str] = None,
              calculator=None, on_batch: Optional[Callable] = None,
              threaded_prefetch=None, log_flush: int = 512):
    """One pass over *loader*.  Returns (state, metrics_state).

    Per-step log scalars are NOT read back per step: each blocking
    ``device_get`` costs a device round-trip (ruinous on a remote-TPU
    link — measured ~5x on the full CLI epoch, 50 vs 249 img/s).  The
    step's tiny scalar dict is instead kept on device and a whole window
    of ``log_flush`` steps is fetched in ONE ``jax.device_get`` (which
    async-issues every leaf's D2H before blocking, so the window's
    round-trips overlap into ~one); the same per-step CSV rows are then
    written in order.  ``log_flush=1`` restores streaming writes."""
    rows: list = []  # device-side per-step scalar dicts awaiting readback

    def _flush_rows():
        if not rows:
            return
        host = jax.device_get(rows)   # one batched D2H for the window
        rows.clear()
        for per_batch in host:
            append_csv_row(log_path, calculator.batch_values_host(per_batch))

    for i, batch_stack in enumerate(_prefetched(
            _virtual_batches(loader, accumulation_scale), mesh,
            threaded=threaded_prefetch)):
        try:
            if train:
                state, metrics_state, per_batch = step_fn(
                    state, metrics_state, batch_stack)
            else:
                metrics_state, per_batch = step_fn(
                    state, metrics_state, batch_stack)
            if log_path is not None and calculator is not None:
                rows.append(per_batch)
                if len(rows) >= max(1, int(log_flush)):
                    _flush_rows()
            if on_batch is not None:
                on_batch(i, per_batch)
        except Exception as exc:  # noqa: BLE001 - reference error envelope
            handle_exception(exc, f"Exception occured in batch {i}.")
    if rows:
        with swallow("Exception writing the batch log rows."):
            _flush_rows()
    return state, metrics_state


def train_model(model, train_data, val_data, test_data,
                config_dict: ConfigDict, optimizer, state: TrainState,
                loss=None, metrics_and_loss=None, name: Optional[str] = None,
                virtual_batch_size: int = 32, true_batch_size: int = 1,
                verbose: bool = True, epoch_start: int = 0,
                grad_clip_value: Optional[float] = None,
                grad_clip_norm_type: float = 2.0, mesh=None,
                on_epoch: Optional[Callable] = None,
                host_loggers: Iterable = (),
                device_augment=None,
                prediction_index: int = 0,
                *args, **kwargs) -> TrainState:
    """Train for the configured number of epochs.  Returns the final state."""
    assert virtual_batch_size % true_batch_size == 0, \
        "true batch size must divide the virtual batch size"
    accumulation_scale = virtual_batch_size // true_batch_size

    tech = config_dict["meta/technical"]
    destination = (tech.get("absolute path", "") or "") + (name or "") + "/"
    num_epochs = config_dict["experiment/number of epochs"]
    log_to_device = tech.get("log to device", True)
    log_batches = bool(log_to_device) and log_to_device != "epoch"
    log_last = tech.get("log_last_model", True)
    log_best = tech.get("log_best_model", True)
    # batch_logs.csv readback window (steps per batched D2H; 1 = stream a
    # row per step like the reference — only useful for crash forensics)
    log_flush = int(tech.get("batch_log_flush", 512) or 512)
    # worker-thread input prefetch (assemble + H2D off the step-dispatch
    # thread); None defers to the MST_PREFETCH_THREAD env default (off)
    threaded_prefetch = tech.get("threaded prefetch", None)
    checkpoints = tech.get_tuple("model_log_checkpoints", [])

    watched_metric, best_value, pick = None, None, max
    if log_best:
        eval_cfg = tech.get("model_evaluation", ConfigDict())
        if isinstance(eval_cfg, ConfigDict) and eval_cfg.has("metric"):
            watched_metric = eval_cfg.get_str("metric")
            mode = eval_cfg.get_str("mode") if eval_cfg.has("mode") else "max"
            pick = min if mode in ("min", "minimum") else max
            best_value = math.inf if pick is min else -math.inf
        else:
            log_best = False
    if log_best and epoch_start > 0:
        resumed = _resume_best_value(destination + "epoch_logs.csv",
                                     watched_metric, pick, epoch_start)
        if resumed is not None:
            best_value = resumed

    calculator = metrics_and_loss
    cm_active_epochs, cm_do_last = _cm_log_epochs(config_dict)
    # donate=False: the per-batch catch-and-continue envelope must be able
    # to keep using the old state after a failed step; with donation the
    # inputs' buffers are already marked deleted when a runtime error
    # (device OOM, tunnel drop) surfaces, poisoning every later step.
    # Donation only trims peak HBM here, it does not change step time.
    train_step = make_train_step(model, loss, calculator, optimizer,
                                 grad_clip_value=grad_clip_value,
                                 grad_clip_norm_type=grad_clip_norm_type,
                                 device_augment=device_augment,
                                 donate=False,
                                 prediction_index=prediction_index)
    eval_step = make_eval_step(model, loss, calculator, donate=False,
                               prediction_index=prediction_index)

    host_loggers = list(host_loggers or ())
    module = getattr(model, "module", model)

    # profiling hooks (SURVEY.md §5.1): per-step wall times + an optional
    # jax.profiler trace of the first profiled epoch
    profile_cfg = tech.get("profile", False)
    step_times: list = []
    if profile_cfg:
        profile_dir = destination + "profile/"
        os.makedirs(profile_dir, exist_ok=True)

        # NON-BLOCKING per-step timing: the dispatch thread issues the
        # step's scalar D2H asynchronously and hands the array to a timer
        # worker; the worker's (sequential, FIFO) blocking readbacks
        # record when each step's outputs actually LAND on the host.  In
        # steady state the arrival intervals equal the step durations
        # (block_until_ready does not sync over the axon tunnel; a scalar
        # readback does), but the dispatch thread never waits — a
        # per-step blocking sync caps throughput at one link round-trip
        # per step (measured 0.225 s/step vs the 0.07 s step on a remote
        # tunnel), which taxes exactly the runs profiling is meant to
        # diagnose.
        import queue as _queue
        import threading as _threading
        timer_q: Any = _queue.Queue()

        def _timer_worker():
            while True:
                value = timer_q.get()
                if value is None:
                    timer_q.task_done()
                    return
                try:
                    float(np.asarray(value).reshape(-1)[0])
                except Exception:   # noqa: BLE001 - timing is best-effort
                    pass
                now = time.perf_counter()
                if step_times:
                    step_times.append((now, now - step_times[-1][0]))
                else:
                    step_times.append((now, 0.0))
                timer_q.task_done()

        _timer_thread = _threading.Thread(target=_timer_worker, daemon=True)
        _timer_thread.start()

        def _on_batch_timer(i, per_batch):
            for value in per_batch.values():
                if hasattr(value, "block_until_ready"):
                    try:                      # start the D2H now so the
                        value.copy_to_host_async()  # worker's wait is pure
                    except Exception:         # noqa: BLE001
                        pass                  # link latency, not a stall
                    timer_q.put(value)
                    break

        def _dump_step_times():
            timer_q.join()      # all arrivals recorded (epoch boundary)
            if len(step_times) > 1:
                append_csv_row(profile_dir + "step_times.csv", {
                    "steps": len(step_times) - 1,
                    "mean_s": float(np.mean([d for _, d in step_times[1:]])),
                    "p50_s": float(np.median(
                        [d for _, d in step_times[1:]])),
                    "max_s": float(np.max([d for _, d in step_times[1:]])),
                })
            step_times.clear()
        def _stop_timer():
            timer_q.put(None)
            timer_q.join()
    else:
        _on_batch_timer = None

        def _dump_step_times():
            return None

        def _stop_timer():
            return None

    @jax.jit
    def _host_forward(variables, x):
        from .step import _dequantize_inputs, _select_prediction
        x = _dequantize_inputs({"x": x})["x"]
        pred = module.apply(variables, x, train=False)
        # host loggers plot the metric-side output (reference
        # train_model.py:66 selection applies to their input too)
        return _select_prediction(pred, prediction_index)

    def _augmented_loader(loader):
        if device_augment is None:
            return loader

        def gen():
            import jax.numpy as jnp
            for i, batch in enumerate(loader):
                yield device_augment(
                    jax.random.fold_in(jax.random.key(0), i),
                    {k: jnp.asarray(v) for k, v in batch.items()
                     if hasattr(v, "shape")})
        return gen()

    def run_host_loggers(epoch_1idx: int, last: bool = False):
        from ..parallel import gather_tree_to_host, is_main_process
        active = [logger for logger in host_loggers
                  if logger.active(epoch_1idx, last=last)]
        if not active:
            return
        variables = state.variables
        if jax.process_count() > 1:
            # jit over globally-sharded weights is an SPMD program every
            # process must launch; the loggers run on process 0 only, so
            # fetch the weights (collective — before the gate) and run the
            # logger forwards on the local device instead
            variables = gather_tree_to_host(variables)
        if not is_main_process():
            return              # images/curves are identical per process
        forward = lambda x: _host_forward(variables, x)  # noqa: E731
        for logger in active:
            with swallow("Exception in a host epoch logger."):
                logger.log(epoch_1idx, _augmented_loader(train_data),
                           forward, train=True, last=last)
                if val_data:
                    logger.log(epoch_1idx, val_data, forward, train=False,
                               last=last)

    # async checkpointing: the device->host transfer stays synchronous
    # (next step overwrites the buffers), but msgpack encode + disk write
    # move to a worker thread so big-model saves stop stalling the epoch
    # loop.  Synchronous saves remain the default (reference parity).
    async_writer = ckpt.AsyncCheckpointer() \
        if tech.get("async_checkpointing", False) else None

    def save_model(filenames):
        """Write the CURRENT model state to every file in *filenames* with
        ONE device->host gather and ONE msgpack encode: an epoch's
        last/best/epoch-tagged sinks hold identical state, and on a slow
        device link the repeated params-sized D2H (not the step!) was the
        dominant per-epoch cost (measured ~2.6 s per extra gather on a
        47 MB/s link for the 31 M-param U-Net)."""
        from ..parallel import gather_tree_to_host, is_main_process
        if isinstance(filenames, str):
            filenames = [filenames]
        if not filenames:
            return
        payload = {"params": state.params, "batch_stats": state.batch_stats}
        if async_writer is None or jax.process_count() > 1:
            # the gather is a collective over cross-host-sharded leaves
            # (multi-host TP/spatial state): every process must join it,
            # so it runs BEFORE the single-writer gate.  Replicated state
            # (all DP runs) makes it a plain device_get.  Single-host
            # async mode skips it: the worker thread device_gets instead,
            # so the state-sized D2H drains UNDER the next epoch's
            # compute rather than stalling this epoch's tail.
            payload = gather_tree_to_host(payload)
        if not is_main_process():   # one writer is correct; N writers
            return                  # race the same tmp file on shared fs
        if async_writer is not None:
            async_writer.save_many(
                [destination + f for f in filenames], payload)
        else:
            blob = ckpt.encode_state(payload)
            for filename in filenames:
                ckpt.write_bytes_atomic(destination + filename, blob)

    # metrics_and_loss=None is a supported signature (loss-only training):
    # the epoch loop must degrade to empty metric rows, not die on
    # None.init_state() inside the per-epoch envelope (which would silently
    # no-op every epoch)
    def _init_metrics():
        return calculator.init_state() if calculator is not None else None

    def _finalize(ms) -> Dict[str, Any]:
        return calculator.finalize_epoch(ms) if calculator is not None \
            else {}

    try:
        epochs = range(epoch_start, num_epochs)
        if verbose:
            try:
                from tqdm import tqdm
                epochs = tqdm(epochs, desc="Training model", unit="epoch")
            except ImportError:
                pass

        for epoch in epochs:
            try:
                # "epoch" is an extras column vs the reference schema
                # (train_model.py:242 writes none): it keys the
                # duplicate-robust best-value re-seeding in
                # _resume_best_value after crash+resume appends
                row: Dict[str, Any] = {
                    "epoch": epoch + 1,
                    "learning_rate": float(optimizer.lr_at(int(state.step)))}

                # per-epoch phase split (train/cm_export/val/checkpoint/
                # loggers) under `meta/technical/profile: true` ->
                # profile/epoch_times.csv: quantifies where a FULL CLI
                # epoch's wall time goes (on slow device links the
                # checkpoint D2H, not the step, dominates).  cm_export_s
                # accumulates the confusion-matrix D2H+export and the
                # checkpoint host-copy prefetch launches, so val_s and
                # ckpt_s stay pure — with no val split those inter-phase
                # costs must not masquerade as checkpoint time
                seg: Dict[str, float] = {}
                seg_t = [time.perf_counter()]

                def _mark(name: str) -> None:
                    if profile_cfg:
                        now = time.perf_counter()
                        seg[name] = seg.get(name, 0.0) + now - seg_t[0]
                        seg_t[0] = now

                trace_ctx = None
                if profile_cfg and epoch == epoch_start:
                    with swallow("Could not start the profiler trace."):
                        jax.profiler.start_trace(destination + "profile/trace")
                        trace_ctx = True
                try:
                    metrics_state = _init_metrics()
                    state, metrics_state = run_epoch(
                        train_step, state, metrics_state, train_data,
                        accumulation_scale, train=True, mesh=mesh,
                        log_path=destination + "batch_logs.csv" if log_batches
                        else None, calculator=calculator,
                        on_batch=_on_batch_timer,
                        threaded_prefetch=threaded_prefetch,
                        log_flush=log_flush)
                finally:
                    # stop/flush even when the train pass raises — otherwise
                    # the profiler keeps tracing for the rest of the run and
                    # step_times mixes epochs into one CSV row
                    if trace_ctx:
                        with swallow("Could not stop the profiler trace."):
                            jax.profiler.stop_trace()
                    _dump_step_times()
                row.update(_finalize(metrics_state))
                _mark("train_s")
                if log_to_device and calculator is not None \
                        and (epoch + 1) in cm_active_epochs:
                    with swallow("Exception logging the confusion matrix."):
                        _export_confusion_matrix(
                            calculator, metrics_state, destination,
                            epoch + 1, config_dict, train=True)

                if log_to_device and async_writer is None:
                    # start the checkpoint D2H now: copy_to_host_async caches
                    # the host copy inside each jax.Array, so the end-of-epoch
                    # gathers find the bytes already transferred — the copy
                    # overlaps the val pass instead of stalling after it
                    # (state buffers stay alive until save_model; the next
                    # train epoch's donation happens after).  Model state is
                    # prefetched only when some model sink will consume it —
                    # the opt state is written every epoch regardless.
                    # SYNC mode only: with async checkpointing the worker
                    # thread drains the D2H under the NEXT epoch's compute —
                    # prefetching here would shove the state-sized transfer
                    # into the val phase for no reason (measured: val_s
                    # absorbs the whole drain on a slow link).
                    prefetch = [state.opt_state]
                    if log_last or log_best or (epoch + 1) in checkpoints:
                        prefetch.append((state.params, state.batch_stats))
                    for leaf in jax.tree_util.tree_leaves(prefetch):
                        if isinstance(leaf, jax.Array) \
                                and leaf.is_fully_addressable:
                            try:                 # best-effort prefetch only
                                leaf.copy_to_host_async()
                            except Exception:    # noqa: BLE001
                                pass

                _mark("cm_export_s")
                if val_data:
                    metrics_state = _init_metrics()
                    _, metrics_state = run_epoch(
                        eval_step, state, metrics_state, val_data,
                        accumulation_scale, train=False, mesh=mesh,
                        threaded_prefetch=threaded_prefetch)
                    row.update({f"val_{k}": v for k, v in
                                _finalize(metrics_state).items()})
                    _mark("val_s")
                    if log_to_device and calculator is not None \
                            and (epoch + 1) in cm_active_epochs:
                        with swallow("Exception logging the confusion matrix."):
                            _export_confusion_matrix(
                                calculator, metrics_state, destination,
                                epoch + 1, config_dict)
                    _mark("cm_export_s")

                if log_to_device:
                    append_csv_row(destination + "epoch_logs.csv", row)
                    model_files = []
                    if log_last:
                        model_files.append("last_model_state_dict.msgpack")
                    if log_best and watched_metric in row:
                        current = row[watched_metric]
                        if pick(best_value, current) == current:
                            best_value = current
                            model_files.append("best_model_state_dict.msgpack")
                    if (epoch + 1) in checkpoints:
                        model_files.append(
                            f"model_state_dict_epoch_{epoch + 1}.msgpack")
                    save_model(model_files)
                    from ..parallel import gather_tree_to_host, is_main_process
                    opt_payload = {
                        "opt_state": state.opt_state,
                        "step": np.asarray(state.step),
                        "micro_step": np.asarray(
                            state.micro_step if state.micro_step is not None
                            else state.step)}
                    if async_writer is None or jax.process_count() > 1:
                        # collective gather before the single-writer gate,
                        # like save_model: opt-state moments inherit the
                        # params' (possibly cross-host) shardings
                        opt_payload = gather_tree_to_host(opt_payload)
                    if is_main_process():
                        save_state = ckpt.save_state_file \
                            if async_writer is None else async_writer.save
                        save_state(
                            destination + "optimizer_state_dict.msgpack",
                            opt_payload)
                        # file-role parity with the reference's
                        # scheduler_state_dict.pt: our schedules are pure
                        # functions of the step counter, so the "state" is that
                        # counter plus the schedule identity (forensics +
                        # resume sanity)
                        schedule = getattr(optimizer, "schedule", None)
                        if schedule is not None:
                            save_state(
                                destination + "scheduler_state_dict.msgpack",
                                {"step": np.asarray(state.step),
                                 "unit": schedule.unit,
                                 "base": float(schedule.base)})
                        # durable-epoch stamp, LAST through the same
                        # writer: in async mode the worker lags the CSV
                        # by up to its queue depth, so on a crash
                        # epoch_logs.csv can be ahead of the on-disk
                        # state.  FIFO order guarantees the stamp only
                        # lands after this epoch's model+optimizer
                        # writes; --continued resumes from
                        # min(csv_rows, stamp) (check_for_continued).
                        save_state(
                            destination + "checkpoint_epoch.msgpack",
                            {"epoch": int(epoch + 1)})
                if async_writer is not None:
                    # surface background write failures on the NEXT
                    # epoch inside this envelope (sync-mode parity:
                    # catch-log-continue), not as one fatal error after
                    # the final epoch
                    async_writer.poll()
                _mark("ckpt_s")
                run_host_loggers(epoch + 1)
                _mark("loggers_s")
                if profile_cfg:
                    with swallow("Exception writing epoch_times.csv."):
                        append_csv_row(profile_dir + "epoch_times.csv", {
                            "epoch": epoch + 1,
                            **{k: round(v, 4) for k, v in seg.items()},
                            "total_s": round(sum(seg.values()), 4)})
                if on_epoch is not None:
                    on_epoch(epoch, row, state)
            except Exception as exc:  # noqa: BLE001 - reference error envelope
                handle_exception(exc, f"Exception occured in epoch {epoch}.")

        if any(lg.do_last for lg in host_loggers):
            run_host_loggers(num_epochs, last=True)

        if calculator is not None and calculator.requires_last_pass:
            with swallow("Exception in last pass."):
                eval_train = train_data if device_augment is None else (
                    {k: np.asarray(v) for k, v in batch.items()}
                    for batch in _augmented_loader(train_data))
                metrics_state = calculator.init_state()
                _, metrics_state = run_epoch(eval_step, state, metrics_state,
                                             eval_train, accumulation_scale,
                                             train=False, mesh=mesh,
                                             threaded_prefetch=threaded_prefetch)
                calculator.finalize_epoch(metrics_state)
                if log_to_device and cm_do_last:
                    # 'last' CM export over final weights (reference
                    # MultiClassConfusionMatrix.save with last=True)
                    with swallow("Exception logging the confusion matrix."):
                        _export_confusion_matrix(
                            calculator, metrics_state, destination,
                            num_epochs, config_dict, train=True)
                metrics_state = calculator.init_state()
                _, metrics_state = run_epoch(eval_step, state, metrics_state,
                                             val_data, accumulation_scale,
                                             train=False, mesh=mesh,
                                             threaded_prefetch=threaded_prefetch)
                calculator.finalize_epoch(metrics_state)
                if log_to_device and cm_do_last:
                    with swallow("Exception logging the confusion matrix."):
                        _export_confusion_matrix(
                            calculator, metrics_state, destination,
                            num_epochs, config_dict)

        if calculator is not None:
            # reference train_model.py:294: end-of-training metric export hooks
            # (e.g. the combined classwise-history plots, which read
            # epoch_logs.csv back from the run directory)
            with swallow("Exception in the end-of-training metric hooks."):
                calculator.evaluate_at_end(
                    save_path=destination,
                    extensions=config_dict.get_str_tuple(
                        "meta/technical/export_plots_as") or ("png",))

        if test_data:
            try:
                metrics_state = _init_metrics()
                _, metrics_state = run_epoch(eval_step, state, metrics_state,
                                             test_data, accumulation_scale,
                                             train=False, mesh=mesh,
                                             threaded_prefetch=threaded_prefetch)
                test_row = _finalize(metrics_state)
                if log_to_device:
                    append_csv_row(destination + "test_logs.csv", test_row)
            except Exception as exc:  # noqa: BLE001
                handle_exception(
                    exc, "Exception occured while evaluating the test data.")

    finally:
        # ALWAYS retire the timer worker and drain the checkpoint
        # queue - an exception unwinding the epoch region (e.g. a
        # KeyboardInterrupt, which the per-epoch envelope
        # deliberately does not catch) must not kill the daemon
        # worker with queued last/best/optimizer writes unwritten,
        # leaving epoch_logs.csv ahead of the on-disk state.  On a CLEAN
        # exit close() errors RAISE: the per-epoch poll() runs right
        # after submission (before the worker drained that epoch), so a
        # failure in the LAST epoch's last/best/optimizer/stamp writes
        # is only observable here — swallowing it would report a
        # successful run whose final checkpoints never landed.  When an
        # exception is already unwinding, close() errors are logged
        # instead: raising would mask the in-flight exception.
        _stop_timer()
        if async_writer is not None:
            if sys.exc_info()[0] is not None:
                with swallow("Exception draining queued async checkpoint "
                             "writes."):
                    async_writer.close()
            else:
                async_writer.close()
    return state
