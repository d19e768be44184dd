"""Checkpoint I/O: native msgpack checkpoints + torch ``.pt`` ingestion.

Capability parity with the reference's checkpoint roles (SURVEY.md §5.4):
``last`` / ``best`` / ``model_state_dict_epoch_{j}`` model checkpoints plus
optimizer/scheduler state, and the pretraining->downstream encoder-transfer
loading path (reference ``unet_models.py:555-588``: strip the
``layers.0.`` prefix of a FeedForwardModel checkpoint and load it into the
U-Net encoder).

Native format: flax msgpack of plain nested dicts (host numpy), one file per
role — fast, dependency-free, and mesh-agnostic (params are replicated or
re-sharded on restore by the caller's shardings).
"""
from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import numpy as np
from flax import serialization

__all__ = [
    "save_params_file", "AsyncCheckpointer", "load_params_file",
    "load_encoder_params",
    "load_encoder_variables", "save_state_file", "load_state_file",
    "load_torch_state_dict",
]


def _to_host(tree):
    # ONE batched device->host transfer for the whole tree: a per-leaf
    # np.asarray would cost a host<->device round trip per leaf (hundreds
    # per checkpoint) over the remote TPU tunnel.  Host leaves (ints,
    # numpy) pass through device_get unchanged.  Cross-host-sharded leaves
    # (multi-host TP/spatial state) are collectively all-gathered first —
    # in multi-host runs the save entry points must therefore be reached
    # by EVERY process before any main-process write gate (loop.py does).
    from ..parallel.mesh import gather_tree_to_host
    return gather_tree_to_host(tree)


def encode_state(params) -> bytes:
    """Serialize a (host or device) pytree to msgpack bytes once — callers
    writing the same state to several files (last/best/epoch-tagged in one
    epoch) encode once and fan the blob out."""
    # to_state_dict converts NamedTuple pytrees (optax states) to dicts
    return serialization.msgpack_serialize(
        serialization.to_state_dict(_to_host(params)))


def write_bytes_atomic(path: str, blob: bytes) -> None:
    """Atomic tmp+fsync+rename write: a crash mid-write must not leave a
    truncated last_model_state_dict.msgpack that breaks --continued
    resume.  The data fsync BEFORE the rename matters for system (not
    just process) crashes: journaling filesystems may make the
    metadata-only rename durable while the data pages are still dirty,
    which would replace the previous good checkpoint with a
    zero-length file on power loss.  The directory fsync afterwards
    makes the rename itself durable."""
    dirname = os.path.dirname(path) or "."
    os.makedirs(dirname, exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "wb") as fh:
        fh.write(blob)
        fh.flush()
        os.fsync(fh.fileno())
    os.replace(tmp, path)
    try:
        dir_fd = os.open(dirname, os.O_RDONLY)
        try:
            os.fsync(dir_fd)
        finally:
            os.close(dir_fd)
    except OSError:  # platforms/filesystems without directory fsync
        pass


def save_params_file(path: str, params) -> None:
    write_bytes_atomic(path, encode_state(params))


class AsyncCheckpointer:
    """Background-thread checkpoint writer (``async_checkpointing: true``).

    The device→host transfer, msgpack encode and disk write ALL move to
    one worker thread, so the epoch loop keeps dispatching while the
    checkpoint's D2H drains — on a slow device link the state-sized D2H
    (not the step) dominates the epoch tail, and pushing it across the
    epoch boundary overlaps it with the next epoch's compute.  Two
    requirements on the caller: (1) the submitted device buffers must not
    be donated to a later jitted call (jax.Arrays are immutable and
    thread-safe to read, but donation invalidates them — the training
    loop steps with ``donate=False``); (2) cross-host-sharded leaves are
    detected and gathered ON the caller's thread (the gather is a
    collective every process must join; a worker-thread collective would
    race the step's).  Writes to the same path are serialized in
    submission order (a single worker queue), and atomic via rename, so a
    reader of ``last_model_state_dict.msgpack`` never sees a torn file.
    Call ``wait()`` before reading back or at end of training.
    """

    def __init__(self):
        import queue
        import threading
        # bounded: a worker lagging N epochs behind would otherwise pin N
        # epochs' device state alive (each queued tree holds jax.Array
        # refs until written) — a full queue back-pressures the epoch
        # loop instead, which is the correct failure mode
        self._queue = queue.Queue(maxsize=8)
        self._errors: list = []
        self._thread = threading.Thread(target=self._worker, daemon=True)
        self._thread.start()

    def _worker(self):
        while True:
            item = self._queue.get()
            if item is None:
                self._queue.task_done()
                return
            paths, tree = item
            blob = None
            for path in paths:
                try:
                    if blob is None:    # gather + encode ONCE per submission
                        blob = encode_state(tree)
                    write_bytes_atomic(path, blob)
                except Exception as e:  # surfaced on poll()/wait()
                    self._errors.append((path, e))
            del tree, item  # drop the device refs before the next get()
            self._queue.task_done()

    def save(self, path: str, params) -> None:
        self.save_many([path], params)

    def save_many(self, paths, params) -> None:
        """One submission writing the SAME state to every path in *paths*
        (an epoch's last/best/epoch-tagged sinks): the worker gathers and
        encodes the tree once and fans the bytes out.  Only
        cross-host-sharded leaves are gathered here on the caller's
        thread (collective — see the class docstring); fully-addressable
        device trees ride the queue as-is so their D2H overlaps later
        epochs."""
        if any(isinstance(leaf, jax.Array) and not leaf.is_fully_addressable
               for leaf in jax.tree_util.tree_leaves(params)):
            params = _to_host(params)
        self._queue.put((list(paths), params))

    def _raise_errors(self) -> None:
        if not self._errors:
            return
        errors, self._errors = self._errors, []
        detail = "; ".join(f"{path}: {err!r}" for path, err in errors)
        raise RuntimeError(
            f"{len(errors)} async checkpoint write(s) failed: {detail}"
        ) from errors[0][1]

    def poll(self) -> None:
        """Raise any background errors accumulated SO FAR without
        blocking.  The training loop calls this once per epoch inside
        its catch-log-continue envelope, so a failing disk surfaces on
        the next epoch (like a sync-mode write failure would) instead
        of only as one fatal error after the last epoch."""
        self._raise_errors()

    def wait(self) -> None:
        """Block until all submitted writes hit disk; raise every
        accumulated background error (aggregated — a second failing
        path must not be silently dropped)."""
        self._queue.join()
        self._raise_errors()

    def close(self) -> None:
        self._queue.put(None)
        self.wait()     # join covers the sentinel too (FIFO queue)


def _is_torch_file(path: str) -> bool:
    return str(path).endswith((".pt", ".pth"))


def load_params_file(path: str):
    """Load a parameter tree from msgpack (native) or torch ``.pt``."""
    if _is_torch_file(path):
        return load_torch_state_dict(path)
    with open(path, "rb") as fh:
        return serialization.msgpack_restore(fh.read())


def _encoder_subtree(tree, path: str):
    for key in ("layers_0", "layers.0", "enc"):
        if key in tree:
            return tree[key]
    # torch checkpoints unflatten 'layers.0.*' to {'layers': {'0': ...}}
    layers = tree.get("layers")
    if isinstance(layers, dict) and "0" in layers:
        return layers["0"]
    # torch-style flat dict {'layers.0.xxx': tensor}
    flat = {k[len("layers.0."):]: v for k, v in tree.items()
            if isinstance(k, str) and k.startswith("layers.0.")}
    if flat:
        return _unflatten_torch_keys(flat)
    raise KeyError(f"checkpoint {path} has no encoder (layers_0) subtree; "
                   f"top-level keys: {list(tree)[:8]}")


def load_encoder_params(path: str):
    """Extract the encoder (first layer) params from a pretraining
    checkpoint — the FeedForwardModel's ``layers_0`` subtree."""
    return load_encoder_variables(path)[0]


def load_encoder_variables(path: str):
    """(params, batch_stats-or-None) of the encoder subtree.

    Native checkpoints (``loop.py`` save_model) carry BN running stats
    alongside the params — an encoder transferred without them runs eval
    forwards against init statistics (mean 0 / var 1)."""
    raw = load_params_file(path)
    tree, stats = raw, None
    if isinstance(raw, dict) and "params" in raw \
            and isinstance(raw["params"], dict):
        tree = raw["params"]
        batch_stats = raw.get("batch_stats")
        if isinstance(batch_stats, dict):
            try:
                stats = _encoder_subtree(batch_stats, path)
            except KeyError:
                stats = None
    return _encoder_subtree(tree, path), stats


# ---------------------------------------------------------------------------
# full training-state checkpoints
# ---------------------------------------------------------------------------

def save_state_file(path: str, state: Dict[str, Any]) -> None:
    """Save a {'params', 'batch_stats', 'opt_state', 'step', ...} dict."""
    save_params_file(path, state)


def load_state_file(path: str):
    return load_params_file(path)


# ---------------------------------------------------------------------------
# torch interop
# ---------------------------------------------------------------------------

def _unflatten_torch_keys(flat: Dict[str, Any]) -> Dict[str, Any]:
    tree: Dict[str, Any] = {}
    for key, value in flat.items():
        parts = key.split(".")
        node = tree
        for part in parts[:-1]:
            node = node.setdefault(part, {})
        node[parts[-1]] = np.asarray(value)
    return tree


def load_torch_state_dict(path: str):
    """Load a torch ``.pt`` state dict as a nested numpy tree.

    Conv weights are transposed OIHW -> HWIO and linear weights (out, in) ->
    (in, out) so rank decides the convention, matching how the reference's
    released encoder weights map onto this framework's NHWC modules.
    Key-level renaming (torch module names -> flax subtree names) is the
    caller's job.
    """
    import torch  # CPU build is available in the image

    state = torch.load(path, map_location="cpu")
    if hasattr(state, "state_dict"):
        state = state.state_dict()
    flat = {}
    for key, tensor in state.items():
        value = tensor.detach().cpu().numpy() \
            if hasattr(tensor, "detach") else np.asarray(tensor)
        if value.ndim == 4:  # conv kernel OIHW -> HWIO
            value = value.transpose(2, 3, 1, 0)
        elif value.ndim == 2:  # linear (out, in) -> (in, out)
            value = value.transpose(1, 0)
        flat[key] = value
    return _unflatten_torch_keys(flat)
