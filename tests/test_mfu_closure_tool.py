"""Off-TPU tests for tools/mfu_closure.py's trace parsing — the
aggregation math behind MFU_CLOSURE.json's per-category roofline split
(time shares, achieved TF/s and GB/s) against a synthetic Chrome trace.
"""
import gzip
import json
import os
import sys

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

from mfu_closure import _trace_split  # noqa: E402


def _write_trace(tmp_path, events):
    d = tmp_path / "plugins" / "profile" / "run1"
    d.mkdir(parents=True)
    with gzip.open(d / "host.trace.json.gz", "wt") as fh:
        json.dump({"traceEvents": events}, fh)
    return str(tmp_path)


def _meta(pid, tid, name):
    out = [{"ph": "M", "pid": pid, "name": "process_name",
            "args": {"name": "/device:TPU:0"}}]
    out.append({"ph": "M", "pid": pid, "tid": tid, "name": "thread_name",
                "args": {"name": name}})
    return out


def _op(pid, tid, name, dur_us, cat, flops=0, byts=0):
    return {"ph": "X", "pid": pid, "tid": tid, "ts": 0, "dur": dur_us,
            "name": name,
            "args": {"hlo_category": cat, "model_flops": str(flops),
                     "bytes_accessed": str(byts)}}


def test_category_aggregation(tmp_path):
    events = _meta(3, 3, "XLA Ops") + _meta(3, 1, "Steps") + [
        # 2 steps worth: conv 2x500us with 1e9 flops each,
        # elementwise 2x250us with 1e8 bytes each
        _op(3, 3, "conv.1", 500.0, "convolution fusion", flops=1e9),
        _op(3, 3, "conv.1", 500.0, "convolution fusion", flops=1e9),
        _op(3, 3, "fuse.1", 250.0, "loop fusion", byts=1e8),
        _op(3, 3, "fuse.1", 250.0, "loop fusion", byts=1e8),
        # an event on a non-op lane must be ignored
        _op(3, 1, "step", 10_000.0, "?", flops=1e12),
    ]
    split = _trace_split(_write_trace(tmp_path, events), steps=2)
    assert split["device_ms_per_step"] == 0.75           # (1000+500)/2 us
    cats = split["categories"]
    assert set(cats) == {"convolution fusion", "loop fusion"}
    conv = cats["convolution fusion"]
    assert conv["time_share"] == round(2 / 3, 4)
    assert conv["ms_per_step"] == 0.5
    # 2e9 flops over 1000 us -> 2 TF/s
    assert conv["achieved_tflops"] == 2.0
    lf = cats["loop fusion"]
    assert lf["achieved_gbps"] == 400                    # 2e8 B / 500 us
    # top_ops: name, category, ms/step, share
    names = [t[0] for t in split["top_ops"]]
    assert names == ["conv.1", "fuse.1"]
    assert split["top_ops"][0][1] == "convolution fusion"


def test_tiny_categories_dropped_but_counted_in_total(tmp_path):
    events = _meta(3, 3, "XLA Ops") + [
        _op(3, 3, "big", 1000.0, "convolution fusion", flops=1e9),
        _op(3, 3, "tiny", 1.0, "copy-start"),            # 0.1% < 0.2% cut
    ]
    split = _trace_split(_write_trace(tmp_path, events), steps=1)
    assert "copy-start" not in split["categories"]
    # but the total and the share denominator include it (1.001 ms
    # rounded to 2 digits)
    assert split["device_ms_per_step"] == 1.0
    assert split["categories"]["convolution fusion"]["time_share"] < 1.0


def test_no_trace_returns_none(tmp_path):
    assert _trace_split(str(tmp_path), steps=1) is None


def test_trace_without_op_lane_returns_none(tmp_path):
    events = _meta(3, 1, "Steps") + [_op(3, 1, "step", 10.0, "?")]
    assert _trace_split(_write_trace(tmp_path, events), steps=1) is None


def test_swin_mirror_pinned_to_bench_workload():
    """_swin_step_setup hand-mirrors bench.bench_swin224 (a refactor
    would invalidate bench's captured resume entries via the per-metric
    workload hash, so the sources stay separate).  This pin turns the
    docstring's "keep in sync" into a suite failure: editing EITHER
    function fails here until the other is re-reviewed and both hashes
    are refreshed."""
    import hashlib
    import inspect

    import bench
    import mfu_closure

    def h(fn):
        return hashlib.sha256(inspect.getsource(fn).encode()) \
            .hexdigest()[:16]

    assert h(bench.bench_swin224) == "e1e0bafd8e22776c", (
        "bench.bench_swin224 changed: re-sync tools/mfu_closure.py:"
        "_swin_step_setup (batch/dtype/loss/donation must match), then "
        "update both pinned hashes here")
    assert h(mfu_closure._swin_step_setup) == "6cea3f6961fe2831", (
        "_swin_step_setup changed: verify it still mirrors "
        "bench.bench_swin224, then update the pinned hash")


def test_merge_preserves_per_workload_provenance(tmp_path, monkeypatch):
    """A partial run must stamp its own workloads with the current
    rev/device and give carried-over pre-provenance entries THEIR file's
    top-level stamp — not re-stamp old measurements as current."""
    import mfu_closure

    old = {"measured_at": "2026-01-01T00:00:00", "code_rev": "oldrev",
           "device": "TPU v5 lite",
           "workloads": {"unet256_train": {"mfu": 0.46}}}
    art = tmp_path / "MFU_CLOSURE.json"
    art.write_text(json.dumps(old))
    monkeypatch.setattr(mfu_closure, "HERE", str(tmp_path))
    monkeypatch.setattr(mfu_closure.bench, "_git_rev", lambda: "newrev")
    monkeypatch.setattr(
        mfu_closure, "_closure",
        lambda name, setup: {"mfu": 0.07})

    class _Dev:
        device_kind = "FakeTPU"

    import jax
    monkeypatch.setattr(jax, "devices", lambda *a: [_Dev()])
    monkeypatch.setattr(sys, "argv", ["mfu_closure.py", "swin"])
    mfu_closure.main()

    out = json.loads(art.read_text())
    assert out["code_rev"] == "newrev"
    swin = out["workloads"]["swin224_train"]
    assert swin["provenance"]["code_rev"] == "newrev"
    assert swin["provenance"]["device"] == "FakeTPU"
    unet = out["workloads"]["unet256_train"]
    assert unet["provenance"] == {"measured_at": "2026-01-01T00:00:00",
                                  "code_rev": "oldrev",
                                  "device": "TPU v5 lite"}
