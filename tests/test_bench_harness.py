"""bench.py capture-proofing: resume file + metric ordering.

Round 2 lost its headline number to a driver timeout during a tunnel
outage (VERDICT r2 §weak 1); these tests pin the round-3 fixes without
touching any device: the headline is measured FIRST and emitted LAST,
measured lines persist to (and replay from) a resume file, and stale or
knob-mismatched cache entries are ignored.
"""
import importlib
import json
import os
import sys


def _fresh_bench(monkeypatch, tmp_path, **env):
    monkeypatch.setenv("BENCH_RESUME_FILE", str(tmp_path / "resume.json"))
    for key, value in env.items():
        monkeypatch.setenv(key, value)
    sys.modules.pop("bench", None)
    sys.path.insert(0, "/root/repo")
    import bench
    return importlib.reload(bench)


def test_measurement_order_headline_first(monkeypatch, tmp_path):
    bench = _fresh_bench(monkeypatch, tmp_path)
    order = bench._measurement_order()
    assert order[0] == "unet256_train"
    assert set(order) == set(bench.ALL_METRICS)


def test_output_order_headline_last(monkeypatch, tmp_path):
    bench = _fresh_bench(monkeypatch, tmp_path)
    order = bench._output_order()
    assert order[-1] == "unet256_train"
    assert set(order) == set(bench.ALL_METRICS)


def test_orders_respect_metric_selection(monkeypatch, tmp_path):
    bench = _fresh_bench(monkeypatch, tmp_path,
                         BENCH_METRICS="swin224_eval,unet256_train")
    assert bench._measurement_order() == ["unet256_train", "swin224_eval"]
    assert bench._output_order() == ["swin224_eval", "unet256_train"]


def test_resume_roundtrip_with_provenance(monkeypatch, tmp_path):
    bench = _fresh_bench(monkeypatch, tmp_path)
    line = {"metric": "unet256_train_images_per_sec_per_chip",
            "value": 268.0, "unit": "images/sec/chip", "vs_baseline": 1000.0}
    bench._record_result("unet256_train", line)
    got = bench._valid_resume_entries()
    assert got["unet256_train"]["value"] == 268.0
    # provenance lands in extras so the artifact is self-describing
    assert "measured_at" in got["unet256_train"]["extras"]


def test_resume_invalidated_by_knob_change(monkeypatch, tmp_path):
    bench = _fresh_bench(monkeypatch, tmp_path)
    bench._record_result("unet256_train", {"metric": "m", "value": 1.0,
                                           "unit": "u"})
    assert "unet256_train" in bench._valid_resume_entries()
    bench = _fresh_bench(monkeypatch, tmp_path, BENCH_BATCH="32")
    assert bench._valid_resume_entries() == {}


def test_resume_invalidated_by_ttl(monkeypatch, tmp_path):
    bench = _fresh_bench(monkeypatch, tmp_path)
    bench._record_result("swin224_train", {"metric": "m", "value": 2.0,
                                           "unit": "u"})
    data = json.load(open(os.environ["BENCH_RESUME_FILE"]))
    data["swin224_train"]["ts"] -= bench.RESUME_TTL_S + 1
    json.dump(data, open(os.environ["BENCH_RESUME_FILE"], "w"))
    assert bench._valid_resume_entries() == {}


def test_resume_invalidated_by_extra_knob_mismatch(monkeypatch, tmp_path):
    """A BENCH_CLI_PLATFORM=cpu validation run must never be replayed as
    a TPU number (and vice versa) — the cache-poisoning hole from the
    round-3 review."""
    bench = _fresh_bench(monkeypatch, tmp_path, BENCH_CLI_PLATFORM="cpu")
    bench._record_result("covidqu256_cli_epoch",
                         {"metric": "m", "value": 4.0, "unit": "u"})
    assert "covidqu256_cli_epoch" in bench._valid_resume_entries()
    bench = _fresh_bench(monkeypatch, tmp_path)
    monkeypatch.delenv("BENCH_CLI_PLATFORM", raising=False)
    bench = importlib.reload(bench)
    assert bench._valid_resume_entries() == {}


def test_resume_invalidated_by_source_change(monkeypatch, tmp_path):
    """A compute-path source edit invalidates cached numbers (the old
    commit's throughput must not be re-emitted as the new commit's)."""
    bench = _fresh_bench(monkeypatch, tmp_path)
    bench._record_result("unet256_train", {"metric": "m", "value": 5.0,
                                           "unit": "u"})
    data = json.load(open(os.environ["BENCH_RESUME_FILE"]))
    assert data["unet256_train"]["src_hash"] == bench._src_hash()
    data["unet256_train"]["src_hash"] = "0" * 16
    json.dump(data, open(os.environ["BENCH_RESUME_FILE"], "w"))
    assert bench._valid_resume_entries() == {}


def test_legacy_resume_entries_still_accepted(monkeypatch, tmp_path):
    """Entries written before the provenance fields existed (no
    src_hash/extra_knobs) stay usable — a mid-round harness upgrade must
    not throw away an already-captured headline."""
    bench = _fresh_bench(monkeypatch, tmp_path)
    bench._record_result("unet256_train", {"metric": "m", "value": 6.0,
                                           "unit": "u"})
    data = json.load(open(os.environ["BENCH_RESUME_FILE"]))
    del data["unet256_train"]["src_hash"]
    del data["unet256_train"]["extra_knobs"]
    json.dump(data, open(os.environ["BENCH_RESUME_FILE"], "w"))
    assert "unet256_train" in bench._valid_resume_entries()


def test_corrupt_resume_file_is_ignored(monkeypatch, tmp_path):
    bench = _fresh_bench(monkeypatch, tmp_path)
    with open(os.environ["BENCH_RESUME_FILE"], "w") as fh:
        fh.write("{not json")
    assert bench._valid_resume_entries() == {}
    # and recording over it recovers
    bench._record_result("swin224_eval", {"metric": "m", "value": 3.0,
                                          "unit": "u"})
    assert "swin224_eval" in bench._valid_resume_entries()


def test_resume_invalidated_by_workload_change(monkeypatch, tmp_path):
    """bench.py itself is excluded from _src_hash, but the workload
    DEFINITIONS live in bench.py — editing a metric's workload function
    must invalidate that metric's cache entry (and only that one)."""
    bench = _fresh_bench(monkeypatch, tmp_path)
    for name in ("unet256_train", "swin224_eval"):
        bench._record_result(name, {"metric": "m", "value": 5.0,
                                    "unit": "u"})
    data = json.load(open(os.environ["BENCH_RESUME_FILE"]))
    assert (data["unet256_train"]["workload_hash"]
            == bench._workload_hash("unet256_train"))
    data["unet256_train"]["workload_hash"] = "0" * 16
    json.dump(data, open(os.environ["BENCH_RESUME_FILE"], "w"))
    got = bench._valid_resume_entries()
    assert "unet256_train" not in got
    assert "swin224_eval" in got


def test_workload_hash_covers_every_metric(monkeypatch, tmp_path):
    """Each metric must map to real bench.py functions (a renamed
    function silently degrading to name-only hashing would defeat the
    pin)."""
    bench = _fresh_bench(monkeypatch, tmp_path)
    assert set(bench._WORKLOAD_FUNCS) == set(bench.ALL_METRICS)
    for fns in bench._WORKLOAD_FUNCS.values():
        for fn in fns + bench._WORKLOAD_COMMON:
            assert callable(getattr(bench, fn)), fn
    # distinct workloads hash distinctly
    hashes = {bench._workload_hash(m) for m in bench.ALL_METRICS}
    assert len(hashes) >= len(bench.ALL_METRICS) - 1  # swin train/eval share


def test_streaming_capture_survives_burst_then_hang(monkeypatch, tmp_path):
    """The round-3 review's capture hole: a child that writes several
    lines in one burst and then hangs must still have ALL burst lines
    teed + parsed before the timeout kill (buffered readline after
    select used to strand all but the first)."""
    bench = _fresh_bench(monkeypatch, tmp_path)
    child = tmp_path / "burst.py"
    child.write_text(
        "import json, sys, time\n"
        "sys.stdout.write(json.dumps({'note': 'warmup'}) + '\\n')\n"
        "sys.stdout.write(json.dumps({'metric': 'm', 'value': 42.0,\n"
        "                             'unit': 'u'}) + '\\n')\n"
        "sys.stdout.flush()\n"
        "time.sleep(60)\n")
    import sys as _sys
    import time as _time
    t0 = _time.time()
    rc, line = bench._run_child_streaming(
        [_sys.executable, str(child)], env=dict(os.environ),
        cwd=str(tmp_path), timeout=8.0)
    assert _time.time() - t0 < 30
    assert rc != 0          # killed at timeout
    assert line is not None and line["value"] == 42.0


def test_cli_grandchild_budget_env(monkeypatch, tmp_path):
    """bench_cli_epoch's grandchild timeout honors the parent's ACTUAL
    per-attempt budget (BENCH_ATTEMPT_BUDGET_S), not just the static
    BENCH_METRIC_TIMEOUT_S — near the deadline the two differ by up to
    19 minutes and the grandchild used to outlive its killer."""
    bench = _fresh_bench(monkeypatch, tmp_path,
                         BENCH_METRIC_TIMEOUT_S="1200",
                         BENCH_ATTEMPT_BUDGET_S="300")
    budget = min(float(os.environ.get("BENCH_METRIC_TIMEOUT_S", "1200")),
                 float(os.environ.get("BENCH_ATTEMPT_BUDGET_S", "inf")))
    assert max(120.0, budget - 60.0) == 240.0
    src = open("/root/repo/bench.py").read()
    assert "BENCH_ATTEMPT_BUDGET_S" in src
    assert '"timeout", "-k"' in src  # self-destruct wrapper
