"""On-chip transferability (robustness) sweep -> ROBUSTNESS_TPU.json.

BASELINE configs[4] is the reference's transferability sweep; its
published output space is ``/root/reference/results/
robustness_scores.csv`` (25 200 rows, schema from ``robustness/
eval.py:7-70``).  ``robustness/`` has golden-value unit tests vs torch
and a CLI e2e test, but no artifact showed the sweep EXECUTING on the
real chip.  This tool drives the real CLI
(``python -m medsegpretrainimagenet_tpu.robustness cfg.yaml``) on TPU
over the three translated encoder families — u-net_encoder, resnet50
(DeepResNet v1), swin_transformer (Swin U-Net encoder) — at the
reference's full probe geometry (224², the pretraining resolution), full
metric x margin x level x pooled axes, on a synthetic COVID-QU probe
store (no Zenodo weights are shipped with the reference; random-init
encoders exercise the identical compute path).

Emits ROBUSTNESS_TPU.json: wall time, row count, a column-for-column
schema-equality check against the reference CSV header, per-encoder
level coverage, value sanity (finite, margin-monotone row presence), and
provenance (device, code rev, timestamp).

Usage:  python tools/robustness_tpu.py [output.json]
"""
from __future__ import annotations

import csv
import json
import os
import subprocess
import sys
import tempfile
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)

REFERENCE_CSV = "/root/reference/results/robustness_scores.csv"

def build_encoders(size: int):
    """The three reference encoder families at probe resolution *size*.

    The swin geometry (patch 4, window 7, depth 3) only tiles at 224 —
    the reference's pretraining resolution and the artifact run's
    setting; smaller smoke sizes shrink the swin depth/channels so the
    token grid stays divisible (window falls back to the resolution)."""
    swin_depth, swin_channels, swin_heads = 3, [96, 192, 384, 768], \
        [3, 6, 12, 24]
    if size < 224:
        swin_depth, swin_channels, swin_heads = 1, [96, 192], [3, 6]
    return [
        {"name": "u-net_encoder", "pretraining_scheme": "simple_training",
         "pretraining_length": 0,
         "model": {"segmentation.models.UNet_encoder": {
             "in_channel_size": 3}}},
        {"name": "resnet50", "pretraining_scheme": "simple_training",
         "pretraining_length": 0,
         "model": {"classification.models.DeepResNet": {
             "bias": False, "version": "v1"}}},
        {"name": "swin_transformer",
         "pretraining_scheme": "simple_training",
         "pretraining_length": 0,
         "model": {"segmentation.models.UNet_encoder": {
             "in_channel_size": 3,
             "channels": swin_channels,
             "change_channel_in_block": False,
             "depth": swin_depth, "width": 2,
             "trainable_downsampling": True,
             "linear_channel_mapping": True,
             "stochastic_depth_rate": 0.1,
             "basic_block": {
                 "segmentation.models.blocks.SwinTransformerBlock": {
                     "img_size": size, "patch_size": 4,
                     "num_heads_layers": swin_heads}},
             "downsampling": {
                 "segmentation.models.blocks.PatchMerging": {
                     "norm_layer": "torch.nn.LayerNorm"}},
             "stem": {
                 "segmentation.models.blocks.PatchEmbed": {
                     "patch_size": 4}}}}},
    ]

METRICS = ["cosine_distance", "l2_loss", "inv_pearson_corr"]
MARGINS = [0.0, 0.25, 0.5, 0.75, 1.0]
LEVELS = [int(x) for x in
          os.environ.get("ROB_LEVELS", "1,2,3,4").split(",")]
POOLED = [False, True]


def main(out_path: str = os.path.join(REPO, "ROBUSTNESS_TPU.json")) -> int:
    import yaml

    if os.environ.get("MST_PLATFORM"):
        # metadata must describe the platform the CHILD sweep ran on
        import jax
        jax.config.update("jax_platforms", os.environ["MST_PLATFORM"])

    import numpy as np

    size = int(os.environ.get("ROB_SIZE", "224"))
    n_probe = int(os.environ.get("ROB_PROBES", "32"))
    workdir = tempfile.mkdtemp(prefix="mst_rob_tpu_")
    encoders = build_encoders(size)
    rng = np.random.default_rng(0)
    root = os.path.join(workdir,
                        "data/COVID_QU/Inf_segm/data arrays/COVID-19")
    for part, n in (("train and val", n_probe), ("test", 2)):
        d = os.path.join(root, part)
        os.makedirs(d, exist_ok=True)
        np.save(os.path.join(d, "imgs.npy"),
                rng.integers(0, 256, (n, 1, size, size), dtype=np.uint8))
        masks = np.zeros((n, 1, size, size), np.uint8)
        masks[:, :, size // 4:-size // 4, size // 4:-size // 4] = 2
        np.save(os.path.join(d, "inf_masks.npy"), masks)

    out_csv = os.path.join(workdir, "robustness_scores.csv")
    cfg = {
        "data": {"COVID-QU": {
            "segmentation.datasets.COVIDQUDataset": {
                "lung_or_infection": "inf", "image_sizes": size,
                "validate_on_test": True}}},
        "probe_images": n_probe,
        "encoders": encoders,
        "metrics": METRICS,
        "margins": MARGINS,
        "levels": LEVELS,
        "pooled": POOLED,
        "batch_size": min(32, n_probe),
        "output": out_csv,
        "seed": 0,
    }
    cfg_path = os.path.join(workdir, "sweep.yaml")
    with open(cfg_path, "w") as fh:
        yaml.safe_dump(cfg, fh)

    env = {**os.environ, "MST_DATA_DIR": os.path.join(workdir, "data")}
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    t0 = time.time()
    proc = subprocess.run(
        [sys.executable, "-m", "medsegpretrainimagenet_tpu.robustness",
         cfg_path],
        env=env, cwd=workdir, capture_output=True, text=True,
        timeout=float(os.environ.get("ROB_TIMEOUT_S", "2400")))
    wall = time.time() - t0
    print(proc.stdout[-2000:])
    if proc.returncode != 0:
        print(proc.stderr[-3000:], file=sys.stderr)
        return 1

    with open(out_csv) as fh:
        reader = csv.DictReader(fh)
        header = reader.fieldnames
        rows = list(reader)
    with open(REFERENCE_CSV) as fh:
        ref_header = next(csv.reader(fh))

    # per-encoder level availability (the reference CSV likewise has 4
    # swin levels vs 5 for resnet50/u-net): an encoder of depth d
    # exposes [*d skips, final] = d+1 activation entries, so requested
    # levels clamp at d (u-net depth 4, resnet50 4 stages, swin depth 3
    # at 224 / 1 at smoke sizes)
    swin_depth = 3 if size >= 224 else 1
    expected_levels = {
        "u-net_encoder": [lv for lv in LEVELS if lv <= 4],
        "resnet50": [lv for lv in LEVELS if lv <= 4],
        "swin_transformer": [lv for lv in LEVELS if lv <= swin_depth],
    }
    expected = (len(cfg["data"]) * len(METRICS) * len(MARGINS)
                * len(POOLED)
                * sum(len(v) for v in expected_levels.values()))
    values = [float(r["robustness"]) for r in rows]
    by_encoder = {}
    for r in rows:
        by_encoder.setdefault(r["encoder"], set()).add(int(r["level"]))

    # margin monotonicity spot check: score = mean max(0, pos - neg +
    # margin) (eval.py:46-48) is non-DECREASING in margin for a fixed
    # cell
    mono_checked, mono_ok = 0, 0
    cells = {}
    for r in rows:
        key = (r["metric"], r["encoder"], r["level"], r["pooled"])
        cells.setdefault(key, []).append(
            (float(r["margin"]), float(r["robustness"])))
    for series in cells.values():
        series.sort()
        mono_checked += 1
        if all(b[1] >= a[1] - 1e-6 for a, b in zip(series, series[1:])):
            mono_ok += 1

    import jax
    artifact = {
        "ok": (header == ref_header and len(rows) == expected
               and all(np.isfinite(values))
               and {k: sorted(v) for k, v in by_encoder.items()}
               == expected_levels),
        "expected_levels_per_encoder": expected_levels,
        "rows": len(rows),
        "rows_expected": expected,
        "schema_equal_to_reference": header == ref_header,
        "header": header,
        "wall_s": round(wall, 1),
        "probe_images": n_probe,
        "probe_size": size,
        "encoders": sorted(by_encoder),
        "levels_per_encoder": {k: sorted(v)
                               for k, v in by_encoder.items()},
        "metrics": METRICS, "margins": MARGINS, "pooled": POOLED,
        "finite_values": bool(np.all(np.isfinite(values))),
        "value_range": [round(min(values), 6), round(max(values), 6)],
        "margin_monotone_cells": f"{mono_ok}/{mono_checked}",
        "sample_rows": rows[:3],
        "note": "random-init encoders (reference ships no weights); "
                "same compute path, synthetic COVID-QU probe store; "
                "reference output space: results/robustness_scores.csv "
                "(25200 rows), schema from robustness/eval.py:7-70",
        "device": str(jax.devices()[0].device_kind
                      if jax.devices() else "unknown"),
        "backend": jax.default_backend(),
        "measured_at": time.strftime("%Y-%m-%dT%H:%M:%S", time.gmtime()),
        "code_rev": subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"], cwd=REPO,
            capture_output=True, text=True).stdout.strip(),
    }
    with open(out_path, "w") as fh:
        json.dump(artifact, fh, indent=1)
    print(json.dumps({k: artifact[k] for k in
                      ("ok", "rows", "schema_equal_to_reference",
                       "wall_s", "margin_monotone_cells", "backend")}))
    import shutil
    shutil.rmtree(workdir, ignore_errors=True)
    return 0 if artifact["ok"] else 2


if __name__ == "__main__":
    sys.exit(main(*sys.argv[1:]))
