"""Off-TPU tests for tools/parity_tpu.py's pure logic: per-family scale
resolution, summary math (deltas, degeneracy guard, acceptance proxy),
and the measured-at scale provenance that must survive carry-over."""
import json
import os
import sys

import pytest

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

import parity_tpu  # noqa: E402


def test_scale_for_flagship_and_default(monkeypatch):
    monkeypatch.delenv("TRAJ_FORCE_TOY", raising=False)
    # r5: flagship at the deployment resolution, swin unpinned to 64²
    assert parity_tpu._scale_for("unet") == {
        "epochs": 6, "train": 32, "val": 8, "size": 256, "tbs": 4}
    assert parity_tpu._scale_for("swin_unet") == {
        "epochs": 6, "train": 16, "val": 8, "size": 64, "tbs": 4}
    monkeypatch.setenv("TRAJ_FORCE_TOY", "1")
    assert parity_tpu._scale_for("unet")["size"] == 32


def _rows(values, col="val_metrics/dice_index_threshold_0.5"):
    other = {"dice_loss": 0.5, "metrics/dice_index_threshold_0.5": 0.5,
             "val_dice_loss": 0.5}
    return [{**other, col: v} for v in values]


def test_summarize_proxy_and_floor():
    tr = {
        "cpu_f32": _rows([0.2, 0.5, 0.80]),
        "tpu_f32": _rows([0.2, 0.5, 0.81]),
        "tpu_bf16": _rows([0.2, 0.5, 0.812]),
    }
    s = parity_tpu._summarize(tr, "fake-chip")
    ap = s["acceptance_proxy"]
    assert ap["value"] == pytest.approx(0.002)
    assert ap["f32_cross_backend_floor"] == pytest.approx(0.01)
    assert ap["pass"] is True
    assert s["max_abs_epoch_deltas"]["tpu_bf16_vs_cpu_f32"][
        "val_metrics/dice_index_threshold_0.5"] == pytest.approx(0.012)


def test_summarize_degeneracy_guard():
    flat = {
        "cpu_f32": _rows([0.3, 0.3, 0.3]),
        "tpu_f32": _rows([0.2, 0.5, 0.8]),
        "tpu_bf16": _rows([0.2, 0.5, 0.8]),
    }
    with pytest.raises(RuntimeError, match="constant"):
        parity_tpu._summarize(flat, "fake-chip")


def test_committed_artifact_has_scale_provenance():
    """Every family in the committed PARITY_TPU.json carries the scale
    it was measured at, and the config block mirrors it — FAMILY_SCALE
    edits must never silently re-document old trajectories."""
    path = os.path.join(parity_tpu.REPO, "PARITY_TPU.json")
    with open(path) as fh:
        art = json.load(fh)
    for fam_name, fam in art["families"].items():
        assert "scale" in fam, fam_name
        assert art["config"]["per_family_scale"][fam_name] == fam["scale"]
        # trajectories really are at the stamped scale
        for rows in fam["trajectories"].values():
            assert len(rows) == fam["scale"]["epochs"], fam_name


def test_artifact_scale_legacy_fallback_is_toy(monkeypatch):
    """Families carried over from a pre-stamp artifact were by
    definition measured at toy scale; labelling them with the current
    _scale_for would write false 642 provenance for 32-pixel
    trajectories."""
    monkeypatch.delenv("TRAJ_FORCE_TOY", raising=False)
    stamped = {"scale": {"epochs": 8, "train": 64, "val": 16,
                         "size": 64, "tbs": 8}}
    assert parity_tpu._artifact_scale(stamped) == stamped["scale"]
    # legacy (no stamp): toy scale, NOT the current flagship scale
    assert parity_tpu._artifact_scale({}) == parity_tpu._TOY_SCALE
    assert parity_tpu._artifact_scale({}) != parity_tpu._scale_for("unet")
