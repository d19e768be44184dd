import jax
import jax.numpy as jnp
import numpy as np
import pytest

from medsegpretrainimagenet_tpu.config import ConfigDict
from medsegpretrainimagenet_tpu.metrics import (MetricsCalculator, auroc,
                                                average_precision, border,
                                                edt, hd95_single)
from medsegpretrainimagenet_tpu.metrics.confusion import (ConfusionMatrixSpec,
                                                          derived_cm_value)


# ---------------------------------------------------------------------------
# confusion matrix + derived
# ---------------------------------------------------------------------------

def test_cm_counts(rng):
    spec = ConfusionMatrixSpec(threshold=0.5)
    state = spec.init_state()
    pred = jnp.asarray([[0.9, 0.2], [0.7, 0.1]])[..., None]
    mask = jnp.asarray([[1.0, 0.0], [0.0, 1.0]])
    state, per_batch = spec.update(state, pred, {"mask": mask})
    assert float(state["tp"]) == 1  # 0.9 vs 1
    assert float(state["fp"]) == 1  # 0.7 vs 0
    assert float(state["fn"]) == 1  # 0.1 vs 1
    assert float(state["tn"]) == 1  # 0.2 vs 0
    assert per_batch["true_positives_threshold_0.5"] == 1


def test_derived_cm_formulas():
    # golden values from the reference formulas (metrics.py:172-302)
    tp, fp, tn, fn = 8.0, 2.0, 85.0, 5.0
    assert derived_cm_value("accuracy", tp, fp, tn, fn) == \
        pytest.approx((8 + 85) / 100)
    assert derived_cm_value("balanced_accuracy", tp, fp, tn, fn) == \
        pytest.approx((8 / 13 + 85 / 87) / 2)
    assert derived_cm_value("sensitivity", tp, fp, tn, fn) == \
        pytest.approx(8 / 13)
    assert derived_cm_value("specificity", tp, fp, tn, fn) == \
        pytest.approx(85 / 87)
    assert derived_cm_value("precision", tp, fp, tn, fn) == \
        pytest.approx(8 / 10)
    assert derived_cm_value("dice_index", tp, fp, tn, fn) == \
        pytest.approx((2 * 8 + 1) / (2 * 8 + 2 + 5 + 1))
    assert derived_cm_value("jaccard_index", tp, fp, tn, fn) == \
        pytest.approx((8 + 1) / (8 + 2 + 5 + 1))
    import math
    expected_mcc = (8 * 85 - 2 * 5) / math.sqrt(13 * 10 * 87 * 90)
    assert derived_cm_value("mcc", tp, fp, tn, fn) == \
        pytest.approx(expected_mcc)


def test_derived_cm_invalid_neutral():
    assert derived_cm_value("dice_index", 0, 0, 10, 0) == 1  # neutral
    assert derived_cm_value("sensitivity", 0, 0, 10, 0) == 0


# ---------------------------------------------------------------------------
# AUROC / AP vs sklearn
# ---------------------------------------------------------------------------

def test_auroc_matches_sklearn(rng):
    sklearn = pytest.importorskip("sklearn.metrics")
    scores = rng.random(500).astype(np.float32)
    scores[::7] = scores[0]  # inject ties
    labels = (rng.random(500) > 0.7).astype(np.float32)
    got, valid = jax.jit(auroc)(jnp.asarray(scores), jnp.asarray(labels))
    assert bool(valid)
    expected = sklearn.roc_auc_score(labels, scores)
    assert float(got) == pytest.approx(expected, abs=1e-5)


def test_average_precision_matches_sklearn(rng):
    sklearn = pytest.importorskip("sklearn.metrics")
    scores = rng.random(300).astype(np.float32)
    scores[::5] = scores[1]
    labels = (rng.random(300) > 0.6).astype(np.float32)
    got, valid = jax.jit(average_precision)(jnp.asarray(scores),
                                            jnp.asarray(labels))
    expected = sklearn.average_precision_score(labels, scores)
    assert float(got) == pytest.approx(expected, abs=1e-5)


def test_auroc_degenerate():
    _, valid = auroc(jnp.asarray([0.1, 0.9]), jnp.asarray([1.0, 1.0]))
    assert not bool(valid)


# ---------------------------------------------------------------------------
# EDT / HD95 vs scipy + medpy algebra
# ---------------------------------------------------------------------------

def test_edt_matches_scipy(rng):
    ndimage = pytest.importorskip("scipy.ndimage")
    mask = rng.random((24, 17)) > 0.8
    mask[0, 0] = True  # ensure non-empty
    got = np.asarray(edt(jnp.asarray(mask)))
    expected = ndimage.distance_transform_edt(~mask)
    np.testing.assert_allclose(got, expected, atol=1e-4)


def test_border_matches_scipy_erosion(rng):
    ndimage = pytest.importorskip("scipy.ndimage")
    mask = rng.random((20, 20)) > 0.6
    got = np.asarray(border(jnp.asarray(mask)))
    footprint = ndimage.generate_binary_structure(2, 1)
    expected = mask ^ ndimage.binary_erosion(mask, structure=footprint,
                                             iterations=1)
    np.testing.assert_array_equal(got, expected)


def _medpy_hd95(pred, true):
    """Reference hd95 recomputed with scipy (medpy algebra)."""
    from scipy import ndimage
    footprint = ndimage.generate_binary_structure(2, 1)

    def surface_distances(a, b):
        a_border = a ^ ndimage.binary_erosion(a, structure=footprint,
                                              iterations=1)
        b_border = b ^ ndimage.binary_erosion(b, structure=footprint,
                                              iterations=1)
        dt = ndimage.distance_transform_edt(~b_border)
        return dt[a_border]

    sds = np.hstack([surface_distances(pred, true),
                     surface_distances(true, pred)])
    return np.percentile(sds, 95)


def test_hd95_matches_medpy_formula(rng):
    pytest.importorskip("scipy.ndimage")
    true = np.zeros((32, 32), bool)
    true[8:20, 8:20] = True
    pred = np.zeros((32, 32), bool)
    pred[10:24, 6:18] = True
    got, valid = jax.jit(hd95_single)(jnp.asarray(pred), jnp.asarray(true))
    assert bool(valid)
    expected = _medpy_hd95(pred, true)
    assert float(got) == pytest.approx(expected, abs=1e-3)


def test_hd95_empty_mask_invalid():
    pred = jnp.zeros((8, 8), bool)
    true = jnp.ones((8, 8), bool)
    _, valid = hd95_single(pred, true)
    assert not bool(valid)


# ---------------------------------------------------------------------------
# calculator end-to-end
# ---------------------------------------------------------------------------

def make_calc(metric_names, **calc_extra):
    cfg = ConfigDict({
        "metrics": {
            "metrics": tuple(metric_names),
            "calculation": dict({"thresholds": 0.5, "label_type": "mask"},
                                **calc_extra),
        }})
    return MetricsCalculator(cfg), cfg


def test_calculator_binary_epoch(rng):
    calc, _ = make_calc(["metrics.DiceIndex", "metrics.BalancedAccuracy"])
    state = calc.init_state()
    pred = jnp.asarray(rng.random((2, 8, 8, 1)).astype(np.float32))
    mask = jnp.asarray((rng.random((2, 8, 8)) > 0.5).astype(np.float32))
    state, per_batch = jax.jit(calc.update)(state, pred,
                                            {"mask": mask})
    values = calc.finalize_epoch(state)
    assert "metrics/dice_index_threshold_0.5" in values
    assert "metrics/balanced_accuracy_threshold_0.5" in values
    # cross-check dice against direct computation
    tp = float(((np.asarray(pred[..., 0]) >= 0.5) & (np.asarray(mask) == 1))
               .sum())
    fp = float(((np.asarray(pred[..., 0]) >= 0.5) & (np.asarray(mask) != 1))
               .sum())
    fn = float(((np.asarray(pred[..., 0]) < 0.5) & (np.asarray(mask) == 1))
               .sum())
    expected = (2 * tp + 1) / (2 * tp + fp + fn + 1)
    assert values["metrics/dice_index_threshold_0.5"] == \
        pytest.approx(expected, rel=1e-5)


def test_calculator_multiclass(rng):
    calc, _ = make_calc(
        ["metrics.multiclass_metrics.Accuracy",
         "metrics.multiclass_metrics.Top5Accuracy",
         "metrics.multiclass_metrics.DiceIndex"],
        number_of_classes=6, label_type="label",
        log_classwise_dice_idcs=False)
    state = calc.init_state()
    logits = jnp.asarray(rng.standard_normal((16, 6)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, 6, (16,)))
    state, per_batch = jax.jit(calc.update)(state, logits,
                                            {"label": labels})
    values = calc.finalize_epoch(state)
    expected_acc = float((np.argmax(np.asarray(logits), -1)
                          == np.asarray(labels)).mean())
    assert values["metrics/accuracy"] == pytest.approx(expected_acc)
    assert 0.0 <= values["metrics/top_5_accuracy"] <= 1.0
    assert "metrics/mean_dice_index" in values


def test_calculator_loss_tracking(rng):
    class FakeLoss:
        name = "dice_loss"
    calc, _ = make_calc(["metrics.DiceIndex"])
    calc.loss = FakeLoss()
    calc.loss_name = "dice_loss"
    state = calc.init_state()
    pred = jnp.asarray(rng.random((1, 4, 4, 1)).astype(np.float32))
    mask = jnp.asarray((rng.random((1, 4, 4)) > 0.5).astype(np.float32))
    state, _ = calc.update(state, pred, {"mask": mask},
                           loss_value=jnp.asarray(0.25))
    state, _ = calc.update(state, pred, {"mask": mask},
                           loss_value=jnp.asarray(0.75))
    values = calc.finalize_epoch(state)
    assert values["dice_loss"] == pytest.approx(0.5)


def test_calculator_threshold_fanout(rng):
    calc, cfg = make_calc(["metrics.DiceIndex"], thresholds=(0.3, 0.7))
    state = calc.init_state()
    assert "cm_0.3" in state and "cm_0.7" in state
    pred = jnp.asarray(rng.random((1, 4, 4, 1)).astype(np.float32))
    mask = jnp.asarray((rng.random((1, 4, 4)) > 0.5).astype(np.float32))
    state, _ = calc.update(state, pred, {"mask": mask})
    values = calc.finalize_epoch(state)
    assert "metrics/dice_index_threshold_0.3" in values
    assert "metrics/dice_index_threshold_0.7" in values


def test_calculator_hd95_and_auc(rng):
    calc, _ = make_calc(["metrics.ModifiedHausdorffDistance",
                         "metrics.AUROC"])
    state = calc.init_state()
    true = np.zeros((2, 16, 16), np.float32)
    true[:, 4:10, 4:10] = 1
    pred = np.zeros((2, 16, 16, 1), np.float32)
    pred[:, 5:11, 4:10, 0] = 0.9
    state, per_batch = jax.jit(calc.update)(
        state, jnp.asarray(pred), {"mask": jnp.asarray(true)})
    values = calc.finalize_epoch(state)
    assert values["metrics/modified_hausdorff_distance_threshold_0.5"] > 0
    assert 0.0 <= values["metrics/area_under_roc"] <= 1.0


def test_pca_plotter(tmp_path):
    import json
    import numpy as np
    from medsegpretrainimagenet_tpu.plotting import PCAPlotter, export_plot
    rng = np.random.default_rng(0)
    groups = [rng.normal(i * 3, 1, (10, 6)).tolist() for i in range(2)]
    plotter = PCAPlotter({"vectors": groups,
                          "legend": {"labels": ["a", "b"]},
                          "dirname": str(tmp_path), "fname": "pca"})
    export_plot(plotter, ("json", "png"))
    plotter.export_tsv()
    assert (tmp_path / "pca.json").exists()
    assert (tmp_path / "pca.png").exists()
    vecs = (tmp_path / "pca_vectors.tsv").read_text().strip().split("\n")
    meta = (tmp_path / "pca_metadata.tsv").read_text().strip().split("\n")
    assert len(vecs) == 20 and len(meta) == 20 and meta[0] == "a"
    # PCA separates the two far-apart clusters along the first axis
    proj = plotter._project()
    assert abs(proj[0][:, 0].mean() - proj[1][:, 0].mean()) > 3


def test_tversky_index_reference_weights_and_name():
    """metrics.TverskyIndex: general weights + config name (reference
    ``metrics.py:237-259``; defaults (1,1,1) = Jaccard-form, eps 1)."""
    import jax.numpy as jnp

    from medsegpretrainimagenet_tpu.config import ConfigDict
    from medsegpretrainimagenet_tpu.metrics import MetricsCalculator

    cfg = ConfigDict({"metrics": {
        "metrics": ("metrics.TverskyIndex", "metrics.DiceIndex"),
        "calculation": {"thresholds": 0.5, "label_type": "mask",
                        "name": "tversky_0.3_0.7",
                        "weight_of_tps": 1, "weight_of_fps": 0.3,
                        "weight_of_fns": 0.7}}})
    calc = MetricsCalculator(cfg)
    state = calc.init_state()
    pred = jnp.asarray([[0.9, 0.8, 0.2, 0.1]])   # tp=1 fp=1 fn=1 tn=1
    target = jnp.asarray([[1, 0, 1, 0]], jnp.int32)
    state, _ = calc.update(state, pred[..., None], {"mask": target})
    row = calc.finalize_epoch(state)
    tp, fp, fn = 1.0, 1.0, 1.0
    expected = (1 * tp + 1) / (1 * tp + 0.3 * fp + 0.7 * fn + 1)
    assert row["metrics/tversky_0.3_0.7_threshold_0.5"] == \
        pytest.approx(expected)
    # DiceIndex coexists under its own column (no key collision)
    assert row["metrics/dice_index_threshold_0.5"] == \
        pytest.approx((2 * tp + 1) / (2 * tp + fp + fn + 1))


def test_binary_auc_epoch_mean_of_batches_plus_pooled(rng):
    """The epoch column equals the reference semantics — the MEAN of
    per-batch sklearn scores over batches with non-degenerate labels
    (AUC.evaluate_epoch, metrics.py:424-432) — while the extra
    ``<name>_pooled`` column is sklearn on the epoch's concatenated
    arrays (scores on a 1/512 grid align with the histogram bins ->
    exact)."""
    import sklearn.metrics as sk

    from medsegpretrainimagenet_tpu.metrics.auc import AUCSpec

    batches = []
    for i in range(4):
        scores = rng.integers(0, 512, size=200).astype(np.float32) / 512.0
        labels = (rng.random(200) < 0.3).astype(np.int32)
        batches.append((scores, labels))
    # one degenerate batch: all-negative labels -> excluded from the mean
    batches.append((rng.random(50).astype(np.float32),
                    np.zeros(50, np.int32)))
    all_s = np.concatenate([s for s, _ in batches])
    all_y = np.concatenate([y for _, y in batches])
    for kind, fn in (("area_under_roc", sk.roc_auc_score),
                     ("average_precision_score", sk.average_precision_score)):
        spec = AUCSpec(kind, label_type="mask")
        state = spec.init_state()
        for s, y in batches:
            state, _ = spec.update(state, jnp.asarray(s),
                                   {"mask": jnp.asarray(y)})
        values = spec.finalize(jax.device_get(state))
        expected_mean = np.mean([fn(y, s) for s, y in batches
                                 if 0 < y.sum() < len(y)])
        assert values[kind] == pytest.approx(expected_mean, abs=1e-6), kind
        assert values[kind + "_pooled"] == \
            pytest.approx(fn(all_y, all_s), abs=1e-6), kind


def test_multiclass_auroc_epoch_macro_over_classes(rng):
    """Epoch value = mean over ALL classes of each class's mean of
    per-batch AUROCs over that class's valid batches (reference
    AverageBinaryContinuousMetric.evaluate_epoch -> per-class
    AUC.evaluate_epoch), degenerate classes contributing 0."""
    import sklearn.metrics as sk

    from medsegpretrainimagenet_tpu.metrics.multiclass import (
        AverageContinuousSpec)

    k = 4
    spec = AverageContinuousSpec("area_under_roc", k,
                                 include_background=False,
                                 apply_softmax=True, label_type="label")
    state = spec.init_state()
    per_class_vals = {idx: [] for idx in range(1, k)}
    for _ in range(3):
        logits = rng.normal(size=(64, k)).astype(np.float32)
        labels = rng.integers(1, k, size=64).astype(np.int32)  # class 0 absent
        state, _ = spec.update(state, jnp.asarray(logits),
                               {"label": jnp.asarray(labels)})
        probs = np.asarray(jax.nn.softmax(jnp.asarray(logits), axis=-1))
        for idx in range(1, k):
            t = (labels == idx).astype(int)
            if 0 < t.sum() < len(t):
                per_class_vals[idx].append(sk.roc_auc_score(t, probs[:, idx]))
    expected = float(np.mean([np.mean(v) if v else 0.0
                              for v in per_class_vals.values()]))
    got = spec.finalize(jax.device_get(state))["area_under_roc"]
    assert got == pytest.approx(expected, abs=1e-5)


def test_mc_hd95_batch_mean_over_present_classes_only():
    """The per-batch macro value averages only classes present in the
    argmax prediction or target (reference add_to_average gate,
    multiclass_metrics.py:595-607) — absent classes are excluded, not
    zero-filled."""
    from medsegpretrainimagenet_tpu.metrics.multiclass import MCHD95Spec

    k = 4  # classes 1..3 foreground; only class 1 appears in this batch
    pred = np.zeros((1, 8, 8, k), np.float32)
    pred[..., 1] = 1.0
    pred[:, :, 4:, 1] = 0.0
    pred[:, :, 4:, 0] = 1.0           # right half background
    mask = np.zeros((1, 8, 8), np.int32)
    mask[:, :, :2] = 1                # class 1 strip -> nonzero hd95
    spec = MCHD95Spec(k, include_background=False, label_type="mask")
    state, per_batch = spec.update(spec.init_state(), jnp.asarray(pred),
                                   {"mask": jnp.asarray(mask)})
    # per-class value for class 1 is some d > 0; classes 2, 3 are absent
    # everywhere -> the logged macro mean must equal d, not d / 3
    d = float(jax.device_get(state["sum"])[0])
    assert d > 0
    assert float(per_batch["modified_hausdorff_distance"]) == \
        pytest.approx(d, rel=1e-6)


def test_binary_auc_histogram_carry_accumulator():
    """Bin counts past the int32 low-word carry base keep exact totals
    (two-word accumulator; f32 or plain int32 would corrupt long-epoch
    pooled scores)."""
    from medsegpretrainimagenet_tpu.metrics.auc import AUCSpec

    spec = AUCSpec("area_under_roc", label_type="mask")
    state = spec.init_state()
    # drive the low word past the carry base without 2^30 real updates:
    # preload lo just below the carry threshold, then add one real batch
    state["pos"] = state["pos"].at[:].set(spec.CARRY - 1)
    scores = jnp.asarray(np.linspace(0, 1, 512, dtype=np.float32))
    labels = jnp.asarray((np.arange(512) % 2).astype(np.int32))
    state, _ = spec.update(state, scores, {"mask": labels})
    lo = np.asarray(jax.device_get(state["pos"]))
    hi = np.asarray(jax.device_get(state["pos_hi"]))
    assert (lo >= 0).all() and (lo < spec.CARRY).all()
    assert hi.sum() >= 1            # the bins that got a count carried
    total = hi.astype(np.float64) * spec.CARRY + lo.astype(np.float64)
    # exact conservation: preload + the real positives of this batch
    assert total.sum() == 65536 * (spec.CARRY - 1) + 256


def test_mc_hd95_uses_argmax_not_threshold():
    """A pixel whose winning prob is < 0.5 still belongs to that class
    (reference multiclass_metrics.py:587 binarizes by argmax)."""
    from medsegpretrainimagenet_tpu.metrics.multiclass import MCHD95Spec

    k = 3
    pred = np.full((1, 8, 8, k), 0.3, np.float32)
    pred[..., 1] = 0.4  # winning class everywhere, but < 0.5
    mask = np.ones((1, 8, 8), np.int32)
    spec = MCHD95Spec(k, include_background=False, label_type="mask")
    state = spec.init_state()
    state, per_batch = spec.update(state, jnp.asarray(pred),
                                   {"mask": jnp.asarray(mask)})
    value = spec.finalize(jax.device_get(state))
    # argmax prediction == mask exactly -> distance 0; the reference's
    # `if value != 0` cumulation guard (metrics.py:348-354) means a
    # perfect-distance batch is NOT counted toward the per-class mean
    assert value["modified_hausdorff_distance"] == pytest.approx(0.0)
    assert float(jax.device_get(state["count"])[0]) == 0.0


def test_multilabel_cm_oversized_buffer(rng):
    """Multilabel CM with the default 1000-class buffer must accept a
    C-channel prediction (C < 1000) and macro-average over exactly the
    observed C classes — the reference's counts adopt the tensor shape on
    first add (metrics.py:60-76), so any C works there."""
    from medsegpretrainimagenet_tpu.metrics.confusion import (
        ConfusionMatrixSpec, DerivedCMSpec, trim_multilabel_cm)

    pred = jnp.asarray(rng.random((2, 8, 8, 3)).astype(np.float32))
    mask = (pred > 0.4).astype(jnp.float32)
    big = ConfusionMatrixSpec(threshold=0.5, multilabel=True,
                              num_classes=1000)
    exact = ConfusionMatrixSpec(threshold=0.5, multilabel=True,
                                num_classes=3)
    s_big, s_exact = big.init_state(), exact.init_state()
    for _ in range(2):
        s_big, _ = jax.jit(big.update)(s_big, pred, {"mask": mask})
        s_exact, _ = jax.jit(exact.update)(s_exact, pred, {"mask": mask})
    h_big = jax.device_get(s_big)
    h_exact = jax.device_get(s_exact)
    assert int(h_big["n_classes"]) == 3
    trimmed = trim_multilabel_cm(h_big)
    for key in ("tp", "fp", "tn", "fn", "class_counts"):
        np.testing.assert_allclose(trimmed[key], np.asarray(h_exact[key]))
    d = DerivedCMSpec("dice_index", threshold=0.5, eps=1)
    v_big = d.finalize_from({}, {d.reads[0]: h_big})
    v_exact = d.finalize_from({}, {d.reads[0]: h_exact})
    assert v_big == pytest.approx(v_exact)
    # a prediction wider than the buffer is a config error, loudly
    tiny = ConfusionMatrixSpec(threshold=0.5, multilabel=True, num_classes=2)
    with pytest.raises(ValueError, match="number_of_classes"):
        tiny.update(tiny.init_state(), pred, {"mask": mask})


def test_classwise_requires_last_pass_flag():
    """Classwise-logging mean dice forces the extra last pass (reference
    AverageBinaryCMMetric, multiclass_metrics.py:189); the classwise-only
    family does not (ClasswiseBinaryCMMetric never sets it)."""
    calc_on, _ = make_calc(["metrics.multiclass_metrics.DiceIndex"],
                           number_of_classes=4, label_type="label",
                           log_classwise_dice_idcs=True)
    assert calc_on.requires_last_pass
    calc_off, _ = make_calc(["metrics.multiclass_metrics.DiceIndex"],
                            number_of_classes=4, label_type="label",
                            log_classwise_dice_idcs=False)
    assert not calc_off.requires_last_pass
    calc_cw, _ = make_calc(
        ["metrics.multiclass_metrics.ClasswiseDiceIndices"],
        number_of_classes=4, label_type="label")
    assert not calc_cw.requires_last_pass


def test_classwise_evaluate_at_end_plot(tmp_path):
    """End-of-training combined classwise history plots (reference
    AverageBinaryCMMetric/ClasswiseBinaryCMMetric.evaluate_at_end,
    multiclass_metrics.py:247-260,382-397): columns come back out of
    epoch_logs.csv into plots/<plural>_plot.<ext>."""
    import csv as _csv
    import json
    import os

    calc, _ = make_calc(["metrics.multiclass_metrics.DiceIndex",
                         "metrics.multiclass_metrics.ClasswiseDiceIndices"],
                        number_of_classes=3, label_type="label",
                        log_classwise_dice_idcs=True)
    rows = []
    for epoch in range(3):
        row = {"learning_rate": 0.1}
        for cls in (1, 2):
            row[f"val_metrics/dice_index_class_{cls}"] = 0.5 + 0.1 * epoch
        rows.append(row)
    with open(tmp_path / "epoch_logs.csv", "w", newline="") as fh:
        writer = _csv.DictWriter(fh, fieldnames=list(rows[0].keys()))
        writer.writeheader()
        writer.writerows(rows)
    calc.evaluate_at_end(save_path=str(tmp_path), extensions=("json",))
    # mean-dice's classwise plot uses the reference plural 'dice_indices';
    # the classwise-only metric preserves the reference's 'dice_indicies'
    # artifact name verbatim (multiclass_metrics.py:410)
    for fname in ("dice_indices_plot.json", "dice_indicies_plot.json"):
        path = tmp_path / "plots" / fname
        assert path.is_file(), fname
        payload = json.loads(path.read_text())
        assert len(payload["Ys"]) == 2
        assert payload["Ys"][0] == pytest.approx([0.5, 0.6, 0.7])


def test_cm_image_export_epochs_wiring():
    """log_confusion_matrix_at defaults to 'last' (reference
    multiclass_metrics.py:19) and 'last' flags the extra last pass
    (reference :70); explicit epoch lists do not."""
    from medsegpretrainimagenet_tpu.train.loop import _cm_log_epochs

    calc, cfg = make_calc(["metrics.multiclass_metrics.Accuracy"],
                          number_of_classes=3, label_type="label",
                          log_confusion_matrix=True)
    assert cfg["metrics/calculation/log_confusion_matrix_at"] == "last"
    assert calc.requires_last_pass
    assert _cm_log_epochs(cfg) == ([], True)

    calc2, cfg2 = make_calc(["metrics.multiclass_metrics.Accuracy"],
                            number_of_classes=3, label_type="label",
                            log_confusion_matrix=True,
                            log_confusion_matrix_at=(1, 2))
    assert not calc2.requires_last_pass
    assert _cm_log_epochs(cfg2) == ([1, 2], False)

    # no CM logging -> nothing active regardless of the 'at' key
    _, cfg3 = make_calc(["metrics.multiclass_metrics.Accuracy"],
                        number_of_classes=3, label_type="label")
    assert _cm_log_epochs(cfg3) == ([], False)
