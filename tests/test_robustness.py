"""Robustness/transferability module: distances, margin scorer, color
jitter, encoder probing, sweep driver (reference ``src/robustness``)."""
import csv

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from medsegpretrainimagenet_tpu.models import UNetEncoder
from medsegpretrainimagenet_tpu.robustness import (Robustness, color_jitter,
                                                   cosine_distance,
                                                   eval_encoder,
                                                   inv_pearson_corr, l2_loss,
                                                   predict_w_model, run_sweep,
                                                   write_scores_csv)


# ---------------------------------------------------------------------------
# distances vs. torch golden values (reference distance.py formulas)
# ---------------------------------------------------------------------------

def _rand(shape, seed=0):
    return np.random.default_rng(seed).standard_normal(shape).astype(
        np.float32)


def test_cosine_distance_matches_torch():
    x, y = _rand((5, 12), 0), _rand((5, 12), 1)
    tx, ty = torch.tensor(x), torch.tensor(y)
    golden = 1 - torch.sum(tx * ty, axis=1) / torch.sqrt(
        torch.sum(tx ** 2, axis=1) * torch.sum(ty ** 2, axis=1))
    np.testing.assert_allclose(np.array(cosine_distance(x, y)),
                               golden.numpy(), rtol=1e-5)


def test_l2_matches_torch():
    x, y = _rand((5, 12), 2), _rand((5, 12), 3)
    golden = torch.mean((torch.tensor(x) - torch.tensor(y)) ** 2, axis=1)
    np.testing.assert_allclose(np.array(l2_loss(x, y)), golden.numpy(),
                               rtol=1e-5)


def test_inv_pearson_matches_torch():
    x, y = _rand((4, 30), 4), _rand((4, 30), 5)
    golden = 1 - torch.stack(
        [torch.corrcoef(torch.stack([a.flatten(), b.flatten()]))[0, 1]
         for a, b in zip(torch.tensor(x), torch.tensor(y))])
    np.testing.assert_allclose(np.array(inv_pearson_corr(x, y)),
                               golden.numpy(), rtol=1e-4, atol=1e-6)


# ---------------------------------------------------------------------------
# margin scorer
# ---------------------------------------------------------------------------

def test_robustness_negative_shift_matches_torch_indexing():
    """k0 = reversed(k1) rolled by 2 (reference eval.py:22-24)."""
    n = 6
    k1 = np.arange(n, dtype=np.float32).reshape(n, 1).repeat(3, 1)
    t = torch.tensor(k1)
    k0_t = torch.stack([t[i - 1] for i in range(n, 0, -1)])
    k0_t = torch.stack([k0_t[-2], k0_t[-1], *k0_t[:-2]])
    k0_j = jnp.roll(jnp.asarray(k1)[::-1], 2, axis=0)
    np.testing.assert_array_equal(np.array(k0_j), k0_t.numpy())
    # and the shift guarantees no self-match anywhere
    assert not (np.array(k0_j)[:, 0] == k1[:, 0]).any()


def test_robustness_score_formula():
    preds0 = jnp.asarray(_rand((6, 4, 4, 2), 6))
    preds1 = preds0 + 0.01  # nearly identical views -> pos ~ 0
    scorer = Robustness(cosine_distance, margin=0.0)
    scores = np.array(scorer(preds0, preds1))
    assert scores.shape == (6,)
    assert (scores >= 0).all()
    # identical views, margin 0 -> pos == 0 so score == max(0, -neg) == 0
    zero = np.array(Robustness(cosine_distance, 0.0)(preds0, preds0))
    np.testing.assert_allclose(zero, 0.0, atol=1e-6)
    # large margin dominates
    big = np.array(Robustness(cosine_distance, 10.0)(preds0, preds0))
    assert (big > 0).all()


# ---------------------------------------------------------------------------
# color jitter
# ---------------------------------------------------------------------------

def test_color_jitter_range_shape_determinism():
    imgs = jnp.asarray(np.random.default_rng(0).random((4, 8, 8, 3)),
                       jnp.float32)
    out1 = color_jitter(jax.random.key(1), imgs)
    out2 = color_jitter(jax.random.key(1), imgs)
    out3 = color_jitter(jax.random.key(2), imgs)
    assert out1.shape == imgs.shape
    assert float(out1.min()) >= 0.0 and float(out1.max()) <= 1.0
    np.testing.assert_array_equal(np.array(out1), np.array(out2))
    assert np.abs(np.array(out1) - np.array(out3)).max() > 0
    # jitter is mild (torchvision factors 0.05-0.1)
    assert np.abs(np.array(out1) - np.array(imgs)).max() < 0.35


def test_color_jitter_grayscale_passthrough_shapes():
    imgs = jnp.asarray(np.random.default_rng(0).random((2, 8, 8, 1)),
                       jnp.float32)
    out = color_jitter(jax.random.key(0), imgs)
    assert out.shape == imgs.shape


def test_hsv_roundtrip():
    from medsegpretrainimagenet_tpu.robustness.eval import (_hsv_to_rgb,
                                                            _rgb_to_hsv)
    rgb = jnp.asarray(np.random.default_rng(0).random((2, 5, 5, 3)),
                      jnp.float32)
    back = _hsv_to_rgb(_rgb_to_hsv(rgb))
    np.testing.assert_allclose(np.array(back), np.array(rgb), atol=1e-5)


# ---------------------------------------------------------------------------
# encoder probing + sweep
# ---------------------------------------------------------------------------

def _encoder():
    module = UNetEncoder(in_channel_size=3, channels=[4, 4, 8, 16], depth=2,
                         width=1)
    x = jnp.zeros((1, 16, 16, 3))
    variables = module.init(jax.random.key(0), x, train=False)
    return module, variables


def test_predict_w_model_levels_and_pooling():
    module, variables = _encoder()
    imgs = jnp.asarray(np.random.default_rng(0).random((5, 16, 16, 3)),
                       jnp.float32)
    # level -2 = last skip (channels 8 at 8x8 after one downsample)
    pooled = predict_w_model(module, variables, imgs, batch_size=2,
                             level=-2, pool=True)
    assert pooled.shape == (5, 8)
    unpooled = predict_w_model(module, variables, imgs, batch_size=2,
                               level=-2, pool=False)
    assert unpooled.shape == (5, 8, 8, 8)
    np.testing.assert_allclose(
        np.array(pooled), np.array(unpooled.mean(axis=(1, 2))), rtol=1e-5)
    # final output (level -1): bottom features 16ch at 4x4
    final = predict_w_model(module, variables, imgs, batch_size=2,
                            level=-1, pool=True)
    assert final.shape == (5, 16)


def test_eval_encoder_end_to_end():
    module, variables = _encoder()
    imgs = np.random.default_rng(0).random((6, 16, 16, 3))
    scorer = Robustness(cosine_distance, margin=0.1)
    scores = eval_encoder(module, variables, imgs, scorer, level=1,
                          pool=True, key=jax.random.key(0), batch_size=3)
    assert scores.shape == (6,)
    assert (np.array(scores) >= 0).all()


def test_run_sweep_and_csv(tmp_path):
    module, variables = _encoder()
    imgs = np.random.default_rng(0).random((4, 16, 16, 3))
    rows = run_sweep(
        encoders=[{"module": module, "variables": variables,
                   "name": "unet_encoder", "pretraining_scheme": "simple",
                   "pretraining_length": 20}],
        datasets={"COVIDQUDataset": imgs},
        metrics=("cosine_distance", "l2"),
        margins=(0.0,), levels=(1, 2), pooled=(True, False),
        batch_size=2)
    assert len(rows) == 2 * 1 * 2 * 2
    assert all(r["encoder"] == "unet_encoder" for r in rows)
    assert all(np.isfinite(r["robustness"]) for r in rows)

    path = str(tmp_path / "robustness_scores.csv")
    write_scores_csv(path, rows)
    with open(path) as fh:
        read = list(csv.DictReader(fh))
    assert len(read) == len(rows)
    # same columns as the published results/robustness_scores.csv
    assert list(read[0].keys()) == [
        "dataset", "metric", "margin", "encoder", "pretraining_scheme",
        "pooled", "level", "pretraining_length", "robustness"]


def test_run_sweep_skips_levels_beyond_encoder_depth():
    """Encoders differ in depth (reference CSV: 4 swin levels vs 5 for
    resnet50/u-net): levels past an encoder's [*skips, final] list are
    skipped for that encoder with a warning, not an IndexError (r5
    regression: the 3-family 224² sweep crashed on the depth-3 swin at
    level 4)."""
    module, variables = _encoder()      # depth-2: 3 activation levels
    imgs = np.random.default_rng(0).random((4, 16, 16, 3))
    with pytest.warns(UserWarning, match="skipping requested levels"):
        rows = run_sweep(
            encoders=[{"module": module, "variables": variables,
                       "name": "shallow"}],
            datasets={"d": imgs},
            metrics=("l2",), margins=(0.0,),
            levels=(1, 4), pooled=(True,), batch_size=2)
    assert {int(r["level"]) for r in rows} == {1}
    assert len(rows) == 1


def test_run_sweep_same_probe_views_for_every_encoder():
    """The jitter key is a function of (seed, dataset) only: two encoders
    with identical weights must receive identical scores in every cell —
    per-encoder jitter draws would make the CSV's cross-encoder ranking an
    RNG artifact (review finding, sweep.py)."""
    module, variables = _encoder()
    imgs = np.random.default_rng(0).random((4, 16, 16, 3))
    rows = run_sweep(
        encoders=[
            {"module": module, "variables": variables, "name": "a"},
            {"module": module, "variables": variables, "name": "b"},
        ],
        datasets={"ds": imgs},
        metrics=("cosine_distance",), margins=(0.0, 0.5), levels=(1, 2),
        pooled=(True,), batch_size=2)
    by_name = {}
    for row in rows:
        cell = (row["metric"], row["margin"], row["level"], row["pooled"])
        by_name.setdefault(row["encoder"], {})[cell] = row["robustness"]
    assert by_name["a"].keys() == by_name["b"].keys()
    for cell, value in by_name["a"].items():
        assert value == by_name["b"][cell], cell


def test_adapt_channels():
    from medsegpretrainimagenet_tpu.robustness.sweep import adapt_channels

    gray = jnp.asarray(np.random.default_rng(0).random((2, 4, 4, 1)),
                       jnp.float32)
    rgb = jnp.asarray(np.random.default_rng(1).random((2, 4, 4, 3)),
                      jnp.float32)
    assert adapt_channels(gray, None) is gray
    assert adapt_channels(rgb, 3) is rgb
    up = adapt_channels(gray, 3)
    assert up.shape == (2, 4, 4, 3)
    np.testing.assert_array_equal(np.array(up[..., 0]),
                                  np.array(gray[..., 0]))
    down = adapt_channels(rgb, 1)
    np.testing.assert_allclose(np.array(down),
                               np.array(rgb.mean(-1, keepdims=True)),
                               rtol=1e-6)
    with np.testing.assert_raises(ValueError):
        adapt_channels(rgb, 2)


def test_run_sweep_adapts_probes_to_encoder_channels():
    """A 1-channel encoder must probe 1-channel views of shared 3-channel
    images (an unconditional 3-channel repeat would init a 3-channel stem
    that a real 1-channel checkpoint could not graft into)."""
    module1 = UNetEncoder(in_channel_size=1, channels=[4, 8], depth=1,
                          width=1)
    variables1 = module1.init(jax.random.key(0), jnp.zeros((1, 16, 16, 1)),
                              train=False)
    module3, variables3 = _encoder()
    imgs = np.random.default_rng(0).random((4, 16, 16, 3))
    rows = run_sweep(
        encoders=[
            {"module": module1, "variables": variables1, "name": "gray",
             "in_channels": 1},
            {"module": module3, "variables": variables3, "name": "rgb",
             "in_channels": 3},
        ],
        datasets={"ds": imgs},
        metrics=("l2",), margins=(0.0,), levels=(1,), pooled=(True,),
        batch_size=2)
    assert {r["encoder"] for r in rows} == {"gray", "rgb"}
    assert all(np.isfinite(r["robustness"]) for r in rows)


def test_collect_levels_reuses_jitted_forward():
    """collect_levels must hit one persistent jit cache per (module,
    method) instead of re-jitting a fresh closure every call (each
    avoidable compile costs tens of seconds on the remote TPU)."""
    from medsegpretrainimagenet_tpu.robustness.eval import _jitted_forward

    module, _variables = _encoder()
    assert _jitted_forward(module, None) is _jitted_forward(module, None)
    other_module, _ = _encoder()
    assert _jitted_forward(other_module, None) is not \
        _jitted_forward(module, None)


def test_sweep_cli(tmp_path, monkeypatch):
    """python -m medsegpretrainimagenet_tpu.robustness cfg.yaml"""
    import yaml
    from medsegpretrainimagenet_tpu.robustness.__main__ import main

    rng = np.random.default_rng(0)
    root = tmp_path / "data" / "COVID_QU" / "Inf_segm" / "data arrays" \
        / "COVID-19"
    for part, n in (("train and val", 10), ("test", 2)):
        d = root / part
        d.mkdir(parents=True)
        np.save(d / "imgs.npy",
                (rng.random((n, 1, 16, 16)) * 255).astype(np.uint8))
        m = np.zeros((n, 1, 16, 16), np.uint8)
        m[:, :, 5:10, 5:10] = 2
        np.save(d / "inf_masks.npy", m)
    monkeypatch.setenv("MST_DATA_DIR", str(tmp_path / "data"))
    monkeypatch.chdir(tmp_path)

    cfg = {
        "data": {"COVIDQUDataset": {
            "segmentation.datasets.COVIDQUDataset": {
                "lung_or_infection": "inf", "image_sizes": 16,
                "validate_on_test": True}}},
        "probe_images": 6,
        "encoders": [{
            "name": "tiny", "pretraining_scheme": "simple",
            "pretraining_length": 1,
            "model": {"segmentation.models.UNet_encoder": {
                "in_channel_size": 3, "channels": (4, 8), "depth": 1}},
        }, {
            # 1-channel encoder: probes must stay grayscale for it
            # (unconditional 3-channel repeat was a review finding)
            "name": "tiny_gray", "pretraining_scheme": "none",
            "pretraining_length": 0,
            "model": {"segmentation.models.UNet_encoder": {
                "in_channel_size": 1, "channels": (4, 8), "depth": 1}},
        }],
        "metrics": ["cosine_distance", "l2"],
        "margins": [0.0],
        "levels": [1],
        "pooled": [True],
        "batch_size": 3,
        "output": str(tmp_path / "robustness_scores.csv"),
        "seed": 0,
    }
    cfg_path = str(tmp_path / "rb.yaml")
    with open(cfg_path, "w") as fh:
        yaml.safe_dump(cfg, fh)
    assert main([cfg_path]) == 0
    import csv as _csv
    with open(tmp_path / "robustness_scores.csv") as fh:
        rows = list(_csv.DictReader(fh))
    assert len(rows) == 4  # 2 metrics x 2 encoders
    assert {r["encoder"] for r in rows} == {"tiny", "tiny_gray"}
    assert all(np.isfinite(float(r["robustness"])) for r in rows)
