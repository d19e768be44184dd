import numpy as np
import pytest

from medsegpretrainimagenet_tpu.config import ConfigDict
from medsegpretrainimagenet_tpu.data import (BalancedDataLoader,
                                             BalancedSource, assemble_batch)
from medsegpretrainimagenet_tpu.data.sampling import batch_index_plan
from medsegpretrainimagenet_tpu.data.transforms import (Compose,
                                                        ConvertToType,
                                                        RepeatChannels,
                                                        build_transform)


def toy_data(n=20, pos_frac=0.3, rng=None):
    rng = rng or np.random.default_rng(0)
    positives = np.zeros(n, bool)
    positives[:int(n * pos_frac)] = True
    return {
        "x": rng.random((n, 8, 8, 1)).astype(np.float32),
        "mask": (rng.random((n, 8, 8)) > 0.5).astype(np.int32),
        "positives": positives,
    }


def test_balanced_source_uniform():
    src = BalancedSource(toy_data(), balanced=1, seed=0)
    assert len(src) == 20
    item = src[0]
    assert item["x"].shape == (8, 8, 1)
    assert item["mask"].shape == (8, 8)


def test_balanced_source_oversampling():
    src = BalancedSource(toy_data(n=20, pos_frac=0.25), balanced="over",
                         pos_ratio_in_ds=0.5, seed=0)
    # 5 pos, 15 neg; factor = 0.5*15/(0.5*5) = 3 -> len = 15 + 3*5 = 30
    assert len(src) == 30
    assert src.cut["class"] == "pos"
    assert src.cut["amount"] == pytest.approx(0.0)


def test_balanced_source_pos_only():
    src = BalancedSource(toy_data(n=20, pos_frac=0.25), balanced="pos_only",
                         seed=0)
    assert len(src) == 5


def test_partition_expansion_index_passthrough():
    seen_indices = []

    def spy_transform(k=1, _index=0, **data):
        seen_indices.append(_index)
        data["k"] = k
        return data

    src = BalancedSource(toy_data(), balanced=1, seed=0,
                         partition_count=4, transforms=spy_transform)
    assert len(src) == 80
    src[5]
    assert seen_indices[-1] == 5


def test_extra_datapoints_pairs():
    data = {"x": np.arange(10, dtype=np.float32).reshape(10, 1),
            "label": np.ones(10, np.int32)}
    src = BalancedSource(data, balanced=1, seed=0, extra_datapoints=1)
    item = src[3]
    # without a pair-consuming transform, the first datapoint is returned
    assert item["x"].shape == (1,)


def test_batch_index_plan_min_pos():
    rng = np.random.default_rng(0)
    # 30-long index space: 20 negatives then 10 positives
    batch_nr, plan = batch_index_plan(
        ds_len=30, nr_pos=10, p=2, n=0, bs=6, cut={"amount": 0}, rng=rng)
    assert batch_nr == 5
    assert len(plan) == 30
    for b in range(batch_nr):
        batch = plan[b * 6:(b + 1) * 6]
        assert sum(idx >= 20 for idx in batch) >= 2  # min positives


def test_assemble_batch_padding():
    class Src:
        def __getitem__(self, i):
            return {"x": np.ones((3, 2 + i))}
    batch = assemble_batch(Src(), [0, 1], pad_with=0.0)
    assert batch["x"].shape == (2, 3, 3)
    assert batch["x"][0, 0, -1] == 0.0


def test_loader_uniform_batches():
    cfg = ConfigDict({"epoch": {"uniform": {}}, "batch": {"uniform": {}},
                      "relative_size": 1.0, "sort_by": None,
                      "pad_with": None})
    loader = BalancedDataLoader(toy_data(), cfg, bs=8, actual_bs=4, seed=0)
    batches = list(loader)
    assert len(batches) == 5
    assert batches[0]["x"].shape == (4, 8, 8, 1)
    assert len(loader) == 5


def test_loader_process_shard_slices():
    """Per-host input slicing: with the same seed, the (rank, count)
    shards of each batch concatenate to exactly the unsliced loader's
    batch, carry the local-slice mark, and a ragged tail is yielded
    whole (unmarked) on every rank."""
    cfg = ConfigDict({"epoch": {"uniform": {}}, "batch": {"uniform": {}},
                      "relative_size": 1.0, "sort_by": None,
                      "pad_with": None})
    # n=19, actual_bs=4 -> four full batches (sliced 2+2) and a ragged
    # tail of 3 (indivisible by 2 -> whole on every rank)
    full = list(BalancedDataLoader(toy_data(19), cfg, bs=8, actual_bs=4,
                                   seed=0))
    shards = [list(BalancedDataLoader(toy_data(19), cfg, bs=8, actual_bs=4,
                                      seed=0, process_shard=(r, 2)))
              for r in range(2)]
    key = BalancedDataLoader.LOCAL_SLICE_KEY
    assert len(shards[0]) == len(shards[1]) == len(full) == 5
    for b, (s0, s1) in enumerate(zip(*shards)):
        if full[b]["x"].shape[0] % 2 == 0:
            assert key in s0 and key in s1
            merged = np.concatenate([s0["x"], s1["x"]])
            np.testing.assert_array_equal(merged, full[b]["x"])
        else:       # ragged tail: whole batch on every rank, no mark
            assert key not in s0 and key not in s1
            np.testing.assert_array_equal(s0["x"], full[b]["x"])
            np.testing.assert_array_equal(s1["x"], full[b]["x"])
    # at least one full batch must actually have been sliced
    assert any(key in s for s in shards[0])


def test_loader_process_shard_short_even_tail_assembles_whole():
    """A short tail that happens to divide the process count must still
    assemble whole and unmarked: the training mesh's data axis divides
    actual_bs, not arbitrary tail sizes, and shard_batch rejects ragged
    already-local input — a marked short tail would be dropped by the
    per-batch error envelope every epoch."""
    cfg = ConfigDict({"epoch": {"uniform": {}}, "batch": {"uniform": {}},
                      "relative_size": 1.0, "sort_by": None,
                      "pad_with": None})
    # n=18, actual_bs=4 -> four full (marked, sliced 2+2) + tail of 2
    # (even, but short -> whole + unmarked)
    key = BalancedDataLoader.LOCAL_SLICE_KEY
    shards = [list(BalancedDataLoader(toy_data(18), cfg, bs=8, actual_bs=4,
                                      seed=0, process_shard=(r, 2)))
              for r in range(2)]
    tails = [s[-1] for s in shards]
    assert all(t["x"].shape[0] == 2 for t in tails)
    assert all(key not in t for t in tails)
    np.testing.assert_array_equal(tails[0]["x"], tails[1]["x"])
    assert sum(key in b for b in shards[0]) == 4


def test_broadcast_from_main_single_process_identity():
    from medsegpretrainimagenet_tpu.parallel import broadcast_from_main
    assert broadcast_from_main((3, 17)) == [3, 17]
    assert broadcast_from_main([]) == []


def test_loader_process_shard_indivisible_bs_disables():
    cfg = ConfigDict({"epoch": {"uniform": {}}, "batch": {"uniform": {}},
                      "relative_size": 1.0, "sort_by": None,
                      "pad_with": None})
    with pytest.warns(UserWarning, match="not divisible"):
        loader = BalancedDataLoader(toy_data(), cfg, bs=9, actual_bs=3,
                                    seed=0, process_shard=(0, 2))
    assert loader.process_shard is None


def test_loader_fill_kwargs():
    cfg = ConfigDict({})
    BalancedDataLoader.fill_kwargs(cfg)
    assert cfg["batch size"] == 8
    assert cfg["train/epoch"].key() == "uniform"
    assert cfg["val/relative_size"] == 1.0


def test_transforms_compose_covidqu_style(rng):
    rotation = build_transform(ConfigDict(
        {"segmentation.transforms.wrapped_transforms.RandomRotation": {
            "border_mode": "BORDER_CONSTANT", "limit": 180,
            "value": 0, "mask_value": 0}}), seed=0)
    flip = build_transform(ConfigDict(
        {"segmentation.transforms.wrapped_transforms.RandomFlip": {
            "vertical": True, "horizontal": False, "probability": 0.5}}),
        seed=0)
    repeat = build_transform(ConfigDict({"transform.RepeatChannels": {}}))
    cast = ConvertToType(ConfigDict({"mask": "torch.LongTensor"}))
    pipeline = Compose(rotation, flip, repeat, cast)
    out = pipeline(x=rng.random((16, 16, 1)).astype(np.float32),
                   mask=(rng.random((16, 16)) > 0.5).astype(np.int32))
    assert out["x"].shape == (16, 16, 3)
    assert out["x"].dtype == np.float32
    assert out["mask"].dtype == np.int32
    assert set(np.unique(out["mask"])).issubset({0, 1})


def test_rotation_preserves_mask_values(rng):
    rotation = build_transform(ConfigDict(
        {"segmentation.transforms.wrapped_transforms.RandomRotation": {
            "limit": 45, "border_mode": "BORDER_CONSTANT",
            "value": 0, "mask_value": 0}}), seed=3)
    mask = np.zeros((16, 16), np.int32)
    mask[4:12, 4:12] = 1
    out = rotation(x=rng.random((16, 16, 1)).astype(np.float32), mask=mask)
    assert set(np.unique(out["mask"])).issubset({0, 1})  # nearest-neighbour


def test_partition_transform():
    part = build_transform(ConfigDict(
        {"segmentation.transforms.wrapped_transforms.Partition": {
            "number of partitions": 4}}))
    x = np.arange(64, dtype=np.float32).reshape(8, 8, 1)
    outs = [part(x=x, _index=i)["x"] for i in range(4)]
    assert all(o.shape == (4, 4, 1) for o in outs)
    assert not np.allclose(outs[0], outs[1])


def test_mixup_pair():
    from medsegpretrainimagenet_tpu.data.transforms import Mixup
    mix = Mixup(ConfigDict({"distribution": "uniform", "probability": 1.0,
                            "maximum": 1.0}), seed=0)
    out = mix(x=[np.zeros((4, 4, 1)), np.ones((4, 4, 1))],
              label=[np.array([1.0, 0.0]), np.array([0.0, 1.0])], k=2)
    assert out["k"] == 1
    assert 0.0 <= float(out["x"].mean()) <= 1.0
    assert out["label"].sum() == pytest.approx(1.0)


def test_onehot_and_cutmix_rect(rng):
    onehot = build_transform(ConfigDict(
        {"classification.transforms.OneHotEncoding": {"num_classes": 5}}))
    out = onehot(x=rng.random((4, 4, 3)), label=2)
    assert out["label"].shape == (5,)
    assert out["label"][2] == 1.0

    cutmix = build_transform(ConfigDict(
        {"classification.transforms.CutMix": {"probability": 1.0}}), seed=0)
    out = cutmix(x=[np.zeros((8, 8, 3)), np.ones((8, 8, 3))],
                 label=[np.eye(5)[0], np.eye(5)[1]], k=2)
    assert out["k"] == 1
    assert out["label"].sum() == pytest.approx(1.0)


def test_randaugment_shapes(rng):
    aug = build_transform(ConfigDict(
        {"classification.transforms.RandAugment": {}}), seed=0)
    x = rng.random((16, 16, 3)).astype(np.float32)
    out = aug(x=x)
    assert out["x"].shape == (16, 16, 3)
    assert out["x"].dtype == np.float32
    assert out["x"].max() <= 1.0 + 1e-5


def test_covidqu_reader_synthetic(tmp_path, monkeypatch, rng):
    """Synthetic COVID-QU-shaped npy stacks through the real reader."""
    root = tmp_path / "COVID_QU" / "Inf_segm" / "data arrays" / "COVID-19"
    for part, n in (("train and val", 12), ("test", 4)):
        d = root / part
        d.mkdir(parents=True)
        np.save(d / "imgs.npy",
                (rng.random((n, 1, 20, 20)) * 255).astype(np.uint8))
        np.save(d / "inf_masks.npy",
                (rng.random((n, 1, 20, 20)) > 0.7).astype(np.uint8) * 2)
    monkeypatch.setenv("MST_DATA_DIR", str(tmp_path))
    from medsegpretrainimagenet_tpu.data.readers import COVIDQUDataset
    ds = COVIDQUDataset(ConfigDict({
        "lung or infection": "inf", "image sizes": 16,
        "validate on test": True, "load masks": True,
        "load distance maps": False}), seed=1)
    assert ds.train["x"].shape == (12, 16, 16, 1)
    assert ds.val["x"].shape == (4, 16, 16, 1)
    assert ds.train["mask"].shape == (12, 16, 16)
    assert set(np.unique(ds.train["mask"])).issubset({0, 1})
    assert ds.train["x"].max() <= 1.0


def test_random_pick_crops_image_and_mask_from_same_position():
    """RandomPick must use ONE (angle, position) draw for all columns —
    per-column draws silently misalign masks from their images
    (reference transforms.py:98-104 samples the triple once)."""
    from medsegpretrainimagenet_tpu.config import ConfigDict
    from medsegpretrainimagenet_tpu.data.transforms.segmentation import (
        RandomPick)

    rng = np.random.default_rng(0)
    img = rng.random((64, 64, 1)).astype(np.float32)
    mask = (img[..., 0] > 0.5).astype(np.int32)
    t = RandomPick(ConfigDict({"crop size": 24, "rotation limit": 0}),
                   seed=3)
    for _ in range(5):
        out = t(x=img, mask=mask)
        # at rotation limit 0 the crop is axis-aligned: thresholding the
        # cropped image must reproduce the cropped mask exactly
        got_mask = np.squeeze(out["mask"])
        ref_mask = (np.squeeze(out["x"]) > 0.5).astype(np.int32)
        np.testing.assert_array_equal(got_mask, ref_mask)


def test_uint8_transfer_survives_default_casting():
    """With uint8_transfer on and no explicit 'x' cast, the pipeline's
    trailing caster must keep x uint8 (the device /255's uint8 only —
    a float32-widened 0-255 x would silently skip normalization)."""
    from medsegpretrainimagenet_tpu.cli.run_experiment import (
        build_transform_pipelines)

    cd = ConfigDict({
        "data": {
            "data": {"segmentation.datasets.COVIDQUDataset": {
                "uint8_transfer": True}},
            "transforms": {"train": "transform.RepeatChannels",
                           "val": "transform.RepeatChannels"},
        }})
    train_tr, _, _, _, _ = build_transform_pipelines(cd, seed=0)
    x = (np.random.default_rng(0).random((8, 8, 1)) * 255).astype(np.uint8)
    out = train_tr(x=x, mask=np.zeros((8, 8), np.uint8))
    assert out["x"].dtype == np.uint8
    # explicit cast still wins
    cd2 = ConfigDict({
        "data": {
            "data": {"segmentation.datasets.COVIDQUDataset": {
                "uint8_transfer": True}},
            "transforms": {"train": "transform.RepeatChannels",
                           "val": "transform.RepeatChannels",
                           "casting": {"x": "torch.FloatTensor"}},
        }})
    train_tr2, _, _, _, _ = build_transform_pipelines(cd2, seed=0)
    out2 = train_tr2(x=x, mask=np.zeros((8, 8), np.uint8))
    assert out2["x"].dtype == np.float32


def test_planned_sort_by_uses_resolved_rows():
    """sort_by must sort the plan by the keys of the rows each balanced
    index RESOLVES to (positive indices repeat via the oversampling
    remap), not by raw plan-index lookup."""
    n_neg, n_pos = 6, 2
    data = {
        "x": np.arange(n_neg + n_pos, dtype=np.float32),
        "label": np.array([0] * n_neg + [1] * n_pos, np.int32),
        "sort_key": np.arange(n_neg + n_pos, dtype=np.float32)[::-1].copy(),
    }
    cfg = ConfigDict({"epoch": {"oversampling": {
                          "ratio of positives": 0.5}},
                      "batch": {"uniform": {}},
                      "relative_size": 1.0, "sort_by": "sort_key",
                      "pad_with": None})
    loader = BalancedDataLoader(data, cfg, bs=4, actual_bs=4, seed=0)
    batches = list(loader)
    rows = np.concatenate([b["x"] for b in batches]).astype(int)
    keys = data["sort_key"][rows]
    assert (np.diff(keys) >= 0).all(), keys


def test_rotation_handles_five_channel_masks():
    """IDRiD multilabel masks have 5 channels; cv2.warpAffine supports
    only 1-4, so joint rotations must chunk channels."""
    from medsegpretrainimagenet_tpu.data.transforms.segmentation import (
        RandomRotation)

    tr = RandomRotation(ConfigDict({"limit": 45, "probability": 1.0}),
                        seed=0)
    x = np.random.default_rng(0).random((16, 16, 3)).astype(np.float32)
    mask = np.zeros((16, 16, 5), np.float32)
    mask[4:12, 4:12, :] = 1.0
    out = tr(x=x, mask=mask)
    assert out["mask"].shape == (16, 16, 5)
    assert out["mask"].sum() > 0


def test_undersampling_above_target_ratio_clamps_cut():
    """A dataset already above the target positive ratio must not produce
    a negative cut (which truncated the epoch to a few items)."""
    data = {"x": np.arange(10, dtype=np.float32),
            "label": np.array([1] * 7 + [0] * 3, np.int32)}
    src = BalancedSource(data, balanced="under", pos_ratio_in_ds=0.5,
                         seed=0)
    assert src.cut["amount"] >= 0


def test_falsy_p_coerces_to_one_reference_parity():
    """Reference quirk pinned (wrapped_transforms.py:81,89): a falsy p —
    missing, null, and even an explicit 0 — coerces to probability 1 for
    RandomRotation/RandomFlip.  Host and device paths must agree on it."""
    rot = build_transform(ConfigDict({
        "segmentation.transforms.wrapped_transforms.RandomRotation":
            {"p": 0}}), seed=0)
    assert rot.p == 1
    flip = build_transform(ConfigDict({
        "segmentation.transforms.wrapped_transforms.RandomFlip":
            {"probability": 0, "vertical": True}}), seed=0)
    assert flip.p == 1


def test_device_repeat_channels_matches_host_factor_semantics():
    """ops.augment.repeat_channels repeats by FACTOR n like the host
    RepeatChannels (np.repeat(x, repeats)): C=3 with n=3 -> 9 channels,
    so toggling device_augmentation cannot change the model input shape."""
    import jax.numpy as jnp

    from medsegpretrainimagenet_tpu.ops.augment import repeat_channels

    x3 = jnp.ones((2, 4, 4, 3))
    assert repeat_channels(x3, 3).shape == (2, 4, 4, 9)
    x1 = jnp.ones((2, 4, 4, 1))
    assert repeat_channels(x1, 3).shape == (2, 4, 4, 3)


# ---------------------------------------------------------------------------
# parallel lazy-load workers (meta/technical/number_of_data_loader_workers)
# ---------------------------------------------------------------------------

def _lazy_path_data(tmp_path, n=14, pos_frac=0.3, seed=5):
    """Column data where 'x' is lazy string paths (ImageNet-style,
    reference data/utils.py:148-149)."""
    rng = np.random.default_rng(seed)
    paths = []
    for i in range(n):
        p = tmp_path / f"img_{i}.npy"
        np.save(p, rng.random((6, 6, 1)).astype(np.float32))
        paths.append(str(p))
    positives = np.zeros(n, bool)
    positives[:int(n * pos_frac)] = True
    return {"x": paths,
            "mask": (rng.random((n, 6, 6)) > 0.5).astype(np.int32),
            "positives": positives}


class _SeededJitter:
    """Transform drawing from a sequential rng stream — the property the
    worker pool must not disturb."""

    def __init__(self, seed):
        self.rng = np.random.default_rng(seed)

    def __call__(self, k=1, _index=0, **data):
        data["x"] = np.asarray(data["x"]) + self.rng.random()
        return data


def test_loader_workers_bit_identical(tmp_path):
    """num_workers>0 parallelizes only the rng-free lazy-load stage:
    every batch (lazy np.load + sequential-rng transform, balanced
    sampling) is bit-identical to the serial loader."""
    cfg = ConfigDict({"epoch": {"oversampling": {"ratio of positives": 0.5}},
                      "batch": {"uniform": {}}, "relative_size": 1.0,
                      "sort_by": None, "pad_with": None})

    def make(workers):
        return BalancedDataLoader(
            _lazy_path_data(tmp_path), cfg, bs=4, actual_bs=4, seed=0,
            transforms=_SeededJitter(11),
            load_function={"x": np.load}, num_workers=workers)

    serial = list(make(0))
    parallel = list(make(3))
    assert len(serial) == len(parallel) > 0
    for s, p in zip(serial, parallel):
        assert set(s) == set(p)
        for key in s:
            np.testing.assert_array_equal(s[key], p[key])


def test_assemble_batch_executor_preserves_k_extra_draws(tmp_path):
    """With extra_datapoints (Mixup pair sampling) the k-extra rng draws
    happen on the calling thread in index order, so executor assembly
    equals serial assembly exactly."""
    from concurrent.futures import ThreadPoolExecutor

    def make_source():
        return BalancedSource(_lazy_path_data(tmp_path), balanced=1, seed=7,
                              extra_datapoints=1,
                              load_function={"x": np.load})

    idcs = [3, 0, 9, 5]
    serial = assemble_batch(make_source(), idcs)
    with ThreadPoolExecutor(max_workers=3) as pool:
        parallel = assemble_batch(make_source(), idcs, executor=pool)
    for key in serial:
        np.testing.assert_array_equal(serial[key], parallel[key])


def test_mixed_dataset_lazy_loads_stay_serial(tmp_path):
    """MixedDataset lazy-reload load functions are order-dependent
    (stateful record pointer) — the loader must refuse to pool them."""
    from medsegpretrainimagenet_tpu.data.sampling import StatefulLoadFunctions

    src = BalancedSource(
        {"x": np.arange(4, dtype=np.float32), "label": np.ones(4, np.int32)},
        balanced=1, seed=0,
        load_function=StatefulLoadFunctions({"x": lambda v: v}))
    assert not src.parallel_load_ok()

    cfg = ConfigDict({"epoch": {"uniform": {}}, "batch": {"uniform": {}},
                      "relative_size": 1.0, "sort_by": None,
                      "pad_with": None})
    loader = BalancedDataLoader(
        {"x": np.arange(4, dtype=np.float32), "label": np.ones(4, np.int32)},
        cfg, bs=2, actual_bs=2, seed=0, num_workers=2,
        load_function=StatefulLoadFunctions({"x": lambda v: v}))
    assert loader._load_executor() is None
