"""ACDC / IDRiD readers, the minimal NIfTI codec, and MixedDataset."""
import os

import numpy as np
import pytest
from PIL import Image

from medsegpretrainimagenet_tpu.config import ConfigDict
from medsegpretrainimagenet_tpu.data import MixedDataset
from medsegpretrainimagenet_tpu.data.readers import (ACDC, IDRiD, load_nii,
                                                     save_nii)


# ---------------------------------------------------------------------------
# NIfTI codec
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("suffix", [".nii", ".nii.gz"])
@pytest.mark.parametrize("dtype", [np.uint8, np.int16, np.float32])
def test_nifti_roundtrip(tmp_path, suffix, dtype):
    rng = np.random.default_rng(0)
    vol = (rng.random((7, 5, 3)) * 100).astype(dtype)
    path = str(tmp_path / f"vol{suffix}")
    save_nii(path, vol)
    data, affine, header = load_nii(path)
    np.testing.assert_array_equal(data, vol.astype(np.float64))
    np.testing.assert_array_equal(affine, np.eye(4))
    assert header["dim"][0] == 3


def test_nifti_fortran_order(tmp_path):
    """Voxels are stored column-major like real NIfTI files."""
    vol = np.arange(24, dtype=np.float32).reshape(2, 3, 4)
    path = str(tmp_path / "f.nii")
    save_nii(path, vol)
    import struct
    with open(path, "rb") as fh:
        raw = fh.read()
    stored = np.frombuffer(raw, np.float32, count=24, offset=352)
    np.testing.assert_array_equal(stored, vol.reshape(-1, order="F"))
    np.testing.assert_array_equal(load_nii(path)[0], vol)


# ---------------------------------------------------------------------------
# ACDC
# ---------------------------------------------------------------------------

def make_acdc_tree(root, n_train=4, n_test=2, hw=(10, 12), zs=(3, 2)):
    rng = np.random.default_rng(0)
    for part, n in (("training", n_train), ("testing", n_test)):
        for p in range(n):
            d = root / "ACDC" / part / f"patient{p:03d}"
            d.mkdir(parents=True)
            for frame in (1, 12):
                z = zs[frame % 2]
                img = rng.random((*hw, z)).astype(np.float32) * 50
                gt = rng.integers(0, 4, (*hw, z)).astype(np.uint8)
                save_nii(str(d / f"patient{p:03d}_frame{frame:02d}.nii.gz"),
                         img)
                save_nii(str(d /
                             f"patient{p:03d}_frame{frame:02d}_gt.nii.gz"),
                         gt)


def test_acdc_random_split(tmp_path, monkeypatch):
    make_acdc_tree(tmp_path)
    monkeypatch.setenv("MST_DATA_DIR", str(tmp_path))
    ds = ACDC(ConfigDict({"val_split_percentage": 0.25,
                          "validate_on_test": False,
                          "image_sizes": 8}), seed=0)
    # 4 patients, 2 frames each, z = 3 + 2 slices -> 5 slices/patient
    total = ds.train["x"].shape[0] + ds.val["x"].shape[0]
    assert total == 4 * 5
    assert ds.val["x"].shape[0] == 1 * 5          # int(0.25*4) = 1 patient
    assert ds.train["x"].shape[1:] == (8, 8, 1)
    assert ds.train["mask"].shape[1:] == (8, 8)
    assert ds.train["mask"].dtype == np.int32
    assert set(np.unique(ds.train["mask"])) <= {0, 1, 2, 3}


def test_acdc_validate_on_test(tmp_path, monkeypatch):
    make_acdc_tree(tmp_path)
    monkeypatch.setenv("MST_DATA_DIR", str(tmp_path))
    ds = ACDC(ConfigDict({"validate_on_test": True, "image_sizes": 8}),
              seed=0)
    assert ds.train["x"].shape[0] == 4 * 5
    assert ds.val["x"].shape[0] == 2 * 5


# ---------------------------------------------------------------------------
# IDRiD
# ---------------------------------------------------------------------------

def make_idrid_tree(root, n_train=6, n_test=3, size=(64, 224)):
    # width > 2*96 so the reference's fixed border crop survives
    rng = np.random.default_rng(0)
    base = root / "idrid" / "Segmentation" / "A. Segmentation"
    imgs = base / "1. Original Images"
    masks = base / "2. All Segmentation Groundtruths"
    task_dirs = {"MA": "1. Microaneurysms", "HE": "2. Haemorrhages"}
    idx = 1
    for part, n in (("a. Training Set", n_train), ("b. Testing Set", n_test)):
        (imgs / part).mkdir(parents=True)
        for td in task_dirs.values():
            (masks / part / td).mkdir(parents=True, exist_ok=True)
        for _ in range(n):
            # bright fundus on black border
            arr = np.zeros((*size, 3), np.uint8)
            arr[8:-8, 16:-16] = rng.integers(100, 255, (size[0] - 16,
                                                        size[1] - 32, 3))
            Image.fromarray(arr).save(imgs / part / f"IDRiD_{idx:02d}.jpg")
            for abbrev, td in task_dirs.items():
                if abbrev == "HE" and idx % 2 == 0:
                    continue  # negatives for the HE task
                m = np.zeros(size, np.uint8)
                m[10:20, 100:120] = 255  # inside the 96-px border crop
                Image.fromarray(m).save(
                    masks / part / td / f"IDRiD_{idx:02d}_{abbrev}.tif")
            idx += 1


def test_idrid_single_task_fullsize(tmp_path, monkeypatch):
    make_idrid_tree(tmp_path)
    monkeypatch.setenv("MST_DATA_DIR", str(tmp_path))
    cfg = ConfigDict({"task": "MA", "base_image_sizes": (32, 48),
                      "cropped_image_sizes": None,
                      "validation_set": "test", "train_set_size": 5})
    ds = IDRiD(cfg, seed=0)
    assert ds.train["x"].shape == (5, 32, 48, 3)
    assert ds.val["x"].shape == (3, 32, 48, 3)
    assert ds.train["mask"].shape == (5, 32, 48)
    assert set(np.unique(ds.train["mask"])) <= {0, 1}


def test_idrid_negatives_excluded_by_default(tmp_path, monkeypatch):
    make_idrid_tree(tmp_path)
    monkeypatch.setenv("MST_DATA_DIR", str(tmp_path))
    cfg = ConfigDict({"task": "HE", "base_image_sizes": (32, 48),
                      "cropped_image_sizes": None,
                      "validation_set": "test", "train_set_size": 3})
    IDRiD.fill_kwargs(cfg)
    assert cfg["include_negatives"] is False
    ds = IDRiD(cfg, seed=0)
    # only odd ids have HE masks: train ids 1,3,5 / test ids 7,9
    assert ds.val["x"].shape[0] == 2


def test_idrid_multitask_single_label(tmp_path, monkeypatch):
    make_idrid_tree(tmp_path)
    monkeypatch.setenv("MST_DATA_DIR", str(tmp_path))
    cfg = ConfigDict({"task": ("MA", "HE"), "base_image_sizes": (32, 48),
                      "cropped_image_sizes": None,
                      "validation_set": "test", "train_set_size": 6})
    IDRiD.fill_kwargs(cfg)
    assert cfg["multilabel"] is False
    ds = IDRiD(cfg, seed=0)
    # argmax over [background, MA, HE]
    assert ds.train["mask"].ndim == 3
    assert set(np.unique(ds.train["mask"])) <= {0, 1, 2}


def test_idrid_multitask_multilabel(tmp_path, monkeypatch):
    make_idrid_tree(tmp_path)
    monkeypatch.setenv("MST_DATA_DIR", str(tmp_path))
    cfg = ConfigDict({"task": ("MA", "HE"), "multilabel": True,
                      "base_image_sizes": (32, 48),
                      "cropped_image_sizes": None,
                      "validation_set": "test", "train_set_size": 6})
    ds = IDRiD(cfg, seed=0)
    assert ds.train["mask"].shape == (6, 32, 48, 2)


def test_idrid_sliding_window_crops_and_darkness(tmp_path, monkeypatch):
    make_idrid_tree(tmp_path)
    monkeypatch.setenv("MST_DATA_DIR", str(tmp_path))
    cfg = ConfigDict({"task": "MA", "base_image_sizes": (32, 48),
                      "cropped_image_sizes": (16, 16),
                      "train_crop_stride": (16, 16),
                      "darkness_threshold": 0.995,
                      "validation_set": "test", "train_set_size": 5})
    ds = IDRiD(cfg, seed=0)
    # 2x3 grid of crops per image, minus dropped dark border crops
    assert ds.train["x"].shape[1:] == (16, 16, 3)
    assert ds.train["x"].shape[0] <= 5 * 6
    assert ds.train["x"].shape[0] > 0
    assert ds.train["mask"].shape == ds.train["x"].shape[:3]
    # a fully-dark threshold drops nothing
    cfg2 = ConfigDict({"task": "MA", "base_image_sizes": (32, 48),
                       "cropped_image_sizes": (16, 16),
                       "train_crop_stride": (16, 16),
                       "darkness_threshold": 1.1,
                       "validation_set": "test", "train_set_size": 5})
    ds2 = IDRiD(cfg2, seed=0)
    assert ds2.train["x"].shape[0] == 5 * 6


# ---------------------------------------------------------------------------
# MixedDataset
# ---------------------------------------------------------------------------

class _Toy:
    """Minimal dataset component for registry-free construction."""

    def __init__(self, n_train, n_val, value, extra=False):
        self.train = {"x": [value] * n_train}
        self.val = {"x": [value] * n_val}
        if extra:
            self.train["y"] = [value * 10] * n_train
            self.val["y"] = [value * 10] * n_val


_TOY_SIZES = {}


def _register_toys():
    from medsegpretrainimagenet_tpu.config.registry import (RegistryError,
                                                            register)
    for i in range(2):
        try:
            register(f"tests.Toy{i}")(
                lambda seed=None, extra=False, _i=i:
                _toy_tuple(*_TOY_SIZES[_i], _i + 1, extra))
        except RegistryError:
            pass  # already registered by an earlier test


def _mixed(cfg_overrides=None, sizes=((6, 4), (10, 2))):
    _register_toys()
    for i, size in enumerate(sizes):
        _TOY_SIZES[i] = size
    cfg = ConfigDict({
        "datasets": tuple(
            ConfigDict({f"tests.Toy{i}": {"extra": i == 0}})
            for i in range(len(sizes))),
        "switch_frequency": 2,
        "preserve_order": True,
        "balancing_strategy": {"train": "none", "val": "under"},
        "preload_data": True,
        **(cfg_overrides or {}),
    })
    return MixedDataset(cfg, seed=0)


def _toy_tuple(nt, nv, value, extra):
    toy = _Toy(nt, nv, value, extra)
    return toy.train, toy.val


def _drain(ds, split="train"):
    data = getattr(ds, split)
    lf = ds.load_function
    n = len(data["train_counter"])
    rows = []
    for i in range(n):
        row = {}
        for kw in data:  # counters first: they advance the pointer
            row[kw] = lf[kw](data[kw][i]) if kw in lf else data[kw][i]
        rows.append(row)
    return rows


def test_mixed_dataset_lengths_and_columns():
    ds = _mixed()
    # none: 6 - 6%2 + 10 - 10%2 = 16 train; under: (2 - 0) * 2 = 4 val
    assert len(ds.train["x"]) == 16
    assert len(ds.val["x"]) == 4
    assert set(ds.train) >= {"train_counter", "val_counter", "ds_idx",
                             "x", "y"}


def test_mixed_dataset_preserve_order_switching():
    ds = _mixed()
    rows = _drain(ds)
    ds_idcs = [r["ds_idx"] for r in rows]
    # cyclic bundles of switch_frequency: 0,0,1,1,0,0,1,1 ... then dataset 0
    # runs out (6 records = 3 bundles) and 1 fills the tail
    for start in range(0, len(ds_idcs), 2):
        assert ds_idcs[start] == ds_idcs[start + 1]
    assert ds_idcs[:4] == [0, 0, 1, 1]
    # dataset 0 has 3 bundles, dataset 1 has 5 -> tail is all 1s
    assert np.bincount(ds_idcs).tolist() == [6, 10]
    # values match the active dataset (+ NaN for missing 'y' in ds 1)
    for r in rows:
        assert r["x"] == r["ds_idx"] + 1
        if r["ds_idx"] == 0:
            assert r["y"] == 10
        else:
            assert np.isnan(r["y"])
        assert r["train_counter"] is True or r["train_counter"] == True  # noqa: E712
        assert not r["val_counter"]


def test_mixed_dataset_val_under_balancing():
    ds = _mixed()
    rows = _drain(ds, "val")
    ds_idcs = [r["ds_idx"] for r in rows]
    assert sorted(ds_idcs) == [0, 0, 1, 1]
    for r in rows:
        assert r["x"] == r["ds_idx"] + 1


def test_mixed_dataset_over_balancing():
    ds = _mixed({"balancing_strategy": {"train": "over", "val": "under"}})
    # over: max(6,10) -> 10 per dataset -> 20 rows
    assert len(ds.train["x"]) == 20
    rows = _drain(ds)
    counts = np.bincount([r["ds_idx"] for r in rows])
    assert counts.tolist() == [10, 10]


def test_mixed_dataset_epoch_wraparound():
    ds = _mixed()
    first = [r["ds_idx"] for r in _drain(ds)]
    second = [r["ds_idx"] for r in _drain(ds)]
    assert len(first) == len(second) == 16
    # pointer state survives epochs without raising
    counts = np.bincount(second)
    assert counts.sum() == 16


def test_mixed_dataset_through_loader():
    """Virtual columns drive the loader's load_function protocol."""
    from medsegpretrainimagenet_tpu.data import BalancedDataLoader
    ds = _mixed()
    cfg = ConfigDict({"epoch": {"uniform": {}}, "batch": {"uniform": {}},
                      "relative_size": 1.0, "sort_by": None,
                      "pad_with": None, "shuffle": False})
    loader = BalancedDataLoader(ds.train, cfg, bs=4, actual_bs=4, seed=0,
                                load_function=ds.load_function,
                                drop_last=True)
    batches = list(loader)
    assert len(batches) == 4
    for batch in batches:
        xs = np.asarray(batch["x"][0] if batch["x"].ndim == 3
                        else batch["x"]).reshape(-1)
        idcs = np.asarray(batch["ds_idx"]).reshape(-1)
        np.testing.assert_array_equal(xs, idcs + 1)


def test_mixed_dataset_lazy_reload():
    """preload_data=False: the active dataset serves real values from the
    start, and switching reloads without losing union-key NaN fills."""
    ds = _mixed({"preload_data": False})
    rows = _drain(ds)
    for r in rows:
        assert r["x"] == r["ds_idx"] + 1, rows
        if r["ds_idx"] == 0:
            assert r["y"] == 10
        else:
            assert np.isnan(r["y"])
    # second epoch exercises reload back to dataset 0
    rows2 = _drain(ds)
    for r in rows2:
        assert r["x"] == r["ds_idx"] + 1
