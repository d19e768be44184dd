"""Behavioral parity with the reference's BalancedDataset/DataIterator
(imported from /root/reference with mocked heavy deps): epoch lengths, cut
bookkeeping, and per-batch positive/negative guarantees must match — RNG
streams differ, so the comparison is on invariants, not exact orders."""
import importlib.abc
import importlib.util
import sys
from unittest.mock import MagicMock

import numpy as np
import pytest

from medsegpretrainimagenet_tpu.config import ConfigDict
from medsegpretrainimagenet_tpu.data import BalancedDataLoader
from medsegpretrainimagenet_tpu.data.sampling import (BalancedSource,
                                                      batch_index_plan)

from conftest import reference_import  # noqa: E402


@pytest.fixture(scope="module")
def reference_utils():
    with reference_import("data.utils") as (ref_data_utils,):
        yield ref_data_utils


def _dataset(n=40, n_pos=10, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.random((n, 4)).astype(np.float32)
    label = np.zeros(n, np.int64)
    label[:n_pos] = 1
    order = rng.permutation(n)
    return {"x": x[order], "label": label[order]}


@pytest.mark.parametrize("balanced", ["over", "under", "pos_only", 1])
def test_lengths_and_cut_match_reference(reference_utils, balanced):
    data = _dataset()
    # pos_ratio 0.5 like the shipped configs (the default 1.0 divides by
    # zero in the reference's own balance_factor)
    ref = reference_utils.BalancedDataset(
        {k: list(v) for k, v in data.items()}, balanced=balanced, seed=0,
        pos_ratio_in_ds=0.5)
    ours = BalancedSource(data, balanced=balanced, seed=0,
                          pos_ratio_in_ds=0.5)
    assert len(ours) == len(ref)
    assert ours.pos_len == ref.pos_len
    assert ours.neg_len == ref.neg_len
    if hasattr(ref, "cut"):   # reference's pos_only branch sets no cut
        assert ours.cut["amount"] == pytest.approx(ref.cut["amount"])
        if "class" in ref.cut:
            assert ours.cut["class"] == ref.cut["class"]


def test_batch_plan_min_counts_match_reference(reference_utils):
    """Both planners guarantee >= p positives and >= n negatives per
    virtual batch and produce the same number of batches."""
    data = _dataset(n=48, n_pos=12)
    bs, p, n = 8, 2, 3

    ref_ds = reference_utils.BalancedDataset(
        {k: list(v) for k, v in data.items()}, balanced="over", seed=0,
        pos_ratio_in_ds=0.5)
    ref_it = reference_utils.DataIterator(
        ref_ds, min_pos_ratio=p / bs, min_neg_ratio=n / bs, bs=bs,
        loaded_bs=bs)
    ref_batches = len(ref_it)

    ours = BalancedSource(data, balanced="over", seed=0,
                          pos_ratio_in_ds=0.5)
    n_batches, plan = batch_index_plan(
        len(ours), len(ours) - ours.neg_len, p, n, bs, ours.cut,
        np.random.default_rng(0))
    assert n_batches == ref_batches

    # per-batch guarantees on our plan
    def is_pos(idx):
        return idx >= ours.neg_len
    for start in range(0, n_batches * bs, bs):
        chunk = plan[start:start + bs]
        pos = sum(1 for i in chunk if is_pos(i))
        assert pos >= p
        assert (bs - pos) >= n


def test_reference_getitem_semantics_match(reference_utils):
    """Same balanced='over' index space: index < neg_len -> negatives,
    rest cycles positives (reference data/utils.py:126-149)."""
    data = _dataset(n=20, n_pos=5, seed=3)
    ref = reference_utils.BalancedDataset(
        {k: list(v) for k, v in data.items()}, balanced="over", seed=0,
        pos_ratio_in_ds=0.5)
    ours = BalancedSource(data, balanced="over", seed=0,
                          pos_ratio_in_ds=0.5)
    for index in range(len(ours)):
        ref_item = ref[index]
        our_item = ours[index]
        ref_label = int(np.asarray(ref_item["label"]))
        assert ref_label == int(np.asarray(our_item["label"])), index
        np.testing.assert_allclose(np.asarray(ref_item["x"]),
                                   np.asarray(our_item["x"]))
