"""Parity of metrics.surface against the reference's vendored medpy code.

Every public function of ``/root/reference/src/metrics/medpy_metrics.py``
is executed (real scipy) and compared against the native reimplementation
— overlap metrics, the surface-distance family (with voxelspacing and
both connectivities), volume correlations (r AND p), and the
object-correspondence family.
"""
import numpy as np
import pytest

import sys
import os
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from conftest import reference_import  # noqa: E402

from medsegpretrainimagenet_tpu.metrics import surface  # noqa: E402


def _blobs(seed: int, shape=(24, 28), n: int = 3) -> np.ndarray:
    """A few random filled rectangles — structured objects, not salt."""
    rng = np.random.default_rng(seed)
    mask = np.zeros(shape, bool)
    for _ in range(n):
        y, x = rng.integers(0, shape[0] - 6), rng.integers(0, shape[1] - 6)
        h, w = rng.integers(2, 7), rng.integers(2, 7)
        mask[y:y + h, x:x + w] = True
    return mask


@pytest.fixture(scope="module")
def medpy():
    with reference_import("metrics.medpy_metrics") as (mod,):
        yield mod


PAIRS = [( _blobs(2 * s), _blobs(2 * s + 1)) for s in range(4)]


def test_overlap_metrics_match_vendored_medpy(medpy):
    for r, g in PAIRS:
        for name in ("dc", "jc", "precision", "recall", "sensitivity",
                     "specificity", "true_negative_rate",
                     "true_positive_rate", "positive_predictive_value",
                     "ravd"):
            expected = getattr(medpy, name)(r, g)
            actual = getattr(surface, name)(r, g)
            assert actual == pytest.approx(expected, rel=1e-6), name


def test_overlap_edge_cases(medpy):
    empty = np.zeros((8, 8), bool)
    some = _blobs(7, (8, 8), 1)
    assert surface.dc(empty, empty) == medpy.dc(empty, empty) == 0.0
    assert surface.precision(empty, some) == 0.0
    assert surface.recall(some, empty) == 0.0
    with pytest.raises(ZeroDivisionError):
        surface.jc(empty, empty)
    with pytest.raises(RuntimeError):
        surface.ravd(some, empty)


@pytest.mark.parametrize("connectivity", [1, 2])
@pytest.mark.parametrize("voxelspacing", [None, (1.0, 2.5)])
def test_surface_distance_family_matches_vendored_medpy(
        medpy, connectivity, voxelspacing):
    for r, g in PAIRS[:2]:
        for name in ("hd", "hd95", "asd", "assd"):
            expected = getattr(medpy, name)(
                r, g, voxelspacing=voxelspacing, connectivity=connectivity)
            actual = getattr(surface, name)(
                r, g, voxelspacing=voxelspacing, connectivity=connectivity)
            assert actual == pytest.approx(expected, rel=1e-5), \
                (name, connectivity, voxelspacing)


def test_surface_distances_empty_raise(medpy):
    empty = np.zeros((8, 8), bool)
    some = _blobs(7, (8, 8), 1)
    with pytest.raises(RuntimeError):
        surface.hd(empty, some)
    with pytest.raises(RuntimeError):
        surface.asd(some, empty)


def test_surface_distances_large_array_device_path(medpy):
    """> the host-path cutoff: exercises the XLA border + EDT path."""
    r = _blobs(11, (160, 160), 5)
    g = _blobs(12, (160, 160), 5)
    assert surface.hd95(r, g) == pytest.approx(medpy.hd95(r, g), rel=1e-5)
    assert surface.assd(r, g) == pytest.approx(medpy.assd(r, g), rel=1e-5)


def test_volume_correlations_match_scipy_pearson(medpy):
    rs = [_blobs(s, (12, 12), 2) for s in range(20, 27)]
    gs = [_blobs(s, (12, 12), 2) for s in range(30, 37)]
    r_exp, p_exp = medpy.volume_correlation(rs, gs)
    r_act, p_act = surface.volume_correlation(rs, gs)
    assert r_act == pytest.approx(r_exp, rel=1e-4)
    assert p_act == pytest.approx(p_exp, rel=1e-3)
    r_exp, p_exp = medpy.volume_change_correlation(rs, gs)
    r_act, p_act = surface.volume_change_correlation(rs, gs)
    assert r_act == pytest.approx(r_exp, rel=1e-4)
    assert p_act == pytest.approx(p_exp, rel=1e-3)


def test_pearson_two_sample_special_case(medpy):
    """n == 2: r is ±1 by construction and scipy defines p = 1.0 (zero
    degrees of freedom); the |r|>=1 -> p=0 clamp must not apply here.
    Covers volume_correlation with 2 images and volume_change_correlation
    with 3 (diff length 2)."""
    def vol(n):
        m = np.zeros((12, 12), bool)
        m.flat[:n] = True
        return m

    rs = [vol(n) for n in (3, 9, 17)]
    gs = [vol(n) for n in (5, 6, 30)]
    r_exp, p_exp = medpy.volume_change_correlation(rs, gs)
    r_act, p_act = surface.volume_change_correlation(rs, gs)
    assert r_act == pytest.approx(r_exp, rel=1e-6)
    assert p_act == p_exp == 1.0
    r_exp, p_exp = medpy.volume_correlation(rs[:2], gs[:2])
    r_act, p_act = surface.volume_correlation(rs[:2], gs[:2])
    assert r_act == pytest.approx(r_exp, rel=1e-6)
    assert p_act == p_exp == 1.0


def test_connected_components_match_scipy_label():
    from scipy import ndimage
    for seed in range(4):
        mask = _blobs(seed, (20, 20), 4)
        for connectivity in (1, 2):
            footprint = ndimage.generate_binary_structure(2, connectivity)
            expected, n_exp = ndimage.label(mask, footprint)
            actual, n_act = surface.connected_components(mask, connectivity)
            assert n_act == n_exp
            # same partition (label ids may in principle differ; compare
            # via matched relabelling)
            for lid in range(1, n_exp + 1):
                ids = np.unique(actual[expected == lid])
                assert len(ids) == 1
                assert (expected == lid).sum() == (actual == ids[0]).sum()


def _overlapping_pairs():
    """Pairs whose objects actually overlap (a shifted/eroded twin plus
    extra spurious blobs) — exercises matched, unmatched and ambiguous
    correspondences."""
    out = []
    for seed in range(3):
        g = _blobs(seed, (24, 28), 3)
        r = np.roll(g, (1, 1), (0, 1)) | _blobs(90 + seed, (24, 28), 1)
        out.append((r, g))
    return out


@pytest.mark.parametrize("connectivity", [1, 2])
def test_obj_family_matches_vendored_medpy(medpy, connectivity):
    for r, g in _overlapping_pairs():
        assert surface.obj_fpr(r, g, connectivity) == pytest.approx(
            medpy.obj_fpr(r, g, connectivity))
        assert surface.obj_tpr(r, g, connectivity) == pytest.approx(
            medpy.obj_tpr(r, g, connectivity))
        assert surface.obj_asd(r, g, connectivity=connectivity) == \
            pytest.approx(medpy.obj_asd(r, g, connectivity=connectivity),
                          rel=1e-5, nan_ok=True)
        assert surface.obj_assd(r, g, connectivity=connectivity) == \
            pytest.approx(medpy.obj_assd(r, g, connectivity=connectivity),
                          rel=1e-5, nan_ok=True)


def test_obj_asd_voxelspacing(medpy):
    r, g = _overlapping_pairs()[0]
    assert surface.obj_asd(r, g, voxelspacing=(2.0, 1.0)) == pytest.approx(
        medpy.obj_asd(r, g, voxelspacing=(2.0, 1.0)), rel=1e-5)


def test_edt_voxelspacing_matches_scipy():
    from scipy import ndimage
    import jax.numpy as jnp
    from medsegpretrainimagenet_tpu.metrics.hd95 import edt
    rng = np.random.default_rng(3)
    mask = rng.random((24, 30)) > 0.9
    expected = ndimage.distance_transform_edt(~mask, sampling=(1.5, 0.75))
    actual = np.asarray(edt(jnp.asarray(mask), spacing=(1.5, 0.75)))
    np.testing.assert_allclose(actual, expected, rtol=1e-5, atol=1e-5)


def test_edt_3d_matches_scipy():
    from scipy import ndimage
    import jax.numpy as jnp
    from medsegpretrainimagenet_tpu.metrics.hd95 import edt
    rng = np.random.default_rng(4)
    mask = rng.random((10, 12, 14)) > 0.95
    expected = ndimage.distance_transform_edt(~mask)
    actual = np.asarray(edt(jnp.asarray(mask)))
    np.testing.assert_allclose(actual, expected, rtol=1e-5, atol=1e-5)
