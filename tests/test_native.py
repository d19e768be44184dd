"""Native C++ (OpenMP) host kernels: build, bind, numerical parity."""
import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from medsegpretrainimagenet_tpu import native  # noqa: E402

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="no g++ / native build failed")


def _cv2_rotate(img, angle, nearest=False, fill=0.0):
    h, w = img.shape[:2]
    m = cv2.getRotationMatrix2D((w / 2 - 0.5, h / 2 - 0.5), float(angle),
                                1.0)
    out = cv2.warpAffine(
        img.astype(np.float32), m, (w, h),
        flags=cv2.INTER_NEAREST if nearest else cv2.INTER_LINEAR,
        borderMode=cv2.BORDER_CONSTANT, borderValue=fill)
    return out


def test_rotate_bilinear_matches_cv2():
    rng = np.random.default_rng(0)
    imgs = rng.random((6, 33, 47, 3)).astype(np.float32)
    angles = rng.uniform(-180, 180, 6).astype(np.float32)
    out = native.rotate_batch(imgs, angles)
    ref = np.stack([_cv2_rotate(imgs[i], angles[i]) for i in range(6)])
    np.testing.assert_allclose(out, ref, atol=1e-4)


def test_rotate_nearest_masks_match_cv2():
    rng = np.random.default_rng(1)
    masks = rng.integers(0, 4, (6, 40, 40)).astype(np.int32)
    angles = rng.uniform(-180, 180, 6).astype(np.float32)
    out = native.rotate_batch(masks, angles, nearest=True)
    ref = np.stack([_cv2_rotate(masks[i], angles[i], nearest=True)
                    for i in range(6)]).astype(np.int32)
    # nearest rounding at exact-half boundaries may differ on a handful of
    # pixels; demand > 99.9% agreement
    assert (out == ref).mean() > 0.999
    assert out.shape == masks.shape


def test_rotate_identity_angle():
    rng = np.random.default_rng(2)
    imgs = rng.random((2, 16, 16, 1)).astype(np.float32)
    out = native.rotate_batch(imgs, np.zeros(2, np.float32))
    np.testing.assert_allclose(out, imgs, atol=1e-6)


def test_flip_batch_per_sample_flags():
    rng = np.random.default_rng(3)
    imgs = rng.random((4, 8, 10, 2)).astype(np.float32)
    fv = np.array([1, 0, 1, 0], np.uint8)
    fh = np.array([0, 1, 1, 0], np.uint8)
    out = native.flip_batch(imgs, fv, fh)
    for i in range(4):
        ref = imgs[i]
        if fv[i]:
            ref = ref[::-1]
        if fh[i]:
            ref = ref[:, ::-1]
        np.testing.assert_array_equal(out[i], ref)
    # int32 masks too (any 4-byte dtype)
    masks = rng.integers(0, 5, (4, 8, 10)).astype(np.int32)
    outm = native.flip_batch(masks, fv, fh)
    np.testing.assert_array_equal(outm[0], masks[0][::-1])


def test_u8_scale():
    rng = np.random.default_rng(4)
    arr = rng.integers(0, 256, (3, 5, 7), np.uint8).astype(np.uint8)
    out = native.u8_to_f32_scale(arr)
    np.testing.assert_allclose(out, arr.astype(np.float32) / 255.0,
                               rtol=1e-6)
    assert out.dtype == np.float32
