"""Device-side classification pretraining augmentation
(``ops/augment.py``: RandomResizedCrop / MixupOrCutMix / RandomErasing /
one-hot on device — the measured answer to the host-bound pretraining
input path, bench ``pretrain224_e2e_measured``)."""
import cv2
import jax
import jax.numpy as jnp
import numpy as np

from medsegpretrainimagenet_tpu.ops.augment import (
    erase_batch, make_classification_device_augment,
    mixup_or_cutmix_batch, random_resized_crop_batch)


def test_crop_full_box_matches_cv2_resize():
    """scale=(1,1), ratio=(1,1) on square images degenerates to a plain
    resize of the whole image — must match cv2.resize INTER_LINEAR
    (same half-pixel-center convention)."""
    rng = np.random.default_rng(0)
    imgs = rng.random((2, 32, 32, 3)).astype(np.float32)
    out = random_resized_crop_batch(jax.random.key(0), jnp.asarray(imgs),
                                    16, scale=(1.0, 1.0),
                                    ratio=(1.0, 1.0))
    for i in range(2):
        golden = cv2.resize(imgs[i], (16, 16),
                            interpolation=cv2.INTER_LINEAR)
        np.testing.assert_allclose(np.array(out[i]), golden, atol=2e-3)


def test_crop_shapes_dtype_and_determinism():
    imgs = jnp.asarray(np.random.default_rng(1).integers(
        0, 256, (3, 40, 40, 3), dtype=np.uint8))
    a = random_resized_crop_batch(jax.random.key(5), imgs, 24)
    b = random_resized_crop_batch(jax.random.key(5), imgs, 24)
    c = random_resized_crop_batch(jax.random.key(6), imgs, 24)
    assert a.shape == (3, 24, 24, 3) and a.dtype == jnp.uint8
    np.testing.assert_array_equal(np.array(a), np.array(b))
    assert np.abs(np.array(a).astype(int)
                  - np.array(c).astype(int)).max() > 0


def test_erase_fills_one_rectangle_within_bounds():
    imgs = jnp.ones((4, 30, 30, 3), jnp.float32)
    out = np.array(erase_batch(jax.random.key(0), imgs, p=1.0,
                               scale=(0.1, 0.2), value=0.0))
    for i in range(4):
        zero = out[i, :, :, 0] == 0.0
        frac = zero.mean()
        assert 0.05 <= frac <= 0.35      # ~scale bounds (int rounding)
        # the zero region is ONE axis-aligned rectangle
        ys, xs = np.where(zero)
        assert zero[ys.min():ys.max() + 1, xs.min():xs.max() + 1].all()
    # p=0 -> identity
    np.testing.assert_array_equal(
        np.array(erase_batch(jax.random.key(1), imgs, p=0.0)),
        np.array(imgs))


def test_mixup_arm_is_convex_combination_with_matching_labels():
    n, classes = 8, 5
    rng = np.random.default_rng(2)
    # constant-per-sample images let us read lam back off the pixels
    vals = rng.random(n).astype(np.float32)
    x = jnp.asarray(np.broadcast_to(vals[:, None, None, None],
                                    (n, 8, 8, 3)).copy())
    labels = jax.nn.one_hot(jnp.arange(n) % classes, classes)
    xo, yo = mixup_or_cutmix_batch(jax.random.key(3), x, labels,
                                   switch_probability=1.0,
                                   mixup_probability=1.0)
    xo, yo = np.array(xo), np.array(yo)
    assert yo.shape == (n, classes)
    np.testing.assert_allclose(yo.sum(-1), 1.0, atol=1e-6)
    for i in range(n):
        pix = xo[i, 0, 0, 0]
        lo, hi = min(vals), max(vals)
        assert lo - 1e-6 <= pix <= hi + 1e-6    # convex combination


def test_cutmix_arm_pixels_come_from_exactly_two_sources():
    n, classes = 6, 4
    vals = np.arange(1, n + 1, dtype=np.float32)
    x = jnp.asarray(np.broadcast_to(vals[:, None, None, None],
                                    (n, 16, 16, 1)).copy())
    labels = jax.nn.one_hot(jnp.arange(n) % classes, classes)
    xo, yo = mixup_or_cutmix_batch(jax.random.key(4), x, labels,
                                   switch_probability=0.0,
                                   cutmix_probability=1.0)
    xo, yo = np.array(xo), np.array(yo)
    for i in range(n):
        uniq = set(np.unique(xo[i]))
        assert uniq <= set(vals)                 # no blending
        assert vals[i] in uniq or len(uniq) == 1
        # label lam equals the foreign-pixel area fraction exactly
        foreign = (xo[i, :, :, 0] != vals[i]).mean()
        own = yo[i, (i % classes)]
        partner_classes = np.where(yo[i] > 0)[0]
        if len(partner_classes) == 2:
            assert abs((1 - own) - foreign) < 1e-5
    np.testing.assert_allclose(yo.sum(-1), 1.0, atol=1e-6)


def test_full_chain_shapes_and_soft_labels():
    chain = make_classification_device_augment(out_size=16, n_classes=7)
    batch = {
        "x": jnp.asarray(np.random.default_rng(5).random(
            (4, 24, 24, 3)).astype(np.float32)),
        "label": jnp.asarray([0, 1, 2, 3], jnp.int32),
    }
    out = jax.jit(chain)(jax.random.key(0), batch)
    assert out["x"].shape == (4, 16, 16, 3)
    assert out["x"].dtype == jnp.float32
    assert out["label"].shape == (4, 7)
    np.testing.assert_allclose(np.array(out["label"]).sum(-1), 1.0,
                               atol=1e-6)
    # deterministic under the same key
    out2 = jax.jit(chain)(jax.random.key(0), batch)
    np.testing.assert_array_equal(np.array(out["x"]),
                                  np.array(out2["x"]))
