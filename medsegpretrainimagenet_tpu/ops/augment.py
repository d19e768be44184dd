"""On-device (jittable) batched augmentation.

SURVEY.md §7: "host numpy augmentation can starve a v5e — push
normalize/flip/rotate/mixup on device".  These ops run *inside* the jitted
train step on the already-transferred batch, so the host pipeline reduces
to batch slicing + one H2D copy:

* ``rotate_batch``  — per-sample random-angle rotation about the image
  centre (bilinear for images, nearest for mask columns, constant fill),
  the device analog of the reference's albumentations ``Rotate``
  (``segmentation/transforms/transforms.py:12-71``);
* ``flip_batch``    — per-sample vertical/horizontal flips via ``jnp.where``
  on the reversed tensor (no gathers);
* ``make_device_augment`` — composes the standard segmentation chain
  (rotation → flip → channel repeat) into one function
  ``(rng, batch) -> batch`` for the train step.

Everything is static-shaped; the resample is two chained 1-D gathers
(rows then columns) which XLA lowers to efficient dynamic-slices, with all
FLOPs on the VPU.
"""
from __future__ import annotations

from typing import Callable, Dict, Optional, Sequence

import jax
import jax.numpy as jnp

__all__ = ["rotate_batch", "flip_batch", "repeat_channels",
           "make_device_augment", "random_resized_crop_batch",
           "erase_batch", "mixup_or_cutmix_batch",
           "make_classification_device_augment"]


def _grid(h: int, w: int, angles_rad: jax.Array):
    """Inverse-mapped source coordinates, (N, H, W) each."""
    cx, cy = w / 2.0 - 0.5, h / 2.0 - 0.5
    ys = jnp.arange(h, dtype=jnp.float32) - cy
    xs = jnp.arange(w, dtype=jnp.float32) - cx
    dy, dx = jnp.meshgrid(ys, xs, indexing="ij")        # (H, W)
    ca = jnp.cos(angles_rad)[:, None, None]
    sa = jnp.sin(angles_rad)[:, None, None]
    sx = ca * dx[None] - sa * dy[None] + cx
    sy = sa * dx[None] + ca * dy[None] + cy
    return sx, sy


def _gather_hw(img, iy, ix):
    """img (H, W, C), iy/ix (H, W) int -> (H, W, C) via two 1-D takes."""
    rows = jnp.take(img, iy.reshape(-1), axis=0)        # (H*W, W, C)
    vals = jnp.take_along_axis(
        rows, ix.reshape(-1)[:, None, None], axis=1)    # (H*W, 1, C)
    return vals.reshape(*iy.shape, img.shape[-1])


def rotate_batch(images: jax.Array, angles_deg: jax.Array,
                 fill: float = 0.0, nearest: bool = False) -> jax.Array:
    """Rotate (N, H, W, C) by per-sample degrees (counter-clockwise,
    cv2/albumentations convention); constant border."""
    n, h, w, c = images.shape
    # same inverse map as the native kernel (cv2.warpAffine semantics)
    angles = jnp.deg2rad(angles_deg.astype(jnp.float32))
    sx, sy = _grid(h, w, angles)

    def sample_one(img, sx, sy):
        if nearest:
            ix = jnp.clip(jnp.round(sx).astype(jnp.int32), 0, w - 1)
            iy = jnp.clip(jnp.round(sy).astype(jnp.int32), 0, h - 1)
            out = _gather_hw(img, iy, ix)
            valid = ((jnp.round(sx) >= 0) & (jnp.round(sx) < w)
                     & (jnp.round(sy) >= 0) & (jnp.round(sy) < h))
            return jnp.where(valid[..., None], out,
                             jnp.asarray(fill, img.dtype))
        x0 = jnp.floor(sx)
        y0 = jnp.floor(sy)
        fx = (sx - x0)[..., None]
        fy = (sy - y0)[..., None]
        x0i = x0.astype(jnp.int32)
        y0i = y0.astype(jnp.int32)
        img_f = img.astype(jnp.float32)
        fill_v = jnp.float32(fill)

        def corner(yi, xi):
            valid = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
            vals = _gather_hw(img_f, jnp.clip(yi, 0, h - 1),
                              jnp.clip(xi, 0, w - 1))
            return jnp.where(valid[..., None], vals, fill_v)

        v00 = corner(y0i, x0i)
        v01 = corner(y0i, x0i + 1)
        v10 = corner(y0i + 1, x0i)
        v11 = corner(y0i + 1, x0i + 1)
        out = ((1 - fy) * ((1 - fx) * v00 + fx * v01)
               + fy * ((1 - fx) * v10 + fx * v11))
        # integer inputs round like cv2.warpAffine (astype would truncate
        # 127.9 -> 127, a systematic darkening vs the host path)
        if jnp.issubdtype(images.dtype, jnp.integer):
            return jnp.round(out).astype(images.dtype)
        return out.astype(images.dtype)
    return jax.vmap(sample_one)(images, sx, sy)


def flip_batch(images: jax.Array, flip_v: jax.Array,
               flip_h: jax.Array) -> jax.Array:
    """Per-sample flips of (N, H, W, ...) with boolean flag vectors."""
    expand = (slice(None),) + (None,) * (images.ndim - 1)
    out = jnp.where(flip_v[expand], images[:, ::-1], images)
    return jnp.where(flip_h[expand], out[:, :, ::-1], out)


def repeat_channels(x: jax.Array, n: int = 3) -> jax.Array:
    """Repeat the channel axis *n* times (reference
    ``transform.RepeatChannels``): ``n`` is the repeat FACTOR, not a
    target channel count — the host transform does an unconditional
    ``np.repeat(x, repeats, axis=-1)`` (``transforms/core.py``
    RepeatChannels), so a C=3 input with repeats=3 becomes 9 channels
    there and must here too, or toggling device_augmentation changes the
    model's input shape."""
    return jnp.repeat(x, n, axis=-1)


def make_device_augment(rotation_limit: Optional[float] = None,
                        rotation_probability: float = 1.0,
                        flip_vertical: bool = False,
                        flip_horizontal: bool = False,
                        flip_probability: float = 1.0,
                        channel_repeats: Optional[int] = None,
                        mask_keys: Sequence[str] = ("mask", "distance_map"),
                        fill: float = 0.0, mask_fill: float = 0.0
                        ) -> Callable:
    """Compose the standard train-time chain into ``(rng, batch) -> batch``.

    Applied inside the jitted train step per fragment; geometry draws are
    shared between ``x`` and the mask columns, and the flip semantics match
    the host ``RandomFlip`` (albumentations ``Flip``: with probability p,
    pick one of {both, vertical, horizontal} when both directions are on).
    """

    def augment(rng: jax.Array, batch: Dict[str, jax.Array]):
        batch = dict(batch)
        x = batch["x"]
        n = x.shape[0]
        k_rot, k_rgate, k_fgate, k_code = jax.random.split(rng, 4)

        if rotation_limit:
            angles = jax.random.uniform(
                k_rot, (n,), minval=-rotation_limit, maxval=rotation_limit)
            if rotation_probability < 1.0:
                gate = jax.random.bernoulli(k_rgate, rotation_probability,
                                            (n,))
                angles = jnp.where(gate, angles, 0.0)
            x = rotate_batch(x, angles, fill=fill)
            for key in mask_keys:
                if key in batch and batch[key] is not None \
                        and batch[key].ndim >= 3:
                    mask = batch[key]
                    squeeze = mask.ndim == 3
                    m = mask[..., None] if squeeze else mask
                    # nearest by column *name*, like the host joint
                    # transforms (ConvertToType may have cast the mask to
                    # float, but it is still a mask)
                    m = rotate_batch(m, angles, fill=mask_fill,
                                     nearest=True)
                    m = m.astype(mask.dtype)
                    batch[key] = m[..., 0] if squeeze else m

        if flip_vertical or flip_horizontal:
            gate = jax.random.bernoulli(k_fgate, flip_probability, (n,))
            if flip_vertical and flip_horizontal:
                # albumentations Flip codes: -1 both, 0 vertical, 1 horiz.
                code = jax.random.randint(k_code, (n,), -1, 2)
                fv = gate & (code <= 0)
                fh = gate & (code != 0)
            elif flip_vertical:
                fv, fh = gate, jnp.zeros((n,), bool)
            else:
                fv, fh = jnp.zeros((n,), bool), gate
            x = flip_batch(x, fv, fh)
            for key in mask_keys:
                if key in batch and batch[key] is not None \
                        and batch[key].ndim >= 3:
                    batch[key] = flip_batch(batch[key], fv, fh)

        if channel_repeats:
            x = repeat_channels(x, channel_repeats)
        batch["x"] = x
        return batch

    return augment


# ---------------------------------------------------------------------------
# classification pretraining chain, on device
# ---------------------------------------------------------------------------
#
# The host chain (config/pretraining/*: RandomResizedCrop -> flip ->
# RandAugment -> OneHot -> MixupOrCutMix -> RandomErasing, numpy/cv2 in
# data/transforms/classification.py) measures ~4.6 ms/image on a 1-core
# host -- a ~215 img/s ceiling against the ~880 img/s pretraining step
# (bench pretrain224_e2e_measured).  These ops move the chain into the
# jitted step so the host pipeline reduces to lazy uint8 loads + batch
# stacking.  Two documented deviations from the host semantics (both
# jit-shape constraints, not quality regressions):
#  * RandomResizedCrop draws ONE clamped box per sample instead of
#    torchvision's 10-attempt rejection loop (differs only for extreme
#    aspect draws, where the host falls back to a center crop);
#  * Mixup/CutMix pair each sample with a batch PERMUTATION partner
#    (timm-style) instead of the loader's independent second datapoint
#    -- pairs come from the same shuffled epoch either way.
# RandAugment stays host-side (its 14-op table is data-dependent
# branch-heavy; lift it only with a measured win).


def _bilinear_axis(img, coords, axis):
    """Lerp-resample *img* along *axis* at float *coords* (clamped edge).

    SEPARABLE on purpose: bilinear crop-resize as rows-then-columns 1-D
    takes keeps intermediates at (out, W, C) — the generic 2-D gather
    (``_gather_hw`` over an (H', W') index grid) materializes an
    (H'·W', W, C) tensor per image, ~150 MB at 224²-from-256², which
    measured a catastrophic ~21 s/step inside the augmented train
    step."""
    size = img.shape[axis]
    lo = jnp.floor(coords)
    frac = coords - lo
    i0 = jnp.clip(lo.astype(jnp.int32), 0, size - 1)
    i1 = jnp.clip(i0 + 1, 0, size - 1)
    shape = [1] * img.ndim
    shape[axis] = coords.shape[0]
    frac = frac.reshape(shape)
    return ((1 - frac) * jnp.take(img, i0, axis=axis)
            + frac * jnp.take(img, i1, axis=axis))


def random_resized_crop_batch(rng: jax.Array, images: jax.Array,
                              out_size: int,
                              scale=(0.08, 1.0),
                              ratio=(3 / 4, 4 / 3)) -> jax.Array:
    """Per-sample RandomResizedCrop to (out_size, out_size), bilinear
    (torchvision / cv2 half-pixel-center convention)."""
    n, h, w, _ = images.shape
    k_area, k_ratio, k_top, k_left = jax.random.split(rng, 4)
    area = h * w * jax.random.uniform(
        k_area, (n,), minval=scale[0], maxval=scale[1])
    import math
    log_r = jax.random.uniform(k_ratio, (n,),
                               minval=math.log(ratio[0]),
                               maxval=math.log(ratio[1]))
    aspect = jnp.exp(log_r)
    cw = jnp.clip(jnp.sqrt(area * aspect), 1.0, w)
    ch = jnp.clip(jnp.sqrt(area / aspect), 1.0, h)
    top = jax.random.uniform(k_top, (n,)) * (h - ch)
    left = jax.random.uniform(k_left, (n,)) * (w - cw)
    centers = jnp.arange(out_size, dtype=jnp.float32) + 0.5
    sy = top[:, None] + centers[None] * (ch[:, None] / out_size) - 0.5
    sx = left[:, None] + centers[None] * (cw[:, None] / out_size) - 0.5

    def one(img, syi, sxi):
        t = _bilinear_axis(img.astype(jnp.float32), syi, axis=0)
        return _bilinear_axis(t, sxi, axis=1)

    out = jax.vmap(one)(images, sy, sx)
    if jnp.issubdtype(images.dtype, jnp.integer):
        return jnp.round(out).astype(images.dtype)
    return out.astype(images.dtype)


def erase_batch(rng: jax.Array, images: jax.Array, p: float = 0.5,
                scale=(0.02, 0.33), ratio=(0.3, 3.3),
                value: float = 0.0) -> jax.Array:
    """torchvision RandomErasing: per-sample random rectangle fill."""
    n, h, w, _ = images.shape
    import math
    k_gate, k_area, k_ratio, k_top, k_left = jax.random.split(rng, 5)
    gate = jax.random.bernoulli(k_gate, p, (n,))
    area = h * w * jax.random.uniform(
        k_area, (n,), minval=scale[0], maxval=scale[1])
    aspect = jnp.exp(jax.random.uniform(
        k_ratio, (n,), minval=math.log(ratio[0]),
        maxval=math.log(ratio[1])))
    eh = jnp.clip(jnp.sqrt(area / aspect), 1.0, h)
    ew = jnp.clip(jnp.sqrt(area * aspect), 1.0, w)
    top = jax.random.uniform(k_top, (n,)) * (h - eh)
    left = jax.random.uniform(k_left, (n,)) * (w - ew)
    yy = jnp.arange(h, dtype=jnp.float32)[None, :, None]
    xx = jnp.arange(w, dtype=jnp.float32)[None, None, :]
    inside = ((yy >= top[:, None, None]) & (yy < (top + eh)[:, None, None])
              & (xx >= left[:, None, None])
              & (xx < (left + ew)[:, None, None]))
    hit = (inside & gate[:, None, None])[..., None]
    return jnp.where(hit, jnp.asarray(value, images.dtype), images)


def mixup_or_cutmix_batch(rng: jax.Array, x: jax.Array,
                          labels_onehot: jax.Array,
                          switch_probability: float = 0.5,
                          mixup_probability: float = 1.0,
                          mixup_maximum: float = 1.0,
                          cutmix_probability: float = 1.0,
                          cutmix_alpha: float = 1.0):
    """Batch-level MixupOrCutMix over permutation partners.

    Mixup follows the shipped uniform-distribution config
    (``lam ~ U(0, maximum)``, ``x = (1-lam) x1 + lam x2`` -- host
    ``transform.Mixup``); CutMix is the classification rectangle variant
    with beta-sampled area and area-exact label mixing
    (``classification.transforms.CutMix``)."""
    n, h, w, _ = x.shape
    (k_perm, k_switch, k_mgate, k_lam, k_cgate, k_beta, k_rx,
     k_ry) = jax.random.split(rng, 8)
    perm = jax.random.permutation(k_perm, n)
    x2 = x[perm]
    y2 = labels_onehot[perm]
    use_mixup = jax.random.bernoulli(k_switch, switch_probability, (n,))

    # mixup arm
    m_gate = jax.random.bernoulli(k_mgate, mixup_probability, (n,))
    lam_m = jax.random.uniform(k_lam, (n,),
                               maxval=mixup_maximum) * m_gate
    # cutmix arm (reference: beta-sampled lam, half-side = sqrt(1-lam)/2,
    # box wrapped at the borders is NOT wrapped here -- clamped box with
    # area-exact label lam)
    c_gate = jax.random.bernoulli(k_cgate, cutmix_probability, (n,))
    lam_c = jax.random.beta(k_beta, cutmix_alpha, cutmix_alpha, (n,))
    half = jnp.sqrt(1 - lam_c) / 2
    bh = jnp.round(jnp.clip(2 * half * h, 0, h))
    bw = jnp.round(jnp.clip(2 * half * w, 0, w))
    ry = jnp.floor(jax.random.uniform(k_ry, (n,)) * (h - bh + 1))
    rx = jnp.floor(jax.random.uniform(k_rx, (n,)) * (w - bw + 1))
    yy = jnp.arange(h, dtype=jnp.float32)[None, :, None]
    xx = jnp.arange(w, dtype=jnp.float32)[None, None, :]
    in_box = ((yy >= ry[:, None, None]) & (yy < (ry + bh)[:, None, None])
              & (xx >= rx[:, None, None])
              & (xx < (rx + bw)[:, None, None]))
    in_box = in_box & c_gate[:, None, None]
    mixed_frac = (in_box.sum(axis=(1, 2)) / (h * w)).astype(jnp.float32)

    x_mix = ((1 - lam_m)[:, None, None, None] * x.astype(jnp.float32)
             + lam_m[:, None, None, None] * x2.astype(jnp.float32))
    x_cut = jnp.where(in_box[..., None], x2.astype(jnp.float32),
                      x.astype(jnp.float32))
    x_out = jnp.where(use_mixup[:, None, None, None], x_mix, x_cut)
    lam_label = jnp.where(use_mixup, lam_m, mixed_frac)
    y_out = ((1 - lam_label)[:, None] * labels_onehot
             + lam_label[:, None] * y2)
    return x_out.astype(jnp.float32), y_out


def make_classification_device_augment(
        out_size: int, n_classes: int,
        crop_scale=(0.08, 1.0), crop_ratio=(3 / 4, 4 / 3),
        flip_probability: float = 0.5,
        mixup_switch_probability: float = 0.5,
        mixup_probability: float = 0.8,
        mixup_maximum: float = 1.0,
        cutmix_probability: float = 1.0,
        erasing_probability: float = 0.25) -> Callable:
    """The pretraining train chain as one jitted ``(rng, batch) -> batch``:
    RandomResizedCrop -> horizontal flip -> OneHot -> MixupOrCutMix ->
    RandomErasing, on the already-transferred uint8 (dequantized) batch.
    Labels come in as class indices and leave one-hot/soft."""

    def augment(rng: jax.Array, batch: Dict[str, jax.Array]):
        batch = dict(batch)
        x = batch["x"]
        n = x.shape[0]
        k_crop, k_flip, k_mix, k_erase = jax.random.split(rng, 4)
        x = random_resized_crop_batch(k_crop, x, out_size,
                                      scale=crop_scale, ratio=crop_ratio)
        fh = jax.random.bernoulli(k_flip, flip_probability, (n,))
        x = flip_batch(x, jnp.zeros((n,), bool), fh)
        label = batch["label"]
        if label.ndim == 1:
            label = jax.nn.one_hot(label, n_classes, dtype=jnp.float32)
        x, label = mixup_or_cutmix_batch(
            k_mix, x, label,
            switch_probability=mixup_switch_probability,
            mixup_probability=mixup_probability,
            mixup_maximum=mixup_maximum,
            cutmix_probability=cutmix_probability)
        x = erase_batch(k_erase, x, p=erasing_probability)
        batch["x"] = x
        batch["label"] = label
        return batch

    return augment
