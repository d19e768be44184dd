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
           "make_device_augment"]


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
