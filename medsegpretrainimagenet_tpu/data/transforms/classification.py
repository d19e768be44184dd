"""Classification augmentations + torchvision.transforms aliases.

Capability parity with ``/root/reference/src/classification/transforms.py``
(OneHotEncoding, rectangle CutMix, MixupOrCutMix, RandAugment) plus native
channels-last numpy implementations of the ``torchvision.transforms.*``
names the shipped pretraining configs use (Resize, CenterCrop,
RandomHorizontalFlip, RandomResizedCrop, ColorJitter, RandomErasing).

All transforms are host-side numpy on (H, W, C) arrays; labels are class
indices or one-hot vectors.
"""
from __future__ import annotations

import math
from typing import Any, Dict, Optional, Tuple

import cv2
import numpy as np

from ...config import ConfigDict, register
from .core import Mixup

__all__ = ["OneHotEncoding", "CutMix", "MixupOrCutMix", "RandAugment",
           "TVResize", "TVCenterCrop", "TVRandomHorizontalFlip",
           "RandomResizedCrop", "ColorJitter", "RandomErasing"]


@register("classification.transforms.OneHotEncoding")
class OneHotEncoding:
    PARAMS = dict(num_classes=1000)

    def __init__(self, config_dict: Optional[ConfigDict] = None,
                 num_classes: int = 1000, **kwargs):
        if config_dict is not None:
            num_classes = config_dict.get("num_classes", num_classes)
        self.num_classes = num_classes
        # cached: a fresh num_classes² eye per sample is a 4 MB alloc per
        # ImageNet image on the host hot path
        self._eye = np.eye(num_classes, dtype=np.float32)

    def _encode(self, label):
        return self._eye[np.asarray(label).astype(int)].copy()

    def __call__(self, k: int = 1, **data):
        label = data["label"]
        if k > 1 and isinstance(label, list):
            data["label"] = [self._encode(l) for l in label]  # noqa: E741
        else:
            data["label"] = self._encode(label)
        data["k"] = k
        return data


@register("classification.transforms.CutMix")
class CutMix:
    """Rectangle CutMix with beta-sampled area (reference
    ``classification/transforms.py:19-53``); channels-last spatial axes."""

    PARAMS = dict(probability=1.0, alpha=1.0)
    num_datapoints = 2

    def __init__(self, config_dict: Optional[ConfigDict] = None,
                 seed: Optional[int] = None, **kwargs):
        config_dict = config_dict or ConfigDict()
        self.p = config_dict.get("probability", 1.0)
        self.alpha = config_dict.get("alpha", 1.0)
        self.rng = np.random.default_rng(seed)

    def __call__(self, k: int = 1, **data):
        (x1, x2), (t1, t2) = data["x"][:2], data["label"][:2]
        data = {key: value[0] if isinstance(value, list) else value
                for key, value in data.items()}
        data["k"] = 1
        if self.rng.binomial(1, self.p):
            x1 = np.asarray(x1)
            x2 = np.asarray(x2)
            w, h = x1.shape[0], x1.shape[1]
            lam = self.rng.beta(self.alpha, self.alpha)
            scale = np.sqrt(1 - lam) / 2
            rx, ry = self.rng.integers(0, w), self.rng.integers(0, h)
            rw = int(np.round(w * scale))
            rh = int(np.round(h * scale))
            x_start, x_end = max(0, rx - rw), min(w, rx + rw)
            y_start, y_end = max(0, ry - rh), min(h, ry + rh)
            x = np.array(x1, copy=True)
            x[x_start:x_end, y_start:y_end] = x2[x_start:x_end, y_start:y_end]
            mu = (x_end - x_start) * (y_end - y_start) / (h * w)
            data["x"] = x
            data["label"] = (1 - mu) * np.asarray(t1) + mu * np.asarray(t2)
        return data


@register("classification.transforms.MixupOrCutMix")
class MixupOrCutMix:
    PARAMS = dict(cutmix_params=CutMix.PARAMS, mixup_params=Mixup.PARAMS,
                  switch_probability=0.5)
    num_datapoints = 2

    @staticmethod
    def fill_kwargs(config_dict: ConfigDict):
        config_dict.get_or_update("cutmix_params", {}) \
            if not config_dict.has("cutmix_params") else None
        config_dict.get_or_update("mixup_params", {}) \
            if not config_dict.has("mixup_params") else None
        if isinstance(config_dict.get("cutmix_params"), ConfigDict):
            config_dict["cutmix_params"].fill_with_defaults(CutMix.PARAMS)
        if isinstance(config_dict.get("mixup_params"), ConfigDict):
            config_dict["mixup_params"].fill_with_defaults(Mixup.PARAMS)

    def __init__(self, config_dict: Optional[ConfigDict] = None,
                 seed: Optional[int] = None, **kwargs):
        config_dict = config_dict or ConfigDict()
        MixupOrCutMix.fill_kwargs(config_dict)
        self.cutmix = CutMix(config_dict.get("cutmix_params"), seed=seed)
        self.mixup = Mixup(config_dict.get("mixup_params"), seed=seed)
        self.switch_p = config_dict.get("switch_probability", 0.5)
        self.rng = np.random.default_rng(seed)

    def __call__(self, k: int = 1, **data):
        if self.rng.binomial(1, self.switch_p):
            return self.mixup(k=k, **data)
        return self.cutmix(k=k, **data)


class _PerDatapointImage:
    """k-datapoint awareness for x-only image transforms.

    With a ``num_datapoints = 2`` consumer (Mixup/CutMix pair mixing)
    later in the chain, upstream transforms receive ``x`` as a LIST of
    images (loader extra_datapoints; same contract as
    ``core.TransformWrapper``'s per-item replication).  The shipped
    pretraining chain (``config/pretraining/unet_encoder/*.yaml``) puts
    RandomResizedCrop / flip / RandAugment BEFORE MixupOrCutMix, so they
    must apply per element; rng draws happen in list order, keeping the
    stream deterministic."""

    def _image(self, x: np.ndarray) -> np.ndarray:
        raise NotImplementedError

    def __call__(self, k: int = 1, **data):
        x = data["x"]
        if k > 1 and isinstance(x, list):
            data["x"] = [self._image(xi) for xi in x]
        else:
            data["x"] = self._image(x)
        data["k"] = k
        return data


# ---------------------------------------------------------------------------
# RandAugment (native subset of torchvision's op table)
# ---------------------------------------------------------------------------

def _affine(img, matrix, fill=0.0, interp=None):
    h, w = img.shape[:2]
    out = cv2.warpAffine(img, matrix, (w, h),
                         flags=interp if interp is not None
                         else cv2.INTER_NEAREST,
                         borderValue=fill if fill is not None else 0.0)
    return out if out.ndim == 3 else out[..., None]


def _blend(a, b, factor):
    return np.clip(a + factor * (b - a), 0, 255)


def _randaugment_ops(rng, magnitude, bins, interp=None, fill=0.0):
    """(name, level) table following torchvision's magnitude ranges."""
    frac = magnitude / max(bins - 1, 1)
    aff = lambda img, m: _affine(img, m, fill=fill, interp=interp)  # noqa: E731
    return {
        "Identity": lambda img: img,
        "ShearX": lambda img: aff(img, np.float32(
            [[1, math.tan(frac * 0.3 * rng.choice((-1, 1))), 0],
             [0, 1, 0]])),
        "ShearY": lambda img: aff(img, np.float32(
            [[1, 0, 0],
             [math.tan(frac * 0.3 * rng.choice((-1, 1))), 1, 0]])),
        "TranslateX": lambda img: aff(img, np.float32(
            [[1, 0, frac * 150 / 331 * img.shape[1]
              * rng.choice((-1, 1))], [0, 1, 0]])),
        "TranslateY": lambda img: aff(img, np.float32(
            [[1, 0, 0], [0, 1, frac * 150 / 331 * img.shape[0]
                         * rng.choice((-1, 1))]])),
        "Rotate": lambda img: aff(img, cv2.getRotationMatrix2D(
            (img.shape[1] / 2, img.shape[0] / 2),
            frac * 30 * rng.choice((-1, 1)), 1.0)),
        "Brightness": lambda img: _blend(
            np.zeros_like(img), img, 1 + frac * 0.9 * rng.choice((-1, 1))),
        "Color": lambda img: _blend(
            np.repeat(img.mean(-1, keepdims=True), img.shape[-1], -1), img,
            1 + frac * 0.9 * rng.choice((-1, 1))),
        "Contrast": lambda img: _blend(
            np.full_like(img, img.mean()), img,
            1 + frac * 0.9 * rng.choice((-1, 1))),
        "Sharpness": lambda img: _blend(
            cv2.GaussianBlur(img, (3, 3), 0).reshape(img.shape), img,
            1 + frac * 0.9 * rng.choice((-1, 1))),
        "Posterize": lambda img: np.bitwise_and(
            img.astype(np.uint8),
            np.uint8(256 - (1 << int(8 - int(8 - frac * 4))))
        ).astype(img.dtype),
        "Solarize": lambda img: np.where(img >= 255 - frac * 255,
                                         255 - img, img),
        "AutoContrast": lambda img: _autocontrast(img),
        "Equalize": lambda img: _equalize(img),
    }


def _autocontrast(img):
    out = np.empty_like(img)
    for c in range(img.shape[-1]):
        ch = img[..., c]
        lo, hi = ch.min(), ch.max()
        out[..., c] = (ch - lo) * (255.0 / (hi - lo)) if hi > lo else ch
    return out


def _equalize(img):
    out = np.empty_like(img)
    for c in range(img.shape[-1]):
        ch = img[..., c].astype(np.uint8)
        out[..., c] = cv2.equalizeHist(ch).astype(img.dtype)
    return out


@register("classification.transforms.RandAugment")
class RandAugment(_PerDatapointImage):
    """RandAugment over uint8-scaled images (reference wraps torchvision;
    this is a native numpy/cv2 implementation of the same op table)."""

    def __init__(self, num_ops: int = 2, magnitude: int = 9,
                 num_magnitude_bins: int = 31, interpolation: str = "NEAREST",
                 fill=None, seed: Optional[int] = None, **kwargs):
        self.num_ops = num_ops
        self.magnitude = magnitude
        self.bins = num_magnitude_bins
        # torchvision forwards interpolation/fill to its functional ops
        self.interp = cv2.INTER_LINEAR if str(interpolation).upper() in (
            "BILINEAR", "LINEAR", "INTERPOLATIONMODE.BILINEAR") else \
            cv2.INTER_NEAREST
        self.fill = 0.0 if fill is None else float(
            fill[0] if isinstance(fill, (list, tuple)) else fill)
        self.rng = np.random.default_rng(seed)

    def _image(self, x):
        x = np.asarray(x, dtype=np.float32)
        scale = 1.0
        if x.max() <= 1.0 + 1e-6:  # [0,1]-scaled input: work in 0-255
            x = x * 255.0
            scale = 255.0
        ops = _randaugment_ops(self.rng, self.magnitude, self.bins,
                               interp=self.interp, fill=self.fill)
        names = list(ops)
        for _ in range(self.num_ops):
            op = ops[names[int(self.rng.integers(0, len(names)))]]
            x = np.clip(op(x), 0, 255)
        return (x / scale).astype(np.float32)


# ---------------------------------------------------------------------------
# torchvision.transforms.* aliases (native numpy/cv2, channels-last)
# ---------------------------------------------------------------------------

@register("torchvision.transforms.Resize")
class TVResize(_PerDatapointImage):
    def __init__(self, size: int = 224, seed=None, **kwargs):
        self.size = size

    def _image(self, x):
        x = np.asarray(x, np.float32)
        h, w = x.shape[:2]
        # torchvision semantics: resize the SHORTER side to `size`
        if isinstance(self.size, int):
            if h <= w:
                nh, nw = self.size, max(int(round(w * self.size / h)), 1)
            else:
                nh, nw = max(int(round(h * self.size / w)), 1), self.size
        else:
            nh, nw = self.size
        out = cv2.resize(x, (nw, nh), interpolation=cv2.INTER_LINEAR)
        return out if out.ndim == 3 else out[..., None]


@register("torchvision.transforms.CenterCrop")
class TVCenterCrop(_PerDatapointImage):
    def __init__(self, size: int = 224, seed=None, **kwargs):
        self.size = (size, size) if isinstance(size, int) else tuple(size)

    def _image(self, x):
        x = np.asarray(x)
        h, w = x.shape[:2]
        th, tw = self.size
        if h < th or w < tw:
            # torchvision pads smaller images with zeros before cropping
            ph, pw = max(th - h, 0), max(tw - w, 0)
            pad = [(ph // 2, ph - ph // 2), (pw // 2, pw - pw // 2)]
            pad += [(0, 0)] * (x.ndim - 2)
            x = np.pad(x, pad)
            h, w = x.shape[:2]
        top, left = (h - th) // 2, (w - tw) // 2
        return x[top:top + th, left:left + tw]


@register("torchvision.transforms.RandomHorizontalFlip")
class TVRandomHorizontalFlip(_PerDatapointImage):
    def __init__(self, p: float = 0.5, seed=None, **kwargs):
        self.p = p
        self.rng = np.random.default_rng(seed)

    def _image(self, x):
        if self.rng.random() < self.p:
            return np.ascontiguousarray(np.asarray(x)[:, ::-1])
        return x


@register("torchvision.transforms.RandomResizedCrop")
class RandomResizedCrop(_PerDatapointImage):
    def __init__(self, size: int = 224, scale=(0.08, 1.0),
                 ratio=(3 / 4, 4 / 3), seed=None, **kwargs):
        self.size = (size, size) if isinstance(size, int) else tuple(size)
        self.scale = tuple(scale)
        self.ratio = tuple(ratio)
        self.rng = np.random.default_rng(seed)

    def _image(self, x):
        x = np.asarray(x, np.float32)
        h, w = x.shape[:2]
        area = h * w
        for _ in range(10):
            target_area = area * self.rng.uniform(*self.scale)
            log_ratio = (math.log(self.ratio[0]), math.log(self.ratio[1]))
            aspect = math.exp(self.rng.uniform(*log_ratio))
            cw = int(round(math.sqrt(target_area * aspect)))
            ch = int(round(math.sqrt(target_area / aspect)))
            if 0 < cw <= w and 0 < ch <= h:
                top = int(self.rng.integers(0, h - ch + 1))
                left = int(self.rng.integers(0, w - cw + 1))
                crop = x[top:top + ch, left:left + cw]
                break
        else:  # fallback: center crop
            side = min(h, w)
            top, left = (h - side) // 2, (w - side) // 2
            crop = x[top:top + side, left:left + side]
        out = cv2.resize(crop, (self.size[1], self.size[0]),
                         interpolation=cv2.INTER_LINEAR)
        return out if out.ndim == 3 else out[..., None]


@register("torchvision.transforms.ColorJitter")
class ColorJitter(_PerDatapointImage):
    def __init__(self, brightness: float = 0.0, contrast: float = 0.0,
                 saturation: float = 0.0, hue: float = 0.0, seed=None,
                 **kwargs):
        self.brightness = brightness
        self.contrast = contrast
        self.saturation = saturation
        self.hue = hue
        self.rng = np.random.default_rng(seed)

    def _factor(self, strength):
        return self.rng.uniform(max(0.0, 1 - strength), 1 + strength)

    def transform_image(self, x: np.ndarray) -> np.ndarray:
        x = np.asarray(x, np.float32)
        if self.brightness:
            x = x * self._factor(self.brightness)
        if self.contrast:
            mean = x.mean()
            x = (x - mean) * self._factor(self.contrast) + mean
        if self.saturation and x.shape[-1] == 3:
            gray = x.mean(-1, keepdims=True)
            x = gray + (x - gray) * self._factor(self.saturation)
        if self.hue and x.shape[-1] == 3:
            shift = self.rng.uniform(-self.hue, self.hue)
            # 0-255-scale inputs (the uint8 transfer path) must not be
            # clipped to [0,1] — normalize for the HSV round-trip, then
            # restore the original scale
            scale = 255.0 if x.max() > 1.5 else 1.0
            hsv = cv2.cvtColor(np.clip(x / scale, 0, 1),
                               cv2.COLOR_RGB2HSV)
            hsv[..., 0] = (hsv[..., 0] + shift * 360.0) % 360.0
            x = cv2.cvtColor(hsv, cv2.COLOR_HSV2RGB) * scale
        return np.clip(x, 0.0, 1.0) if x.max() <= 1.5 else x

    _image = transform_image


@register("torchvision.transforms.RandomErasing")
class RandomErasing(_PerDatapointImage):
    def __init__(self, p: float = 0.5, scale=(0.02, 0.33),
                 ratio=(0.3, 3.3), value: float = 0.0, seed=None, **kwargs):
        self.p = p
        self.scale = tuple(scale)
        self.ratio = tuple(ratio)
        self.value = value
        self.rng = np.random.default_rng(seed)

    def _image(self, x):
        x = np.asarray(x)
        if self.rng.random() < self.p:
            h, w = x.shape[:2]
            for _ in range(10):
                area = h * w * self.rng.uniform(*self.scale)
                aspect = math.exp(self.rng.uniform(
                    math.log(self.ratio[0]), math.log(self.ratio[1])))
                eh = int(round(math.sqrt(area / aspect)))
                ew = int(round(math.sqrt(area * aspect)))
                if eh < h and ew < w:
                    top = int(self.rng.integers(0, h - eh))
                    left = int(self.rng.integers(0, w - ew))
                    x = np.array(x, copy=True)
                    x[top:top + eh, left:left + ew] = self.value
                    break
        return x
