"""Deep ResNet encoder/classifier (NHWC, flax.linen).

Capability parity with ``/root/reference/src/classification/models.py``:
ResNet v1/v2 with basic or bottleneck blocks, configurable widths and
channel ladders (defaults = ResNet-50), 7x7 stride-2 stem + maxpool,
zero-fill shortcuts with stride-2 AvgPool downsampling, linearly spaced
stochastic depth, and an optional classifier head.  ``__call__`` can return
the per-level skip tensors so the model slots into ``UNet`` as an external
encoder (ResNet-50 Attention U-Net configs).
"""
from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..config import register
from .blocks import TorchBatchNorm
from .blocks import _batch_norm as _bn
from .blocks import compute_dtype, maybe_remat

__all__ = ["DeepResNet", "BasicResBlock", "BottleneckResBlock"]


def drop_path(module: nn.Module, x, rate: float, train: bool):
    """Reference *classification* DropPath (``classification/models.py:
    313-331``) — distinct from the segmentation ``unet_models.py:14-22``
    variant used by `blocks.drop_path`: training keeps each sample's
    branch with probability (1-rate) WITHOUT the 1/keep rescale, and eval
    multiplies by keep_prob (old-style dropout).  Matching it exactly is
    what makes reference-trained ResNet weights reproduce numerically."""
    if rate == 0.0:
        return x
    keep = 1.0 - rate
    if not train:
        return x * jnp.asarray(keep, x.dtype)
    key = module.make_rng("dropout")
    shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    mask = jax.random.bernoulli(key, keep, shape)
    return jnp.where(mask, x, jnp.zeros_like(x))


def _zero_fill_shortcut(x, out_channels: int, downsample: bool):
    """AvgPool(stride 2) + zero-padded channels (reference ``:183-200``)."""
    if downsample:
        x = nn.avg_pool(x, window_shape=(1, 1), strides=(2, 2))
    cin = x.shape[-1]
    if out_channels == cin:
        return x
    if out_channels < cin:
        raise ValueError("out channels must not shrink in ResNet shortcut")
    pad = jnp.zeros(x.shape[:-1] + (out_channels - cin,), x.dtype)
    return jnp.concatenate([x, pad], axis=-1)


class BasicResBlock(nn.Module):
    out_channels: int
    version: str = "v1"
    downsample: bool = False
    bias: bool = True
    drop_probability: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        stride = (2, 2) if self.downsample else (1, 1)
        if self.version == "v1":
            y = nn.Conv(self.out_channels, (3, 3), strides=stride,
                        padding=((1, 1), (1, 1)), use_bias=self.bias, dtype=compute_dtype())(x)
            y = _bn(train)(y)
            y = nn.relu(y)
            y = nn.Conv(self.out_channels, (3, 3), padding=((1, 1), (1, 1)),
                        use_bias=self.bias, dtype=compute_dtype())(y)
            y = _bn(train)(y)
            y = drop_path(self, y, self.drop_probability, train)
            return nn.relu(y + _zero_fill_shortcut(x, self.out_channels,
                                                   self.downsample))
        # v2 "pre-activation" — bug-for-bug with the reference
        # (``classification/models.py:219-222``): bn1/relu1 run (bn1 still
        # updates its running stats in train mode, and its params exist in
        # checkpoints) but their OUTPUT IS DISCARDED — conv1 consumes the
        # raw input x
        _ = nn.relu(_bn(train)(x))
        y = nn.Conv(self.out_channels, (3, 3), strides=stride,
                    padding=((1, 1), (1, 1)), use_bias=self.bias, dtype=compute_dtype())(x)
        y = _bn(train)(y)
        y = nn.relu(y)
        y = nn.Conv(self.out_channels, (3, 3), padding=((1, 1), (1, 1)),
                    use_bias=self.bias, dtype=compute_dtype())(y)
        y = drop_path(self, y, self.drop_probability, train)
        return y + _zero_fill_shortcut(x, self.out_channels, self.downsample)


class BottleneckResBlock(nn.Module):
    out_channels: int
    version: str = "v1"
    downsample: bool = False
    bias: bool = True
    drop_probability: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        mid = self.out_channels // 4
        stride = (2, 2) if self.downsample else (1, 1)
        if self.version == "v1":
            y = nn.Conv(mid, (1, 1), use_bias=self.bias, dtype=compute_dtype())(x)
            y = _bn(train)(y)
            y = nn.relu(y)
            y = nn.Conv(mid, (3, 3), strides=stride, padding=((1, 1), (1, 1)),
                        use_bias=self.bias, dtype=compute_dtype())(y)
            y = _bn(train)(y)
            y = nn.relu(y)
            y = nn.Conv(self.out_channels, (1, 1), use_bias=self.bias, dtype=compute_dtype())(y)
            y = _bn(train)(y)
            y = drop_path(self, y, self.drop_probability, train)
            return nn.relu(y + _zero_fill_shortcut(x, self.out_channels,
                                                   self.downsample))
        y = _bn(train)(x)
        y = nn.relu(y)
        y = nn.Conv(mid, (1, 1), use_bias=self.bias, dtype=compute_dtype())(y)
        y = _bn(train)(y)
        y = nn.relu(y)
        y = nn.Conv(mid, (3, 3), strides=stride, padding=((1, 1), (1, 1)),
                    use_bias=self.bias, dtype=compute_dtype())(y)
        y = _bn(train)(y)
        y = nn.relu(y)
        y = nn.Conv(self.out_channels, (1, 1), use_bias=self.bias, dtype=compute_dtype())(y)
        y = drop_path(self, y, self.drop_probability, train)
        return y + _zero_fill_shortcut(x, self.out_channels, self.downsample)


@register("classification.models.DeepResNet", "deep_resnet", "resnet")
class DeepResNet(nn.Module):
    """ResNet v1/v2 (defaults = ResNet-50) with skip-value output."""

    version: Any = "v1"
    bottleneck: bool = True
    channel_sizes: Sequence[int] = (256, 512, 1024, 2048)
    widths: Sequence[int] = (3, 4, 6, 3)
    in_channels: int = 3
    base_channel_size: int = 64
    bias: bool = True
    head: Any = False
    stochastic_depth_rate: float = 0.0
    output_size: int = 1000

    DEFAULT_CHANNEL_SIZES = (256, 512, 1024, 2048)

    def setup(self):
        version = self.version
        if isinstance(version, int):
            version = f"v{version}"
        if version not in ("v1", "v2"):
            raise ValueError(f"ResNet version must be v1/v2, got {version!r}")
        if len(self.widths) != len(self.channel_sizes):
            raise ValueError("each level needs one width and one channel size")
        self._version = version
        block_cls = BottleneckResBlock if self.bottleneck else BasicResBlock
        probs = np.linspace(0.0, self.stochastic_depth_rate or 0.0,
                            sum(self.widths))
        levels = []
        offset = 0
        for i, (width, out_ch) in enumerate(zip(self.widths,
                                                self.channel_sizes)):
            level = []
            for j in range(width):
                level.append(block_cls(
                    out_channels=out_ch,
                    version=version,
                    downsample=bool(i) and j == 0,
                    bias=self.bias,
                    drop_probability=float(probs[offset + j])))
            levels.append(level)
            offset += width
        self.levels = levels
        self.stem_conv = nn.Conv(self.base_channel_size, (7, 7),
                                 strides=(2, 2), padding=((3, 3), (3, 3)),
                                 use_bias=self.bias, dtype=compute_dtype())
        if version == "v1":
            self.stem_bn = TorchBatchNorm(momentum=0.9, epsilon=1e-5, dtype=compute_dtype())
        if self.head:
            if version == "v2":
                self.head_bn = TorchBatchNorm(momentum=0.9, epsilon=1e-5, dtype=compute_dtype())
            self.head_dense = nn.Dense(self.output_size, dtype=compute_dtype())

    def __call__(self, x, train: bool = False, return_skip_vals: bool = False):
        y = self.stem_conv(x)
        if self._version == "v1":
            y = self.stem_bn(y, use_running_average=not train)
            y = nn.relu(y)
        skip_values = [y]
        y = nn.max_pool(y, window_shape=(3, 3), strides=(2, 2),
                        padding=((1, 1), (1, 1)))
        for level in self.levels:
            for block in level:
                y = maybe_remat(block, y, train)
            skip_values.append(y)
        if self.head:
            if self._version == "v2":
                y = self.head_bn(y, use_running_average=not train)
                y = nn.relu(y)
            y = y.mean(axis=(1, 2))
            y = self.head_dense(y)
        if return_skip_vals:
            return y, skip_values[:-1]
        return y
