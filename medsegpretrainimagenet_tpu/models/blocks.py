"""Convolutional building blocks (NHWC, flax.linen).

Capability parity with ``/root/reference/src/segmentation/models/blocks.py``
(ConvBlock, UpConvBlock, ResNeXt/InvertedBottleneck/ConvNeXt blocks,
residual-connection zoo, mixing blocks, LayerScale) plus the ``torch.nn.*``
layer aliases the shipped configs use for stems/heads.  Everything is
channels-last and static-shaped so XLA tiles convs straight onto the MXU and
fuses the BN/activation epilogues.

Design notes (TPU-first, not a translation):
* Layout is NHWC; "channel" always means the last axis.
* BatchNorm under a data-sharded ``jit`` computes global batch statistics
  (XLA inserts the cross-chip reductions), i.e. sync-BN semantics — strictly
  stronger than the reference's per-replica DataParallel BN.
* Stochastic depth / dropout draw from the ``'dropout'`` PRNG collection.
* Blocks carry their config-time channel sizes as static fields so
  parameter shapes are fully determined before tracing.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..config import ConfigDict, register
from ..config.registry import get_kwargs, resolve
from .activations import fill_activation_spec, make_activation

__all__ = [
    "Conv2d", "MaxPool2d", "AvgPool2d", "AdaptiveAvgPool2d", "Flatten",
    "Linear", "LayerNorm", "Identity", "Upsample", "ConvBlock", "UpConvBlock",
    "ResNeXtBlock", "InvertedBottleneckBlock", "ConvNeXtBlock",
    "ChannelwiseLayerNorm", "LayerScale", "TorchBatchNorm", "ResConnection",
    "ConcatBlock",
    "AttentionBlock", "ConcatLinearBlock", "drop_path", "make_block_builder",
    "set_compute_dtype", "compute_dtype",
    "set_remat", "remat_enabled", "maybe_remat",
    "block_accepts", "mixing_out_channels",
]


_COMPUTE_DTYPE = [None]  # None -> flax dtype inference (f32 with f32 params)


def set_compute_dtype(dtype) -> None:
    """Set the activation/compute dtype for all blocks (params stay f32).

    ``jnp.bfloat16`` halves HBM traffic on the conv tower — the measured
    bottleneck at 256² (a single level-0 activation is 256·256·64·4 B per
    image in f32).  Must be set before module *tracing* (jit compile), not
    before construction.
    """
    _COMPUTE_DTYPE[0] = dtype


def compute_dtype():
    return _COMPUTE_DTYPE[0]


_LN_HALF_OUT = [False]


def set_ln_half_out(enabled: bool) -> None:
    """LayerNorms emit compute-dtype outputs (statistics stay f32).

    OFF by default — MEASURED SLOWER (v5e, Swin-224 bf16 train, 20-step
    A/B via ``tests/perf_swin_ablation.py``): 326.1 img/s at 71.41 GB
    accessed/step vs the default f32-out LNs' 365.3 img/s at 67.91 GB
    (XLA compiled cost analysis).  The hypothesis was that f32 LN
    outputs make the residual stream f32 and double the roll/
    window-partition/residual-add bytes; in practice XLA's fusion
    already absorbs those f32 islands, and forcing a bf16 cast at every
    LN *adds* convert nodes (bytes went UP) and breaks fusions.
    Together with the earlier ``dtype=compute_dtype()`` A/B (bf16
    *statistics*, 327 img/s), any bf16-out LayerNorm loses ~10% on this
    step — the Swin byte ceiling is real and LN dtype is not the lever.
    Kept as the measured A/B knob; no effect when no compute dtype is
    set.  Takes effect at module construction time.
    """
    _LN_HALF_OUT[0] = bool(enabled)


class _HalfOutLayerNorm(nn.LayerNorm):
    """flax LayerNorm (f32 params + statistics) whose output is cast to
    the compute dtype.  The cast fuses into the LN's elementwise tail,
    so the downstream residual stream carries bf16 bytes."""

    def __call__(self, x, *args, **kwargs):
        y = super().__call__(x, *args, **kwargs)
        cd = compute_dtype()
        return y.astype(cd) if cd is not None else y


# keep flax's auto-naming prefix "LayerNorm_N": param trees (and torch
# checkpoint translation) must not depend on the half-out knob
_HalfOutLayerNorm.__name__ = "LayerNorm"


def make_layer_norm(**kwargs) -> nn.Module:
    """The framework's LayerNorm: flax default, or the half-output
    variant when :func:`set_ln_half_out` is on."""
    if _LN_HALF_OUT[0]:
        return _HalfOutLayerNorm(**kwargs)
    return nn.LayerNorm(**kwargs)


_REMAT = [False]


def set_remat(enabled: bool) -> None:
    """Rematerialize basic-block activations in the backward pass
    (``meta/technical/remat: true``).

    Trades FLOPs for HBM: the backward recomputes each block's forward
    instead of keeping its activations live — the standard TPU lever for
    fitting larger batches/images (the level-0 activations dominate peak
    HBM on the conv U-Nets).  Like ``set_compute_dtype``, takes effect at
    module *tracing* time.
    """
    _REMAT[0] = bool(enabled)


def remat_enabled() -> bool:
    return _REMAT[0]


def maybe_remat(module, x, train: bool):
    """Call a basic block, under ``jax.checkpoint`` when remat is on.

    Module-first lifted transform: the block's parameter scope (and thus
    the checkpoint tree) is unchanged by the wrap, so remat on/off stays
    checkpoint-compatible.  ``train`` is closed over (static).
    """
    if not _REMAT[0]:
        return module(x, train=train)
    return nn.remat(
        lambda mdl, h: mdl(h, train=train))(module, x)


def _pair(v) -> Tuple[int, int]:
    if isinstance(v, (tuple, list)):
        return tuple(v)
    return (v, v)


def _padding(pad, kernel_size) -> Any:
    """Translate torch-style padding specs to lax conv padding."""
    if pad in ("same", "SAME"):
        return "SAME"
    if pad in ("valid", "VALID"):
        return "VALID"
    if isinstance(pad, int):
        return ((pad, pad), (pad, pad))
    if isinstance(pad, (tuple, list)):
        return tuple((p, p) for p in pad)
    raise ValueError(f"Unsupported padding {pad!r}")


def drop_path(module: nn.Module, x: jax.Array, rate: float,
              train: bool) -> jax.Array:
    """Per-sample stochastic depth (reference ``unet_models.py:14-22``)."""
    if rate == 0.0 or not train:
        return x
    keep = 1.0 - rate
    key = module.make_rng("dropout")
    shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    mask = jax.random.bernoulli(key, keep, shape)
    return jnp.where(mask, x / keep, jnp.zeros_like(x))


# ---------------------------------------------------------------------------
# torch.nn.* layer aliases (so reference configs run unchanged)
# ---------------------------------------------------------------------------

@register("torch.nn.Conv2d", "nn.Conv2d", "conv2d")
class Conv2d(nn.Module):
    in_channels: int = 0  # informational; flax infers from input
    out_channels: int = 0
    kernel_size: Union[int, Tuple[int, int]] = 3
    stride: Union[int, Tuple[int, int]] = 1
    padding: Any = 0
    bias: bool = True
    groups: int = 1
    dilation: Union[int, Tuple[int, int]] = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        return nn.Conv(
            features=self.out_channels,
            kernel_size=_pair(self.kernel_size),
            strides=_pair(self.stride),
            padding=_padding(self.padding, self.kernel_size),
            use_bias=self.bias,
            feature_group_count=self.groups,
            kernel_dilation=_pair(self.dilation),
            dtype=compute_dtype(),
        )(x)


@register("torch.nn.MaxPool2d", "max_pool2d")
class MaxPool2d(nn.Module):
    kernel_size: Union[int, Tuple[int, int]] = 2
    stride: Optional[Union[int, Tuple[int, int]]] = None
    padding: int = 0

    def __call__(self, x, train: bool = False):
        k = _pair(self.kernel_size)
        s = _pair(self.stride) if self.stride is not None else k
        pad = _padding(self.padding, k)
        if pad == "VALID" or self.padding == 0:
            pad = "VALID"
        return nn.max_pool(x, window_shape=k, strides=s, padding=pad)


@register("torch.nn.AvgPool2d", "avg_pool2d")
class AvgPool2d(nn.Module):
    kernel_size: Union[int, Tuple[int, int]] = 2
    stride: Optional[Union[int, Tuple[int, int]]] = None
    padding: int = 0

    def __call__(self, x, train: bool = False):
        k = _pair(self.kernel_size)
        s = _pair(self.stride) if self.stride is not None else k
        return nn.avg_pool(x, window_shape=k, strides=s, padding="VALID"
                           if self.padding == 0 else _padding(self.padding, k))


def _adaptive_pool_axis(x, axis: int, out: int):
    """Adaptive average pooling of one axis to ``out`` bins (torch bin
    boundaries: bin i covers [floor(i*n/out), ceil((i+1)*n/out)))."""
    n = x.shape[axis]
    if n == out:
        return x
    if n % out == 0:
        step = n // out
        shape = x.shape[:axis] + (out, step) + x.shape[axis + 1:]
        return x.reshape(shape).mean(axis=axis + 1)
    bins = [jnp.mean(jax.lax.slice_in_dim(
        x, (i * n) // out, -(-((i + 1) * n) // out), axis=axis),
        axis=axis, keepdims=True) for i in range(out)]
    return jnp.concatenate(bins, axis=axis)


@register("torch.nn.AdaptiveAvgPool2d", "adaptive_avg_pool2d")
class AdaptiveAvgPool2d(nn.Module):
    """Adaptive average pool over the two innermost non-channel axes.

    4D NHWC input pools (H, W).  3D (B, L, C) input follows torch's
    unbatched-(C, H, W) reading of ``nn.AdaptiveAvgPool2d`` — the last two
    axes are pooled, which is how the Swin pretraining head collapses
    tokens: ``output_size (1, C)`` -> mean over L
    (``config/pretraining/swin_transformer/simple.yaml:58-61``).
    """

    output_size: Any = 1

    def __call__(self, x, train: bool = False):
        if x.ndim == 3:
            o = _pair(self.output_size)
            x = _adaptive_pool_axis(x, 1, o[0])
            return _adaptive_pool_axis(x, 2, o[1])
        if self.output_size == 1 or self.output_size == (1, 1):
            return x.mean(axis=(1, 2), keepdims=True)
        o = _pair(self.output_size)
        x = _adaptive_pool_axis(x, 1, o[0])
        return _adaptive_pool_axis(x, 2, o[1])


@register("torch.nn.Flatten", "flatten")
class Flatten(nn.Module):
    def __call__(self, x, train: bool = False):
        return x.reshape(x.shape[0], -1)


@register("torch.nn.Linear", "linear_layer")
class Linear(nn.Module):
    in_features: int = 0
    out_features: int = 0
    bias: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        return nn.Dense(self.out_features, use_bias=self.bias, dtype=compute_dtype())(x)


@register("torch.nn.LayerNorm", "layer_norm")
class LayerNorm(nn.Module):
    normalized_shape: int = 0
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x, train: bool = False):
        return nn.LayerNorm(epsilon=self.eps)(x)


@register("torch.nn.Identity", "identity")
class Identity(nn.Module):
    def __call__(self, x, train: bool = False):
        return x


@register("torch.nn.Upsample", "upsample")
class Upsample(nn.Module):
    scale_factor: int = 2

    def __call__(self, x, train: bool = False):
        s = int(self.scale_factor)
        x = jnp.repeat(x, s, axis=1)
        return jnp.repeat(x, s, axis=2)


# ---------------------------------------------------------------------------
# core conv blocks
# ---------------------------------------------------------------------------

try:
    from flax.linen.normalization import (_canonicalize_axes,
                                          _compute_stats, _normalize)
    _HAVE_FLAX_NORM_INTERNALS = True
except ImportError:                     # pragma: no cover - flax upgrade
    _HAVE_FLAX_NORM_INTERNALS = False


class TorchBatchNorm(nn.BatchNorm):
    """``nn.BatchNorm`` with torch's running-variance semantics.

    Torch normalizes with the *biased* batch variance but accumulates the
    *unbiased* one (Bessel ``n/(n-1)``) into ``running_var``
    (``torch.nn.modules.batchnorm`` — the reference's BN layers, e.g.
    ``blocks.py:455``, inherit this).  Flax stores the biased variance, so
    eval-mode outputs drift from a reference checkpoint by ``~1/n`` per
    layer.  Only the running-average update differs; the normalize path
    (and therefore every *train*-mode output and gradient) is unchanged.
    Variable names stay ``batch_stats/{mean,var}`` so checkpoints and
    torch-transfer remaps are unaffected.
    """

    @nn.compact
    def __call__(self, x, use_running_average: Optional[bool] = None, *,
                 mask=None):
        from flax.linen import module as _flax_module

        use_running_average = _flax_module.merge_param(
            "use_running_average", self.use_running_average,
            use_running_average)
        feature_axes = _canonicalize_axes(x.ndim, self.axis)
        reduction_axes = tuple(i for i in range(x.ndim)
                               if i not in feature_axes)
        feature_shape = [x.shape[ax] for ax in feature_axes]

        stat_dtype = (jnp.float32 if self.force_float32_reductions
                      else self.param_dtype)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda s: jnp.zeros(s, stat_dtype),
                                feature_shape)
        ra_var = self.variable("batch_stats", "var",
                               lambda s: jnp.ones(s, stat_dtype),
                               feature_shape)

        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
            if not self.force_float32_reductions:
                mean = jnp.asarray(mean, self.param_dtype)
                var = jnp.asarray(var, self.param_dtype)
        else:
            mean, var = _compute_stats(
                x, reduction_axes, dtype=self.dtype,
                axis_name=(self.axis_name if not self.is_initializing()
                           else None),
                axis_index_groups=self.axis_index_groups,
                use_fast_variance=self.use_fast_variance, mask=mask,
                force_float32_reductions=self.force_float32_reductions)
            if not self.is_initializing():
                n = 1
                for ax in reduction_axes:
                    n *= x.shape[ax]
                bessel = n / max(n - 1, 1)
                ra_mean.value = (self.momentum * ra_mean.value
                                 + (1 - self.momentum) * mean)
                ra_var.value = (self.momentum * ra_var.value
                                + (1 - self.momentum) * (bessel * var))

        return _normalize(self, x, mean, var, reduction_axes, feature_axes,
                          self.dtype, self.param_dtype, self.epsilon,
                          self.use_bias, self.use_scale, self.bias_init,
                          self.scale_init, self.force_float32_reductions)


if not _HAVE_FLAX_NORM_INTERNALS:       # pragma: no cover - flax upgrade
    # A flax release moved its normalization internals: degrade to plain
    # flax BN (biased running var).  Train-mode numerics are identical;
    # only eval-vs-torch running-stat parity loosens by ~1/n per layer.
    import warnings

    warnings.warn(
        "flax.linen.normalization internals unavailable; TorchBatchNorm "
        "degrades to biased running-var updates (eval outputs may drift "
        "~1/n per BN layer from a torch reference)", RuntimeWarning)

    class TorchBatchNorm(nn.BatchNorm):  # noqa: F811
        """Fallback without the torch running-var correction."""


# Keep flax auto-naming at ``BatchNorm_N`` so param trees, msgpack
# checkpoints, and the torch-transfer remaps are byte-identical to the
# plain-flax layout.
TorchBatchNorm.__name__ = "BatchNorm"
TorchBatchNorm.__qualname__ = "BatchNorm"


def _batch_norm(train: bool) -> nn.Module:
    return TorchBatchNorm(use_running_average=not train, momentum=0.9,
                          epsilon=1e-5, dtype=compute_dtype())


@register("segmentation.models.blocks.ConvBlock", "conv_block")
class ConvBlock(nn.Module):
    """``size`` x (conv k×k -> BN -> act), optional stride-2 tail + dropout.

    Parity: reference ``blocks.py:419-492``.
    """

    in_channels: int = 0
    out_channels: int = 0
    size: int = 2
    kernel_size: int = 3
    padding: Any = 1
    activations: Any = "relu"
    dropout: Any = False
    stride: Optional[int] = None
    downsample_in_block: bool = False

    PARAMS = {
        "activations": "relu",
        "size": 2,
        "padding": 1,
        "kernel_size": 3,
        "dropout": False,
        "stride": None,
    }
    DROPOUT_RATE = 0.5

    @staticmethod
    def fill_kwargs(config_dict: ConfigDict):
        fill_activation_spec(config_dict, "activations")
        if config_dict.get("dropout"):
            config_dict.get_or_update("dropout/rate", ConvBlock.DROPOUT_RATE)

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i in range(self.size):
            downsampling = self.downsample_in_block and i == self.size - 1
            stride = self.stride or (2 if downsampling else 1)
            x = nn.Conv(self.out_channels, _pair(self.kernel_size),
                        strides=_pair(stride),
                        padding=_padding(self.padding, self.kernel_size),
                        dtype=compute_dtype())(x)
            x = _batch_norm(train)(x)
            x = make_activation(self.activations)(x)
        if self.dropout:
            rate = self.dropout["rate"] if not isinstance(self.dropout, bool) \
                else self.DROPOUT_RATE
            # reference uses nn.Dropout2d (``blocks.py:485``): whole
            # feature maps drop per (sample, channel) — broadcast over H, W
            x = nn.Dropout(rate=rate, deterministic=not train,
                           broadcast_dims=(1, 2))(x)
        return x


@register("segmentation.models.blocks.UpConvBlock", "up_conv_block")
class UpConvBlock(nn.Module):
    """Upsample(x2 nearest) -> conv -> act (reference ``blocks.py:495-539``)."""

    in_channels: int = 0
    out_channels: int = 0
    activation: Any = "relu"
    kernel_size: int = 2
    scale_factor: int = 2
    channel_decrease_ratio: float = 0.5  # consumed by the decoder

    PARAMS = {
        "activation": "relu",
        "kernel_size": 2,
        "scale_factor": 2,
    }

    @staticmethod
    def fill_kwargs(config_dict: ConfigDict):
        fill_activation_spec(config_dict, "activation")

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = Upsample(scale_factor=self.scale_factor)(x)
        x = nn.Conv(self.out_channels, _pair(self.kernel_size),
                    padding="SAME", dtype=compute_dtype())(x)
        return make_activation(self.activation)(x)


@register("segmentation.models.blocks.ChannelwiseLayerNorm",
          "channelwise_layer_norm")
class ChannelwiseLayerNorm(nn.Module):
    """LayerNorm over the channel axis (NHWC: a plain last-axis LN —
    the reference's NCHW permute dance (``blocks.py:775-784``) is free here).
    """

    num_features: int = 0
    smoothing_term: float = 1e-6

    @nn.compact
    def __call__(self, x, train: bool = False):
        return nn.LayerNorm(epsilon=self.smoothing_term)(x)


@register("segmentation.models.blocks.LayerScale", "layer_scale")
class LayerScale(nn.Module):
    n_channels: int = 0
    init_value: float = 1e-6

    @nn.compact
    def __call__(self, x, train: bool = False):
        scale = self.param("scale", nn.initializers.constant(self.init_value),
                           (self.n_channels,))
        # the param stays f32; cast to the activation dtype so bf16 compute
        # is not silently promoted to f32 for the whole scaled branch
        return x * scale.astype(x.dtype)


def _bottleneck_triple(x, mid, out, kernel_size, activations, train):
    """1x1 -> depthwise kxk -> 1x1, each conv+BN+act."""
    act = lambda y: make_activation(activations)(y)  # noqa: E731
    x = nn.Conv(mid, (1, 1), padding="SAME", dtype=compute_dtype())(x)
    x = _batch_norm(train)(x)
    x = act(x)
    x = nn.Conv(mid, _pair(kernel_size), padding="SAME",
                feature_group_count=mid, dtype=compute_dtype())(x)
    x = _batch_norm(train)(x)
    x = act(x)
    x = nn.Conv(out, (1, 1), padding="SAME", dtype=compute_dtype())(x)
    x = _batch_norm(train)(x)
    return act(x)


@register("segmentation.models.blocks.ResNeXtBlock", "resnext_block")
class ResNeXtBlock(nn.Module):
    """(1x1 C->C/4) -> (dw kxk) -> (1x1 C/4->C); reference ``blocks.py:786-847``."""

    in_channels: int = 0
    out_channels: int = 0
    kernel_size: int = 3
    activations: Any = "relu"

    @staticmethod
    def fill_kwargs(config_dict: ConfigDict):
        fill_activation_spec(config_dict, "activations")

    @nn.compact
    def __call__(self, x, train: bool = False):
        return _bottleneck_triple(x, self.out_channels // 4,
                                  self.out_channels, self.kernel_size,
                                  self.activations, train)


@register("segmentation.models.blocks.InvertedBottleneckBlock",
          "inverted_bottleneck_block")
class InvertedBottleneckBlock(nn.Module):
    """(1x1 C->4C) -> (dw kxk) -> (1x1 4C->C); reference ``blocks.py:849-908``."""

    in_channels: int = 0
    out_channels: int = 0
    kernel_size: int = 3
    activations: Any = "relu"

    @staticmethod
    def fill_kwargs(config_dict: ConfigDict):
        fill_activation_spec(config_dict, "activations")

    @nn.compact
    def __call__(self, x, train: bool = False):
        return _bottleneck_triple(x, self.out_channels * 4,
                                  self.out_channels, self.kernel_size,
                                  self.activations, train)


@register("segmentation.models.blocks.ConvNeXtBlock", "convnext_block")
class ConvNeXtBlock(nn.Module):
    """dw conv -> norm -> 1x1 (4x) -> act -> 1x1; reference ``blocks.py:910-981``."""

    in_channels: int = 0
    out_channels: int = 0
    kernel_size: int = 3
    activations: Any = "gelu"
    normalisation: Any = "segmentation.models.blocks.ChannelwiseLayerNorm"
    reduce_number_of_activations: bool = True
    reduce_number_of_norm_layers: bool = True
    channel_change_index: int = 1

    @staticmethod
    def fill_kwargs(config_dict: ConfigDict):
        fill_activation_spec(config_dict, "activations")

    def _norm(self, num_features) -> nn.Module:
        cfg = self.normalisation
        if isinstance(cfg, str):
            name, params = cfg, ConfigDict()
        else:
            name, params = cfg.item()
        constructor = resolve(name)
        kwargs = get_kwargs(constructor, params)
        for field in ("num_features", "normalized_shape"):
            if field in constructor.__dataclass_fields__:
                kwargs[field] = num_features
                break
        return constructor(**kwargs)

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.channel_change_index not in (1, 2, 3):
            raise ValueError("channel_change_index should be in (1, 2, 3)")
        i = self.channel_change_index
        channels = (self.in_channels,) * (i - 1) + (self.out_channels,) * (3 - i)
        act = lambda y: make_activation(self.activations)(y)  # noqa: E731

        x = nn.Conv(channels[0], _pair(self.kernel_size), padding="SAME",
                    feature_group_count=min(self.in_channels, channels[0]), dtype=compute_dtype())(x)
        x = self._norm(channels[0])(x)
        if not self.reduce_number_of_activations:
            x = act(x)

        x = nn.Conv(4 * channels[1], (1, 1), padding="SAME", dtype=compute_dtype())(x)
        if not self.reduce_number_of_norm_layers:
            x = self._norm(4 * channels[1])(x)
        x = act(x)

        x = nn.Conv(self.out_channels, (1, 1), padding="SAME", dtype=compute_dtype())(x)
        if not self.reduce_number_of_norm_layers:
            x = self._norm(self.out_channels)(x)
        if not self.reduce_number_of_activations:
            x = act(x)
        return x


# ---------------------------------------------------------------------------
# residual connections (reference ``blocks.py:654-772``)
# ---------------------------------------------------------------------------

class ResConnection(nn.Module):
    """Shortcut branch: identity (zero-fill / repeat / add / cut-off channel
    adaptation) or a 1x1-conv projection with optional BN/ReLU."""

    in_channels: int = 0
    out_channels: int = 0
    downsampling: bool = False
    type_config: Any = "identity"

    CONV_PARAMS = {"kernel_size": 1, "batch_norm": True, "activation": False}

    @nn.compact
    def __call__(self, x, train: bool = False):
        cfg = self.type_config
        if isinstance(cfg, str):
            kind, params = cfg, ConfigDict()
        else:
            kind, params = cfg.item()
            if not isinstance(params, ConfigDict):
                params = ConfigDict()

        cin, cout = self.in_channels, self.out_channels
        if kind == "identity":
            if self.downsampling:
                raise NotImplementedError(
                    "identity shortcut with spatial downsampling")
            if cin == cout:
                return x
            if cin < cout:
                method = params.get_str("expand_method") \
                    if params.has("expand_method") else "fill_with_zeros"
                if method == "fill_with_zeros":
                    pad = jnp.zeros(x.shape[:-1] + (cout - cin,), x.dtype)
                    return jnp.concatenate([x, pad], axis=-1)
                if method == "repeat":
                    if cout % cin:
                        raise ValueError("repeat expand needs divisibility")
                    return jnp.concatenate([x] * (cout // cin), axis=-1)
                raise ValueError(f"unknown expand_method {method!r}")
            method = params.get_str("contract_method") \
                if params.has("contract_method") else "add"
            if method == "add":
                if cin % cout:
                    raise ValueError("add contract needs divisibility")
                return x.reshape(x.shape[:-1] + (cin // cout, cout)).sum(-2)
            if method == "cut_off":
                return x[..., :cout]
            raise ValueError(f"unknown contract_method {method!r}")

        if kind in ("conv", "convolution"):
            merged = dict(self.CONV_PARAMS)
            merged.update({k.replace(" ", "_"): v
                           for k, v in params.trim().to_dict().items()})
            y = nn.Conv(cout, _pair(merged["kernel_size"]),
                        strides=(2, 2) if self.downsampling else (1, 1),
                        padding="VALID" if merged["kernel_size"] == 1
                        else "SAME", dtype=compute_dtype())(x)
            if merged["batch_norm"]:
                y = _batch_norm(train)(y)
            if merged["activation"]:
                y = nn.relu(y)
            return y
        raise ValueError(f"shortcut type must be identity/convolution, "
                         f"got {kind!r}")


# ---------------------------------------------------------------------------
# mixing blocks (decoder skip-connection aggregation)
# ---------------------------------------------------------------------------

@register("segmentation.models.blocks.ConcatBlock", "concatenate")
class ConcatBlock(nn.Module):
    """Channel concat of upsampled path and skip value."""

    @staticmethod
    def get_out_ch(x_channels, x_up_channels, skip_channels,
                   level_out_channels):
        return x_up_channels + skip_channels

    def __call__(self, x, x_up, skip_val, train: bool = False):
        return jnp.concatenate([x_up, skip_val], axis=-1)


@register("segmentation.models.blocks.ConcatLinearBlock",
          "concat_linear_block")
class ConcatLinearBlock(nn.Module):
    """Token-axis concat + linear projection (Swin decoder mixing,
    reference ``blocks.py:639-651``); operates on (B, L, C) sequences."""

    x_channels: int = 0
    x_up_channels: int = 0
    skip_channels: int = 0
    level_out_channels: int = 0

    @staticmethod
    def get_out_ch(x_channels, x_up_channels, skip_channels,
                   level_out_channels):
        return level_out_channels

    @nn.compact
    def __call__(self, x, x_up, skip_val, train: bool = False):
        y = jnp.concatenate([x_up, skip_val], axis=-1)
        return nn.Dense(self.level_out_channels, dtype=compute_dtype())(y)


@register("segmentation.models.blocks.AttentionBlock", "attention_block")
class AttentionBlock(nn.Module):
    """Attention-U-Net gate (arXiv:1804.03999); reference ``blocks.py:554-628``.

    Gating signal from the coarse path reweights the skip tensor before the
    usual concat.
    """

    x_channels: int = 0
    x_up_channels: int = 0
    skip_channels: int = 0
    level_out_channels: int = 0
    gating_signal: Any = None

    PARAMS = {
        "gating signal": {
            "argument name": "gating_signal",
            "default": {"segmentation.models.blocks.ConvBlock": {
                "size": 1, "kernel size": 1, "padding": 0}},
        },
        "halve_channels": False,
    }
    halve_channels: bool = False

    @staticmethod
    def fill_kwargs(config_dict: ConfigDict):
        from ..config.registry import fill_spec
        fill_spec(config_dict, "gating signal")

    @staticmethod
    def get_out_ch(x_channels, x_up_channels, skip_channels,
                   level_out_channels):
        return x_up_channels + skip_channels

    @nn.compact
    def __call__(self, x, x_up, skip_val, train: bool = False):
        gs_cfg = self.gating_signal
        if gs_cfg is None:
            gs_cfg = ConfigDict(
                {"segmentation.models.blocks.ConvBlock": {
                    "size": 1, "kernel_size": 1, "padding": 0}})
        builder = make_block_builder(gs_cfg)
        g = builder(self.x_channels, self.x_channels)(x, train=train)

        g1 = nn.Conv(self.x_channels, (1, 1), padding="VALID", dtype=compute_dtype())(g)
        g1 = _batch_norm(train)(g1)
        x1 = nn.Conv(self.x_channels, (2, 2), strides=(2, 2),
                     padding="VALID", dtype=compute_dtype())(skip_val)
        x1 = _batch_norm(train)(x1)
        p = nn.relu(x1 + g1)
        p = nn.Conv(self.skip_channels, (1, 1), padding="VALID", dtype=compute_dtype())(p)
        p = _batch_norm(train)(p)
        p = nn.sigmoid(p)
        p = Upsample(scale_factor=2)(p)
        return jnp.concatenate([x_up, skip_val * p], axis=-1)


def mixing_out_channels(mixing, **channel_kwargs) -> int:
    """Output channels of a mixing block constructor or instance."""
    fn = getattr(mixing, "get_out_ch", None)
    if fn is None:
        return channel_kwargs["x_up_channels"] + channel_kwargs["skip_channels"]
    return fn(**channel_kwargs)


# ---------------------------------------------------------------------------
# config -> block factory plumbing
# ---------------------------------------------------------------------------

def block_accepts(constructor, field: str) -> bool:
    fields = getattr(constructor, "__dataclass_fields__", None)
    if fields is not None:
        return field in fields
    import inspect
    try:
        return field in inspect.signature(constructor).parameters
    except (TypeError, ValueError):
        return False


def make_block_builder(block_cfg: Any):
    """Resolve a block config to ``builder(in_ch, out_ch, **ctx) -> Module``.

    *ctx* keys (``downsample_in_block``, ``position``,
    ``stochastic_depth_rate``, ...) are forwarded only when the block class
    has such a field — the registry-based analog of the reference's
    ``accepts_kwarg`` probing (``unet_models.py:108-116``).
    """
    if isinstance(block_cfg, str):
        block_cfg = ConfigDict({block_cfg: {}})
    elif not isinstance(block_cfg, ConfigDict):
        # flax freezes dict-typed dataclass fields of top-level modules
        # into FrozenDicts; thaw back into ConfigDict
        import flax.core
        block_cfg = ConfigDict(flax.core.unfreeze(block_cfg))
    name, params = block_cfg.item()
    if not isinstance(params, ConfigDict):
        params = ConfigDict()
        block_cfg[name] = params
    constructor = resolve(name)
    from ..config.registry import fill_spec
    fill_spec(block_cfg)  # idempotent: injects missing defaults in place
    base_kwargs = get_kwargs(constructor, params)
    base_kwargs = {k: v for k, v in base_kwargs.items()
                   if block_accepts(constructor, k)}

    def build(in_channels: int, out_channels: int, **ctx) -> nn.Module:
        kwargs = dict(base_kwargs)
        if block_accepts(constructor, "in_channels"):
            kwargs["in_channels"] = in_channels
        if block_accepts(constructor, "out_channels"):
            kwargs["out_channels"] = out_channels
        for key, value in ctx.items():
            if block_accepts(constructor, key):
                kwargs[key] = value
        return constructor(**kwargs)

    build.constructor = constructor
    return build
