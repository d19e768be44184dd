"""Configurable U-Net encoder / decoder / U-Net (NHWC, flax.linen).

Capability parity with
``/root/reference/src/segmentation/models/unet_models.py``: a fully
config-generic U-Net — stem / basic-block / down- / up-sampling / mixing
blocks are all pluggable components, with arbitrary channel ladders,
per-block residual connections, stochastic depth, and layer scaling.  The
same modules express the basic ConvBlock U-Net, the ResNet-50 Attention
U-Net (external encoder + AttentionBlock mixing) and the Swin U-Net
(PatchEmbed stem, Swin blocks, PatchMerging/PatchExpand, ConcatLinear
mixing) purely through configuration.

TPU-first notes: depth/width/channels are static config, so the level loops
unroll at trace time into one fused XLA graph; blocks run on NHWC (or (B, L,
C) token) tensors; stochastic depth uses the ``'dropout'`` PRNG collection.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple, Union

import flax.linen as nn
import numpy as np

from ..config import ConfigDict, register
from ..config.registry import fill_spec, get_kwargs, resolve
from . import blocks as B
from .activations import ACTIVATIONS, make_activation

__all__ = ["UNetEncoder", "UNetDecoder", "UNet", "stoch_depth_probs"]


def stoch_depth_probs(depth: int, width: int, max_prob: float = 0.0,
                      min_prob: float = 0.0):
    """Linearly spaced stochastic-depth probabilities (swin_unet layout;
    reference ``unet_models.py:26-35``): ``(depth+1)*width`` values split
    into per-level down lists, the bottom list, and reversed up lists."""
    probs = np.linspace(min_prob, max_prob, (depth + 1) * width)
    down = [probs[i * width:(i + 1) * width] for i in range(depth)]
    bottom = probs[depth * width:(depth + 1) * width]
    up = [probs[(depth - 1 - i) * width:(depth - i) * width]
          for i in range(depth)]
    return down, bottom, up


def _as_channels(value, depth) -> list:
    if isinstance(value, ConfigDict):
        value = value.key()
    if value in (None, "default"):
        return [64 * 2 ** i for i in range(depth + 1)]
    return list(value)


def _normalize_block_cfg(cfg):
    if cfg is None:
        return None
    if isinstance(cfg, str):
        return ConfigDict({cfg: {}})
    if not isinstance(cfg, ConfigDict):
        import flax.core
        return ConfigDict(flax.core.unfreeze(cfg))
    return cfg


def _make_mixing_builder(mixing_cfg):
    """Resolve a mixing-block config to ``(builder, get_out_ch)``."""
    mixing_cfg = _normalize_block_cfg(mixing_cfg)
    if isinstance(mixing_cfg, ConfigDict) and len(mixing_cfg) == 1 \
            and mixing_cfg.key() == "concatenate":
        mixing_cfg = "concatenate"
    if mixing_cfg == "concatenate":
        constructor, params = B.ConcatBlock, ConfigDict()
    else:
        name, params = mixing_cfg.item()
        constructor = resolve(name)
        fill_spec(mixing_cfg)
    base = get_kwargs(constructor, params)
    base = {k: v for k, v in base.items() if B.block_accepts(constructor, k)}

    def build(**channel_kwargs) -> nn.Module:
        kwargs = dict(base)
        for key, value in channel_kwargs.items():
            if B.block_accepts(constructor, key):
                kwargs[key] = value
        return constructor(**kwargs)

    def out_ch(**channel_kwargs) -> int:
        return B.mixing_out_channels(constructor, **channel_kwargs)

    return build, out_ch


def _res_shortcut(cfg, in_channels, out_channels, downsampling=False):
    return B.ResConnection(in_channels=in_channels, out_channels=out_channels,
                           downsampling=downsampling, type_config=cfg)


class UNetEncoder(nn.Module):
    """General U-Net encoder (reference ``unet_models.py:39-236``).

    ``depth`` levels of ``width`` basic blocks (+ optional residual
    shortcut, layer scale, stochastic depth per block) with a downsampling
    block between levels (or stride-in-block when ``downsampling`` is None),
    plus a bottom level.  ``__call__`` optionally returns the per-level skip
    tensors.
    """

    in_channel_size: int = 3
    basic_block: Any = "segmentation.models.blocks.ConvBlock"
    stem: Any = "default_stem"
    downsampling: Any = "default_downsampling"
    depth: int = 4
    width: int = 1
    channels: Any = "default"
    residual_connections: Any = False
    change_channel_in_block: bool = True
    trainable_downsampling: bool = False
    stochastic_depth_rate: float = 0.0
    layer_scaling: Any = False
    init_scheme: Any = None

    PARAMS = {
        "in_channel_size": 3,
        "basic_block": "segmentation.models.blocks.ConvBlock",
        "stem": {"torch.nn.Conv2d": {"kernel_size": 3, "padding": "same"}},
        "downsampling": {"torch.nn.MaxPool2d": {"kernel_size": 2}},
        "depth": 4,
        "width": 1,
        "channels": "default",
        "residual_connections": False,
        "change_channel_in_block": True,
        "trainable_downsampling": False,
        "stochastic_depth_rate": 0.0,
        "layer_scaling": False,
    }

    @staticmethod
    def fill_kwargs(config_dict: ConfigDict):
        for key in ("basic_block", "downsampling", "stem"):
            value = config_dict.get(key)
            if isinstance(value, str):
                config_dict[key] = ConfigDict({value: {}})
            if isinstance(config_dict.get(key), ConfigDict):
                fill_spec(config_dict[key])

    def _channel_list(self) -> list:
        channels = _as_channels(self.channels, self.depth)
        if len(channels) < self.depth + 2:
            channels = [channels[0], *channels]
        return channels

    @property
    def channel_sizes(self) -> list:
        return self._channel_list()[1:]

    def setup(self):
        channels = self._channel_list()
        ccib = self.change_channel_in_block
        stem_cfg = _normalize_block_cfg(
            None if self.stem is None else (
                ConfigDict({"torch.nn.Conv2d":
                            {"kernel_size": 3, "padding": "same"}})
                if self.stem == "default_stem" else self.stem))
        down_cfg = _normalize_block_cfg(
            ConfigDict({"torch.nn.MaxPool2d": {"kernel_size": 2}})
            if self.downsampling == "default_downsampling"
            else self.downsampling)
        self._integrated_downsample = down_cfg is None

        if stem_cfg is not None:
            stem_builder = B.make_block_builder(stem_cfg)
            self.stem_block = stem_builder(self.in_channel_size, channels[0])
        else:
            self.stem_block = B.Identity()

        block_builder = B.make_block_builder(_normalize_block_cfg(
            self.basic_block))
        down_builder = None if down_cfg is None \
            else B.make_block_builder(down_cfg)

        use_res = bool(self.residual_connections)
        use_scale = self.layer_scaling is not False
        sd_rate = self.stochastic_depth_rate or 0.0
        down_probs, bottom_probs, _ = stoch_depth_probs(
            self.depth, self.width, sd_rate)
        self._down_probs, self._bottom_probs = down_probs, bottom_probs

        level_convs, level_shortcuts, level_scales, downsamples = [], [], [], []
        for i in range(self.depth):
            convs, shortcuts, scales = [], [], []
            for j in range(self.width):
                cin = channels[i + (not ccib)] if j == 0 else channels[i + 1]
                is_last = (j == self.width - 1)
                downs = self._integrated_downsample and is_last
                convs.append(block_builder(
                    cin, channels[i + 1], downsample_in_block=downs,
                    position=j, stochastic_depth_rate=float(down_probs[i][j])))
                if use_res:
                    shortcuts.append(_res_shortcut(
                        self.residual_connections, cin, channels[i + 1],
                        downsampling=downs))
                if use_scale:
                    scales.append(B.LayerScale(
                        n_channels=channels[i + 1],
                        init_value=float(self.layer_scaling)))
            level_convs.append(convs)
            level_shortcuts.append(shortcuts)
            level_scales.append(scales)
            if down_builder is not None:
                if self.trainable_downsampling:
                    downsamples.append(down_builder(
                        channels[i + 1], channels[i + 1 + (not ccib)]))
                else:
                    downsamples.append(down_builder(
                        channels[i + 1], channels[i + 1]))

        bottom_convs, bottom_shortcuts, bottom_scales = [], [], []
        for j in range(self.width):
            cin = channels[-2 + (not ccib)] if j == 0 else channels[-1]
            bottom_convs.append(block_builder(
                cin, channels[-1], downsample_in_block=False, position=j,
                stochastic_depth_rate=float(bottom_probs[j])))
            if use_res:
                bottom_shortcuts.append(_res_shortcut(
                    self.residual_connections, cin, channels[-1]))
            if use_scale:
                bottom_scales.append(B.LayerScale(
                    n_channels=channels[-1],
                    init_value=float(self.layer_scaling)))

        self.level_convs = level_convs
        self.level_shortcuts = level_shortcuts
        self.level_scales = level_scales
        self.downsamples = downsamples
        self.bottom_convs = bottom_convs
        self.bottom_shortcuts = bottom_shortcuts
        self.bottom_scales = bottom_scales

    def _run_block(self, x, conv, scale, shortcut, prob, train):
        y = B.maybe_remat(conv, x, train)
        if scale is not None:
            y = scale(y)
        if shortcut is not None:
            if self.stochastic_depth_rate:
                y = B.drop_path(self, y, float(prob), train)
            return y + shortcut(x, train=train)
        return y

    def __call__(self, x, train: bool = False, return_skip_vals: bool = False):
        use_res = bool(self.residual_connections)
        use_scale = self.layer_scaling is not False
        skip_values = []
        x = self.stem_block(x, train=train)
        for i in range(self.depth):
            for j in range(self.width):
                x = self._run_block(
                    x, self.level_convs[i][j],
                    self.level_scales[i][j] if use_scale else None,
                    self.level_shortcuts[i][j] if use_res else None,
                    self._down_probs[i][j], train)
            skip_values.append(x)
            if not self._integrated_downsample:
                x = self.downsamples[i](x, train=train)
        for j in range(self.width):
            x = self._run_block(
                x, self.bottom_convs[j],
                self.bottom_scales[j] if use_scale else None,
                self.bottom_shortcuts[j] if use_res else None,
                self._bottom_probs[j], train)
        if return_skip_vals:
            return x, skip_values
        return x


class UNetDecoder(nn.Module):
    """General U-Net decoder (reference ``unet_models.py:240-390``)."""

    basic_block: Any = "segmentation.models.blocks.ConvBlock"
    upsampling_block: Any = "segmentation.models.blocks.UpConvBlock"
    mixing_block: Any = "concatenate"
    residual_connections: Any = False
    stochastic_depth_rate: float = 0.0
    output_ch: int = 1
    depth: int = 4
    width: int = 1
    channels: Any = None
    final_block: Any = None
    layer_scaling: Any = False
    skip_con_channels_list: Any = None
    init_scheme: Any = None

    def setup(self):
        channels = list(self.channels)
        skip_channels = list(self.skip_con_channels_list or [])
        self._skip_con_nr = len(skip_channels)

        block_builder = B.make_block_builder(
            _normalize_block_cfg(self.basic_block))
        ups_cfg = _normalize_block_cfg(self.upsampling_block)
        ups_builder = B.make_block_builder(ups_cfg)
        ratio = 0.5
        if isinstance(ups_cfg, ConfigDict):
            ratio = ups_cfg.value().get("channel_decrease_ratio", 0.5) \
                if isinstance(ups_cfg.value(), ConfigDict) else 0.5
        mix_builder, mix_out_ch = _make_mixing_builder(self.mixing_block)

        use_res = bool(self.residual_connections)
        use_scale = self.layer_scaling is not False
        _, _, up_probs = stoch_depth_probs(
            self.depth, self.width, self.stochastic_depth_rate or 0.0)
        self._up_probs = up_probs

        upsamples, mixings, level_convs, level_shortcuts, level_scales = \
            [], [], [], [], []
        for i in range(self.depth):
            ups_out = int(channels[i] * ratio)
            upsamples.append(ups_builder(channels[i], ups_out))
            ch_kwargs = dict(x_channels=channels[i], x_up_channels=ups_out,
                             skip_channels=skip_channels[i]
                             if i < self._skip_con_nr else 0,
                             level_out_channels=channels[i + 1])
            if i < self._skip_con_nr:
                mixings.append(mix_builder(**ch_kwargs))
                mixed_ch = mix_out_ch(**ch_kwargs)
            else:
                mixed_ch = ups_out
            convs, shortcuts, scales = [], [], []
            for j in range(self.width):
                cin = mixed_ch if j == 0 else channels[i + 1]
                convs.append(block_builder(
                    cin, channels[i + 1], position=j,
                    stochastic_depth_rate=float(up_probs[i][j])))
                if use_res:
                    shortcuts.append(_res_shortcut(
                        self.residual_connections, cin, channels[i + 1]))
                if use_scale:
                    scales.append(B.LayerScale(
                        n_channels=channels[i + 1],
                        init_value=float(self.layer_scaling)))
            level_convs.append(convs)
            level_shortcuts.append(shortcuts)
            level_scales.append(scales)

        self.upsamples = upsamples
        self.mixings = mixings
        self.level_convs = level_convs
        self.level_shortcuts = level_shortcuts
        self.level_scales = level_scales

        if self.final_block is not None:
            final_builder = B.make_block_builder(
                _normalize_block_cfg(self.final_block))
            self.final = final_builder(channels[-1], self.output_ch)
        else:
            self.final = B.Identity()

    def __call__(self, x, skip_values, train: bool = False):
        use_res = bool(self.residual_connections)
        use_scale = self.layer_scaling is not False
        skip_values = list(skip_values)
        for i in range(self.depth):
            x_up = self.upsamples[i](x, train=train)
            if i < self._skip_con_nr:
                skip_val = skip_values.pop()
                x_new = self.mixings[i](x, x_up, skip_val, train=train)
            else:
                x_new = x_up
            x = x_new
            for j in range(self.width):
                y = B.maybe_remat(self.level_convs[i][j], x, train)
                if use_scale:
                    y = self.level_scales[i][j](y)
                if use_res:
                    if self.stochastic_depth_rate:
                        y = B.drop_path(self, y, float(self._up_probs[i][j]),
                                        train)
                    y = y + self.level_shortcuts[i][j](x, train=train)
                x = y
        return self.final(x, train=train)


class UNet(nn.Module):
    """Composable U-Net (reference ``unet_models.py:393-689``).

    Channel resolution chain: external ``encoder.channel_sizes`` >
    ``encoder_channels`` > ``channels``; decoder channels default to the
    reversed encoder ladder; skip-connection channels default to the
    reversed non-bottom encoder channels.
    """

    img_ch: int = 3
    output_ch: int = 1
    depth: int = 4
    width: int = 1
    basic_block: Any = "segmentation.models.blocks.ConvBlock"
    mixing_block: Any = "concatenate"
    preproc_block: Any = "default_stem"
    final_block: Any = "default_final"
    upsampling_block: Any = "segmentation.models.blocks.UpConvBlock"
    downsampling_block: Any = "default_downsampling"
    channels: Any = "default"
    encoder_channels: Any = None
    decoder_channels: Any = None
    skip_con_channels: Any = None
    residual_connections: Any = False
    stochastic_depth_rate: float = 0.0
    final_activation: Any = "sigmoid"
    layer_scaling: Any = False
    change_channels_in_block: bool = True
    trainable_downsampling: bool = False
    encoder: Any = None

    PARAMS = {
        "architecture/in channel size": {"argument name": "img_ch",
                                         "default": 3},
        "architecture/out channel size": {"argument name": "output_ch",
                                          "default": 1},
        "architecture/depth": {"argument name": "depth", "default": 4},
        "architecture/width": {"argument name": "width", "default": 1},
        "architecture/basic block": {
            "argument name": "basic_block",
            "default": "segmentation.models.blocks.ConvBlock"},
        "architecture/mixing block": {"argument name": "mixing_block",
                                      "default": "concatenate"},
        "architecture/stem": {
            "argument name": "preproc_block",
            "default": {"torch.nn.Conv2d": {"kernel_size": 3,
                                            "padding": "same"}}},
        "architecture/final_block": {
            "argument name": "final_block",
            "default": {"torch.nn.Conv2d": {"kernel_size": 1}}},
        "architecture/upsampling": {
            "argument name": "upsampling_block",
            "default": "segmentation.models.blocks.UpConvBlock"},
        "architecture/downsampling": {
            "argument name": "downsampling_block",
            "default": {"torch.nn.MaxPool2d": {"kernel_size": 2}}},
        "architecture/channels": {"argument name": "channels",
                                  "default": "default"},
        "architecture/encoder_channels": {"argument name": "encoder_channels",
                                          "default": None},
        "architecture/decoder_channels": {"argument name": "decoder_channels",
                                          "default": None},
        "architecture/skip_con_channels": {
            "argument name": "skip_con_channels", "default": None},
        "architecture/residual_connections": {
            "argument name": "residual_connections", "default": False},
        "architecture/stochastic depth rate": {
            "argument name": "stochastic_depth_rate", "default": 0},
        "architecture/activation function/final": {
            "argument name": "final_activation", "default": "sigmoid"},
        "architecture/layer_scaling": {"argument name": "layer_scaling",
                                       "default": False},
        "architecture/change_channels_in_block": {
            "argument name": "change_channels_in_block", "default": True},
        "architecture/trainable_downsampling": {
            "argument name": "trainable_downsampling", "default": False},
        "architecture/encoder": {"argument name": "encoder", "default": None},
        "weight_init": {"torch.nn.init.kaiming_normal_":
                        {"nonlinearity": "relu"}},
    }

    @staticmethod
    def fill_kwargs(config_dict: ConfigDict):
        for key in ("architecture/basic block", "architecture/upsampling",
                    "architecture/downsampling", "architecture/stem",
                    "architecture/final_block"):
            value = config_dict.get(key)
            if isinstance(value, str):
                config_dict[key] = ConfigDict({value: {}})
            if isinstance(config_dict.get(key), ConfigDict):
                fill_spec(config_dict[key])

        mixing = config_dict["architecture/mixing block"]
        if isinstance(mixing, ConfigDict) and mixing.key() != "concatenate":
            fill_spec(mixing)

        act = config_dict["architecture/activation function/final"]
        if isinstance(act, ConfigDict):
            name, params = act.item()
            if name in ACTIVATIONS and isinstance(params, ConfigDict):
                params.fill_with_defaults(ACTIVATIONS[name])

        res_con = config_dict["architecture/residual_connections"]
        if res_con:
            if isinstance(res_con, str):
                res_con = ConfigDict({res_con: {}})
            keys = list(res_con.keys())
            if len(keys) == 1 and res_con.key() not in ("up", "down"):
                res_cons = ConfigDict({"down": res_con.copy().to_dict(),
                                       "up": res_con.copy().to_dict()})
            else:
                res_cons = res_con
            down = res_cons.get_or_update("down", "identity")
            up = res_cons.get_or_update("up", "identity")
            res_cons.expand()
            down_is_identity = down and (
                down == "identity"
                or (isinstance(down, ConfigDict) and down.key() == "identity"))
            if down_is_identity and config_dict[
                    "architecture/change_channels_in_block"]:
                res_cons.get_or_update("down/identity/expand_method",
                                       "fill_with_zeros")
            up_is_identity = up and (
                up == "identity"
                or (isinstance(up, ConfigDict) and up.key() == "identity"))
            if up_is_identity:
                res_cons.get_or_update("up/identity/contract_method", "add")
            for kw in ("down", "up"):
                sub = res_cons.get(kw)
                if sub and isinstance(sub, ConfigDict) \
                        and sub.key() in ("conv", "convolution"):
                    sub.value().fill_with_defaults(
                        B.ResConnection.CONV_PARAMS)
            config_dict["architecture/residual_connections"] = res_cons

        if config_dict.get("architecture/encoder") is None:
            config_dict.pop("architecture/encoder", None)
        else:
            for key in ("in_channel_size", "stem", "downsampling",
                        "trainable_downsampling", "change_channels_in_block"):
                config_dict.pop("architecture/" + key, None)
            if res_con:
                config_dict.pop("architecture/residual_connections/down",
                                None)
            fill_spec(config_dict["architecture/encoder"])

    def _resolve_channels(self):
        channels = _as_channels(self.channels, self.depth)
        if self.encoder is not None:
            enc_cfg = _normalize_block_cfg(self.encoder)
            enc_channels = enc_cfg.value().get("channel_sizes")
            if enc_channels is None:
                constructor = resolve(enc_cfg.key())
                enc_channels = getattr(constructor, "DEFAULT_CHANNEL_SIZES",
                                       None)
            enc_channels = list(enc_channels)
        else:
            enc_channels = channels if self.encoder_channels is None \
                else list(self.encoder_channels)
        if self.decoder_channels is None:
            dec_channels = channels[::-1]
        else:
            dec_channels = [enc_channels[-1], *self.decoder_channels]
        return enc_channels, dec_channels

    def setup(self):
        enc_channels, dec_channels = self._resolve_channels()
        encoder_depth = len(enc_channels) - 1
        decoder_depth = len(dec_channels) - 1
        skip_list = self.skip_con_channels or enc_channels[:-1][::-1]

        res = self.residual_connections
        if res:
            if isinstance(res, ConfigDict) and ("down" in res or "up" in res):
                down_res = res.get("down", False)
                up_res = res.get("up", False)
            else:
                down_res, up_res = res, res
        else:
            down_res, up_res = False, False

        if self.encoder is not None:
            enc_cfg = _normalize_block_cfg(self.encoder)
            constructor = resolve(enc_cfg.key())
            kwargs = get_kwargs(constructor, enc_cfg.value())
            kwargs = {k: v for k, v in kwargs.items()
                      if B.block_accepts(constructor, k)}
            self.enc = constructor(**kwargs)
        else:
            stem = None if self.preproc_block is None else (
                self.preproc_block if self.preproc_block != "default_stem"
                else ConfigDict({"torch.nn.Conv2d":
                                 {"kernel_size": 3, "padding": "same"}}))
            down = self.downsampling_block \
                if self.downsampling_block != "default_downsampling" \
                else ConfigDict({"torch.nn.MaxPool2d": {"kernel_size": 2}})
            self.enc = UNetEncoder(
                in_channel_size=self.img_ch,
                basic_block=self.basic_block,
                stem=stem,
                downsampling=down,
                depth=encoder_depth,
                width=self.width,
                channels=enc_channels,
                residual_connections=down_res,
                change_channel_in_block=self.change_channels_in_block,
                trainable_downsampling=self.trainable_downsampling,
                stochastic_depth_rate=self.stochastic_depth_rate,
                layer_scaling=self.layer_scaling,
            )

        final = self.final_block if self.final_block != "default_final" \
            else ConfigDict({"torch.nn.Conv2d": {"kernel_size": 1}})
        self.dec = UNetDecoder(
            basic_block=self.basic_block,
            mixing_block=self.mixing_block,
            upsampling_block=self.upsampling_block,
            residual_connections=up_res,
            stochastic_depth_rate=self.stochastic_depth_rate,
            output_ch=self.output_ch,
            depth=decoder_depth,
            width=self.width,
            skip_con_channels_list=skip_list,
            channels=dec_channels,
            final_block=final,
            layer_scaling=self.layer_scaling,
        )

        if self.final_activation is None:
            self.final_act = None
        else:
            self.final_act = make_activation(self.final_activation)

    def __call__(self, x, train: bool = False):
        x, skip_vals = self.enc(x, train=train, return_skip_vals=True)
        out = self.dec(x, skip_vals, train=train)
        if self.final_act is not None:
            out = self.final_act(out)
        return out


register("segmentation.models.UNet", "unet")(UNet)
register("segmentation.models.UNet_encoder", "unet_encoder")(UNetEncoder)
register("segmentation.models.UNet_decoder", "unet_decoder")(UNetDecoder)
