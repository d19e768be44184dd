"""Sequential compound models (reference ``model/model.py:278-333``).

``FeedForwardModel`` chains a list of config-built layers; it is the
pretraining classifier shape used by the shipped configs
(``config/pretraining/*``): ``encoder -> AdaptiveAvgPool2d -> Flatten ->
Linear``.  The first layer's parameter subtree (``layers_0``) is what the
downstream ``UNet`` encoder-transfer loader consumes (see
``train/checkpoint.py``).

Per-layer weight-init schemes (``weight initialisation`` entries inside a
layer config) are applied by the Model wrapper at parameter level.
"""
from __future__ import annotations

from typing import Any, List, Optional, Sequence

import flax.linen as nn

from ..config import ConfigDict, register
from ..config.registry import fill_spec, get_kwargs, resolve
from .blocks import block_accepts
from .init import init_spec_defaults


def _normalize_layers(layers) -> List[ConfigDict]:
    if layers is None:
        return []
    if not isinstance(layers, (tuple, list)):
        layers = [layers]
    out = []
    for layer in layers:
        if isinstance(layer, str):
            layer = ConfigDict({layer: {}})
        elif isinstance(layer, dict) and not isinstance(layer, ConfigDict):
            layer = ConfigDict(layer)
        out.append(layer)
    return out


def build_layer(layer_cfg: ConfigDict) -> nn.Module:
    """Instantiate one layer module from its ``{name: params}`` config."""
    name, params = layer_cfg.item()
    if not isinstance(params, ConfigDict):
        params = ConfigDict()
    constructor = resolve(name)
    kwargs = get_kwargs(constructor, params)
    kwargs = {k: v for k, v in kwargs.items()
              if block_accepts(constructor, k)
              and k not in ("weight_initialisation",)}
    kwargs.pop("weight initialisation", None)
    return constructor(**kwargs)


@register("model.CompoundModel")
class CompoundModel(nn.Module):
    """Container building its layers from a list of layer configs."""

    submodels: Any = None

    PARAMS = {"submodels": {"argument name": "submodels", "default": None}}

    @staticmethod
    def fill_kwargs(config_dict: ConfigDict):
        key = "submodels" if "submodels" in config_dict else "layers"
        for layer_dict in config_dict.elements_of(key):
            fill_spec(layer_dict)
            if "weight initialisation" in layer_dict.value():
                init_cfg = layer_dict.value()["weight initialisation"]
                if isinstance(init_cfg, ConfigDict) and len(init_cfg) == 1:
                    name, params = init_cfg.item()
                    if isinstance(params, ConfigDict):
                        params.fill_with_defaults(init_spec_defaults(name))

    def setup(self):
        self.layers = [build_layer(cfg)
                       for cfg in _normalize_layers(self.submodels)]

    def __call__(self, x, train: bool = False):
        for layer in self.layers:
            x = layer(x, train=train)
        return x


@register("model.FeedForwardModel", "feed_forward_model")
class FeedForwardModel(nn.Module):
    """Sequential chain of config-built layers.

    Reference parity note: the published ``FeedForwardModel.forward``
    (``model/model.py:327-333``) fans the *same* input into every layer —
    which would crash its own pretraining configs (a Linear cannot consume a
    raw image).  The only semantics consistent with those configs and the
    published ImageNet accuracies is sequential chaining, which is what this
    module implements.  ``encoder_features(x, train, return_skip_vals)``
    exposes the first layer's per-level activations (used by the robustness
    module to grab encoder activations).
    """

    threads: Any = None

    PARAMS = {"layers": {"argument name": "threads", "default": None}}

    @staticmethod
    def fill_kwargs(config_dict: ConfigDict):
        key = "threads" if "threads" in config_dict else "layers"
        for layer_dict in config_dict.elements_of(key):
            fill_spec(layer_dict)
            if "weight initialisation" in layer_dict.value():
                init_cfg = layer_dict.value()["weight initialisation"]
                if isinstance(init_cfg, ConfigDict) and len(init_cfg) == 1:
                    name, params = init_cfg.item()
                    if isinstance(params, ConfigDict):
                        params.fill_with_defaults(init_spec_defaults(name))

    def setup(self):
        self.layers = [build_layer(cfg)
                       for cfg in _normalize_layers(self.threads)]

    def __call__(self, x, train: bool = False):
        for layer in self.layers:
            x = layer(x, train=train)
        return x

    def encoder_features(self, x, train: bool = False,
                         return_skip_vals: bool = True):
        """Run only the first layer (the encoder), with skip outputs."""
        first = self.layers[0]
        return first(x, train=train, return_skip_vals=return_skip_vals)
