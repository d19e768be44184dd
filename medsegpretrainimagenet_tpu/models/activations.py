"""Activation registry.

Capability parity with ``/root/reference/src/model/activations.py``: named
activations with declarative argument specs, usable anywhere a config names
one.  All activations operate on NHWC tensors (channel axis = -1), matching
this framework's TPU-native layout (the reference's ``softmax(dim=1)`` over
NCHW channels maps to ``axis=-1`` here).

Activations are tiny flax modules so that parametric ones (PReLU) can carry
parameters while everything shares one construction path.
"""
from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp

from ..config import ConfigDict, register
from ..config.registry import resolve as _resolve

__all__ = ["Activation", "make_activation", "ACTIVATIONS"]


class Activation(nn.Module):
    """A named activation with optional kwargs; channel axis is -1."""

    kind: str = "relu"
    negative_slope: float = 0.2
    prelu_init: float = 0.2

    @nn.compact
    def __call__(self, x, train: bool = False):
        name = self.kind
        if name == "relu":
            return nn.relu(x)
        if name == "sigmoid":
            return nn.sigmoid(x)
        if name == "softmax":
            return nn.softmax(x, axis=-1)
        if name in ("leaky relu", "leaky_relu"):
            return nn.leaky_relu(x, negative_slope=self.negative_slope)
        if name == "gelu":
            # exact (erf) form, matching torch.nn.GELU's default
            return nn.gelu(x, approximate=False)
        if name in ("linear", "identity"):
            return x
        if name == "prelu":
            alpha = self.param(
                "alpha", lambda _key: jnp.asarray(self.prelu_init, jnp.float32))
            # cast the f32 parameter to the activation dtype — promoting
            # bf16 activations to f32 here would defeat the compute-dtype
            # convention for every layer downstream
            return jnp.where(x >= 0, x, alpha.astype(x.dtype) * x)
        if name == "tanh":
            return nn.tanh(x)
        if name == "silu":
            return nn.silu(x)
        raise ValueError(f"Unknown activation {self.kind!r}")


#: declarative specs, mirroring the reference's registry shape
ACTIVATIONS = {
    "relu": {},
    "sigmoid": {},
    "softmax": {},
    "gelu": {},
    "linear": {},
    "tanh": {},
    "silu": {},
    "prelu": {
        "initial negative slope": {"argument name": "prelu_init",
                                   "default": 0.2},
    },
    "leaky relu": {
        "negative slope": {"argument name": "negative_slope",
                           "default": 0.2},
    },
}


def make_activation(config: Any, default: str = "relu") -> nn.Module:
    """Build an activation from a config value.

    Accepts a bare name, a ``{name: {kwargs}}`` ConfigDict, or ``None``
    (falls back to *default*).  Unknown names are resolved through the
    component registry so library activations can be registered under
    arbitrary aliases.
    """
    if config is None:
        config = default
    if isinstance(config, dict) and not isinstance(config, ConfigDict):
        config = ConfigDict(config)
    if isinstance(config, str):
        name, params = config, ConfigDict()
    elif isinstance(config, ConfigDict):
        name, params = config.item()
        if not isinstance(params, ConfigDict):
            params = ConfigDict()
    else:
        raise TypeError(f"Cannot build activation from {config!r}")

    # honour the framework-wide space/underscore key equivalence
    # ('leaky_relu' must find the 'leaky relu' spec like any ConfigDict key)
    if name not in ACTIVATIONS and name.replace("_", " ") in ACTIVATIONS:
        name = name.replace("_", " ")
    if name in ACTIVATIONS:
        kwargs = {}
        for key, entry in ACTIVATIONS[name].items():
            arg = entry.get("argument name", key) if isinstance(entry, dict) \
                else key
            default = entry.get("default") if isinstance(entry, dict) else entry
            kwargs[arg] = params.get(key, default)
        return Activation(kind=name, **kwargs)
    constructor = _resolve(name)
    from ..config.registry import get_kwargs
    return constructor(**get_kwargs(constructor, params))


def fill_activation_spec(config_dict: ConfigDict, key: str) -> None:
    """fill_kwargs helper: inject activation argument defaults in place."""
    if not config_dict.has(key):
        return
    value = config_dict[key]
    if isinstance(value, str):
        return
    name, params = value.item()
    if name in ACTIVATIONS and isinstance(params, ConfigDict):
        params.fill_with_defaults(ACTIVATIONS[name])


# registry aliases so configs can name activations as components
register("model.Activation")(Activation)
