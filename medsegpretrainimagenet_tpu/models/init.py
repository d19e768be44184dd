"""Weight-initialisation schemes over flax parameter pytrees.

Capability parity with ``/root/reference/src/model/weight_init.py`` and the
random-init path of ``Model.init_weight`` (``model/model.py:93-198``): named
schemes (glorot/he uniform/normal, constant, fix uniform/normal, default)
plus the ``torch.nn.init.*`` aliases used by the shipped configs, applied
per layer *type* with an ``otherwise`` fallback.

TPU-native design: instead of mutating module weights in place, a scheme is
a pure function re-sampling selected leaves of an already-initialised
parameter pytree under fresh PRNG keys — so initialisation composes with
jit/shard without host round-trips.  Layer types are recognised by leaf
structure: conv kernels are rank-4 ``kernel`` leaves (HWIO), dense kernels
rank-2; norm scales/biases and other parameters keep their constructor
defaults, matching the reference's behaviour of leaving modules its schemes
cannot initialise untouched.
"""
from __future__ import annotations

import math
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ConfigDict

__all__ = ["INIT_SCHEMES", "make_sampler", "apply_init", "init_spec_defaults"]


def _fans(shape) -> Tuple[float, float]:
    """fan_in / fan_out for HWIO conv kernels and (in, out) dense kernels."""
    if len(shape) < 2:
        return 1.0, 1.0
    receptive = int(np.prod(shape[:-2])) if len(shape) > 2 else 1
    return shape[-2] * receptive, shape[-1] * receptive


def _variance_sampler(scale: float, mode: str, distribution: str) -> Callable:
    def sample(key, shape, dtype=jnp.float32):
        fan_in, fan_out = _fans(shape)
        denom = {"fan_in": fan_in, "fan_out": fan_out,
                 "fan_avg": (fan_in + fan_out) / 2.0}[mode]
        variance = scale / max(denom, 1.0)
        if distribution == "normal":
            return jax.random.normal(key, shape, dtype) * jnp.sqrt(variance)
        bound = math.sqrt(3.0 * variance)
        return jax.random.uniform(key, shape, dtype, -bound, bound)
    return sample


def _norm_mode(mode: Any) -> str:
    mode = str(mode).replace(" ", "_")
    return mode if mode.startswith("fan_") else f"fan_{mode}"


_RELU_GAIN = 2.0


def _kaiming(distribution: str):
    def factory(a: float = 0.0, mode: str = "fan_in",
                nonlinearity: str = "relu", **_ignored):
        if nonlinearity in ("relu",):
            gain_sq = _RELU_GAIN
        elif nonlinearity in ("leaky_relu", "leaky relu"):
            gain_sq = 2.0 / (1.0 + a ** 2)
        elif nonlinearity == "linear":
            gain_sq = 1.0
        else:
            gain_sq = 1.0
        return _variance_sampler(gain_sq, _norm_mode(mode), distribution)
    return factory


def _xavier(distribution: str):
    def factory(gain: float = 1.0, **_ignored):
        return _variance_sampler(gain ** 2, "fan_avg", distribution)
    return factory


def _constant(value: float = 1.0, **_ignored):
    return lambda key, shape, dtype=jnp.float32: jnp.full(shape, value, dtype)


def _uniform(a: float = 0.0, b: float = 1.0, **_ignored):
    return lambda key, shape, dtype=jnp.float32: jax.random.uniform(
        key, shape, dtype, a, b)


def _normal(mean: float = 0.0, std: float = 1.0, **_ignored):
    return lambda key, shape, dtype=jnp.float32: (
        mean + std * jax.random.normal(key, shape, dtype))


def _trunc_normal(mean: float = 0.0, std: float = 0.02, a: float = -2.0,
                  b: float = 2.0, **_ignored):
    """timm ``trunc_normal_`` semantics: a/b are *absolute* cutoffs (for
    the shipped Swin configs' std=0.02, a=-2, b=2 that is +/-100 sigma —
    effectively untruncated, true std 0.02; truncating at +/-2 *sigma*
    instead would shrink the realised std by ~12%)."""
    def sample(key, shape, dtype=jnp.float32):
        if std <= 0:
            return jnp.full(shape, mean, dtype)
        lo = (a - mean) / std
        hi = (b - mean) / std
        return mean + std * jax.random.truncated_normal(key, lo, hi, shape,
                                                        dtype)
    return sample


def _keep(key, shape, dtype=jnp.float32):  # "torch default": leave as-is
    return None


#: scheme name -> (sampler factory, declarative argument spec)
INIT_SCHEMES: Dict[str, Tuple[Callable, dict]] = {
    "glorot uniform": (_xavier("uniform"), {"gain": {"default": 1.0}}),
    "glorot normal": (_xavier("normal"), {"gain": {"default": 1.0}}),
    "he uniform": (_kaiming("uniform"), {"mode": {"default": "fan in"}}),
    "he normal": (_kaiming("normal"), {"mode": {"default": "fan in"}}),
    "constant": (_constant, {"value": {"argument name": "value",
                                       "default": 1.0}}),
    "fix uniform": (_uniform, {"minium": {"argument name": "a",
                                          "default": 0.0},
                               "maximum": {"argument name": "b",
                                           "default": 1.0}}),
    "fix normal": (_normal, {"mean": {"default": 0.0},
                             "std": {"default": 1.0}}),
    "torch default": (lambda **kw: _keep, {}),
    "default": (lambda **kw: _keep, {}),
    # dotted aliases used verbatim by the shipped configs
    "torch.nn.init.kaiming_normal_": (_kaiming("normal"), {}),
    "torch.nn.init.kaiming_uniform_": (_kaiming("uniform"), {}),
    "torch.nn.init.xavier_normal_": (_xavier("normal"), {}),
    "torch.nn.init.xavier_uniform_": (_xavier("uniform"), {}),
    "torch.nn.init.constant_": (
        lambda val=0.0, **kw: _constant(value=val), {}),
    "torch.nn.init.normal_": (_normal, {}),
    "torch.nn.init.uniform_": (_uniform, {}),
    "timm.models.layers.trunc_normal_": (_trunc_normal, {}),
    "trunc normal": (_trunc_normal, {"mean": {"default": 0.0},
                                     "std": {"default": 0.02}}),
}


def init_spec_defaults(name: str) -> dict:
    return INIT_SCHEMES[name][1] if name in INIT_SCHEMES else {}


def make_sampler(config: Any) -> Tuple[Callable, float]:
    """Resolve a scheme config to ``(kernel_sampler, bias_fill_value)``.

    *config* may be a bare scheme name or ``{name: {kwargs}}``.
    """
    if isinstance(config, str):
        name, params = config, ConfigDict()
    elif isinstance(config, ConfigDict):
        name, params = config.item()
        if not isinstance(params, ConfigDict):
            params = ConfigDict()
    else:
        raise TypeError(f"Cannot build init scheme from {config!r}")
    if name not in INIT_SCHEMES:
        raise KeyError(f"Unknown weight-init scheme {name!r}")
    factory, _spec = INIT_SCHEMES[name]
    kwargs = {k.replace(" ", "_"): v
              for k, v in params.trim().to_dict().items()}
    bias_fill = kwargs.pop("bias_init", 0.0)
    remap = {"value": "value", "minium": "a", "maximum": "b"}
    kwargs = {remap.get(k, k): v for k, v in kwargs.items()}
    return factory(**kwargs), bias_fill


_LAYER_PREDICATES = {
    # layer-type name -> predicate on (leaf name, leaf ndim)
    "torch.nn.Conv2d": lambda name, ndim: name == "kernel" and ndim == 4,
    "conv": lambda name, ndim: name == "kernel" and ndim == 4,
    "torch.nn.Linear": lambda name, ndim: name == "kernel" and ndim == 2,
    "linear": lambda name, ndim: name == "kernel" and ndim == 2,
    "dense": lambda name, ndim: name == "kernel" and ndim == 2,
    "torch.nn.LayerNorm": lambda name, ndim: name == "scale" and ndim == 1,
    "layer_norm": lambda name, ndim: name == "scale" and ndim == 1,
    "otherwise": lambda name, ndim: name == "kernel" and ndim >= 2,
}


def apply_init(params, scheme_config: Any, rng: jax.Array):
    """Re-sample kernel leaves of *params* according to a scheme config.

    *scheme_config* is either one scheme (``{name: kwargs}`` / bare name) or
    a per-layer-type table ``{'torch.nn.Conv2d': scheme, 'otherwise':
    scheme}``.  Kernel leaves matched by a predicate are re-sampled; sibling
    ``bias`` leaves are filled with the scheme's ``bias_init`` (default 0).
    Parameters the schemes cannot initialise (norm scales, PReLU slopes, ...)
    keep their constructor defaults — the analog of the reference leaving
    uninitialisable modules at torch defaults.
    """
    def resolve_sampler(sub, layer_name=None):
        # the reference accepts a *list* of schemes per layer type and
        # tries them in order until one applies (``model.py:151-162``);
        # for kernel leaves every parametric scheme applies, so the first
        # resolvable entry wins
        if isinstance(sub, (list, tuple)):
            last_exc = None
            for element in sub:
                try:
                    return make_sampler(element)
                except (KeyError, TypeError) as exc:
                    last_exc = exc
            raise last_exc or KeyError(
                f"No resolvable scheme in list for {layer_name!r}")
        if isinstance(sub, (str, ConfigDict)):
            return make_sampler(sub)
        return make_sampler(ConfigDict({layer_name: {}}))

    table = []
    if isinstance(scheme_config, ConfigDict) and any(
            k in _LAYER_PREDICATES for k in scheme_config.keys()):
        items = list(scheme_config.items())
        items.sort(key=lambda kv: kv[0] == "otherwise")  # otherwise last
        for layer_name, sub in items:
            pred = _LAYER_PREDICATES.get(layer_name)
            if pred is None:
                continue
            table.append((pred, resolve_sampler(sub, layer_name)))
    else:
        table.append((_LAYER_PREDICATES["otherwise"],
                      resolve_sampler(scheme_config)))

    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    treedef = jax.tree_util.tree_structure(params)
    keys = jax.random.split(rng, max(len(flat), 1))
    matched_parents: Dict[tuple, float] = {}
    new_leaves = []
    # hundreds of tiny per-leaf sampling ops: keep them on the host CPU
    # (CLAUDE.md: never run unjitted per-leaf work on the device — over a
    # remote TPU tunnel each dispatch is a round trip)
    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        for (path, leaf), key in zip(flat, keys):
            name = getattr(path[-1], "key", str(path[-1]))
            parent = tuple(getattr(p, "key", str(p)) for p in path[:-1])
            value = leaf
            for pred, (sampler, bias_fill) in table:
                if pred(name, getattr(leaf, "ndim", 0)):
                    sampled = sampler(key, leaf.shape, leaf.dtype)
                    if sampled is not None:
                        value = sampled
                        matched_parents[parent] = bias_fill
                    break
            new_leaves.append(((name, parent), value))

        out = []
        for (name, parent), value in new_leaves:
            if name == "bias" and parent in matched_parents:
                value = jnp.full_like(value, matched_parents[parent])
            out.append(value)
    return jax.tree_util.tree_unflatten(treedef, out)
