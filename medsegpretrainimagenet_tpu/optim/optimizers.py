"""Optimizers as optax transforms, built from config.

Capability parity with ``/root/reference/src/optim/optimizer.py`` and
``optims_dict.py``: named optimizers (``sgd``, ``adam``/AdamW) plus the
``torch.optim.*`` aliases used by the shipped configs, with the nested
``learning_rate`` sub-config carrying the schedule spec and base lr.

TPU-native design: the optimizer is an ``optax.GradientTransformation``
whose update runs inside the jitted train step; the learning rate is a pure
schedule of the step counter (see ``schedules.py``); freezing is an
``optax.multi_transform`` label tree (frozen leaves get ``set_to_zero``),
and torch-style coupled weight decay maps to ``add_decayed_weights`` placed
before the momentum/adam transform exactly as torch applies it to the grad.
"""
from __future__ import annotations

from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ..config import ConfigDict, register
from .schedules import (DEFAULT_BASE_LR, ScheduleSpec, build_schedule,
                        fill_schedule_spec)

__all__ = ["Optimizer", "OPTIMIZERS", "build_optimizer"]


def _torch_momentum(momentum: float, dampening: float,
                    nesterov: bool) -> optax.GradientTransformation:
    """torch.optim.SGD momentum with dampening, exactly: the buffer seeds
    with the *undampened* first gradient (``buf = g``), later steps do
    ``buf = m*buf + (1-d)*g`` (plain ``scale(1-d)`` before a trace would
    also dampen the first step)."""

    def init(params):
        return {"trace": jax.tree_util.tree_map(jnp.zeros_like, params),
                "first": jnp.asarray(True)}

    def update(grads, state, params=None):
        del params
        damp = jnp.where(state["first"], 1.0, 1.0 - dampening)
        new_trace = jax.tree_util.tree_map(
            lambda t, g: momentum * t + damp * g, state["trace"], grads)
        out = jax.tree_util.tree_map(
            lambda t, g: g + momentum * t, new_trace, grads) if nesterov \
            else new_trace
        return out, {"trace": new_trace, "first": jnp.asarray(False)}

    return optax.GradientTransformation(init, update)


def _sgd(learning_rate, momentum=0.9, weight_decay=0.0, nesterov=False,
         dampening=0.0, **_ignored) -> optax.GradientTransformation:
    """torch.optim.SGD semantics: grad += wd*param; momentum buffer;
    optional nesterov / dampening."""
    parts = []
    if weight_decay:
        parts.append(optax.add_decayed_weights(weight_decay))
    if momentum:
        if dampening:
            parts.append(_torch_momentum(momentum, dampening, nesterov))
        else:
            parts.append(optax.trace(decay=momentum, nesterov=nesterov))
    parts.append(optax.scale_by_learning_rate(learning_rate))
    return optax.chain(*parts)


def _torch_amsgrad(b1: float, b2: float,
                   eps: float) -> optax.GradientTransformation:
    """torch amsgrad exactly: ``v_max = max(v_max, v)`` over the RAW second
    moment, bias-corrected afterwards (``sqrt(v_max)/sqrt(1-b2^t) + eps``).
    optax's ``scale_by_amsgrad`` maxes the bias-CORRECTED moment instead,
    which yields a measurably different trajectory."""
    tm = jax.tree_util.tree_map

    def init(params):
        zeros = tm(jnp.zeros_like, params)
        return {"mu": zeros, "nu": tm(jnp.zeros_like, params),
                "nu_max": tm(jnp.zeros_like, params),
                "count": jnp.zeros((), jnp.int32)}

    def update(grads, state, params=None):
        del params
        count = state["count"] + 1
        mu = tm(lambda m, g: b1 * m + (1 - b1) * g, state["mu"], grads)
        nu = tm(lambda v, g: b2 * v + (1 - b2) * g * g, state["nu"], grads)
        nu_max = tm(jnp.maximum, state["nu_max"], nu)
        t = count.astype(jnp.float32)
        bc1 = 1.0 - b1 ** t
        bc2 = 1.0 - b2 ** t
        out = tm(lambda m, vm: (m / bc1) /
                 (jnp.sqrt(vm) / jnp.sqrt(bc2) + eps), mu, nu_max)
        return out, {"mu": mu, "nu": nu, "nu_max": nu_max, "count": count}

    return optax.GradientTransformation(init, update)


def _adam(learning_rate, beta_1=0.9, beta_2=0.999, weight_decay=0.0,
          decoupled_weight_decay=False, amsgrad=False, eps=1e-8,
          betas=None, **_ignored) -> optax.GradientTransformation:
    if betas is not None:  # torch.optim.Adam spells the pair 'betas'
        beta_1, beta_2 = betas
    scale = _torch_amsgrad(beta_1, beta_2, eps) if amsgrad \
        else optax.scale_by_adam(b1=beta_1, b2=beta_2, eps=eps)
    parts = []
    if decoupled_weight_decay:
        # torch.optim.AdamW: p -= lr*(adam_update + wd*p) — the decay is
        # applied AFTER the adam rescale (this chain is exactly what
        # optax.adamw builds, but amsgrad must still be honored: the
        # reference's adam_init forwards it to torch AdamW)
        parts.append(scale)
        if weight_decay:
            parts.append(optax.add_decayed_weights(weight_decay))
    else:
        # torch.optim.Adam couples decay into the gradient pre-momentum
        if weight_decay:
            parts.append(optax.add_decayed_weights(weight_decay))
        parts.append(scale)
    parts.append(optax.scale_by_learning_rate(learning_rate))
    return optax.chain(*parts)


def _adamw(learning_rate, betas=(0.9, 0.999), weight_decay=0.01, eps=1e-8,
           amsgrad=False, **_ignored) -> optax.GradientTransformation:
    b1, b2 = betas
    return _adam(learning_rate, beta_1=b1, beta_2=b2,
                 weight_decay=weight_decay, decoupled_weight_decay=True,
                 amsgrad=amsgrad, eps=eps)


OPTIMIZERS = {
    "sgd": {
        "init": _sgd,
        "arguments": {
            "momentum": {"argument name": "momentum", "default": 0.9},
            "weight decay": {"argument name": "weight_decay", "default": 0.0},
            "nesterov momentum": {"argument name": "nesterov",
                                  "default": False},
            "momentum dampening": {"argument name": "dampening",
                                   "default": 0.0},
        },
    },
    "adam": {
        "init": _adam,
        "arguments": {
            "beta_1": {"argument name": "beta_1", "default": 0.9},
            "beta_2": {"argument name": "beta_2", "default": 0.999},
            "weight decay": {"argument name": "weight_decay", "default": 0.0},
            "decoupled weight decay": {
                "argument name": "decoupled_weight_decay", "default": False},
            "amsgrad": {"argument name": "amsgrad", "default": False},
        },
    },
    "torch.optim.AdamW": {
        "init": _adamw,
        "arguments": {
            "betas": {"argument name": "betas", "default": (0.9, 0.999)},
            "weight_decay": {"argument name": "weight_decay",
                             "default": 0.01},
            "eps": {"argument name": "eps", "default": 1e-8},
            "amsgrad": {"argument name": "amsgrad", "default": False},
        },
    },
    "torch.optim.Adam": {
        "init": _adam,
        "arguments": {
            "betas": {"argument name": "betas", "default": (0.9, 0.999)},
            "weight_decay": {"argument name": "weight_decay", "default": 0.0},
            "eps": {"argument name": "eps", "default": 1e-8},
            "amsgrad": {"argument name": "amsgrad", "default": False},
        },
    },
    "torch.optim.SGD": {
        "init": _sgd,
        "arguments": {
            "momentum": {"argument name": "momentum", "default": 0.0},
            "weight_decay": {"argument name": "weight_decay", "default": 0.0},
            "nesterov": {"argument name": "nesterov", "default": False},
            "dampening": {"argument name": "dampening", "default": 0.0},
        },
    },
}


class Optimizer:
    """Config-built optimizer: optax transform + lr schedule + freeze mask.

    Usage::

        opt = Optimizer(config_dict['training/optimizer'],
                        num_epochs=E, batches_per_epoch=B,
                        trainable_mask=mask_tree)
        state = opt.tx.init(params)
        lr = opt.lr_at(step)
    """

    PARAMS = {"learning rate": DEFAULT_BASE_LR}

    @staticmethod
    def fill_kwargs(config_dict: ConfigDict):
        optim_name, optim_dict = config_dict.item()
        if optim_name in OPTIMIZERS:
            optim_dict.fill_with_defaults(OPTIMIZERS[optim_name]["arguments"])
        lr_dict = optim_dict.get_or_update("learning rate", "constant",
                                           final=False)
        if isinstance(lr_dict, ConfigDict):
            lr_dict.get_or_update(f"{lr_dict.key()}/base",
                                  Optimizer.PARAMS["learning rate"])
            fill_schedule_spec(lr_dict)

    def __init__(self, config_dict: ConfigDict,
                 num_epochs: Optional[int] = None,
                 batches_per_epoch: int = 1,
                 trainable_mask=None):
        if isinstance(config_dict, str):
            config_dict = ConfigDict({config_dict: {}})
        Optimizer.fill_kwargs(config_dict)
        optim_name, optim_dict = config_dict.item()

        lr_cfg = optim_dict.get("learning rate")
        self.schedule: ScheduleSpec = build_schedule(
            lr_cfg, num_epochs=num_epochs,
            batches_per_epoch=batches_per_epoch)
        self._lr_fn = self.schedule.global_fn(batches_per_epoch)

        spec = OPTIMIZERS.get(optim_name)
        if spec is None:
            from ..config.registry import RegistryError
            raise RegistryError(
                f"Unknown optimizer {optim_name!r} "
                f"(known: {sorted(OPTIMIZERS)})")
        kwargs = {}
        for arg_name, arg_spec in spec["arguments"].items():
            arg = arg_spec.get("argument name", arg_name) \
                if isinstance(arg_spec, dict) else arg_name
            default = arg_spec.get("default") \
                if isinstance(arg_spec, dict) else arg_spec
            value = optim_dict.get(arg_name, default)
            if isinstance(value, ConfigDict):
                value = value.key()
            kwargs[arg] = value

        tx = spec["init"](learning_rate=self._lr_fn, **kwargs)
        if trainable_mask is not None:
            labels = jax.tree_util.tree_map(
                lambda trainable: "train" if trainable else "freeze",
                trainable_mask)
            tx = optax.multi_transform(
                {"train": tx, "freeze": optax.set_to_zero()}, labels)
        self.tx: optax.GradientTransformation = tx
        self.name = optim_name

    def lr_at(self, step):
        """Learning rate at a global optimizer step (host or traced)."""
        return self._lr_fn(step)


def build_optimizer(config_dict, **kwargs) -> Optimizer:
    return Optimizer(config_dict, **kwargs)


for _alias in OPTIMIZERS:
    register(_alias)(build_optimizer)
