"""Training state pytree."""
from __future__ import annotations

from typing import Any

import flax.struct
import jax
import jax.numpy as jnp

__all__ = ["TrainState"]


@flax.struct.dataclass
class TrainState:
    """Everything the jitted train step threads through itself.

    ``step`` counts optimizer steps (virtual batches); the dropout /
    stochastic-depth PRNG stream is derived per step by folding ``step``
    into ``rng_base`` so resume reproduces the stream exactly.
    """

    params: Any
    batch_stats: Any
    opt_state: Any
    step: jax.Array
    rng_base: jax.Array
    #: counts every train-step invocation; every virtual batch now also
    #: applies the optimizer update (reference ``train_model.py:55``), so
    #: this tracks ``step`` — kept as a distinct field for checkpoint
    #: compatibility and so the dropout stream stays well-defined even if
    #: a no-update pass ever returns
    micro_step: jax.Array = None  # type: ignore[assignment]

    @classmethod
    def create(cls, variables: dict, opt_state, rng: jax.Array):
        return cls(params=variables["params"],
                   batch_stats=variables.get("batch_stats", {}),
                   opt_state=opt_state,
                   step=jnp.zeros((), jnp.int32),
                   rng_base=rng,
                   micro_step=jnp.zeros((), jnp.int32))

    @property
    def variables(self) -> dict:
        out = {"params": self.params}
        if self.batch_stats:
            out["batch_stats"] = self.batch_stats
        return out

    def step_rng(self) -> jax.Array:
        counter = self.micro_step if self.micro_step is not None \
            else self.step  # states from before the field existed
        return jax.random.fold_in(self.rng_base, counter)
