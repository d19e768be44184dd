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

    @classmethod
    def create(cls, variables: dict, opt_state, rng: jax.Array):
        return cls(params=variables["params"],
                   batch_stats=variables.get("batch_stats", {}),
                   opt_state=opt_state,
                   step=jnp.zeros((), jnp.int32),
                   rng_base=rng)

    @property
    def variables(self) -> dict:
        out = {"params": self.params}
        if self.batch_stats:
            out["batch_stats"] = self.batch_stats
        return out

    def step_rng(self) -> jax.Array:
        return jax.random.fold_in(self.rng_base, self.step)
