"""Functional train state: params + BN batch_stats + optimizer state.

The reference mutates an nn.Module in place (train.py); TPU-natively the
state is an explicit pytree threaded through a jitted, donated step.
"""

from __future__ import annotations

from typing import Any

import flax.struct
import jax
import optax


@flax.struct.dataclass
class TrainState:
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jax.Array  # int32 scalar


def create_train_state(model, tx: optax.GradientTransformation, rng, sample_input,
                       ) -> TrainState:
    """Initialize parameters/batch stats with a sample input and build the
    optimizer state."""
    import jax.numpy as jnp

    rngs = {"params": rng, "dropout": jax.random.fold_in(rng, 1)}
    variables = model.init(rngs, sample_input, train=False)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    return TrainState(
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        step=jnp.zeros((), jnp.int32),
    )
